"""Smoke test for examples/inference_playground.py — the script equivalent of
the reference notebook (notebooks/inference_playground.ipynb). Drives all
three parts (one-call demo, VToonify-D style-degree walkthrough, style
control + color transfer) hermetically over the synthetic reference-format
checkpoint zoo and precomputed landmarks."""

import importlib.util
import os
import sys
from argparse import Namespace

import numpy as np
import pytest
import torch

from tests import reference_oracle as oracle

oracle.install()
from model.vtoonify import VToonify  # noqa: E402
from model.bisenet.model import BiSeNet  # noqa: E402
from model.encoder.encoders.psp_encoders import GradualStyleEncoder  # noqa: E402

pytestmark = pytest.mark.e2e

N_LATENT = 12


def _load_playground():
    path = os.path.join(os.path.dirname(__file__), "..", "examples",
                        "inference_playground.py")
    spec = importlib.util.spec_from_file_location("playground_demo", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["playground_demo"] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def zoo_root(tmp_path_factory):
    """checkpoint_root in the Model's expected layout (reference
    checkpoint/README.md:4-35)."""
    root = tmp_path_factory.mktemp("playground_zoo")
    torch.manual_seed(43)
    style_dir = root / "vtoonify_d_arcane"  # 'arcane1-d' → style id 0
    style_dir.mkdir()
    vt = VToonify(in_size=32, out_size=128, channel_multiplier=1,
                  num_res_layers=2, backbone="dualstylegan")
    torch.save({"g_ema": vt.state_dict()}, str(style_dir / "vtoonify_s_d.pt"))
    torch.save(BiSeNet(19).state_dict(), str(root / "faceparsing.pth"))
    enc = GradualStyleEncoder(50, "ir_se",
                              Namespace(input_nc=3, n_styles=N_LATENT))
    torch.save(
        {
            "state_dict": {"encoder." + k: v
                           for k, v in enc.state_dict().items()},
            "latent_avg": torch.randn(N_LATENT, 512),
        },
        str(root / "encoder.pt"),
    )
    rng = np.random.RandomState(44)
    bank = {"style0.png": rng.randn(1, N_LATENT, 512).astype(np.float32) * 0.3}
    np.save(str(style_dir / "exstyle_code.npy"), bank, allow_pickle=True)
    return root


def test_playground_all_parts(zoo_root, tmp_path):
    import cv2

    playground = _load_playground()

    # synthetic portrait + plausible landmarks for the StaticLandmarker
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (375, 500, 3), np.uint8)
    content = str(tmp_path / "face.png")
    cv2.imwrite(content, img)
    lm = np.zeros((68, 2), np.float32)
    lm[36:42] = [190, 150]
    lm[42:48] = [300, 150]
    lm[27:36] = [245, 200]
    lm[48:68] = [245, 260]
    lm_path = str(tmp_path / "landmarks.npy")
    np.save(lm_path, lm)

    out_dir = str(tmp_path / "out")
    playground.main([
        "--checkpoint_root", str(zoo_root),
        "--content", content,
        "--out", out_dir,
        "--landmarks", lm_path,
        "--style_type", "arcane1-d",
        "--model", "arcane1-d",
        "--styles", "arcane1-d",
    ])

    expected = [
        "demo_arcane1-d.jpg",           # part 1
        "walkthrough_ds0.0.jpg",        # part 2 (degree sweep)
        "walkthrough_ds0.5.jpg",
        "walkthrough_ds1.0.jpg",
        "style_arcane1-d.jpg",          # part 3
        "style_color_transfer.jpg",
    ]
    shapes = []
    for name in expected:
        out = cv2.imread(os.path.join(out_dir, name))
        assert out is not None, name
        # 4× upscaled crop, /32-aligned (crop floor 8 × upsample 4)
        assert out.shape[0] % 32 == 0 and out.shape[1] % 32 == 0, name
        assert out.shape[0] >= 4 * 64, name
        shapes.append(out.shape)
    assert len(set(shapes)) == 1  # same crop throughout

    # the style-degree sweep actually changes the output
    a = cv2.imread(os.path.join(out_dir, "walkthrough_ds0.0.jpg")).astype(
        np.int32)
    b = cv2.imread(os.path.join(out_dir, "walkthrough_ds1.0.jpg")).astype(
        np.int32)
    assert np.abs(a - b).mean() > 0.5
