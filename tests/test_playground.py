"""Smoke test for examples/inference_playground.py — the script equivalent of
the reference notebook (notebooks/inference_playground.ipynb). Drives all
three parts (one-call demo, VToonify-D style-degree walkthrough, style
control + color transfer) hermetically over the synthetic reference-format
checkpoint zoo and precomputed landmarks."""

import importlib.util
import os
import sys

import numpy as np
import pytest

from tests.zoo import build_zoo, portrait_landmarks

pytestmark = pytest.mark.e2e


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
    # 'arcane1-d' → style id 0 (tests/zoo.py holds the layout)
    return build_zoo(tmp_path_factory.mktemp("playground_zoo"),
                     "vtoonify_d_arcane", torch_seed=43, bank_seed=44)


def test_playground_all_parts(zoo_root, tmp_path):
    import cv2

    playground = _load_playground()

    # synthetic portrait + plausible landmarks for the StaticLandmarker
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (375, 500, 3), np.uint8)
    content = str(tmp_path / "face.png")
    cv2.imwrite(content, img)
    lm_path = str(tmp_path / "landmarks.npy")
    np.save(lm_path, portrait_landmarks())

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
