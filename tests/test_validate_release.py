"""Smoke test for the release-validation gate (VERDICT r3 #3): prove
vtoonify-validate-release is runnable end-to-end by pointing it at the
synthetic checkpoint zoo — generate "goldens" with one run of the tool,
validate a second run against them (PSNR = inf → pass), then corrupt a
golden and assert the gate fails. The day the released checkpoint zoo
appears, the same command gates real parity vs reference output/*.jpg."""

import os
import shutil
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

REF_DATA = "/root/reference/data"
N_LATENT = 12


@pytest.fixture(scope="module")
def release_zoo(tmp_path_factory):
    """checkpoint_root shaped like the released zoo (checkpoint/README.md),
    covering the two model paths the 077436/081680 cases need."""
    root = tmp_path_factory.mktemp("release_zoo")
    torch.manual_seed(44)
    cartoon = root / "vtoonify_d_cartoon"
    cartoon.mkdir()
    vt = VToonify(in_size=32, out_size=128, channel_multiplier=1,
                  num_res_layers=2, backbone="dualstylegan")
    torch.save({"g_ema": vt.state_dict()}, str(cartoon / "vtoonify_s_d.pt"))
    torch.save({"g_ema": vt.state_dict()},
               str(cartoon / "vtoonify_s026_d0.5.pt"))
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
    rng = np.random.RandomState(45)
    bank = {
        f"style{i}.png": rng.randn(1, N_LATENT, 512).astype(np.float32) * 0.3
        for i in range(27)  # style_id 26 must exist
    }
    np.save(str(cartoon / "exstyle_code.npy"), bank, allow_pickle=True)

    lm_root = root / "landmarks"
    lm_root.mkdir()
    lm = np.zeros((68, 2), np.float32)
    lm[36:42] = [190, 150]
    lm[42:48] = [300, 150]
    lm[27:36] = [245, 200]
    lm[48:68] = [245, 260]
    for stem in ("077436", "081680"):
        np.save(str(lm_root / f"{stem}.npy"), lm)
    return root


def test_validate_release_gate(release_zoo, tmp_path):
    import cv2

    from vtoonify_tpu.cli import validate_release as vr

    cases = ["077436_vtoonify_d", "081680_vtoonify_d"]
    common = [
        "--checkpoint_root", str(release_zoo),
        "--data_root", REF_DATA,
        "--landmarks_root", str(release_zoo / "landmarks"),
        "--cases", *cases, "--skip_video",
    ]

    # 1) generate "goldens" from this framework itself. Outputs go to a
    # SEPARATE dir — an output written into golden_root would be compared
    # with itself (the output filename equals the golden name) and the
    # missing-golden first pass would trivially "pass".
    golden_dir = tmp_path / "golden"
    gen_dir = tmp_path / "gen"
    rc = vr.main(common + ["--golden_root", str(golden_dir),
                           "--output_path", str(gen_dir)])
    assert rc == 1  # goldens were missing on the first pass — gate FAILS

    # outputs now exist; install them under the golden names
    golden_dir.mkdir()
    for name, base in zip(cases, ("077436", "081680")):
        src = gen_dir / f"{base}_vtoonify_d.jpg"
        assert src.exists()
        shutil.copy(str(src), str(golden_dir / f"{name}.jpg"))

    # 2) re-run against those goldens → bit-identical → pass
    out_json = tmp_path / "report.json"
    rc = vr.main(common + ["--golden_root", str(golden_dir),
                           "--output_path", str(tmp_path / "out2"),
                           "--json_out", str(out_json)])
    assert rc == 0
    import json

    report = json.loads(out_json.read_text())
    assert all(r["pass"] for r in report["results"])
    assert len(report["results"]) == 2

    # 3) corrupt one golden → the gate must fail. NB: inversion is NOT a
    # valid corruption here — the synthetic random-init model emits
    # near-mid-gray pixels, so 255-img ≈ img keeps PSNR above the gate.
    # Random noise is guaranteed ~8 dB against any natural image.
    g = golden_dir / f"{cases[0]}.jpg"
    img = cv2.imread(str(g))
    noise = np.random.RandomState(0).randint(
        0, 256, img.shape, dtype=np.uint8)
    cv2.imwrite(str(g), noise)
    rc = vr.main(common + ["--golden_root", str(golden_dir),
                           "--output_path", str(tmp_path / "out3")])
    assert rc == 1


def test_validate_release_unknown_case():
    from vtoonify_tpu.cli import validate_release as vr

    with pytest.raises(SystemExit):
        vr.main(["--cases", "not_a_case"])
