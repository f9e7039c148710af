"""Smoke test for the release-validation gate (VERDICT r3 #3): prove
vtoonify-validate-release is runnable end-to-end by pointing it at the
synthetic checkpoint zoo — generate "goldens" with one run of the tool,
validate a second run against them (PSNR = inf → pass), then corrupt a
golden and assert the gate fails. The day the released checkpoint zoo
appears, the same command gates real parity vs reference output/*.jpg."""

import os
import shutil

import numpy as np
import pytest

from tests.zoo import build_zoo, portrait_landmarks

pytestmark = pytest.mark.e2e

REF_DATA = "/root/reference/data"


@pytest.fixture(scope="module")
def release_zoo(tmp_path_factory):
    """checkpoint_root shaped like the released zoo (tests/zoo.py holds the
    layout), covering the two model paths the 077436/081680 cases need."""
    root = build_zoo(
        tmp_path_factory.mktemp("release_zoo"), "vtoonify_d_cartoon",
        torch_seed=44, bank_seed=45,
        n_bank_styles=27,  # style_id 26 must exist
        extra_ckpt_names=("vtoonify_s026_d0.5.pt",),
    )
    lm_root = root / "landmarks"
    lm_root.mkdir()
    for stem in ("077436", "081680"):
        np.save(str(lm_root / f"{stem}.npy"), portrait_landmarks())
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
