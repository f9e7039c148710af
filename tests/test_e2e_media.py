"""CLI-on-real-media regression (VERDICT r1 #5; reference output/readme.md
repro commands): synthesize the reference-format checkpoint zoo at tiny
config, then drive cli.style_transfer.main() image + video paths over the
reference's sample media with a StaticLandmarker — asserting crop
parameterization, output geometry, and bucketing consistency. Hermetic: no
pretrained weights, no dlib, CPU platform (conftest)."""

import os
from argparse import Namespace

import numpy as np
import pytest
import torch

from tests import reference_oracle as oracle

oracle.install()
from model.vtoonify import VToonify  # noqa: E402
from model.bisenet.model import BiSeNet  # noqa: E402
from model.encoder.encoders.psp_encoders import GradualStyleEncoder  # noqa: E402

REF_DATA = "/root/reference/data"
N_LATENT = 12
GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")

pytestmark = pytest.mark.e2e


def _block_means(img, grid=16):
    """(H, W, 3) uint8 → (grid, grid, 3) float per-channel block means: a
    compact pixel checksum that averages out JPEG/codec noise but catches any
    numerical regression in the CLI path — channel-order swaps, uint8
    conversion, gamma/scale drift (VERDICT r2 #5; the reference pins its
    outputs the same way via committed output/*.jpg)."""
    h, w = img.shape[:2]
    ys = np.linspace(0, h, grid + 1).astype(int)
    xs = np.linspace(0, w, grid + 1).astype(int)
    out = np.zeros((grid, grid, 3), np.float64)
    for i in range(grid):
        for j in range(grid):
            out[i, j] = img[ys[i]:ys[i + 1], xs[j]:xs[j + 1]].reshape(
                -1, 3).mean(axis=0)
    return out


def _check_golden(name, img, atol):
    """Compare block means against the committed golden; regenerate with
    VTOONIFY_REGEN_GOLDEN=1 (tolerance absorbs cross-platform float drift
    and JPEG/codec library differences, a few uint8 LSB on 30px+ blocks)."""
    means = _block_means(img)
    path = os.path.join(GOLDEN_DIR, name + ".npy")
    if os.environ.get("VTOONIFY_REGEN_GOLDEN"):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.save(path, means)
        return
    assert os.path.exists(path), (
        f"missing golden {path} — run with VTOONIFY_REGEN_GOLDEN=1 once")
    np.testing.assert_allclose(means, np.load(path), atol=atol,
                               err_msg=f"pixel drift vs golden '{name}'")


@pytest.fixture(scope="module")
def zoo(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e_zoo")
    torch.manual_seed(21)
    vt = VToonify(in_size=32, out_size=128, channel_multiplier=1,
                  num_res_layers=2, backbone="dualstylegan")
    torch.save({"g_ema": vt.state_dict()}, str(root / "vtoonify_s_d.pt"))
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
    rng = np.random.RandomState(22)
    bank = {
        f"style{i}.png": rng.randn(1, N_LATENT, 512).astype(np.float32) * 0.3
        for i in range(2)
    }
    np.save(str(root / "exstyle_code.npy"), bank, allow_pickle=True)

    # plausible 68-point landmarks for 077436.jpg's 500x375 framing
    lm = np.zeros((68, 2), np.float32)
    lm[36:42] = [190, 150]  # left eye
    lm[42:48] = [300, 150]  # right eye
    lm[27:36] = [245, 200]  # nose
    lm[48:68] = [245, 260]  # mouth
    np.save(str(root / "landmarks.npy"), lm)
    return root


def _cli_args(zoo, out_dir, content):
    return [
        "--content", content,
        "--ckpt", str(zoo / "vtoonify_s_d.pt"),
        "--faceparsing_path", str(zoo / "faceparsing.pth"),
        "--style_encoder_path", str(zoo / "encoder.pt"),
        "--exstyle_path", str(zoo / "exstyle_code.npy"),
        "--landmarks", str(zoo / "landmarks.npy"),
        "--output_path", out_dir,
        "--style_id", "1", "--scale_image",
    ]


def test_style_transfer_image_on_real_photo(zoo, tmp_path):
    import cv2

    from vtoonify_tpu.cli import style_transfer
    from vtoonify_tpu.pipeline import crop as crop_mod
    from vtoonify_tpu.pipeline.landmarks import StaticLandmarker

    content = os.path.join(REF_DATA, "077436.jpg")
    out_dir = str(tmp_path / "out")
    style_transfer.main(_cli_args(zoo, out_dir, content))

    inp = cv2.imread(os.path.join(out_dir, "077436_input.jpg"))
    out = cv2.imread(os.path.join(out_dir, "077436_vtoonify_d.jpg"))
    assert inp is not None and out is not None
    # output is exactly 4x the preprocessed crop
    assert out.shape[0] == 4 * inp.shape[0]
    assert out.shape[1] == 4 * inp.shape[1]
    # crop bounds are /8-floored (crop.py CROP_MULTIPLE), so the compiled
    # graph sees XLA-bucketable shapes
    assert inp.shape[0] % 8 == 0 and inp.shape[1] % 8 == 0

    # the crop the CLI used matches the documented parameterization
    frame = cv2.cvtColor(cv2.imread(content), cv2.COLOR_BGR2RGB)
    lmk = StaticLandmarker(str(zoo / "landmarks.npy"))
    params = crop_mod.get_video_crop_parameter(frame, lmk)
    h, w, top, bottom, left, right, scale = params
    assert (bottom - top, right - left) == inp.shape[:2]
    # eye distance after rescale is the canonical 64px: landmarks 110px apart
    assert scale == pytest.approx(64.0 / 110.0, rel=1e-6)

    # frozen-seed pixel checksums (zoo is fully seeded, so the whole CLI
    # path — converter, frame graph, uint8 conversion, BGR writer — is
    # deterministic up to float drift)
    _check_golden("image_input_crop", inp, atol=2.0)
    _check_golden("image_vtoonify_d", out, atol=3.0)


def test_style_transfer_image_sp_bit_equal(zoo, tmp_path):
    """--sp 8 (spatial partitioning: ONE frame's height sharded over the
    8-device virtual mesh, VERDICT r3 #2) drives the same CLI path and must
    write a bit-identical output to the unsharded run — GSPMD halo exchanges
    are exact, and the JPEG encoder sees identical pixels."""
    import cv2

    from vtoonify_tpu.cli import style_transfer

    content = os.path.join(REF_DATA, "077436.jpg")
    out_ref = str(tmp_path / "ref")
    out_sp = str(tmp_path / "sp")
    style_transfer.main(_cli_args(zoo, out_ref, content))
    style_transfer.main(_cli_args(zoo, out_sp, content) + ["--sp", "8"])

    ref = cv2.imread(os.path.join(out_ref, "077436_vtoonify_d.jpg"))
    sp = cv2.imread(os.path.join(out_sp, "077436_vtoonify_d.jpg"))
    assert ref is not None and sp is not None
    np.testing.assert_array_equal(sp, ref)

    # --sp and --dp are mutually exclusive; over-subscription errors cleanly
    with pytest.raises(SystemExit):
        style_transfer.main(_cli_args(zoo, out_sp, content)
                            + ["--sp", "8", "--dp", "2"])
    with pytest.raises(SystemExit):
        style_transfer.main(_cli_args(zoo, out_sp, content) + ["--sp", "64"])


def test_style_transfer_video_on_real_clip(zoo, tmp_path):
    import cv2

    from vtoonify_tpu.cli import style_transfer

    content = os.path.join(REF_DATA, "529_2.mp4")
    out_dir = str(tmp_path / "out")
    style_transfer.main(
        _cli_args(zoo, out_dir, content)
        + ["--video", "--frame_limit", "6", "--batch_size", "3", "--profile"]
    )

    crop_cap = cv2.VideoCapture(os.path.join(out_dir, "529_2_input.mp4"))
    out_cap = cv2.VideoCapture(os.path.join(out_dir, "529_2_vtoonify_d.mp4"))
    try:
        assert int(crop_cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 6
        assert int(out_cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 6
        cw = int(crop_cap.get(cv2.CAP_PROP_FRAME_WIDTH))
        ch = int(crop_cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
        assert cw % 8 == 0 and ch % 8 == 0
        assert int(out_cap.get(cv2.CAP_PROP_FRAME_WIDTH)) == 4 * cw
        assert int(out_cap.get(cv2.CAP_PROP_FRAME_HEIGHT)) == 4 * ch
        assert out_cap.get(cv2.CAP_PROP_FPS) == pytest.approx(15.0, abs=0.1)

        # frozen-seed pixel checksums on the first and last written frame
        # (mp4v lossy encode → wider tolerance than the JPEG image path)
        ok, first = out_cap.read()
        assert ok
        for _ in range(5):
            ok, last = out_cap.read()
            assert ok
        _check_golden("video_frame0", first, atol=4.0)
        _check_golden("video_frame5", last, atol=4.0)
    finally:
        crop_cap.release()
        out_cap.release()
