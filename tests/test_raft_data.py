"""RAFT eval-harness data plumbing: flow-file IO, input padder, and the
Sintel/KITTI-layout validators (reference model/raft/evaluate.py +
frame_utils.py)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vtoonify_tpu.models.raft_data import (
    InputPadder,
    iter_kitti,
    iter_sintel,
    read_flo,
    read_kitti_flow,
    validate_kitti,
    validate_sintel,
    write_flo,
    write_kitti_flow,
)


def test_flo_roundtrip(tmp_path):
    rng = np.random.RandomState(70)
    flow = rng.randn(17, 23, 2).astype(np.float32) * 5
    path = str(tmp_path / "a.flo")
    write_flo(path, flow)
    np.testing.assert_array_equal(read_flo(path), flow)
    with pytest.raises(ValueError, match="magic"):
        bad = str(tmp_path / "bad.flo")
        open(bad, "wb").write(b"\x00" * 32)
        read_flo(bad)


def test_kitti_flow_roundtrip(tmp_path):
    rng = np.random.RandomState(71)
    flow = np.round(rng.randn(16, 20, 2).astype(np.float32) * 10 * 64) / 64
    valid = rng.rand(16, 20) > 0.3
    path = str(tmp_path / "f.png")
    write_kitti_flow(path, flow, valid)
    flow2, valid2 = read_kitti_flow(path)
    np.testing.assert_allclose(flow2, flow, atol=1 / 64)
    np.testing.assert_array_equal(valid2, valid)


@pytest.mark.parametrize("mode", ["sintel", "kitti"])
def test_input_padder(mode):
    x = jnp.asarray(np.random.RandomState(72).rand(1, 43, 61, 3))
    padder = InputPadder(x.shape, mode=mode)
    y = padder.pad(x)
    assert y.shape[1] % 8 == 0 and y.shape[2] % 8 == 0
    np.testing.assert_array_equal(np.asarray(padder.unpad(y)), np.asarray(x))


def _build_mini_dataset(root, kind):
    import cv2

    rng = np.random.RandomState(73)
    if kind == "sintel":
        img_dir = os.path.join(root, "training", "clean", "scene_1")
        flow_dir = os.path.join(root, "training", "flow", "scene_1")
        os.makedirs(img_dir), os.makedirs(flow_dir)
        for i in (1, 2, 3):
            cv2.imwrite(os.path.join(img_dir, f"frame_{i:04d}.png"),
                        rng.randint(0, 255, (40, 56, 3), np.uint8))
        for i in (1, 2):
            write_flo(os.path.join(flow_dir, f"frame_{i:04d}.flo"),
                      np.ones((40, 56, 2), np.float32))
    else:
        img_dir = os.path.join(root, "training", "image_2")
        flow_dir = os.path.join(root, "training", "flow_occ")
        os.makedirs(img_dir), os.makedirs(flow_dir)
        for i in ("000000", "000001"):
            for t in ("10", "11"):
                cv2.imwrite(os.path.join(img_dir, f"{i}_{t}.png"),
                            rng.randint(0, 255, (40, 56, 3), np.uint8))
            write_kitti_flow(os.path.join(flow_dir, f"{i}_10.png"),
                             np.ones((40, 56, 2), np.float32))


def test_dataset_walkers(tmp_path):
    _build_mini_dataset(str(tmp_path / "sintel"), "sintel")
    _build_mini_dataset(str(tmp_path / "kitti"), "kitti")
    s = list(iter_sintel(str(tmp_path / "sintel")))
    assert len(s) == 2  # 3 frames → 2 consecutive pairs
    assert s[0][0].shape == (40, 56, 3) and s[0][2].shape == (40, 56, 2)
    k = list(iter_kitti(str(tmp_path / "kitti")))
    assert len(k) == 2
    assert k[0][3].dtype == bool


@pytest.mark.slow
def test_validate_drivers_run(tmp_path):
    from vtoonify_tpu.models.raft import init_raft

    _build_mini_dataset(str(tmp_path / "sintel"), "sintel")
    _build_mini_dataset(str(tmp_path / "kitti"), "kitti")
    params = init_raft(jax.random.PRNGKey(0))
    r1 = validate_sintel(params, str(tmp_path / "sintel"), iters=2)
    r2 = validate_kitti(params, str(tmp_path / "kitti"), iters=2)
    for r in (r1, r2):
        assert set(r) == {"epe", "1px", "3px", "5px"}
        assert np.isfinite(r["epe"])


@pytest.mark.slow
def test_raft_eval_cli(tmp_path):
    """`vtoonify-raft-eval` e2e: a torch RAFT checkpoint (DataParallel-style
    'module.' prefix, like the released raft-things.pth) through the full
    Sintel validation harness — reference model/raft/evaluate.py __main__."""
    import torch

    from tests import reference_oracle as oracle
    from vtoonify_tpu.models.raft_eval import main as raft_eval_main

    oracle.install()
    from argparse import Namespace

    from model.raft.core.raft import RAFT  # noqa: E402

    torch.manual_seed(7)
    ref = RAFT(Namespace(small=False, mixed_precision=False,
                         alternate_corr=False)).eval()
    ckpt = tmp_path / "raft-tiny.pth"
    torch.save({f"module.{k}": v for k, v in ref.state_dict().items()},
               str(ckpt))
    _build_mini_dataset(str(tmp_path / "Sintel"), "sintel")

    metrics = raft_eval_main([
        "--model", str(ckpt), "--dataset", "sintel",
        "--data_root", str(tmp_path), "--iters", "2", "--alternate_corr",
    ])
    assert set(metrics) == {"epe", "1px", "3px", "5px"}
    assert np.isfinite(metrics["epe"])

    with pytest.raises(SystemExit):
        raft_eval_main(["--model", str(ckpt), "--dataset", "sintel",
                        "--small"])


# --- flow color coding (models/raft_viz.py vs the vendored visualizer) ------


def _ref_flow_viz():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_flow_viz",
        "/root/reference/model/raft/core/utils/flow_viz.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_flow_to_image_parity():
    from vtoonify_tpu.models.raft_viz import flow_to_image

    ref = _ref_flow_viz()
    rng = np.random.RandomState(72)
    for scale in (0.3, 5.0, 200.0):
        flow = (rng.randn(21, 33, 2) * scale).astype(np.float32)
        np.testing.assert_array_equal(
            flow_to_image(flow), ref.flow_to_image(flow)
        )
        np.testing.assert_array_equal(
            flow_to_image(flow, bgr=True),
            ref.flow_to_image(flow, convert_to_bgr=True),
        )
    # clip branch + zero flow (white center)
    flow = (rng.randn(9, 9, 2) * 10).astype(np.float32)
    np.testing.assert_array_equal(
        flow_to_image(flow, clip_flow=3.0),
        ref.flow_to_image(flow, clip_flow=3.0),
    )
    white = flow_to_image(np.zeros((5, 5, 2), np.float32))
    assert (white == 255).all()


def test_colorize_out_of_range_parity():
    from vtoonify_tpu.models.raft_viz import colorize_flow_uv, make_colorwheel

    ref = _ref_flow_viz()
    np.testing.assert_array_equal(make_colorwheel(), ref.make_colorwheel())
    rng = np.random.RandomState(73)
    u = rng.randn(15, 17) * 2.0  # radii straddle 1 → both branches exercised
    v = rng.randn(15, 17) * 2.0
    np.testing.assert_array_equal(
        colorize_flow_uv(u, v), ref.flow_uv_to_colors(u, v)
    )


def test_demo_directory(tmp_path):
    from PIL import Image

    from vtoonify_tpu.models.raft import init_raft
    from vtoonify_tpu.models.raft_viz import demo_directory, list_image_pairs

    frames_dir = tmp_path / "frames"
    frames_dir.mkdir()
    rng = np.random.RandomState(74)
    for i in range(3):
        Image.fromarray(
            rng.randint(0, 256, (44, 36, 3), np.uint8)
        ).save(frames_dir / f"f{i}.png")

    assert len(list_image_pairs(str(frames_dir))) == 2
    params = init_raft(jax.random.PRNGKey(1))
    out = demo_directory(params, str(frames_dir), str(tmp_path / "viz"),
                         iters=2)
    assert len(out) == 2
    stack = np.asarray(Image.open(out[0]))
    assert stack.shape == (88, 36, 3)  # [frame; flow-viz] vertical stack


def test_forward_interpolate_parity():
    """forward_interpolate vs the reference's scipy implementation
    (model/raft/core/utils/utils.py:26-54)."""
    import torch

    from tests import reference_oracle as oracle
    from vtoonify_tpu.models.raft_data import forward_interpolate

    oracle.install()
    from model.raft.core.utils.utils import (  # noqa: E402
        forward_interpolate as ref_fi,
    )

    rng = np.random.RandomState(3)
    flow = rng.randn(12, 16, 2).astype(np.float32) * 3.0
    ref = ref_fi(torch.from_numpy(flow.transpose(2, 0, 1)))
    got = forward_interpolate(flow)
    np.testing.assert_allclose(got, np.transpose(np.asarray(ref), (1, 2, 0)),
                               atol=1e-6)


@pytest.mark.slow
def test_submission_writers(tmp_path):
    """create_sintel_submission (warm start: flow_init threading through
    raft_apply) + create_kitti_submission produce readable leaderboard
    layouts — reference evaluate.py:21-71."""
    import cv2

    from vtoonify_tpu.models.raft import init_raft
    from vtoonify_tpu.models.raft_data import (
        create_kitti_submission,
        create_sintel_submission,
    )

    rng = np.random.RandomState(41)
    sintel = tmp_path / "Sintel"
    for scene in ("alley_9", "cave_0"):
        d = sintel / "test" / "clean" / scene
        os.makedirs(str(d))
        for i in (1, 2, 3):
            cv2.imwrite(str(d / f"frame_{i:04d}.png"),
                        rng.randint(0, 255, (40, 56, 3), np.uint8))
    kitti = tmp_path / "KITTI" / "testing" / "image_2"
    os.makedirs(str(kitti))
    for i in ("000000",):
        for t in ("10", "11"):
            cv2.imwrite(str(kitti / f"{i}_{t}.png"),
                        rng.randint(0, 255, (40, 56, 3), np.uint8))

    params = init_raft(jax.random.PRNGKey(2))
    s_out = create_sintel_submission(params, str(sintel),
                                     str(tmp_path / "sintel_sub"),
                                     iters=2, warm_start=True,
                                     dstypes=("clean",))
    assert len(s_out) == 4  # 2 scenes x 2 pairs
    assert s_out[0].endswith(os.path.join("clean", "alley_9",
                                          "frame0001.flo"))
    flo = read_flo(s_out[0])
    assert flo.shape == (40, 56, 2) and np.isfinite(flo).all()

    k_out = create_kitti_submission(params, str(tmp_path / "KITTI"),
                                    str(tmp_path / "kitti_sub"), iters=2)
    assert len(k_out) == 1 and k_out[0].endswith("000000_10.png")
    flow, valid = read_kitti_flow(k_out[0])
    assert flow.shape == (40, 56, 2) and valid.all()


@pytest.mark.slow
def test_validate_chairs(tmp_path):
    """validate_chairs over a mini FlyingChairs layout with a split file
    (reference evaluate.py:74-90 + datasets.FlyingChairs split handling)."""
    import cv2

    from vtoonify_tpu.models.raft import init_raft
    from vtoonify_tpu.models.raft_data import validate_chairs

    root = tmp_path / "FlyingChairs_release" / "data"
    os.makedirs(str(root))
    rng = np.random.RandomState(17)
    for i in (1, 2, 3):
        for t in (1, 2):
            cv2.imwrite(str(root / f"{i:05d}_img{t}.ppm"),
                        rng.randint(0, 255, (40, 56, 3), np.uint8))
        write_flo(str(root / f"{i:05d}_flow.flo"),
                  np.ones((40, 56, 2), np.float32))
    split = tmp_path / "chairs_split.txt"
    split.write_text("1\n2\n2\n")  # 1=train, 2=validation → 2 val pairs

    params = init_raft(jax.random.PRNGKey(4))
    r = validate_chairs(params, str(root), split_file=str(split), iters=2)
    assert set(r) == {"epe", "1px", "3px", "5px"}
    assert np.isfinite(r["epe"])
