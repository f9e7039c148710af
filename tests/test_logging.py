"""Training observability: sample grids + metrics jsonl (VERDICT r1 #4;
reference train_vtoonify_d.py:271-276,361-376)."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vtoonify_tpu.train.logging import (
    MetricsLogger,
    SampleGridLogger,
    save_image_grid,
    to_uint8,
)


def test_to_uint8_range():
    x = np.array([[-1.0, 0.0, 1.0]])[..., None].repeat(3, -1)
    out = to_uint8(x)
    assert out.dtype == np.uint8
    np.testing.assert_array_equal(out.reshape(-1, 3)[:, 0], [0, 128, 255])


def test_save_image_grid_layout(tmp_path):
    from PIL import Image

    imgs = np.zeros((6, 16, 16, 3), np.float32)
    imgs[0] = 1.0  # white first tile
    path = str(tmp_path / "grid.jpg")
    save_image_grid(path, imgs, nrow=3, pad=2)
    grid = np.asarray(Image.open(path))
    # 2 rows x 3 cols of 16px tiles with 2px padding
    assert grid.shape == (2 * 16 + 3 * 2, 3 * 16 + 4 * 2, 3)
    assert grid[2 + 8, 2 + 8, 0] > 200      # first tile is white
    assert grid[2 + 8, 2 + 16 + 2 + 8, 0] < 150  # second tile dark


def test_metrics_logger_jsonl(tmp_path):
    mlog = MetricsLogger(str(tmp_path))
    mlog.log(3, {"d": jnp.asarray(0.5), "g": 1.25}, d_s=0.4)
    mlog.log(4, {"d": 0.25, "g": 1.0})
    lines = [json.loads(line) for line in open(mlog.path)]
    assert [rec["step"] for rec in lines] == [3, 4]
    assert lines[0]["d"] == 0.5 and lines[0]["d_s"] == 0.4
    assert "wall_s" in lines[1]


@pytest.mark.parametrize("fix_degree", [False, True])
def test_sample_grid_logger(tmp_path, fix_degree):
    from PIL import Image

    from vtoonify_tpu.models.vtoonify import VToonifyConfig, init_vtoonify

    cfg = VToonifyConfig(in_size=32, out_size=128, channel_multiplier=1,
                         num_res_layers=2, backbone="dualstylegan")
    params = init_vtoonify(jax.random.PRNGKey(0), cfg)
    b = 2
    rng = np.random.RandomState(0)
    batch_data = {
        "real_input": jnp.asarray(
            rng.randn(b, 32, 32, 22).astype(np.float32) * 0.1),
        "real_output": jnp.asarray(
            rng.randn(b, 128, 128, 3).astype(np.float32).clip(-1, 1)),
        "xl": jnp.asarray(
            rng.randn(b, cfg.n_latent, 512).astype(np.float32) * 0.1),
    }
    glog = SampleGridLogger(str(tmp_path), cfg, fix_degree=fix_degree)
    glog.seed(batch_data, 0.5)
    glog.seed(batch_data, 0.9)  # idempotent: only the first seed sticks
    assert float(glog._fixed["d_s"]) == 0.5
    path = glog.log(7, params, 0.8)
    grid = np.asarray(Image.open(path))
    nrows = 2 if fix_degree else 3  # target, fixed-d_s, (current-d_s)
    assert path.endswith("00007.jpg")
    assert grid.shape == (nrows * 256 + (nrows + 1) * 2, b * 256 + (b + 1) * 2,
                          3)


def test_step_trace_close_flushes_truncated_window(tmp_path):
    """--profile N with N past the last iteration: close() must stop the
    trace and write the file instead of silently losing it."""
    import glob

    import jax

    from vtoonify_tpu.utils.profiling import StepTrace

    logdir = str(tmp_path / "trace")
    tr = StepTrace(logdir, first_step=0, n_steps=10)
    tr.before(0)
    tr.after(0, jax.numpy.zeros(()))   # window not finished
    tr.close()                          # loop ended early
    assert not tr._active
    assert glob.glob(logdir + "/**/*.xplane.pb", recursive=True)
    tr.close()                          # idempotent
