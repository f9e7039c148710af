"""RAFT parity vs the reference oracle (random-init converted weights)."""

from argparse import Namespace

import numpy as np
import torch

import jax.numpy as jnp

from tests import reference_oracle as oracle
from vtoonify_tpu.convert.torch_import import convert_raft, flatten_torch_state
from vtoonify_tpu.models.raft import RAFTConfig, init_raft, raft_apply

oracle.install()
from model.raft.core.raft import RAFT  # noqa: E402


def test_raft_parity():
    torch.manual_seed(90)
    args = Namespace(small=False, mixed_precision=False,
                     alternate_corr=False)
    ref = RAFT(args).eval()
    params = convert_raft(flatten_torch_state(ref))

    rng = np.random.RandomState(91)
    # sizes chosen so no correlation-pyramid level degenerates to 1px
    # (the reference divides by zero there; see lookup_corr)
    im1 = rng.randint(0, 256, (1, 128, 192, 3)).astype(np.float32)
    im2 = rng.randint(0, 256, (1, 128, 192, 3)).astype(np.float32)
    with torch.no_grad():
        flow_lr_ref, flow_up_ref = ref(
            oracle.to_nchw(im1), oracle.to_nchw(im2), iters=4, test_mode=True
        )
    flow_lr, flow_up = raft_apply(
        params, jnp.asarray(im1), jnp.asarray(im2), RAFTConfig(), iters=4,
        test_mode=True,
    )
    # coords1-coords0 channels: ours NHWC (x,y) == torch NCHW (x,y)
    np.testing.assert_allclose(
        np.asarray(flow_lr), oracle.to_nhwc(flow_lr_ref), atol=2e-3, rtol=1e-2
    )
    np.testing.assert_allclose(
        np.asarray(flow_up), oracle.to_nhwc(flow_up_ref), atol=2e-2, rtol=1e-2
    )


def test_raft_init_smoke():
    import jax

    params = init_raft(jax.random.PRNGKey(0))
    flow_lr, flow_up = raft_apply(
        params, jnp.zeros((1, 32, 32, 3)), jnp.ones((1, 32, 32, 3)) * 255,
        iters=2,
    )
    assert flow_lr.shape == (1, 4, 4, 2)
    assert flow_up.shape == (1, 32, 32, 2)


def test_smooth_parsing_maps_smoke():
    import jax

    from vtoonify_tpu.models.bisenet import init_bisenet
    from vtoonify_tpu.pipeline.smooth_parsing import smooth_video_parsing_maps

    raft_params = init_raft(jax.random.PRNGKey(1))
    parsing_params = init_bisenet(jax.random.PRNGKey(2))
    frames = np.random.RandomState(3).randint(
        0, 256, (4, 32, 32, 3), dtype=np.uint8
    )
    maps = smooth_video_parsing_maps(raft_params, parsing_params, frames,
                                     window=2, iters=2)
    assert maps.shape == (4, 32, 32, 19)
    assert np.isfinite(maps).all()
