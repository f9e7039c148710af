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


def test_lookup_corr_alt_matches_allpairs():
    """The memory-efficient on-the-fly lookup (reference alt_cuda_corr
    equivalent) is exact vs the materialized all-pairs volume — same window
    channel ordering, zero-padding and degenerate-axis semantics, to float
    rounding (the pool/dot order differs)."""
    from vtoonify_tpu.models.raft import (
        build_corr_pyramid, build_fmap_pyramid, lookup_corr, lookup_corr_alt,
    )

    rng = np.random.RandomState(7)
    b, h, w, c = 2, 16, 24, 32
    f1 = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    f2 = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    # coords spread past the borders to exercise the zeros padding
    coords = jnp.asarray(
        rng.uniform(-6, 6, (b, h, w, 2)).astype(np.float32)
        + np.stack(np.meshgrid(np.arange(w), np.arange(h)),
                   axis=-1).astype(np.float32)
    )
    want = lookup_corr(build_corr_pyramid(f1, f2, 4), coords, radius=4)
    for chunk in (9, 81, 5):  # 5 → falls back to a divisor of 81
        got = lookup_corr_alt(f1, build_fmap_pyramid(f2, 4), coords,
                              radius=4, offset_chunk=chunk)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-4, rtol=1e-4)


def test_raft_apply_alt_corr_matches():
    """Full-model equality: corr_impl='alt' produces the same flow as the
    default all-pairs path (float-rounding tolerance through 4 GRU steps)."""
    import jax

    params = init_raft(jax.random.PRNGKey(5))
    rng = np.random.RandomState(6)
    im1 = jnp.asarray(rng.randint(0, 256, (1, 64, 96, 3)).astype(np.float32))
    im2 = jnp.asarray(rng.randint(0, 256, (1, 64, 96, 3)).astype(np.float32))
    lr_a, up_a = raft_apply(params, im1, im2, RAFTConfig(), iters=4)
    lr_b, up_b = raft_apply(params, im1, im2, RAFTConfig(corr_impl="alt"),
                            iters=4)
    np.testing.assert_allclose(np.asarray(lr_b), np.asarray(lr_a),
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(up_b), np.asarray(up_a),
                               atol=1e-2, rtol=1e-3)


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
