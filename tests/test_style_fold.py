"""Shared-style weight folding (round 3): when the style batch is 1 while x
carries a real batch (one style code per video — the inference frame graph),
modulation s and demodulation d fold into the conv kernel instead of scaling
activations (nn/layers.py modulated_conv2d / styled_conv_*_packed /
_to_rgb_packed_conv). Exact same algebra; these tests pin the folded path
against the tiled-style activation-scaling path for every variant."""

import numpy as np

import jax
import jax.numpy as jnp

from vtoonify_tpu.nn import layers as L

B = 3
STYLE_DIM = 512


def _tile(style):
    return jnp.broadcast_to(style, (B,) + style.shape[1:])


def _check(got, want, atol=2e-5):
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=atol)


def test_modulated_conv2d_fold_matches_tiled():
    key = jax.random.PRNGKey(60)
    ks = jax.random.split(key, 3)
    rng = np.random.RandomState(61)
    x = jnp.asarray(rng.randn(B, 12, 12, 16).astype(np.float32))
    style = jnp.asarray(rng.randn(1, STYLE_DIM).astype(np.float32))
    for upsample, downsample, demod in (
        (False, False, True), (False, False, False),
        (True, False, True), (False, True, True),
    ):
        p = L.init_modulated_conv2d(ks[0], 16, 24, 3, STYLE_DIM)
        want = L.modulated_conv2d(p, x, _tile(style), demodulate=demod,
                                  upsample=upsample, downsample=downsample)
        got = L.modulated_conv2d(p, x, style, demodulate=demod,
                                 upsample=upsample, downsample=downsample)
        _check(got, want)


def test_modulated_conv2d_fold_unfused_upsample():
    key = jax.random.PRNGKey(62)
    rng = np.random.RandomState(63)
    x = jnp.asarray(rng.randn(B, 10, 10, 8).astype(np.float32))
    style = jnp.asarray(rng.randn(1, STYLE_DIM).astype(np.float32))
    p = L.init_modulated_conv2d(key, 8, 8, 3, STYLE_DIM)
    want = L.modulated_conv2d(p, x, _tile(style), upsample=True,
                              fuse_upsample=False)
    got = L.modulated_conv2d(p, x, style, upsample=True, fuse_upsample=False)
    _check(got, want)


def test_styled_conv_packed_variants_fold_matches_tiled():
    key = jax.random.PRNGKey(64)
    k1, k2, k3 = jax.random.split(key, 3)
    rng = np.random.RandomState(65)
    x = jnp.asarray(rng.randn(B, 8, 8, 16).astype(np.float32))
    style = jnp.asarray(rng.randn(1, STYLE_DIM).astype(np.float32))
    noise = jnp.asarray(rng.randn(B, 16, 16, 1).astype(np.float32))

    p_up = L.init_styled_conv(k1, 16, 8, 3, STYLE_DIM)
    want = L.styled_conv_up_packed(p_up, x, _tile(style), noise=noise)
    got = L.styled_conv_up_packed(p_up, x, style, noise=noise)
    _check(got, want)

    xp = got  # (B, 8, 8, 32) packed
    p_c = L.init_styled_conv(k2, 8, 8, 3, STYLE_DIM)
    want = L.styled_conv_packed(p_c, xp, _tile(style), noise=noise)
    got = L.styled_conv_packed(p_c, xp, style, noise=noise)
    _check(got, want)

    p_rgb = L.init_to_rgb(k3, 8, STYLE_DIM)
    want = L.to_rgb_packed(p_rgb, xp, _tile(style))
    got = L.to_rgb_packed(p_rgb, xp, style)
    _check(got, want)
    want = L.to_rgb_packed_stay(p_rgb, xp, _tile(style))
    got = L.to_rgb_packed_stay(p_rgb, xp, style)
    _check(got, want)


def test_vtoonify_apply_fold_matches_tiled():
    """Full-model: batch-1 style == tiled style through vtoonify_apply
    (both backbones' generator walks share the layer code; the D config
    exercises AdaIN resblocks + packed stages + ToRGB)."""
    from vtoonify_tpu.models.vtoonify import (
        VToonifyConfig, init_vtoonify, vtoonify_apply,
    )

    cfg = VToonifyConfig(in_size=32, out_size=128, channel_multiplier=1,
                         num_res_layers=2, backbone="dualstylegan")
    params = init_vtoonify(jax.random.PRNGKey(66), cfg)
    rng = np.random.RandomState(67)
    x = jnp.asarray(rng.randn(B, 32, 32, 22).astype(np.float32) * 0.3)
    s_w = jnp.asarray(rng.randn(1, cfg.n_latent, 512).astype(np.float32) * 0.3)
    want = vtoonify_apply(params, cfg, x, jnp.broadcast_to(
        s_w, (B,) + s_w.shape[1:]), d_s=0.5)
    got = vtoonify_apply(params, cfg, x, s_w, d_s=0.5)
    _check(got, want, atol=1e-4)
