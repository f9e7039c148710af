"""Differentiable geometric augmentation (mild ADA variant).

Capability-parity with reference model/simple_augment.py:391-441 (the only
augment imported by the trainers): reflect-pad → 2× wavelet (SYM6) upsample →
affine grid-sample → 2× wavelet downsample, with the reference's milder
parameter distributions (flip, ±0.125 integer translate, lognormal scales
σ=0.1·log2, ±π/4 rotations, fractional translate).

TPU-native deviation: the reference pads by a *data-dependent* amount
(simple_augment.py:304-325, clamped to size-1) which would retrigger XLA
compilation every step. Here the pad is STATIC (`max_pad`, default size//2 + 6
≈ the distribution's practical worst case); whenever the reference's dynamic
pad would have been ≤ max_pad the outputs are bit-identical, because extra
reflect padding only extends content the grid never samples. Used inside the
no-grad data-synthesis path (train_vtoonify_d.py:262), but fully
differentiable anyway (JAX autodiff replaces the 40-line custom grid-sample
double-backward at simple_augment.py:342-377).
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp

from vtoonify_tpu.ops.interp import grid_sample
from vtoonify_tpu.ops.upfirdn2d import upfirdn2d

# TPU fast path for the affine warp (see _affine_warp below). Overridable for
# tests: _FORCE_KERNEL forces the Pallas path, _INTERPRET runs it in
# interpreter mode (hermetic CPU). VTOONIFY_WARP_EXACT=1 runs the kernel's
# MXU contractions at Precision.HIGHEST (f32-exact, ~6x the MXU cost)
# instead of the default single bf16 pass (value-only error ≤ ~6e-3 on
# [-1,1] images — under 2 uint8 LSB; sampling positions are exact either
# way).
_FORCE_KERNEL = False
_INTERPRET = False
_EXACT = os.environ.get("VTOONIFY_WARP_EXACT", "0") == "1"


@functools.lru_cache(None)
def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"

SYM6 = jnp.array(
    (
        0.015404109327027373,
        0.0034907120842174702,
        -0.11799011114819057,
        -0.048311742585633,
        0.4910559419267466,
        0.787641141030194,
        0.3379294217276218,
        -0.07263752278646252,
        -0.021060292512300564,
        0.04472490177066578,
        0.0017677118642428036,
        -0.007800708325034148,
    ),
    dtype=jnp.float32,
)


def _translate_mat(tx, ty):
    b = tx.shape[0]
    m = jnp.tile(jnp.eye(3), (b, 1, 1))
    return m.at[:, 0, 2].set(tx).at[:, 1, 2].set(ty)


def _rotate_mat(theta):
    b = theta.shape[0]
    c, s = jnp.cos(theta), jnp.sin(theta)
    m = jnp.tile(jnp.eye(3), (b, 1, 1))
    return (
        m.at[:, 0, 0].set(c).at[:, 0, 1].set(-s)
        .at[:, 1, 0].set(s).at[:, 1, 1].set(c)
    )


def _scale_mat(sx, sy):
    b = sx.shape[0]
    m = jnp.tile(jnp.eye(3), (b, 1, 1))
    return m.at[:, 0, 0].set(sx).at[:, 1, 1].set(sy)


def _scale_single(sx, sy):
    return jnp.array([[sx, 0, 0], [0, sy, 0], [0, 0, 1]], jnp.float32)


def _translate_single(tx, ty):
    return jnp.array([[1, 0, tx], [0, 1, ty], [0, 0, 1]], jnp.float32)


def _apply(key, p, transform, prev):
    b = transform.shape[0]
    sel = jax.random.bernoulli(key, p, (b,)).astype(jnp.float32)[:, None, None]
    eye = jnp.tile(jnp.eye(3), (b, 1, 1))
    return (sel * transform + (1 - sel) * eye) @ prev


def sample_affine(key, p, size, height, width):
    """reference simple_augment.py:196-252 (mild parameters)."""
    keys = jax.random.split(key, 14)
    G = jnp.tile(jnp.eye(3), (size, 1, 1))

    # flip
    f = jax.random.randint(keys[0], (size,), 0, 2).astype(jnp.float32)
    G = _apply(keys[1], p, _scale_mat(1 - 2.0 * f, jnp.ones(size)), G)
    # integer translate
    t = jax.random.uniform(keys[2], (size,), minval=-0.125, maxval=0.125)
    G = _apply(
        keys[3], p,
        _translate_mat(jnp.round(t * width) / width,
                       jnp.round(t * height) / height),
        G,
    )
    # isotropic scale
    s = jnp.exp(jax.random.normal(keys[4], (size,)) * (0.1 * math.log(2)))
    G = _apply(keys[5], p, _scale_mat(s, s), G)

    p_rot = 1 - math.sqrt(1 - p)
    # pre-rotate
    th = jax.random.uniform(keys[6], (size,), minval=-math.pi * 0.25,
                            maxval=math.pi * 0.25)
    G = _apply(keys[7], p_rot, _rotate_mat(-th), G)
    # anisotropic scale
    s = jnp.exp(jax.random.normal(keys[8], (size,)) * (0.1 * math.log(2)))
    G = _apply(keys[9], p, _scale_mat(s, 1 / s), G)
    # post-rotate
    th = jax.random.uniform(keys[10], (size,), minval=-math.pi * 0.25,
                            maxval=math.pi * 0.25)
    G = _apply(keys[11], p_rot, _rotate_mat(-th), G)
    # fractional translate
    t = jax.random.normal(keys[12], (size,)) * 0.125
    G = _apply(keys[13], p, _translate_mat(t, t), G)
    return G


def _affine_grid(theta, hw, align_corners=False):
    """torch F.affine_grid on (N, 2, 3) theta → (N, H, W, 2) sampling grid."""
    h, w = hw
    if align_corners:
        xs = jnp.linspace(-1.0, 1.0, w)
        ys = jnp.linspace(-1.0, 1.0, h)
    else:
        xs = (jnp.arange(w) * 2 + 1) / w - 1.0
        ys = (jnp.arange(h) * 2 + 1) / h - 1.0
    gx, gy = jnp.meshgrid(xs, ys)  # (H, W)
    base = jnp.stack([gx, gy, jnp.ones_like(gx)], axis=-1)  # (H, W, 3)
    # HIGHEST: on TPU the default einsum precision is a single bf16 MXU pass,
    # which puts ~0.1 px of noise on the sampling coordinates
    return jnp.einsum("hwk,njk->nhwj", base, theta,
                      precision=jax.lax.Precision.HIGHEST)


def _pixel_affine_coefs(theta, out_hw, in_hw):
    """Normalized-grid affine (N, 2, 3) → pixel-space coefficients
    [ax, bx, cx, ay, by, cy]: the exact composition of `_affine_grid`
    (align_corners=False) with grid_sample's coordinate unnormalization."""
    ho, wo = out_hw
    h, w = in_hw
    t00, t01, t02 = theta[:, 0, 0], theta[:, 0, 1], theta[:, 0, 2]
    t10, t11, t12 = theta[:, 1, 0], theta[:, 1, 1], theta[:, 1, 2]
    ax = t00 * (w / wo)
    bx = t01 * (w / ho)
    cx = (t00 * (1 / wo - 1) + t01 * (1 / ho - 1) + t02 + 1) * (w / 2) - 0.5
    ay = t10 * (h / wo)
    by = t11 * (h / ho)
    cy = (t10 * (1 / wo - 1) + t11 * (1 / ho - 1) + t12 + 1) * (h / 2) - 0.5
    return jnp.stack([ax, bx, cx, ay, by, cy], axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _affine_warp_kernelpath(img, theta, out_hw):
    from vtoonify_tpu.ops.pallas_kernels import affine_warp_bilinear_pallas

    coef = _pixel_affine_coefs(theta, out_hw, img.shape[1:3])
    prec = (jax.lax.Precision.HIGHEST if (_EXACT or _INTERPRET)
            else jax.lax.Precision.DEFAULT)
    return affine_warp_bilinear_pallas(img, coef, out_hw,
                                       interpret=_INTERPRET, precision=prec)


def _affine_warp_xla(img, theta, out_hw):
    # the grid stays float32 whatever the image dtype — bf16 coordinates
    # carry ~1 px of rounding at production sizes (8-bit mantissa); only the
    # interpolated VALUES may round through the image dtype
    grid = _affine_grid(theta, out_hw, align_corners=False)
    return grid_sample(img, grid.astype(jnp.float32), align_corners=False,
                       padding_mode="zeros").astype(img.dtype)


def _affine_warp_fwd(img, theta, out_hw):
    return _affine_warp_kernelpath(img, theta, out_hw), (img, theta)


def _affine_warp_bwd(out_hw, res, g):
    # gradients via the differentiable XLA formulation (the kernel itself has
    # no VJP; the augment runs under stop_gradient in the trainers anyway)
    img, theta = res
    _, vjp = jax.vjp(lambda a, t: _affine_warp_xla(a, t, out_hw), img, theta)
    return vjp(g)


_affine_warp_kernelpath.defvjp(_affine_warp_fwd, _affine_warp_bwd)


def _affine_warp(img, theta, out_hw):
    """grid_sample(affine grid) — Pallas one-hot-matmul kernel on TPU (TPU
    gathers serialize; docs/PERF.md), XLA gathers elsewhere and for images
    smaller than the kernel's DMA box (tiny debug configs)."""
    from vtoonify_tpu.ops.pallas_kernels import affine_warp_supported

    if ((_FORCE_KERNEL or _on_tpu())
            and img.dtype in (jnp.float32, jnp.bfloat16)
            and (_INTERPRET or affine_warp_supported(img.shape))):
        return _affine_warp_kernelpath(img, theta, out_hw)
    return _affine_warp_xla(img, theta, out_hw)


def random_apply_affine(img, p, key=None, G=None, max_pad=None):
    """img: (B, H, W, C) NHWC. Returns (augmented, G_inv).

    `G`, if given, is the *inverse* affine (matching the reference's returned
    matrix) and the sampling step is skipped — the parity-test hook.
    """
    b, h, w, c = img.shape
    k = SYM6.astype(img.dtype)
    len_k = k.shape[0]
    pad_k = len_k // 4

    if G is None:
        G = jnp.linalg.inv(sample_affine(key, p, b, h, w))
    G_inv = G.astype(jnp.float32)

    if max_pad is None:
        max_pad = w // 2 + 2 * pad_k
    pad = int(max_pad)
    img_pad = jnp.pad(img, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                      mode="reflect")

    # symmetric static pad → the reference's (pad1-pad2)/2 recentering is 0
    up_pad = ((len_k + 1) // 2, (len_k - 2) // 2)
    img_2x = upfirdn2d(img_pad, k[None, :], up=(2, 1), pad=(*up_pad, 0, 0))
    img_2x = upfirdn2d(img_2x, k[:, None], up=(1, 2), pad=(0, 0, *up_pad))

    G_inv = _scale_single(2, 2) @ G_inv @ _scale_single(0.5, 0.5)
    G_inv = _translate_single(-0.5, -0.5) @ G_inv @ _translate_single(0.5, 0.5)
    out_h, out_w = (h + pad_k * 2) * 2, (w + pad_k * 2) * 2
    h2x, w2x = img_2x.shape[1], img_2x.shape[2]
    G_inv = (
        _scale_single(2 / w2x, 2 / h2x)
        @ G_inv
        @ _scale_single(1 / (2 / out_w), 1 / (2 / out_h))
    )
    img_affine = _affine_warp(img_2x, G_inv[:, :2, :], (out_h, out_w))

    k_flip = jnp.flip(k)
    d_p = -pad_k * 2
    down_pad = (d_p + (len_k - 1) // 2, d_p + (len_k - 2) // 2)
    img_down = upfirdn2d(img_affine, k_flip[None, :], down=(2, 1),
                         pad=(*down_pad, 0, 0))
    img_down = upfirdn2d(img_down, k_flip[:, None], down=(1, 2),
                         pad=(0, 0, *down_pad))
    return img_down, G
