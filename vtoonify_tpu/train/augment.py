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

import math

import jax
import jax.numpy as jnp

from vtoonify_tpu.ops.interp import grid_sample
from vtoonify_tpu.ops.upfirdn2d import upfirdn2d

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
    return jnp.einsum("hwk,njk->nhwj", base, theta)


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
    grid = _affine_grid(G_inv[:, :2, :], (out_h, out_w))
    img_affine = grid_sample(img_2x, grid.astype(img.dtype),
                             align_corners=False, padding_mode="zeros")

    k_flip = jnp.flip(k)
    d_p = -pad_k * 2
    down_pad = (d_p + (len_k - 1) // 2, d_p + (len_k - 2) // 2)
    img_down = upfirdn2d(img_affine, k_flip[None, :], down=(2, 1),
                         pad=(*down_pad, 0, 0))
    img_down = upfirdn2d(img_down, k_flip[:, None], down=(1, 2),
                         pad=(0, 0, *down_pad))
    return img_down, G
