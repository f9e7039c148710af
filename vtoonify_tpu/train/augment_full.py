"""Full ADA augmentation — geometric (strong params) + color transforms +
adaptive-p tuning.

Capability-parity with reference model/stylegan/non_leaking.py: the upstream
stylegan2-ada pipeline (only `simple_augment` is imported by the VToonify
trainers, but the full version is part of the inventory). Differences from
train/augment.py's mild variant: stronger scale σ=0.2·log2, full ±π rotations,
plus the color-matrix chain (brightness, contrast, luma flip, hue rotation,
saturation) and the `AdaptiveAugment` p-controller
(non_leaking.py:12-48,196-283).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from vtoonify_tpu.train.augment import (
    _apply,
    _rotate_mat,
    _scale_mat,
    _translate_mat,
    random_apply_affine,
)

AXIS = (1 / math.sqrt(3),) * 3


def sample_affine_full(key, p, size, height, width):
    """non_leaking.py sample_affine (strong parameters)."""
    keys = jax.random.split(key, 14)
    G = jnp.tile(jnp.eye(3), (size, 1, 1))

    f = jax.random.randint(keys[0], (size,), 0, 2).astype(jnp.float32)
    G = _apply(keys[1], p, _scale_mat(1 - 2.0 * f, jnp.ones(size)), G)
    t = jax.random.uniform(keys[2], (size,), minval=-0.125, maxval=0.125)
    G = _apply(
        keys[3], p,
        _translate_mat(jnp.round(t * width) / width,
                       jnp.round(t * height) / height), G,
    )
    s = jnp.exp(jax.random.normal(keys[4], (size,)) * (0.2 * math.log(2)))
    G = _apply(keys[5], p, _scale_mat(s, s), G)

    p_rot = 1 - math.sqrt(1 - p)
    th = jax.random.uniform(keys[6], (size,), minval=-math.pi, maxval=math.pi)
    G = _apply(keys[7], p_rot, _rotate_mat(-th), G)
    s = jnp.exp(jax.random.normal(keys[8], (size,)) * (0.2 * math.log(2)))
    G = _apply(keys[9], p, _scale_mat(s, 1 / s), G)
    th = jax.random.uniform(keys[10], (size,), minval=-math.pi, maxval=math.pi)
    G = _apply(keys[11], p_rot, _rotate_mat(-th), G)
    t = jax.random.normal(keys[12], (size,)) * 0.125
    G = _apply(keys[13], p, _translate_mat(t, t), G)
    return G


# --- color matrices (non_leaking.py:100-160, 252-283) ------------------------


def _apply4(key, p, transform, prev):
    b = transform.shape[0]
    sel = jax.random.bernoulli(key, p, (b,)).astype(jnp.float32)[:, None, None]
    eye = jnp.tile(jnp.eye(4), (b, 1, 1))
    return (sel * transform + (1 - sel) * eye) @ prev


def _translate3d(t):
    b = t.shape[0]
    m = jnp.tile(jnp.eye(4), (b, 1, 1))
    return m.at[:, 0, 3].set(t).at[:, 1, 3].set(t).at[:, 2, 3].set(t)


def _scale3d(s):
    b = s.shape[0]
    m = jnp.tile(jnp.eye(4), (b, 1, 1))
    return m.at[:, 0, 0].set(s).at[:, 1, 1].set(s).at[:, 2, 2].set(s)


def _luma_flip(i):
    axis = jnp.array(AXIS + (0.0,))
    flip = 2 * jnp.outer(axis, axis)[None] * i[:, None, None]
    return jnp.eye(4)[None] - flip


def _hue_rotate(theta):
    u = jnp.array(AXIS)
    eye = jnp.eye(3)
    cross = jnp.array([
        [0, -u[2], u[1]],
        [u[2], 0, -u[0]],
        [-u[1], u[0], 0],
    ])
    outer = jnp.outer(u, u)
    c = jnp.cos(theta)[:, None, None]
    s = jnp.sin(theta)[:, None, None]
    rot = c * eye[None] + s * cross[None] + (1 - c) * outer[None]
    out = jnp.tile(jnp.eye(4), (theta.shape[0], 1, 1))
    return out.at[:, :3, :3].set(rot)


def _saturation(i):
    axis = jnp.array(AXIS + (0.0,))
    a = jnp.outer(axis, axis)[None]
    eye = jnp.eye(4)[None]
    return a + (eye - a) * i[:, None, None]


def sample_color(key, p, size):
    keys = jax.random.split(key, 10)
    C = jnp.tile(jnp.eye(4), (size, 1, 1))
    t = jax.random.normal(keys[0], (size,)) * 0.2
    C = _apply4(keys[1], p, _translate3d(t), C)
    s = jnp.exp(jax.random.normal(keys[2], (size,)) * (0.5 * math.log(2)))
    C = _apply4(keys[3], p, _scale3d(s), C)
    f = jax.random.randint(keys[4], (size,), 0, 2).astype(jnp.float32)
    C = _apply4(keys[5], p, _luma_flip(f), C)
    th = jax.random.uniform(keys[6], (size,), minval=-math.pi, maxval=math.pi)
    C = _apply4(keys[7], p, _hue_rotate(th), C)
    s = jnp.exp(jax.random.normal(keys[8], (size,)) * math.log(2))
    C = _apply4(keys[9], p, _saturation(s), C)
    return C


def apply_color(img, mat):
    """img (B, H, W, 3); mat (B, 4, 4) — non_leaking.py:444-452:
    out = img @ M[:3,:3]^T + M[:3,3]."""
    mul = jnp.swapaxes(mat[:, :3, :3], 1, 2).astype(img.dtype)
    add = mat[:, :3, 3][:, None, None, :].astype(img.dtype)
    return jnp.einsum("bhwc,bcd->bhwd", img, mul) + add


def augment(img, p, key, max_pad=None):
    """Full ADA: affine then color (non_leaking.py:455-460)."""
    k1, k2, k3 = jax.random.split(key, 3)
    b, h, w, _ = img.shape
    G = jnp.linalg.inv(sample_affine_full(k1, p, b, h, w))
    img, G = random_apply_affine(img, p, G=G, max_pad=max_pad)
    C = sample_color(k2, p, b)
    img = apply_color(img, C)
    return img, (G, C)


class AdaptiveAugment:
    """Adaptive p-controller (non_leaking.py:15-48): tracks sign(D(real)) and
    walks p toward the target r_t. Host-side state; call per step with the
    (already cross-replica-summed) real predictions."""

    def __init__(self, ada_aug_target=0.6, ada_aug_len=500 * 1000,
                 update_every=256):
        self.ada_aug_target = ada_aug_target
        self.ada_aug_len = ada_aug_len
        self.update_every = update_every
        self.ada_update = 0
        self.sign_sum = 0.0
        self.n_pred = 0.0
        self.r_t_stat = 0.0
        self.ada_aug_p = 0.0

    def tune(self, real_pred) -> float:
        import numpy as np

        rp = np.asarray(real_pred)
        self.sign_sum += float(np.sign(rp).sum())
        self.n_pred += rp.shape[0]
        self.ada_update += 1
        if self.ada_update % self.update_every == 0:
            self.r_t_stat = self.sign_sum / max(self.n_pred, 1)
            sign = 1 if self.r_t_stat > self.ada_aug_target else -1
            self.ada_aug_p += sign * self.n_pred / self.ada_aug_len
            self.ada_aug_p = min(1.0, max(0.0, self.ada_aug_p))
            self.sign_sum = 0.0
            self.n_pred = 0.0
            self.ada_update = 0
        return self.ada_aug_p
