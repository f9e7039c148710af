"""Resize / sampling ops with exact torch semantics (NHWC).

The reference leans on torch.nn.functional.interpolate and grid_sample in the
preprocessing pipeline (style_transfer.py:221-222), pSp FPN
(psp_encoders.py:87-88, align_corners=True), BiSeNet heads
(bisenet/model.py:251-253, align_corners=True) and the differentiable
augmentation / RAFT warping (simple_augment.py, raft/core/utils). jax.image
uses different pixel-center conventions, so these are implemented explicitly
as gathers — cheap, fusible, and bit-faithful to torch for parity tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _source_coords(out_size: int, in_size: int, align_corners: bool, dtype):
    i = jnp.arange(out_size, dtype=dtype)
    if align_corners:
        if out_size == 1:
            return jnp.zeros((out_size,), dtype)
        scale = (in_size - 1) / (out_size - 1)
        return i * scale
    scale = in_size / out_size
    return jnp.clip((i + 0.5) * scale - 0.5, 0.0, None)


def resize_bilinear(x, size, align_corners: bool = False):
    """torch F.interpolate(mode='bilinear') on NHWC input."""
    n, h, w, c = x.shape
    oh, ow = size
    if (oh, ow) == (h, w):
        return x
    dtype = x.dtype if jnp.issubdtype(x.dtype, jnp.floating) else jnp.float32
    ys = _source_coords(oh, h, align_corners, dtype)
    xs = _source_coords(ow, w, align_corners, dtype)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = (ys - y0.astype(dtype))[None, :, None, None]
    wx = (xs - x0.astype(dtype))[None, None, :, None]
    # Two-pass gather: rows then columns (keeps gathers 1-D and XLA-friendly).
    top = jnp.take(x, y0, axis=1)
    bot = jnp.take(x, y1, axis=1)
    rows = top * (1 - wy) + bot * wy
    left = jnp.take(rows, x0, axis=2)
    right = jnp.take(rows, x1, axis=2)
    return left * (1 - wx) + right * wx


def resize_nearest(x, size):
    """torch F.interpolate(mode='nearest') on NHWC input."""
    n, h, w, c = x.shape
    oh, ow = size
    ys = jnp.floor(jnp.arange(oh, dtype=jnp.float32) * (h / oh)).astype(jnp.int32)
    xs = jnp.floor(jnp.arange(ow, dtype=jnp.float32) * (w / ow)).astype(jnp.int32)
    ys = jnp.clip(ys, 0, h - 1)
    xs = jnp.clip(xs, 0, w - 1)
    return jnp.take(jnp.take(x, ys, axis=1), xs, axis=2)


def grid_sample(x, grid, align_corners: bool = False, padding_mode: str = "zeros"):
    """torch F.grid_sample(mode='bilinear') on NHWC input.

    Args:
      x: (N, H, W, C)
      grid: (N, Ho, Wo, 2) normalized coords in [-1, 1], last dim = (x, y).
    """
    n, h, w, c = x.shape
    gx = grid[..., 0]
    gy = grid[..., 1]
    if align_corners:
        fx = (gx + 1) * 0.5 * (w - 1)
        fy = (gy + 1) * 0.5 * (h - 1)
    else:
        fx = ((gx + 1) * w - 1) * 0.5
        fy = ((gy + 1) * h - 1) * 0.5

    if padding_mode == "border":
        # torch clamps the *continuous* coordinate before the bilinear corners
        fx = jnp.clip(fx, 0, w - 1)
        fy = jnp.clip(fy, 0, h - 1)

    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    wx = fx - x0
    wy = fy - y0

    # The gather operand is a materialized reshape of x; with few channels
    # minor it would be lane-padded on TPU (C=6 → 21× HBM expansion on the
    # megapixel augment tensors). Gather from a channels-second-minor view
    # instead (minor dim = h·w, unpadded) when C is small.
    fold_c = c <= 16
    flat_cm = (jnp.moveaxis(x, -1, 1).reshape(n, c, h * w)
               if fold_c else x.reshape(n, h * w, c))

    def gather(ix, iy):
        valid = (ix >= 0) & (ix <= w - 1) & (iy >= 0) & (iy <= h - 1)
        ixc = jnp.clip(ix, 0, w - 1).astype(jnp.int32)
        iyc = jnp.clip(iy, 0, h - 1).astype(jnp.int32)
        idx = (iyc * w + ixc).astype(jnp.int32)  # (N, Ho, Wo)
        if fold_c:
            vals = jnp.take_along_axis(
                flat_cm, idx.reshape(n, 1, -1), axis=2
            )  # (N, C, Ho·Wo)
            vals = jnp.moveaxis(vals.reshape((n, c) + idx.shape[1:]), 1, -1)
        else:
            vals = jnp.take_along_axis(
                flat_cm, idx.reshape(n, -1, 1), axis=1
            ).reshape(idx.shape + (c,))
        if padding_mode == "zeros":
            vals = jnp.where(valid[..., None], vals, 0.0)
        return vals

    v00 = gather(x0, y0)
    v01 = gather(x0 + 1, y0)
    v10 = gather(x0, y0 + 1)
    v11 = gather(x0 + 1, y0 + 1)
    wx = wx[..., None]
    wy = wy[..., None]
    return (
        v00 * (1 - wx) * (1 - wy)
        + v01 * wx * (1 - wy)
        + v10 * (1 - wx) * wy
        + v11 * wx * wy
    )


def avg_pool(x, window, stride=None, padding=0):
    """torch F.avg_pool2d on NHWC input."""
    kh, kw = (window, window) if isinstance(window, int) else window
    if stride is None:
        stride = (kh, kw)
    sh, sw = (stride, stride) if isinstance(stride, int) else stride
    ph, pw = (padding, padding) if isinstance(padding, int) else padding
    out = lax.reduce_window(
        x,
        0.0,
        lax.add,
        (1, kh, kw, 1),
        (1, sh, sw, 1),
        ((0, 0), (ph, ph), (pw, pw), (0, 0)),
    )
    return out / (kh * kw)


def max_pool(x, window, stride=None, padding=0):
    """torch F.max_pool2d on NHWC input."""
    kh, kw = (window, window) if isinstance(window, int) else window
    if stride is None:
        stride = (kh, kw)
    sh, sw = (stride, stride) if isinstance(stride, int) else stride
    ph, pw = (padding, padding) if isinstance(padding, int) else padding
    return lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        lax.max,
        (1, kh, kw, 1),
        (1, sh, sw, 1),
        ((0, 0), (ph, ph), (pw, pw), (0, 0)),
    )


def adaptive_avg_pool(x, output_size=1):
    """torch AdaptiveAvgPool2d for the sizes used by the model zoo.

    Supports output 1×1 (global mean) and any size that evenly divides the
    input (the only cases the reference models need: SE modules (1),
    BackboneEncoder pools (1, 7)).
    """
    n, h, w, c = x.shape
    oh, ow = (
        (output_size, output_size) if isinstance(output_size, int) else output_size
    )
    if (oh, ow) == (1, 1):
        return jnp.mean(x, axis=(1, 2), keepdims=True)
    assert h % oh == 0 and w % ow == 0, "adaptive_avg_pool: non-divisible size"
    return avg_pool(x, (h // oh, w // ow))
