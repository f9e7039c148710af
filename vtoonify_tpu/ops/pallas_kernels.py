"""Pallas TPU kernels for the L0 hot ops (BASELINE.json perf targets).

These back the ops in ops/upfirdn2d.py and ops/fused_act.py on TPU. XLA
already fuses the pure-elementwise fused_leaky_relu into producer epilogues,
and expresses upfirdn as a depthwise conv — the Pallas versions exist to (a)
guarantee the fusion/tiling instead of hoping, and (b) fuse the *whole*
blur-resample chain (pad → FIR_y → FIR_x → stride) into one VMEM-resident
pass with no HBM round-trip between the two separable passes.

Layout: NHWC with C as the lane dimension (128-aligned tiles). Each grid step
processes one (batch, row-block) stripe; the horizontal pass reads the
vertical pass's result directly from VMEM scratch.

Enable via `VTOONIFY_PALLAS=1` (dispatch in ops/upfirdn2d.py / fused_act.py)
or call directly. Falls back to the XLA path for shapes that don't tile.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# fused bias + leaky-relu × scale


def _fused_lrelu_kernel(x_ref, b_ref, o_ref, *, slope, scale):
    x = x_ref[...]
    b = b_ref[...]
    y = x + b
    o_ref[...] = jnp.where(y >= 0, y, y * slope) * scale


def fused_leaky_relu_pallas(x, bias, negative_slope: float = 0.2,
                            scale: float = math.sqrt(2.0),
                            interpret: bool = False):
    """(..., C) input + (C,) bias. Tiles over a flattened row dim."""
    orig_shape = x.shape
    c = x.shape[-1]
    n = int(x.size) // c
    x2 = x.reshape(n, c)
    rows = 256 if n % 256 == 0 else (8 if n % 8 == 0 else None)
    if rows is None:
        y = x2 + bias.astype(x.dtype)
        return (jnp.where(y >= 0, y, y * negative_slope) * scale).reshape(
            orig_shape
        )
    out = pl.pallas_call(
        functools.partial(_fused_lrelu_kernel, slope=negative_slope,
                          scale=scale),
        out_shape=jax.ShapeDtypeStruct((n, c), x.dtype),
        grid=(n // rows,),
        in_specs=[
            pl.BlockSpec((rows, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x2, bias.astype(x.dtype))
    return out.reshape(orig_shape)


# ---------------------------------------------------------------------------
# fused separable 2-D FIR blur (up=1, down=1) — the Blur module's hot case


def _blur_kernel(x_ref, ky_ref, kx_ref, o_ref, *, kt, pad_y0, pad_x0, h, w):
    """One (batch, channel-tile) slab: full H×W plane resident in VMEM.
    Vertical 1-D FIR then horizontal 1-D FIR, zero padding semantics."""
    x = x_ref[0]  # (H, W, ct)
    ky = ky_ref[...]
    kx = kx_ref[...]

    # vertical pass: y[i] = Σ_t x[i + t - pad_y0] · ky_flipped[t]
    acc = jnp.zeros_like(x)
    for t in range(kt):
        off = t - pad_y0
        lo = max(0, -off)
        hi = min(h, h - off)
        src = x[lo + off: hi + off, :, :]
        pad_top = lo
        pad_bot = h - hi
        src = jnp.pad(src, ((pad_top, pad_bot), (0, 0), (0, 0)))
        acc = acc + src * ky[kt - 1 - t]
    # horizontal pass
    out = jnp.zeros_like(acc)
    for t in range(kt):
        off = t - pad_x0
        lo = max(0, -off)
        hi = min(w, w - off)
        src = acc[:, lo + off: hi + off, :]
        src = jnp.pad(src, ((0, 0), (lo, w - hi), (0, 0)))
        out = out + src * kx[kt - 1 - t]
    o_ref[0] = out


def blur_same_pallas(x, kernel_1d, pad=(1, 1), interpret: bool = False):
    """Separable same-size blur (upfirdn up=1, down=1, pad symmetric so the
    output equals the input size: pad0 + pad1 == kt - 1). One fused pass."""
    b, h, w, c = x.shape
    kt = kernel_1d.shape[0]
    pad0, pad1 = pad
    assert pad0 + pad1 == kt - 1, "same-size blur only"
    ct = 128 if c % 128 == 0 else (c if c <= 256 else None)
    if ct is None:
        from vtoonify_tpu.ops.upfirdn2d import upfirdn2d

        return upfirdn2d(x, kernel_1d, pad=(pad0, pad1))
    k = kernel_1d.astype(x.dtype)
    return pl.pallas_call(
        functools.partial(_blur_kernel, kt=kt, pad_y0=pad0, pad_x0=pad0,
                          h=h, w=w),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), x.dtype),
        grid=(b, c // ct),
        in_specs=[
            pl.BlockSpec((1, h, w, ct), lambda i, j: (i, 0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kt,), lambda i, j: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((kt,), lambda i, j: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, ct), lambda i, j: (i, 0, 0, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, k, k)
