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


# ---------------------------------------------------------------------------
# fused modulated 3×3 conv (stride 1, same pad) — the StyleGAN high-res tail
#
# In the XLA graph each styled conv at 1024²×32ch costs ~14 ms in context:
# the conv itself runs lane-padded (32→128 on both operands ≈ 16× waste) and
# the modulation/demodulation/activation elementwise passes + layout changes
# each re-stream the ~270 MB activation through HBM. This kernel does ONE
# HBM read and ONE write per tensor: slab-DMA a row stripe (with halo),
# scale by the per-sample style s, accumulate 3 row-matmuls with the taps
# packed into the contraction dim (K = 3·3·C), then apply demod, bias and
# leaky-relu in-register.


def _modconv3x3_kernel(s_ref, d_ref, b_ref, w_ref, x_hbm, o_ref, slab, sem,
                       *, rows, width, wpad, cin, cout, slope, gain, has_act):
    bi = pl.program_id(0)
    ri = pl.program_id(1)

    copy = pltpu.make_async_copy(
        x_hbm.at[bi, pl.ds(ri * rows, rows + 2)], slab, sem
    )
    copy.start()
    copy.wait()

    # dynamic batch-row select via one-hot (Mosaic can't prove sublane
    # alignment for a direct dynamic index on packed bf16 rows)
    nb = s_ref.shape[0]
    sel = (jax.lax.broadcasted_iota(jnp.int32, (nb, 1), 0) == bi)
    s_row = jnp.sum(s_ref[...] * sel.astype(s_ref.dtype), axis=0)
    d_row = jnp.sum(d_ref[...] * sel.astype(d_ref.dtype), axis=0)

    xs = slab[...] * s_row  # (rows+2, width+2, cin), style-modulated

    acc = jnp.zeros((rows * width, cout), jnp.float32)
    for dy in range(3):
        r = xs[dy:dy + rows]  # (rows, width+2, cin)
        for dx in range(3):
            tap = r[:, dx:dx + width].reshape(rows * width, cin)
            acc = acc + jnp.dot(tap, w_ref[dy * 3 + dx],
                                preferred_element_type=jnp.float32)

    out = acc * d_row
    if has_act:
        out = out + b_ref[0]
        out = jnp.where(out >= 0, out, out * slope) * gain
    o_ref[0] = out.reshape(rows, width, cout).astype(o_ref.dtype)


def modconv3x3_fused_pallas(x, w, s, d=None, act_bias=None,
                            negative_slope: float = 0.2,
                            gain: float = math.sqrt(2.0),
                            rows: int = 8, interpret: bool = False):
    """Fused styled conv: lrelu(demod·conv(x·s, w) + bias)·√2.

    Args:
      x: (B, H, W, C) NHWC; H divisible by `rows`.
      w: (3, 3, C, Cout) — already scaled by the equalized-LR factor.
      s: (B, C) per-sample modulation; d: (B, Cout) demod (or None);
      act_bias: (Cout,) or None (None ⇒ no activation, raw conv out).
    """
    b, h, wd, c = x.shape
    cout = w.shape[-1]
    assert h % rows == 0
    # right-pad W so HBM slab slices are tile-aligned (multiple of 8), and
    # pad Cin to the 128-lane tile (Mosaic lays the HBM buffer out padded
    # anyway; zero weight rows make the junk lanes inert)
    wp = ((wd + 2 + 7) // 8) * 8
    cp = ((c + 127) // 128) * 128
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, wp - wd - 1), (0, cp - c)))
    w_taps = jnp.pad(w.reshape(9, c, cout), ((0, 0), (0, cp - c), (0, 0)))
    s = jnp.pad(s, ((0, 0), (0, cp - c)))
    if d is None:
        d = jnp.ones((b, cout), x.dtype)
    has_act = act_bias is not None
    if act_bias is None:
        act_bias = jnp.zeros((cout,), x.dtype)

    kern = functools.partial(
        _modconv3x3_kernel, rows=rows, width=wd, wpad=wp, cin=cp, cout=cout,
        slope=negative_slope, gain=gain, has_act=has_act,
    )
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, h, wd, cout), x.dtype),
        grid=(b, h // rows),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),          # s (whole)
            pl.BlockSpec(memory_space=pltpu.VMEM),          # d (whole)
            pl.BlockSpec(memory_space=pltpu.VMEM),          # bias (whole)
            pl.BlockSpec(memory_space=pltpu.VMEM),          # w (whole)
            pl.BlockSpec(memory_space=pltpu.ANY),           # x (HBM)
        ],
        out_specs=pl.BlockSpec((1, rows, wd, cout),
                               lambda bi, ri: (bi, ri, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((rows + 2, wp, cp), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(s.astype(x.dtype), d.astype(x.dtype),
      act_bias.astype(x.dtype)[None], w_taps.astype(x.dtype), xp)
