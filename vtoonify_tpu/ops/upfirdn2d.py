"""upfirdn2d — upsample → FIR filter → downsample, as ONE XLA convolution.

This is the core resampling primitive of the StyleGAN2 family (reference:
model/stylegan/op/upfirdn2d_kernel.cu and the exact CPU math in
model/stylegan/op_cpu/upfirdn2d.py:20-61). Semantics being reproduced:

    1. zero-stuff each pixel with (up-1) zeros after it (incl. trailing)
    2. pad with (pad0, pad1) per axis; NEGATIVE pads crop
    3. true 2-D convolution with `kernel` (the reference correlates with the
       flipped kernel, which is convolution with the kernel itself)
    4. keep every `down`-th sample

    out = (in * up + pad0 + pad1 - k + down) // down          per axis

TPU-native design: instead of a hand-tiled CUDA kernel, the whole pipeline is
expressed as a single depthwise `lax.conv_general_dilated` with
lhs_dilation=up, window_strides=down and explicit (possibly negative)
padding — XLA maps it onto the convolution units directly and it is
differentiable for free (no custom double-backward needed; the reference
needed 130 lines of autograd for this, op/upfirdn2d.py:20-146).

Note on dilation vs. zero-stuffing: lhs_dilation inserts zeros only *between*
samples ((in-1)*up+1 length) while the reference appends (up-1) trailing zeros
(in*up length). Those trailing zeros only ever multiply kernel taps with zero
input, so adding (up-1) to the high padding makes the two formulations produce
bit-identical outputs with the reference output-size formula.

A separable fast path (two rank-1 passes) is used when the caller provides a
1-D kernel — every kernel in the framework ([1,3,3,1] binomial, SYM6 wavelet)
is an outer product, so production code always takes this path.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax


def make_kernel(k, gain: float = 1.0):
    """Build a normalized FIR kernel (reference model/stylegan/model.py:21-29).

    1-D input → separable (returned as 1-D, consumed by the separable path);
    normalization always uses the 2-D sum so gains match the reference.
    """
    k = np.asarray(k, dtype=np.float32)
    if k.ndim == 1:
        # normalize by the 2-D sum: outer(k,k).sum() == k.sum()**2
        k = k / k.sum()
        return jnp.asarray(k * np.sqrt(gain), dtype=jnp.float32)
    k = k / k.sum()
    return jnp.asarray(k * gain, dtype=jnp.float32)


def _pairify(v):
    return tuple(v) if isinstance(v, (tuple, list)) else (v, v)


def _pad4(pad):
    pad = tuple(pad)
    if len(pad) == 2:
        return (pad[0], pad[1], pad[0], pad[1])
    return pad  # (x0, x1, y0, y1)


def upfirdn2d(x, kernel, up=1, down=1, pad=(0, 0)):
    """Apply up-FIR-down resampling per channel.

    Args:
      x: (N, H, W, C) NHWC input.
      kernel: (kh, kw) 2-D FIR kernel, or (k,) 1-D separable kernel.
      up / down: int or (x, y) pair (reference argument order).
      pad: (pad0, pad1) applied to both axes, or (x0, x1, y0, y1).
    """
    up_x, up_y = _pairify(up)
    down_x, down_y = _pairify(down)
    pad_x0, pad_x1, pad_y0, pad_y1 = _pad4(pad)
    kernel = jnp.asarray(kernel, dtype=x.dtype)

    if kernel.ndim == 1:
        # Separable: vertical pass then horizontal pass (exactly equal to the
        # 2-D outer-product kernel because zero-stuff/pad/down factor per axis).
        x = _upfirdn1d(x, kernel, up_y, down_y, pad_y0, pad_y1, axis=1)
        x = _upfirdn1d(x, kernel, up_x, down_x, pad_x0, pad_x1, axis=2)
        return x

    c = x.shape[-1]
    kh, kw = kernel.shape
    # single-axis 2-D kernels (1×k / k×1, the augment pipeline's calls) route
    # through the 1-D path so they get the small-channel folded layout too —
    # only when the other axis is a no-op (its up/down/pad would be dropped)
    if kw == 1 and (up_x, down_x, pad_x0, pad_x1) == (1, 1, 0, 0):
        return _upfirdn1d(x, kernel[:, 0], up_y, down_y, pad_y0, pad_y1,
                          axis=1)
    if kh == 1 and (up_y, down_y, pad_y0, pad_y1) == (1, 1, 0, 0):
        return _upfirdn1d(x, kernel[0, :], up_x, down_x, pad_x0, pad_x1,
                          axis=2)
    # true convolution == correlation with the flipped kernel
    w = jnp.flip(kernel, axis=(0, 1))
    w = jnp.broadcast_to(w[:, :, None, None], (kh, kw, 1, c))
    return lax.conv_general_dilated(
        x,
        w,
        window_strides=(down_y, down_x),
        padding=((pad_y0, pad_y1 + up_y - 1), (pad_x0, pad_x1 + up_x - 1)),
        lhs_dilation=(up_y, up_x),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


# Below this channel count a depthwise conv is catastrophically lane-padded on
# TPU (XLA puts C on the 128-wide lane dim: C=3 → 42×, C=6 → 21× memory AND
# compute expansion — observed as an 8 GB HLO temp for a 388 MB augment
# tensor). The folded path rewrites the filtered axis's conv so the feature
# dim is (other_spatial_axis · C), restoring full lanes at <1% padding.
_FOLD_C_MAX = 16


def _upfirdn1d(x, k1d, up, down, pad0, pad1, axis):
    """One separable axis of upfirdn as a depthwise 1-D conv."""
    c = x.shape[-1]
    if c <= _FOLD_C_MAX:
        return _upfirdn1d_folded(x, k1d, up, down, pad0, pad1, axis)
    kt = k1d.shape[0]
    w = jnp.flip(k1d)
    if axis == 1:
        w = jnp.broadcast_to(w[:, None, None, None], (kt, 1, 1, c))
        strides = (down, 1)
        padding = ((pad0, pad1 + up - 1), (0, 0))
        dil = (up, 1)
    else:
        w = jnp.broadcast_to(w[None, :, None, None], (1, kt, 1, c))
        strides = (1, down)
        padding = ((0, 0), (pad0, pad1 + up - 1))
        dil = (1, up)
    return lax.conv_general_dilated(
        x,
        w,
        window_strides=strides,
        padding=padding,
        lhs_dilation=dil,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def _upfirdn1d_folded(x, k1d, up, down, pad0, pad1, axis):
    """Small-channel single-axis upfirdn with the non-filtered spatial axis
    folded into the conv feature dim.

    Identical math to `_upfirdn1d` (the same per-channel taps are summed in
    the same order); only the conv's feature layout changes: filtering along
    H on (B, H, W, C) runs as a depthwise conv on (B, H, 1, W·C) — the
    (W, C) fold is a free reshape — and filtering along W transposes H↔W
    first. W·C lanes instead of C means the TPU conv is not lane-padded.
    """
    if axis == 2:
        x = jnp.swapaxes(x, 1, 2)
    b, h, wd, c = x.shape
    kt = k1d.shape[0]
    w = jnp.broadcast_to(jnp.flip(k1d)[:, None, None, None],
                         (kt, 1, 1, wd * c))
    out = lax.conv_general_dilated(
        x.reshape(b, h, 1, wd * c),
        w,
        window_strides=(down, 1),
        padding=((pad0, pad1 + up - 1), (0, 0)),
        lhs_dilation=(up, 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=wd * c,
    )
    out = out.reshape(b, out.shape[1], wd, c)
    if axis == 2:
        out = jnp.swapaxes(out, 1, 2)
    return out


def upsample_2x(x, kernel_1d):
    """Reference Upsample module (model.py:32-50): ×4 gain, factor-2 pads."""
    k = kernel_1d * 2.0  # sqrt(factor**2) per separable axis
    kt = k.shape[0]
    p = kt - 2
    pad0 = (p + 1) // 2 + 1
    pad1 = p // 2
    return upfirdn2d(x, k, up=2, down=1, pad=(pad0, pad1))


def downsample_2x(x, kernel_1d):
    """Reference Downsample module (model.py:53-71)."""
    kt = kernel_1d.shape[0]
    p = kt - 2
    pad0 = (p + 1) // 2
    pad1 = p // 2
    return upfirdn2d(x, kernel_1d, up=1, down=2, pad=(pad0, pad1))


def blur(x, kernel_1d, pad, upsample_factor: int = 1):
    """Reference Blur module (model.py:74-90)."""
    k = kernel_1d
    if upsample_factor > 1:
        k = k * float(upsample_factor)  # sqrt(factor**2) per separable axis
    return upfirdn2d(x, k, up=1, down=1, pad=pad)
