"""Convolution primitives with exact torch semantics, NHWC/HWIO layout.

These are thin wrappers over `lax.conv_general_dilated` so XLA owns fusion and
MXU tiling. Reference semantics being matched (for checkpoint parity):
  * conv2d         == torch.nn.functional.conv2d (cross-correlation)
  * conv_transpose2d == torch.nn.functional.conv_transpose2d
(see reference model/stylegan/model.py usage of conv2d_gradfix.conv2d /
conv_transpose2d — the gradfix mechanism itself is unnecessary in JAX where
grad-of-grad is native and "no weight gradients" is just stop_gradient).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _pair(v):
    if isinstance(v, (tuple, list)):
        return tuple(v)
    return (v, v)


def conv2d(x, w, *, stride=1, padding=0, dilation=1, groups=1, precision=None):
    """Cross-correlation, torch.nn.functional.conv2d semantics.

    Args:
      x: (N, H, W, Cin) input.
      w: (kh, kw, Cin // groups, Cout) kernel (HWIO).
      padding: int/pair, symmetric spatial zero-padding (negative allowed → crop).
    Returns:
      (N, H', W', Cout)
    """
    stride = _pair(stride)
    dilation = _pair(dilation)
    if isinstance(padding, (tuple, list)) and len(padding) == 2 and all(
        isinstance(p, (tuple, list)) for p in padding
    ):
        pad = tuple(tuple(p) for p in padding)
    else:
        ph, pw = _pair(padding)
        pad = ((ph, ph), (pw, pw))
    return lax.conv_general_dilated(
        x,
        w,
        window_strides=stride,
        padding=pad,
        rhs_dilation=dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        precision=precision,
    )


def conv_transpose2d(x, w, *, stride=2, padding=0, groups=1, precision=None):
    """torch.nn.functional.conv_transpose2d semantics (gradient of conv2d).

    Args:
      x: (N, H, W, Cin)
      w: (kh, kw, Cout // groups, Cin) kernel — note the torch transposed-conv
         convention that the *input* channel axis is the contraction axis.
         (torch layout is (Cin, Cout/groups, kh, kw); ours is HW + (O', I) with
         O' = Cout // groups.)
    Output spatial size: (in - 1) * stride - 2 * padding + k.
    """
    stride = _pair(stride)
    ph, pw = _pair(padding)
    kh, kw = w.shape[0], w.shape[1]
    # conv_transpose == lhs-dilated correlation with the spatially-flipped
    # kernel, i/o swapped.
    w_flip = jnp.flip(w, axis=(0, 1))  # (kh, kw, Cout//groups, Cin)
    # For grouped transposed conv we need HWIO with I = Cin // groups:
    # split the Cin axis by groups and fold the group into the output axis.
    cout_g, cin = w.shape[2], w.shape[3]
    if groups > 1:
        w_flip = w_flip.reshape(kh, kw, cout_g, groups, cin // groups)
        # → (kh, kw, cin//g, groups, cout_g) so the flatten below yields
        # group-major output channels, matching torch's ordering.
        w_flip = jnp.transpose(w_flip, (0, 1, 4, 3, 2))
        w_flip = w_flip.reshape(kh, kw, cin // groups, groups * cout_g)
    else:
        w_flip = jnp.swapaxes(w_flip, 2, 3)  # (kh, kw, Cin, Cout)
    pad = ((kh - 1 - ph, kh - 1 - ph), (kw - 1 - pw, kw - 1 - pw))
    return lax.conv_general_dilated(
        x,
        w_flip,
        window_strides=(1, 1),
        padding=pad,
        lhs_dilation=stride,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        precision=precision,
    )


def conv2d_s2d_packed(x, w, precision=None):
    """3×3 stride-1 same-pad conv computed in space-to-depth packing.

    For wide-resolution/narrow-channel tensors (the StyleGAN high-res tail,
    e.g. 1024²×32), a direct conv wastes ~16× on 128-lane padding (both
    operands pad Cin/Cout→128). Packing 2×2 spatial blocks into channels
    turns it into an equivalent (3,3,4C,4C) conv at half resolution — 16/9×
    the nominal FLOPs but near-full MXU lanes. Exact (pure index algebra).

    Args: x (B, H, W, C) with H, W even; w (3, 3, C, C_out).
    """
    b, h, wd, c = x.shape
    cout = w.shape[-1]
    # packed kernel: output block (a,b) at packed pixel (u,v) gathers input
    # block (p,q) at (u+m, v+n) where 2m+p = a+dy-1, 2n+q = b+dx-1
    kp = jnp.zeros((3, 3, 4, c, 4, cout), w.dtype)
    for a_ in range(2):
        for b_ in range(2):
            for dy in range(3):
                for dx in range(3):
                    ty, tx = a_ + dy - 1, b_ + dx - 1
                    m, p = ty // 2, ty % 2
                    n, q = tx // 2, tx % 2
                    kp = kp.at[m + 1, n + 1, p * 2 + q, :, a_ * 2 + b_, :].add(
                        w[dy, dx]
                    )
    kp = kp.reshape(3, 3, 4 * c, 4 * cout)
    xp = x.reshape(b, h // 2, 2, wd // 2, 2, c)
    xp = jnp.transpose(xp, (0, 1, 3, 2, 4, 5)).reshape(b, h // 2, wd // 2,
                                                       4 * c)
    yp = lax.conv_general_dilated(
        xp, kp, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision,
    )
    yp = yp.reshape(b, h // 2, wd // 2, 2, 2, cout)
    return jnp.transpose(yp, (0, 1, 3, 2, 4, 5)).reshape(b, h, wd, cout)
