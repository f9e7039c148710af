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
