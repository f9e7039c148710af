"""Fused bias + LeakyReLU × scale.

Reference: model/stylegan/op/fused_bias_act_kernel.cu (CUDA) with exact CPU
math at model/stylegan/op_cpu/fused_act.py:23-34:

    y = leaky_relu(x + bias) * scale,   slope = 0.2, scale = sqrt(2)

On TPU this needs no custom kernel at all for correctness — XLA fuses the
bias-add/select/multiply chain into the producing convolution's epilogue —
and autodiff supplies the first & second derivatives the reference hand-rolled
(op/fused_act.py:20-84). A Pallas fused epilogue exists in ops/pallas_kernels
for the inference hot path.

Channel axis is LAST (NHWC), unlike the reference's dim-1 (NCHW).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

SCALE = math.sqrt(2.0)


def fused_leaky_relu(x, bias=None, negative_slope: float = 0.2, scale: float = SCALE):
    if bias is not None:
        x = x + bias.astype(x.dtype)
    return jax.nn.leaky_relu(x, negative_slope) * jnp.asarray(scale, x.dtype)
