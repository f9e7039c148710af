from vtoonify_tpu.ops.convs import conv2d, conv_transpose2d
from vtoonify_tpu.ops.upfirdn2d import upfirdn2d, make_kernel
from vtoonify_tpu.ops.fused_act import fused_leaky_relu
from vtoonify_tpu.ops.interp import (
    resize_bilinear,
    resize_nearest,
    grid_sample,
    avg_pool,
    max_pool,
    adaptive_avg_pool,
)

__all__ = [
    "conv2d",
    "conv_transpose2d",
    "upfirdn2d",
    "make_kernel",
    "fused_leaky_relu",
    "resize_bilinear",
    "resize_nearest",
    "grid_sample",
    "avg_pool",
    "max_pool",
    "adaptive_avg_pool",
]
