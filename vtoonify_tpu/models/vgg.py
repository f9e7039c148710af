"""VGG19 multi-layer L1 perceptual loss.

Capability-parity with reference model/vgg.py:6-60 (legacy component, not
wired into any reference script — kept for inventory completeness): ImageNet
normalization of [-1,1] inputs, relu1_1/2_1/3_1/4_1/5_1-adjacent taps,
1/32..1 layer weights, L1 distance.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vtoonify_tpu.nn import layers as L
from vtoonify_tpu.ops.interp import max_pool

# VGG19 conv plan per slice of the reference's forward (vgg.py:17-44):
# slice1: conv1_1..relu (2 convs? indices 0-1 → 1 conv), see torchvision vgg19:
# features: [0]conv1_1 [1]relu [2]conv1_2 [3]relu [4]pool [5]conv2_1 ...
_SLICES = (
    ((3, 64),),                               # 0:2   → relu1_1
    ((64, 64), "pool", (64, 128)),            # 2:7   → relu2_1
    ((128, 128), "pool", (128, 256)),         # 7:12  → relu3_1
    ((256, 256), (256, 256), (256, 256), "pool", (256, 512)),  # 12:21 → relu4_1
    ((512, 512), (512, 512), (512, 512), "pool", (512, 512)),  # 21:30 → relu5_1
)

MEAN = jnp.array([0.485, 0.456, 0.406]) * 2 - 1
STD = jnp.array([0.229, 0.224, 0.225]) * 2
LAYER_WEIGHTS = (1 / 32, 1 / 16, 1 / 8, 1 / 4, 1.0)


def init_vgg19(key):
    ks = jax.random.split(key, 20)
    ki = iter(ks)
    params = []
    for sl in _SLICES:
        convs = []
        for item in sl:
            if item == "pool":
                convs.append("pool")
            else:
                convs.append(L.init_conv2d_torch(next(ki), item[0], item[1], 3))
        params.append(convs)
    return params


def vgg19_features(params, x):
    h = (x - MEAN.astype(x.dtype)) / STD.astype(x.dtype)
    feats = []
    for sl in params:
        for item in sl:
            if isinstance(item, str):
                h = max_pool(h, 2)
            else:
                h = jax.nn.relu(L.conv2d_torch(item, h, padding=1))
        feats.append(h)
    return feats


def vgg_loss(params, x, y):
    fx = vgg19_features(params, x)
    fy = vgg19_features(params, jax.lax.stop_gradient(y))
    total = 0.0
    for w, a, b in zip(LAYER_WEIGHTS, fx, fy):
        total = total + w * jnp.mean(jnp.abs(a - b))
    return total


def convert_vgg19(sd):
    """torchvision vgg19 `features.*` → params."""
    import numpy as np

    conv_idx = [0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25, 28]
    per_slice = [(0,), (2, None, 5), (7, None, 10), (12, 14, 16, None, 19),
                 (21, 23, 25, None, 28)]
    params = []
    for sl in per_slice:
        convs = []
        for i in sl:
            if i is None:
                convs.append("pool")
            else:
                convs.append({
                    "weight": jnp.asarray(np.transpose(
                        sd[f"features.{i}.weight"], (2, 3, 1, 0))),
                    "bias": jnp.asarray(sd[f"features.{i}.bias"]),
                })
        params.append(convs)
    return params
