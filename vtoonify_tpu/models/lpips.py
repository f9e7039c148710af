"""LPIPS perceptual loss (net-lin, VGG16 backbone).

Capability-parity with reference model/stylegan/lpips/networks_basic.py:27-110:
input scaling layer → VGG16 feature taps (relu1_2/2_2/3_3/4_3/5_3) →
channel-unit-normalize → squared diff → learned 1×1 `lin` heads → spatial
mean, summed over the 5 taps. The reference's lin weights ship in-repo
(lpips/weights/v0.1/vgg.pth); the VGG16 backbone comes from torchvision —
both convert through `convert_lpips`.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from vtoonify_tpu.nn import layers as L
from vtoonify_tpu.ops.interp import max_pool

# VGG16 conv channel plan per stage (taps after each stage's last relu)
_VGG_PLAN = (
    (3, 64, 64),
    (64, 128, 128),
    (128, 256, 256, 256),
    (256, 512, 512, 512),
    (512, 512, 512, 512),
)

SCALE_SHIFT = jnp.array([-0.030, -0.088, -0.188], jnp.float32)
SCALE_SCALE = jnp.array([0.458, 0.448, 0.450], jnp.float32)


def init_lpips(key):
    ks = jax.random.split(key, 32)
    ki = iter(ks)
    vgg = []
    for stage in _VGG_PLAN:
        convs = []
        for i in range(len(stage) - 1):
            convs.append(L.init_conv2d_torch(next(ki), stage[i], stage[i + 1], 3))
        vgg.append(convs)
    lins = [
        {"weight": jax.random.uniform(next(ki), (1, 1, stage[-1], 1), jnp.float32)}
        for stage in _VGG_PLAN
    ]
    return {"vgg": vgg, "lins": lins}


def _vgg_features(params, x):
    feats = []
    h = x
    for si, stage in enumerate(params["vgg"]):
        if si > 0:
            h = max_pool(h, 2)
        for conv in stage:
            h = jax.nn.relu(L.conv2d_torch(conv, h, padding=1))
        feats.append(h)
    return feats


def _unit_normalize(x, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))
    return x / (norm + eps)


def lpips_apply(params, x0, x1):
    """(B, H, W, 3) pairs in [-1, 1] → (B, 1, 1, 1) distances."""
    shift = SCALE_SHIFT.astype(x0.dtype)
    scale = SCALE_SCALE.astype(x0.dtype)
    f0 = _vgg_features(params, (x0 - shift) / scale)
    f1 = _vgg_features(params, (x1 - shift) / scale)
    val = 0.0
    for a, b, lin in zip(f0, f1, params["lins"]):
        diff = jnp.square(_unit_normalize(a) - _unit_normalize(b))
        proj = jax.lax.conv_general_dilated(
            diff, lin["weight"].astype(diff.dtype), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        val = val + jnp.mean(proj, axis=(1, 2), keepdims=True)
    return val


def convert_lpips(vgg_sd, lin_sd):
    """torchvision vgg16 `features.*` state_dict + LPIPS `lin*.model.1.weight`
    dict → params."""
    import numpy as np

    # torchvision features indices of convs per stage
    idxs = ((0, 2), (5, 7), (10, 12, 14), (17, 19, 21), (24, 26, 28))
    vgg = []
    for stage in idxs:
        convs = []
        for i in stage:
            convs.append(
                {
                    "weight": jnp.asarray(
                        np.transpose(vgg_sd[f"features.{i}.weight"], (2, 3, 1, 0))
                    ),
                    "bias": jnp.asarray(vgg_sd[f"features.{i}.bias"]),
                }
            )
        vgg.append(convs)
    lins = []
    for k in range(5):
        w = lin_sd[f"lin{k}.model.1.weight"]  # (1, C, 1, 1)
        lins.append({"weight": jnp.asarray(np.transpose(w, (2, 3, 1, 0)))})
    return {"vgg": vgg, "lins": lins}
