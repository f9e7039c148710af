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


# The reference vendors the learned lin heads in-repo
# (model/stylegan/lpips/weights/v0.1/vgg.pth, loaded by dist_model.py:24-117).
# Candidate default locations, first hit wins.
DEFAULT_LIN_PATHS = (
    "/root/reference/model/stylegan/lpips/weights/v0.1/vgg.pth",
)


def find_lin_weights(lin_path=None):
    """Resolve the LPIPS lin-head weights file ($VTOONIFY_LPIPS_LIN or the
    vendored reference copy). Returns a path or None."""
    import os

    candidates = [lin_path, os.environ.get("VTOONIFY_LPIPS_LIN")]
    candidates += list(DEFAULT_LIN_PATHS)
    for c in candidates:
        if c and os.path.exists(c):
            return c
    return None


def load_lpips(vgg_path=None, lin_path=None, allow_random=False, key=None):
    """Build LPIPS params for training.

    The reference always trains against pretrained LPIPS (dist_model.py
    loads torchvision VGG16 + the vendored lin heads); random perceptual
    weights silently corrupt 1 of the 5 G-losses, so absence of `vgg_path`
    is a hard error unless `allow_random` is explicit. The lin heads default
    to the vendored reference copy when present.
    """
    lin_file = find_lin_weights(lin_path)
    if vgg_path is None:
        if not allow_random:
            raise ValueError(
                "LPIPS needs pretrained VGG16 conv weights: pass --vgg_path "
                "(a torchvision vgg16 state_dict). To knowingly train with a "
                "random perceptual net (tests/smoke only), pass "
                "--allow_random_lpips."
            )
        params = init_lpips(key if key is not None else jax.random.PRNGKey(1))
        if lin_file is not None:
            import torch

            lin_sd = {k: v.numpy() for k, v in
                      torch.load(lin_file, map_location="cpu").items()}
            params["lins"] = convert_lpips_lins(lin_sd)
            return params, f"random VGG16 + real lin heads ({lin_file})"
        return params, "fully random (allow_random_lpips)"

    import torch

    vgg_sd = {k: v.numpy() for k, v in
              torch.load(vgg_path, map_location="cpu").items()}
    if lin_file is None:
        raise ValueError(
            "LPIPS lin-head weights not found: pass --lpips_lin_path or set "
            "$VTOONIFY_LPIPS_LIN (the reference vendors them at "
            "model/stylegan/lpips/weights/v0.1/vgg.pth)."
        )
    lin_sd = {k: v.numpy() for k, v in
              torch.load(lin_file, map_location="cpu").items()}
    return (convert_lpips(vgg_sd, lin_sd),
            f"VGG16 {vgg_path} + lin heads {lin_file}")


def convert_lpips_lins(lin_sd):
    """LPIPS `lin*.model.1.weight` dict → the `lins` param list."""
    import numpy as np

    lins = []
    for k in range(5):
        w = lin_sd[f"lin{k}.model.1.weight"]  # (1, C, 1, 1)
        lins.append({"weight": jnp.asarray(np.transpose(w, (2, 3, 1, 0)))})
    return lins


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
    return {"vgg": vgg, "lins": convert_lpips_lins(lin_sd)}
