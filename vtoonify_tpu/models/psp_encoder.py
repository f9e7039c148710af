"""pSp GradualStyleEncoder — IR-SE-50 trunk + FPN style heads.

Capability-parity with reference model/encoder/encoders/psp_encoders.py:35-116
and helpers.py (ArcFace IR-SE blocks): 24 bottleneck_IR_SE units with taps at
body indices 6/20/23, lateral 1×1s, bilinear align-corners FPN merge, and 18
GradualStyleBlock heads producing an (N, 18, 512) z+ code. The standalone
loader's `latent_avg` forward-hook behavior (reference util.py:143-161) is an
explicit `latent_avg` addition here.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vtoonify_tpu.nn import layers as L
from vtoonify_tpu.ops.interp import adaptive_avg_pool, max_pool, resize_bilinear


# --- IR-SE-50 block table (reference helpers.py:29-53) ----------------------


def ir_se_50_blocks():
    spec = [(64, 64, 3), (64, 128, 4), (128, 256, 14), (256, 512, 3)]
    blocks = []
    for in_ch, depth, num in spec:
        blocks.append((in_ch, depth, 2))
        for _ in range(num - 1):
            blocks.append((depth, depth, 1))
    return blocks


@dataclass(frozen=True)
class PSPEncoderConfig:
    input_nc: int = 3
    n_styles: int = 18
    coarse_ind: int = 3
    middle_ind: int = 7


# --- SE module (helpers.py:56-72) -------------------------------------------


def init_se(key, ch, reduction=16):
    k1, k2 = jax.random.split(key)
    return {
        "fc1": L.init_conv2d_torch(k1, ch, ch // reduction, 1, bias=False),
        "fc2": L.init_conv2d_torch(k2, ch // reduction, ch, 1, bias=False),
    }


def se_apply(p, x):
    a = adaptive_avg_pool(x, 1)
    a = jax.nn.relu(L.conv2d_torch(p["fc1"], a))
    a = jax.nn.sigmoid(L.conv2d_torch(p["fc2"], a))
    return x * a


# --- bottleneck_IR_SE (helpers.py:97-119) -----------------------------------


def init_bottleneck(key, in_ch, depth, stride):
    ks = jax.random.split(key, 6)
    p = {
        "bn0": L.init_batch_norm_2d(in_ch),
        "conv1": L.init_conv2d_torch(ks[0], in_ch, depth, 3, bias=False),
        "prelu": {"weight": jnp.full((depth,), 0.25, jnp.float32)},
        "conv2": L.init_conv2d_torch(ks[1], depth, depth, 3, bias=False),
        "bn2": L.init_batch_norm_2d(depth),
        "se": init_se(ks[2], depth),
    }
    if in_ch != depth:
        p["shortcut_conv"] = L.init_conv2d_torch(ks[3], in_ch, depth, 1,
                                                 bias=False)
        p["shortcut_bn"] = L.init_batch_norm_2d(depth)
    return p


def bottleneck_apply(p, x, stride):
    if "shortcut_conv" in p:
        shortcut = L.batch_norm_2d(
            p["shortcut_bn"], L.conv2d_torch(p["shortcut_conv"], x, stride=stride)
        )
    else:
        shortcut = max_pool(x, 1, stride=stride) if stride > 1 else x
    res = L.batch_norm_2d(p["bn0"], x)
    res = L.conv2d_torch(p["conv1"], res, padding=1)
    res = L.prelu(p["prelu"], res)
    res = L.conv2d_torch(p["conv2"], res, stride=stride, padding=1)
    res = L.batch_norm_2d(p["bn2"], res)
    res = se_apply(p["se"], res)
    return res + shortcut


# --- GradualStyleBlock (psp_encoders.py:11-32) ------------------------------


def init_gradual_style_block(key, in_c, out_c, spatial):
    num_pools = int(np.log2(spatial))
    ks = jax.random.split(key, num_pools + 1)
    return {
        "convs": [
            L.init_conv2d_torch(ks[i], in_c if i == 0 else out_c, out_c, 3)
            for i in range(num_pools)
        ],
        "linear": L.init_equal_linear(ks[-1], out_c, out_c),
    }


def gradual_style_block(p, x):
    for cp in p["convs"]:
        x = jax.nn.leaky_relu(L.conv2d_torch(cp, x, stride=2, padding=1), 0.01)
    x = x.reshape(x.shape[0], -1)
    return L.equal_linear(p["linear"], x)


# --- GradualStyleEncoder ----------------------------------------------------


def init_psp_encoder(key, cfg: PSPEncoderConfig):
    blocks = ir_se_50_blocks()
    ks = jax.random.split(key, len(blocks) + cfg.n_styles + 8)
    ki = iter(ks)
    p = {
        "input_conv": L.init_conv2d_torch(next(ki), cfg.input_nc, 64, 3,
                                          bias=False),
        "input_bn": L.init_batch_norm_2d(64),
        "input_prelu": {"weight": jnp.full((64,), 0.25, jnp.float32)},
        "body": [
            init_bottleneck(next(ki), in_ch, depth, stride)
            for (in_ch, depth, stride) in blocks
        ],
        "styles": [],
        "latlayer1": L.init_conv2d_torch(next(ki), 256, 512, 1),
        "latlayer2": L.init_conv2d_torch(next(ki), 128, 512, 1),
    }
    for i in range(cfg.n_styles):
        spatial = 16 if i < cfg.coarse_ind else (32 if i < cfg.middle_ind else 64)
        p["styles"].append(init_gradual_style_block(next(ki), 512, 512, spatial))
    return p


def psp_encoder_apply(params, cfg: PSPEncoderConfig, x,
                      latent_avg: Optional[jnp.ndarray] = None):
    """(B, 256, 256, 3) aligned face in [-1,1] → (B, n_styles, 512) z+ code.

    With `latent_avg`, reproduces the standalone loader's forward hook
    (reference util.py:157-160): output += latent_avg (broadcast over layers).
    """
    blocks = ir_se_50_blocks()
    h = L.conv2d_torch(params["input_conv"], x, padding=1)
    h = L.batch_norm_2d(params["input_bn"], h)
    h = L.prelu(params["input_prelu"], h)

    c1 = c2 = c3 = None
    for i, (bp, (_, _, stride)) in enumerate(zip(params["body"], blocks)):
        h = bottleneck_apply(bp, h, stride)
        if i == 6:
            c1 = h
        elif i == 20:
            c2 = h
        elif i == 23:
            c3 = h

    latents = []
    for j in range(cfg.coarse_ind):
        latents.append(gradual_style_block(params["styles"][j], c3))

    p2 = resize_bilinear(
        c3, c2.shape[1:3], align_corners=True
    ) + L.conv2d_torch(params["latlayer1"], c2)
    for j in range(cfg.coarse_ind, cfg.middle_ind):
        latents.append(gradual_style_block(params["styles"][j], p2))

    p1 = resize_bilinear(
        p2, c1.shape[1:3], align_corners=True
    ) + L.conv2d_torch(params["latlayer2"], c1)
    for j in range(cfg.middle_ind, cfg.n_styles):
        latents.append(gradual_style_block(params["styles"][j], p1))

    out = jnp.stack(latents, axis=1)
    if latent_avg is not None:
        # pSp checkpoints store latent_avg as (n_styles, 512); a (512,) vector
        # (layer-shared average) is also accepted.
        la = jnp.asarray(latent_avg)
        if la.ndim == 1:
            la = la[None, :]
        out = out + la[None]
    return out
