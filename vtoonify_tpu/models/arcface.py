"""ArcFace IR-SE backbone + identity loss.

Capability-parity with reference model/encoder/encoders/model_irse.py:9-84 and
model/encoder/criteria/id_loss.py:6-33 (pSp-heritage components, part of the
inventory even though the VToonify trainers don't call them): IR-SE trunk with
BN→Dropout→Flatten→Linear→BN1d output head, L2-normalized embedding; IDLoss =
mean(1 − ⟨f(ŷ), f(y)⟩) on the [35:223, 32:220] face crop pooled to 112².
Dropout is identity here (inference/loss use only).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vtoonify_tpu.nn import layers as L
from vtoonify_tpu.models.psp_encoder import (
    bottleneck_apply,
    init_bottleneck,
    ir_se_50_blocks,
)
from vtoonify_tpu.ops.interp import adaptive_avg_pool, resize_bilinear


def init_arcface_backbone(key, input_size: int = 112):
    blocks = ir_se_50_blocks()
    ks = jax.random.split(key, len(blocks) + 4)
    ki = iter(ks)
    spatial = 7 if input_size == 112 else 14
    return {
        "input_conv": L.init_conv2d_torch(next(ki), 3, 64, 3, bias=False),
        "input_bn": L.init_batch_norm_2d(64),
        "input_prelu": {"weight": jnp.full((64,), 0.25, jnp.float32)},
        "body": [
            init_bottleneck(next(ki), cin, d, s) for (cin, d, s) in blocks
        ],
        "out_bn": L.init_batch_norm_2d(512),
        "out_linear": L.init_linear_torch(next(ki), 512 * spatial * spatial,
                                          512),
        "out_bn1d": {
            "running_mean": jnp.zeros((512,)),
            "running_var": jnp.ones((512,)),
        },
    }


def arcface_apply(params, x):
    """(B, S, S, 3) in [-1,1] → (B, 512) L2-normalized embeddings."""
    blocks = ir_se_50_blocks()
    h = L.conv2d_torch(params["input_conv"], x, padding=1)
    h = L.batch_norm_2d(params["input_bn"], h)
    h = L.prelu(params["input_prelu"], h)
    for bp, (_, _, stride) in zip(params["body"], blocks):
        h = bottleneck_apply(bp, h, stride)
    h = L.batch_norm_2d(params["out_bn"], h)
    b = h.shape[0]
    # torch Flatten on NCHW → channel-major; transpose for parity
    h = jnp.transpose(h, (0, 3, 1, 2)).reshape(b, -1)
    h = L.linear_torch(params["out_linear"], h)
    # BatchNorm1d(affine=False) eval
    bn = params["out_bn1d"]
    h = (h - bn["running_mean"]) * jax.lax.rsqrt(bn["running_var"] + 1e-5)
    return h / jnp.linalg.norm(h, axis=1, keepdims=True)


def id_loss(params, y_hat, y):
    """reference id_loss.py:17-33; inputs (B, 256, 256, 3) in [-1,1]."""

    def feats(img):
        crop = img[:, 35:223, 32:220, :]
        crop = resize_to_112(crop)
        return arcface_apply(params, crop)

    yf = jax.lax.stop_gradient(feats(y))
    yhf = feats(y_hat)
    return jnp.mean(1.0 - jnp.sum(yhf * yf, axis=1))


def resize_to_112(x):
    """AdaptiveAvgPool2d((112,112)) for the 188² crop — non-divisible, so it
    falls back to bilinear-equivalent pooling windows; torch's adaptive pool
    on 188→112 uses variable windows, approximated with area resize."""
    if x.shape[1] % 112 == 0:
        return adaptive_avg_pool(x, 112)
    return resize_bilinear(x, (112, 112), align_corners=False)
