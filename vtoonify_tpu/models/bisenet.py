"""BiSeNet face parsing (19 classes) — ResNet-18 context path variant.

Capability-parity with reference model/bisenet/{model.py,resnet.py}: ResNet-18
trunk, attention-refinement modules, FFM with the spatial path replaced by the
res3 (1/8) feature, three output heads bilinearly upsampled (align_corners) to
input size. Consumers use head-0 logits (style_transfer.py:171-174).
BatchNorms run in eval mode (the network is always frozen in this framework).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from vtoonify_tpu.nn import layers as L
from vtoonify_tpu.ops.interp import (
    adaptive_avg_pool,
    max_pool,
    resize_bilinear,
    resize_nearest,
)


@dataclass(frozen=True)
class BiSeNetConfig:
    n_classes: int = 19


# --- resnet18 basic block ----------------------------------------------------


def init_basic_block(key, in_ch, out_ch, stride):
    ks = jax.random.split(key, 3)
    p = {
        "conv1": L.init_conv2d_torch(ks[0], in_ch, out_ch, 3, bias=False),
        "bn1": L.init_batch_norm_2d(out_ch),
        "conv2": L.init_conv2d_torch(ks[1], out_ch, out_ch, 3, bias=False),
        "bn2": L.init_batch_norm_2d(out_ch),
    }
    if in_ch != out_ch or stride != 1:
        p["down_conv"] = L.init_conv2d_torch(ks[2], in_ch, out_ch, 1, bias=False)
        p["down_bn"] = L.init_batch_norm_2d(out_ch)
    return p


def basic_block(p, x, stride):
    r = jax.nn.relu(
        L.batch_norm_2d(p["bn1"], L.conv2d_torch(p["conv1"], x, stride=stride,
                                                 padding=1))
    )
    r = L.batch_norm_2d(p["bn2"], L.conv2d_torch(p["conv2"], r, padding=1))
    s = x
    if "down_conv" in p:
        s = L.batch_norm_2d(p["down_bn"],
                            L.conv2d_torch(p["down_conv"], x, stride=stride))
    return jax.nn.relu(s + r)


def init_resnet18(key):
    ks = jax.random.split(key, 16)
    ki = iter(ks)
    layers = {"conv1": L.init_conv2d_torch(next(ki), 3, 64, 7, bias=False),
              "bn1": L.init_batch_norm_2d(64)}
    for name, (in_ch, out_ch, stride) in {
        "layer1": (64, 64, 1),
        "layer2": (64, 128, 2),
        "layer3": (128, 256, 2),
        "layer4": (256, 512, 2),
    }.items():
        layers[name] = [
            init_basic_block(next(ki), in_ch, out_ch, stride),
            init_basic_block(next(ki), out_ch, out_ch, 1),
        ]
    return layers


def resnet18_apply(p, x):
    h = jax.nn.relu(
        L.batch_norm_2d(p["bn1"], L.conv2d_torch(p["conv1"], x, stride=2,
                                                 padding=3))
    )
    h = max_pool(h, 3, stride=2, padding=1)
    strides = {"layer1": 1, "layer2": 2, "layer3": 2, "layer4": 2}
    h = basic_block(p["layer1"][0], h, strides["layer1"])
    h = basic_block(p["layer1"][1], h, 1)
    feat8 = basic_block(p["layer2"][1], basic_block(p["layer2"][0], h, 2), 1)
    feat16 = basic_block(p["layer3"][1], basic_block(p["layer3"][0], feat8, 2), 1)
    feat32 = basic_block(p["layer4"][1], basic_block(p["layer4"][0], feat16, 2), 1)
    return feat8, feat16, feat32


# --- BiSeNet modules ----------------------------------------------------------


def init_conv_bn_relu(key, in_ch, out_ch, ks=3):
    return {
        "conv": L.init_conv2d_torch(key, in_ch, out_ch, ks, bias=False),
        "bn": L.init_batch_norm_2d(out_ch),
    }


def conv_bn_relu(p, x, stride=1, padding=1):
    return jax.nn.relu(
        L.batch_norm_2d(p["bn"], L.conv2d_torch(p["conv"], x, stride=stride,
                                                padding=padding))
    )


def init_arm(key, in_ch, out_ch):
    k1, k2 = jax.random.split(key)
    return {
        "conv": init_conv_bn_relu(k1, in_ch, out_ch),
        "conv_atten": L.init_conv2d_torch(k2, out_ch, out_ch, 1, bias=False),
        "bn_atten": L.init_batch_norm_2d(out_ch),
    }


def arm_apply(p, x):
    feat = conv_bn_relu(p["conv"], x)
    atten = adaptive_avg_pool(feat, 1)
    atten = L.conv2d_torch(p["conv_atten"], atten)
    atten = jax.nn.sigmoid(L.batch_norm_2d(p["bn_atten"], atten))
    return feat * atten


def init_ffm(key, in_ch, out_ch):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "convblk": init_conv_bn_relu(k1, in_ch, out_ch, ks=1),
        "conv1": L.init_conv2d_torch(k2, out_ch, out_ch // 4, 1, bias=False),
        "conv2": L.init_conv2d_torch(k3, out_ch // 4, out_ch, 1, bias=False),
    }


def ffm_apply(p, fsp, fcp):
    fcat = jnp.concatenate([fsp, fcp], axis=-1)
    feat = conv_bn_relu(p["convblk"], fcat, padding=0)
    atten = adaptive_avg_pool(feat, 1)
    atten = jax.nn.relu(L.conv2d_torch(p["conv1"], atten))
    atten = jax.nn.sigmoid(L.conv2d_torch(p["conv2"], atten))
    return feat * atten + feat


def init_output_head(key, in_ch, mid_ch, n_classes):
    k1, k2 = jax.random.split(key)
    return {
        "conv": init_conv_bn_relu(k1, in_ch, mid_ch),
        "conv_out": L.init_conv2d_torch(k2, mid_ch, n_classes, 1, bias=False),
    }


def output_head(p, x):
    return L.conv2d_torch(p["conv_out"], conv_bn_relu(p["conv"], x))


def init_bisenet(key, cfg: BiSeNetConfig = BiSeNetConfig()):
    ks = jax.random.split(key, 10)
    return {
        "resnet": init_resnet18(ks[0]),
        "arm16": init_arm(ks[1], 256, 128),
        "arm32": init_arm(ks[2], 512, 128),
        "conv_head32": init_conv_bn_relu(ks[3], 128, 128),
        "conv_head16": init_conv_bn_relu(ks[4], 128, 128),
        "conv_avg": init_conv_bn_relu(ks[5], 512, 128, ks=1),
        "ffm": init_ffm(ks[6], 256, 256),
        "conv_out": init_output_head(ks[7], 256, 256, cfg.n_classes),
        "conv_out16": init_output_head(ks[8], 128, 64, cfg.n_classes),
        "conv_out32": init_output_head(ks[9], 128, 64, cfg.n_classes),
    }


def bisenet_apply(params, x, heads: int = 1):
    """(B, H, W, 3) normalized input → 19-class logits at input resolution.

    heads=1 returns only the main head (the only one consumers use);
    heads=3 returns all three (reference bisenet/model.py:241-254).
    """
    h, w = x.shape[1:3]
    feat8, feat16, feat32 = resnet18_apply(params["resnet"], x)

    avg = adaptive_avg_pool(feat32, 1)
    avg = conv_bn_relu(params["conv_avg"], avg, padding=0)
    avg_up = jnp.broadcast_to(
        avg, (avg.shape[0],) + feat32.shape[1:3] + (avg.shape[-1],)
    )

    feat32_arm = arm_apply(params["arm32"], feat32) + avg_up
    feat32_up = resize_nearest(feat32_arm, feat16.shape[1:3])
    feat32_up = conv_bn_relu(params["conv_head32"], feat32_up)

    feat16_arm = arm_apply(params["arm16"], feat16) + feat32_up
    feat16_up = resize_nearest(feat16_arm, feat8.shape[1:3])
    feat16_up = conv_bn_relu(params["conv_head16"], feat16_up)

    feat_fuse = ffm_apply(params["ffm"], feat8, feat16_up)

    out = output_head(params["conv_out"], feat_fuse)
    out = resize_bilinear(out, (h, w), align_corners=True)
    if heads == 1:
        return out
    out16 = resize_bilinear(
        output_head(params["conv_out16"], feat16_up), (h, w), align_corners=True
    )
    out32 = resize_bilinear(
        output_head(params["conv_out32"], feat32_up), (h, w), align_corners=True
    )
    return out, out16, out32
