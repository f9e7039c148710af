"""DualStyleGAN — StyleGAN2 wrapped with an extrinsic style path.

Capability-parity with reference model/dualstylegan.py:47-203: ModRes
(AdaResBlock) feature modulation on layers 0..res_index, identity-initialized
structure transforms T_s on latents for layers res_index+1.., color-transform
mapping T_c, per-layer interpolation weights, z+ latents, early-exit feature
taps. Statically unrolled; `interp_weights` may be traced scalars (style
degree d_s is a runtime control knob in VToonify-D).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from vtoonify_tpu.nn import layers as L
from vtoonify_tpu.models import generator as G


@dataclass(frozen=True)
class DualStyleGANConfig:
    size: int = 1024
    style_dim: int = 512
    n_mlp: int = 8
    channel_multiplier: int = 2
    channel_max: int = 512
    res_index: int = 6  # floored to even by the reference (dualstylegan.py:60)

    @property
    def generator(self) -> G.GeneratorConfig:
        return G.GeneratorConfig(
            size=self.size, style_dim=self.style_dim, n_mlp=self.n_mlp,
            channel_multiplier=self.channel_multiplier,
            channel_max=self.channel_max,
        )

    @property
    def log_size(self) -> int:
        return int(math.log2(self.size))

    @property
    def n_latent(self) -> int:
        return self.log_size * 2 - 2

    @property
    def res_index_eff(self) -> int:
        return self.res_index // 2 * 2


def _init_identity_equal_linear(key, dim=512):
    """T_s init: eye·√dim + 0.01·randn (dualstylegan.py:70-76). Stored (in,out);
    eye is symmetric so no transpose subtlety."""
    w = jnp.eye(dim) * math.sqrt(dim) + 0.01 * jax.random.normal(
        key, (dim, dim), jnp.float32
    )
    return {"weight": w, "bias": jnp.zeros((dim,), jnp.float32)}


def init_dualstylegan(key, cfg: DualStyleGANConfig):
    gcfg = cfg.generator
    k_gen, k_style, k_res = jax.random.split(key, 3)
    ch = gcfg.channels

    # color transform T_c: PixelNorm + (n_mlp - 6) EqualLinear(0.01 lr)
    style_keys = jax.random.split(k_style, max(cfg.n_mlp - 6, 1))
    style = [
        L.init_equal_linear(style_keys[i], 512, 512)
        for i in range(cfg.n_mlp - 6)
    ]

    res = []
    res_keys = jax.random.split(k_res, 2 * cfg.log_size + 4)
    ki = iter(res_keys)
    res.append(L.init_ada_res_block(next(ki), ch[4]))  # for conv1
    for i in range(3, cfg.log_size + 1):
        out_ch = ch[2 ** i]
        if i < 3 + cfg.res_index_eff // 2:
            res.append(L.init_ada_res_block(next(ki), out_ch))
            res.append(L.init_ada_res_block(next(ki), out_ch))
        else:
            res.append(_init_identity_equal_linear(next(ki)))
            res.append(_init_identity_equal_linear(next(ki)))
    res.append(_init_identity_equal_linear(next(ki)))  # for to_rgb of last pair

    return {
        "style": style,
        "generator": G.init_generator(k_gen, gcfg),
        "res": res,
    }


def color_transform(params, exstyle):
    """T_c mapping (PixelNorm + small MLP), dualstylegan.py:51-55."""
    x = L.pixel_norm(exstyle)
    for p in params["style"]:
        x = L.equal_linear(p, x, lr_mul=0.01, activation=True)
    return x


def prepare_exstyles(params, cfg: DualStyleGANConfig, exstyles):
    """→ (resstyles, adastyles): T_c-mapped codes for AdaIN, raw codes for T_s."""
    if exstyles.ndim < 3:
        rs = color_transform(params, exstyles)
        resstyles = jnp.repeat(rs[:, None, :], cfg.n_latent, axis=1)
        adastyles = jnp.repeat(exstyles[:, None, :], cfg.n_latent, axis=1)
    else:
        nb, nl, nd = exstyles.shape
        resstyles = color_transform(
            params, exstyles.reshape(nb * nl, nd)
        ).reshape(nb, nl, nd)
        adastyles = exstyles
    return resstyles, adastyles


def dualstylegan_apply(
    params,
    cfg: DualStyleGANConfig,
    styles,
    exstyles,
    *,
    input_is_latent=False,
    z_plus_latent=False,
    truncation=1.0,
    truncation_latent=None,
    inject_index=None,
    noise: Optional[Sequence] = None,
    use_res=True,
    fuse_index=18,
    interp_weights: Sequence = (1.0,) * 18,
    return_feat=False,
    packed: bool = True,
):
    """reference dualstylegan.py:84-194. `packed` runs ModRes-free
    narrow-channel stages in space-to-depth layout (exact; see
    generator_apply)."""
    gcfg = cfg.generator
    gp = params["generator"]
    latent = G.styles_to_latent(
        gp, gcfg, styles,
        input_is_latent=input_is_latent, z_plus_latent=z_plus_latent,
        truncation=truncation, truncation_latent=truncation_latent,
        inject_index=inject_index,
    )
    if noise is None:
        noise = [None] * gcfg.num_layers

    if use_res:
        resstyles, adastyles = prepare_exstyles(params, cfg, exstyles)

    res = params["res"]
    ri = cfg.res_index_eff

    batch = latent.shape[0]
    out = jnp.broadcast_to(
        gp["input"].astype(latent.dtype), (batch,) + gp["input"].shape[1:]
    )
    out = L.styled_conv(gp["conv1"], out, latent[:, 0], noise=noise[0])
    if use_res and fuse_index > 0:
        out = L.ada_res_block(res[0], out, resstyles[:, 0], interp_weights[0])

    skip = L.to_rgb(gp["to_rgb1"], out, latent[:, 1])

    i = 1
    for idx in range(len(gp["to_rgbs"])):
        conv1p = gp["convs"][2 * idx]
        conv2p = gp["convs"][2 * idx + 1]
        n1, n2 = noise[2 * idx + 1], noise[2 * idx + 2]

        # per-layer styles, T_s-blended past the ModRes region
        if use_res and fuse_index >= i and i > ri:
            s1 = interp_weights[i] * L.equal_linear(res[i], adastyles[:, i]) + (
                1 - interp_weights[i]
            ) * latent[:, i]
        else:
            s1 = latent[:, i]
        if use_res and fuse_index >= (i + 1) and i > ri:
            s2 = interp_weights[i + 1] * L.equal_linear(
                res[i + 1], adastyles[:, i + 1]
            ) + (1 - interp_weights[i + 1]) * latent[:, i + 1]
        else:
            s2 = latent[:, i + 1]
        if use_res and fuse_index >= (i + 2) and i >= ri - 1:
            s3 = interp_weights[i + 2] * L.equal_linear(
                res[i + 2], adastyles[:, i + 2]
            ) + (1 - interp_weights[i + 2]) * latent[:, i + 2]
        else:
            s3 = latent[:, i + 2]

        if (packed and (not use_res or i > ri)
                and conv1p["conv"]["weight"].shape[-1] <= 128):
            # ModRes-free stage on blended per-layer styles → packed layout
            # (exact; see generator_apply / docs/PERF.md)
            outp = L.styled_conv_up_packed(conv1p, out, s1, noise=n1)
            outp = L.styled_conv_packed(conv2p, outp, s2, noise=n2)
            skip = L.to_rgb_packed(gp["to_rgbs"][idx], outp, s3, skip)
            out = L.depth_to_space2(outp)
        else:
            out = L.styled_conv(conv1p, out, s1, noise=n1, upsample=True)
            if use_res and fuse_index >= i and i <= ri:
                out = L.ada_res_block(res[i], out, resstyles[:, i],
                                      interp_weights[i])
            out = L.styled_conv(conv2p, out, s2, noise=n2)
            if use_res and fuse_index >= (i + 1) and i <= ri:
                out = L.ada_res_block(res[i + 1], out, resstyles[:, i + 1],
                                      interp_weights[i + 1])
            skip = L.to_rgb(gp["to_rgbs"][idx], out, s3, skip)

        i += 2
        if i > ri and return_feat:
            return out, skip

    return skip
