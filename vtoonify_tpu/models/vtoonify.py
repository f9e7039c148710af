"""VToonify — the product model (T and D backbones in one implementation).

Capability-parity with reference model/vtoonify.py:10-286:
  * content encoder: stem + downsampling convs + ModRes-adjusted res blocks
  * frozen StyleGAN2 (T) / DualStyleGAN (D) mid/high-res synthesis layers
  * d_s-conditioned attention Fusion (D) / concat-conv fusion (T) at each
    resolution ≤ in_size, plus RGB-skip fusion
  * style-degree control d_s, T_s-transformed exstyle layers ≥ 7 (D)
  * return_feat early-exit (pretrain target) and return_mask (mask loss)

All control flow is static (backbone / sizes are config); d_s and styles are
traced values, so one compiled graph serves every style degree and exemplar.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from vtoonify_tpu.nn import layers as L
from vtoonify_tpu.models import generator as G
from vtoonify_tpu.models import dualstylegan as D


@dataclass(frozen=True)
class VToonifyConfig:
    in_size: int = 256
    out_size: int = 1024
    img_channels: int = 3
    parsing_channels: int = 19  # BiSeNet classes concatenated to RGB
    style_channels: int = 512
    num_mlps: int = 8
    channel_multiplier: int = 2
    channel_max: int = 512
    num_res_layers: int = 6
    backbone: str = "dualstylegan"  # or "toonify"

    @property
    def generator(self) -> G.GeneratorConfig:
        return G.GeneratorConfig(
            size=self.out_size, style_dim=self.style_channels,
            n_mlp=self.num_mlps, channel_multiplier=self.channel_multiplier,
            channel_max=self.channel_max,
        )

    @property
    def dualstylegan(self) -> D.DualStyleGANConfig:
        return D.DualStyleGANConfig(
            size=self.out_size, style_dim=self.style_channels,
            n_mlp=self.num_mlps, channel_multiplier=self.channel_multiplier,
            channel_max=self.channel_max,
        )

    @property
    def channels(self) -> dict:
        return G.channel_table(self.channel_multiplier,
                               self.channel_max)

    @property
    def encoder_res(self) -> tuple:
        return tuple(
            2 ** i for i in range(int(math.log2(self.in_size)), 4, -1)
        )

    @property
    def n_latent(self) -> int:
        return int(math.log2(self.out_size)) * 2 - 2


# ---------------------------------------------------------------------------
# Fusion (reference vtoonify.py:106-128)


def init_fusion(key, in_ch, skip_ch, out_ch):
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    # conv/conv2 consume cat[f_G, ·] — stored cat2-SPLIT at in_ch so the
    # TP kernel gradients stay collective-free (L.split_cat2_weight)
    return {
        "conv": L.split_cat2_weight(
            L.init_conv2d_torch(k1, in_ch + skip_ch, out_ch, 3), in_ch),
        "norm": L.init_adaptive_instance_norm(k2, in_ch + skip_ch, 128),
        "conv2": L.split_cat2_weight(
            L.init_conv2d_torch(k3, in_ch + skip_ch, 1, 3), in_ch),
        "linear": [
            L.init_linear_torch(k4, 1, 64),
            L.init_linear_torch(k5, 64, 128),
        ],
    }


def fusion_apply(p, f_G, f_E, d_s):
    b = f_G.shape[0]
    # cast the (f32) degree scalar to the activation dtype: adding it raw
    # promotes the label — and through m_E every downstream high-res stage —
    # to f32, which cost ~15% of inference wall-clock in bf16 mode
    label = jnp.zeros((b, 1), f_G.dtype) + jnp.asarray(d_s).astype(f_G.dtype)
    label = jax.nn.leaky_relu(L.linear_torch(p["linear"][0], label), 0.2)
    label = jax.nn.leaky_relu(L.linear_torch(p["linear"][1], label), 0.2)
    # concat-free formulation of the reference's cat[f_G, |f_G−f_E|] → AdaIN
    # → conv chain (vtoonify.py:124-127): instance norm is per-channel and
    # the convs are linear in input channels, so every concat splits exactly
    # into per-operand halves — no channel concat of two TP-sharded
    # activations (which GSPMD reshards with an all-to-all; parallel/audit).
    c = f_G.shape[-1]
    st = L.linear_torch(p["norm"]["style"], label)  # (B, 4c): γ|β over cat
    diff = jnp.abs(f_G - f_E)
    na = (st[:, None, None, 0:c] * L.instance_norm_2d(f_G)
          + st[:, None, None, 2 * c:3 * c])
    nb = (st[:, None, None, c:2 * c] * L.instance_norm_2d(diff)
          + st[:, None, None, 3 * c:4 * c])
    m_E = jnp.tanh(jax.nn.relu(L.conv2d_torch_cat2(p["conv2"], na, nb,
                                                   padding=1)))
    f_out = L.conv2d_torch_cat2(p["conv"], f_G, f_E * m_E, padding=1)
    return f_out, m_E


# ---------------------------------------------------------------------------
# VToonifyResBlock (reference vtoonify.py:92-104)


def init_vtoonify_res_block(key, fin):
    k1, k2 = jax.random.split(key)
    return {
        "conv1": L.init_conv2d_torch(k1, fin, fin, 3),
        "conv2": L.init_conv2d_torch(k2, fin, fin, 3),
    }


def vtoonify_res_block(p, x):
    out = jax.nn.leaky_relu(L.conv2d_torch(p["conv1"], x, padding=1), 0.2)
    out = jax.nn.leaky_relu(L.conv2d_torch(p["conv2"], out, padding=1), 0.2)
    return (out + x) / math.sqrt(2)


# ---------------------------------------------------------------------------
# VToonify


def init_vtoonify(key, cfg: VToonifyConfig):
    ch = cfg.channels
    keys = jax.random.split(key, 64)
    ki = iter(keys)
    is_d = cfg.backbone == "dualstylegan"

    params = {
        "generator": (
            D.init_dualstylegan(next(ki), cfg.dualstylegan)
            if is_d
            else G.init_generator(next(ki), cfg.generator)
        )
    }

    # encoder
    enc = {
        "stem": [
            L.init_conv2d_torch(
                next(ki), cfg.img_channels + cfg.parsing_channels, 32, 3
            ),
            L.init_conv2d_torch(next(ki), 32, ch[cfg.in_size], 3),
        ],
        "down": [],
        "resblocks": [],
    }
    for res in cfg.encoder_res:
        if res > 32:
            enc["down"].append(
                [
                    L.init_conv2d_torch(next(ki), ch[res], ch[res // 2], 3),
                    L.init_conv2d_torch(next(ki), ch[res // 2], ch[res // 2], 3),
                ]
            )
        else:
            enc["resblocks"] = [
                init_vtoonify_res_block(next(ki), ch[res])
                for _ in range(cfg.num_res_layers)
            ]
            enc["final"] = L.init_conv2d_torch(
                next(ki), ch[res], cfg.img_channels, 1
            )
    params["encoder"] = enc

    # fusion modules, ordered low→high res (encoder_res reversed)
    params["fusion_out"] = []
    params["fusion_skip"] = []
    for res in cfg.encoder_res[::-1]:
        c = ch[res]
        if is_d:
            params["fusion_out"].append(init_fusion(next(ki), c, c, c))
        else:
            # T fusion: cat[out, f_E] — cat2-split at c
            params["fusion_out"].append(L.split_cat2_weight(
                L.init_conv2d_torch(next(ki), c * 2, c, 3), c))
        # skip fusion: cat[skip(RGB), f_E·m_E] — cat2-split at img_channels
        params["fusion_skip"].append(L.split_cat2_weight(
            L.init_conv2d_torch(next(ki), cfg.img_channels + c,
                                cfg.img_channels, 3), cfg.img_channels))

    # dilated ModRes copies for the encoder (D only, vtoonify.py:200-207)
    if is_d:
        res_list = [L.init_ada_res_block(next(ki), ch[4])]
        for i in range(3, 6):
            out_ch = ch[2 ** i]
            res_list.append(L.init_ada_res_block(next(ki), out_ch))
            res_list.append(L.init_ada_res_block(next(ki), out_ch))
        params["res"] = res_list
    return params


def _encoder_dilations():
    """res[1..6] dilations 4,4,2,2,1,1 (vtoonify.py:204-207)."""
    return [None, 4, 4, 2, 2, 1, 1]


def prepare_styles(params, cfg: VToonifyConfig, style):
    """Style prep half of forward (vtoonify.py:211-224).

    Returns (resstyles, adastyles): T_c-mapped styles for the encoder ModRes
    (D only; None for T) and per-layer generator styles with T_s applied to
    layers ≥ 7 (D only).
    """
    is_d = cfg.backbone == "dualstylegan"
    n_latent = cfg.n_latent
    resstyles = None
    if style is None:
        # legal only with return_feat (T-pretrain teacher interface,
        # train_vtoonify_t.py:122)
        return None, None
    if style.ndim < 3:
        if is_d:
            rs = D.color_transform(params["generator"], style)
            resstyles = jnp.repeat(rs[:, None, :], n_latent, axis=1)
        adastyles = jnp.repeat(style[:, None, :], n_latent, axis=1)
    else:
        nb, nl, nd = style.shape
        if is_d:
            resstyles = D.color_transform(
                params["generator"], style.reshape(nb * nl, nd)
            ).reshape(nb, nl, nd)
        adastyles = style

    if is_d:
        cols = [adastyles[:, i] for i in range(n_latent)]
        for i in range(7, n_latent):
            cols[i] = L.equal_linear(params["generator"]["res"][i], cols[i])
        adastyles = jnp.stack(cols, axis=1)
    return resstyles, adastyles


def vtoonify_apply(
    params,
    cfg: VToonifyConfig,
    x,
    style,
    d_s=None,
    return_mask: bool = False,
    return_feat: bool = False,
    packed_out: bool = False,
):
    """reference model/vtoonify.py:210-277. x: (B, H, W, 3+19) NHWC in [-1,1]
    RGB + parsing-logit channels; H = W = multiple of 8 (any size; fusion
    stages are determined by cfg.in_size).

    packed_out: return the image in space-to-depth PACKED phase-major form
    (B, 2H_out/2... i.e. (B, Hout/2, Wout/2, 12)) — the final ToRGB + skip
    upsample stay packed (nn/layers.py::to_rgb_packed_stay), so no unpacked
    full-res float tensor is ever materialized; the caller finishes the
    depth-to-space as a uint8 permutation (pipeline/toonify.py)."""
    is_d = cfg.backbone == "dualstylegan"
    assert style is not None or return_feat, "style=None needs return_feat"
    resstyles, adastyles = prepare_styles(params, cfg, style)

    # --- encoder walk, collecting multi-scale features
    enc = params["encoder"]
    feat = x
    feat = jax.nn.leaky_relu(L.conv2d_torch(enc["stem"][0], feat, padding=1), 0.2)
    feat = jax.nn.leaky_relu(L.conv2d_torch(enc["stem"][1], feat, padding=1), 0.2)
    encoder_features = [feat]
    for blk in enc["down"]:
        feat = jax.nn.leaky_relu(
            L.conv2d_torch(blk[0], feat, stride=2, padding=1), 0.2
        )
        feat = jax.nn.leaky_relu(L.conv2d_torch(blk[1], feat, padding=1), 0.2)
        encoder_features.append(feat)
    encoder_features = encoder_features[::-1]

    dil = _encoder_dilations()
    for ii, rb in enumerate(enc["resblocks"]):
        feat = vtoonify_res_block(rb, feat)
        if is_d:
            feat = L.ada_res_block(
                params["res"][ii + 1], feat, resstyles[:, ii + 1], d_s,
                dilation=dil[ii + 1],
            )

    out = feat
    skip = L.conv2d_torch(enc["final"], feat)
    if return_feat:
        return out, skip

    # --- generator mid/high-res walk starting at 32×32 (convs[6::2])
    gp = params["generator"]["generator"] if is_d else params["generator"]
    gcfg = cfg.generator
    start_pair = 3  # pair index producing 64px from 32px
    n_pairs = gcfg.log_size - 2

    _index = 1
    m_Es = []
    for pair in range(start_pair, n_pairs):
        if 2 ** (5 + (_index - 1) // 2) <= cfg.in_size:
            fusion_index = (_index - 1) // 2
            f_E = encoder_features[fusion_index]
            if is_d:
                out, m_E = fusion_apply(
                    params["fusion_out"][fusion_index], out, f_E, d_s
                )
                skip = L.conv2d_torch_cat2(
                    params["fusion_skip"][fusion_index],
                    skip, f_E * m_E, padding=1,
                )
                m_Es.append(m_E)
            else:
                out = L.conv2d_torch_cat2(
                    params["fusion_out"][fusion_index],
                    out, f_E, padding=1,
                )
                skip = L.conv2d_torch_cat2(
                    params["fusion_skip"][fusion_index],
                    skip, f_E, padding=1,
                )

        # noise is architecturally zero (vtoonify.py:266-267) → omit
        stage_cout = gp["convs"][2 * pair]["conv"]["weight"].shape[-1]
        if stage_cout <= 128:
            # narrow-channel high-res stage → run it in space-to-depth packed
            # layout (exact; avoids 128-lane padding and inter-op relayouts
            # on the wide/narrow tensors). Fusion above already happened on
            # the unpacked input.
            outp = L.styled_conv_up_packed(
                gp["convs"][2 * pair], out, adastyles[:, _index + 6]
            )
            outp = L.styled_conv_packed(gp["convs"][2 * pair + 1], outp,
                                        adastyles[:, _index + 7])
            if packed_out and pair == n_pairs - 1:
                # final stage: keep the image packed end-to-end
                skip = L.to_rgb_packed_stay(gp["to_rgbs"][pair], outp,
                                            adastyles[:, _index + 8], skip)
            else:
                skip = L.to_rgb_packed(gp["to_rgbs"][pair], outp,
                                       adastyles[:, _index + 8], skip)
                out = L.depth_to_space2(outp)
            _index += 2
            continue
        out = L.styled_conv(
            gp["convs"][2 * pair], out, adastyles[:, _index + 6], upsample=True
        )
        out = L.styled_conv(gp["convs"][2 * pair + 1], out,
                            adastyles[:, _index + 7])
        skip = L.to_rgb(gp["to_rgbs"][pair], out, adastyles[:, _index + 8], skip)
        _index += 2

    image = skip
    if packed_out and image.shape[-1] != 12:
        # final stage ran unpacked (wide-channel tail in exotic configs):
        # honor the packed contract anyway
        image = L.space_to_depth2(image)
    if return_mask and is_d:
        return image, m_Es
    return image


def zplus2wplus(params, cfg: VToonifyConfig, zplus):
    """vtoonify.py:285-286: z+ → w+ through the frozen mapping MLP."""
    gp = (
        params["generator"]["generator"]
        if cfg.backbone == "dualstylegan"
        else params["generator"]
    )
    nb, nl, nd = zplus.shape
    return G.style_mlp(gp, cfg.generator, zplus.reshape(nb * nl, nd)).reshape(
        zplus.shape
    )


# ---------------------------------------------------------------------------
# ConditionalDiscriminator (reference vtoonify.py:10-89)


@dataclass(frozen=True)
class CondDiscriminatorConfig:
    size: int = 256
    channel_multiplier: int = 2
    channel_max: int = 512
    use_condition: bool = False
    style_num: Optional[int] = None

    @property
    def base(self) -> G.DiscriminatorConfig:
        return G.DiscriminatorConfig(
            size=self.size, channel_multiplier=self.channel_multiplier,
            channel_max=self.channel_max,
        )


def init_cond_discriminator(key, cfg: CondDiscriminatorConfig):
    kd, k1, k2, k3, k4, k5 = jax.random.split(key, 6)
    base = G.init_discriminator(kd, cfg.base)
    ch = cfg.base.channels
    if cfg.use_condition:
        cd = 128
        base["final_linear"][1] = L.init_equal_linear(k1, ch[4], cd)
        base["label_mapper"] = [
            L.init_linear_torch(k2, 1, 64),
            L.init_linear_torch(k3, 64, 64),
            L.init_linear_torch(k4, 64, cd // 2),
        ]
        base["style_embed"] = (
            jax.random.normal(k5, (cfg.style_num, cd - cd // 2), jnp.float32)
        )
    return base


def cond_discriminator_apply(params, cfg: CondDiscriminatorConfig, x,
                             degree_label=None, style_ind=None):
    out = L.conv_layer(params["conv_in"], x, 1)
    for bp in params["blocks"]:
        out = L.res_block(bp, out)
    out = L.conv_layer_cat2(params["final_conv"], out,
                            G.minibatch_stddev(out), 3)
    b = out.shape[0]
    out = jnp.transpose(out, (0, 3, 1, 2)).reshape(b, -1)
    out = L.equal_linear(params["final_linear"][0], out, activation=True)
    h = L.equal_linear(params["final_linear"][1], out)
    if not cfg.use_condition:
        return h
    lab = degree_label
    for i, lp in enumerate(params["label_mapper"]):
        lab = L.linear_torch(lp, lab)
        if i < 2:
            lab = jax.nn.leaky_relu(lab, 0.2)
    emb = params["style_embed"][style_ind]
    cond = jnp.concatenate([lab, emb], axis=1)
    cd = cond.shape[-1]
    return jnp.sum(h * cond, axis=1, keepdims=True) / math.sqrt(cd)
