"""StyleGAN2 generator + discriminator (TPU-native functional rebuild).

Capability-parity with reference model/stylegan/model.py:395-718 — mapping
MLP, constant input, per-resolution styled conv pairs + ToRGB skip chain,
style mixing, truncation, z+ latents, early-exit feature taps, minibatch-
stddev discriminator — expressed as pure functions over param pytrees with a
statically unrolled resolution loop (no data-dependent control flow; one XLA
graph per output size).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from vtoonify_tpu.nn import layers as L


def channel_table(channel_multiplier: int = 2,
                  channel_max: int = 512) -> dict:
    """reference model.py:422-432. `channel_max` caps every entry (the
    standard StyleGAN2 channel_max knob; the reference hardcodes 512) —
    smaller caps give cheap debug/dryrun configs with the same topology."""
    return {
        res: min(c, channel_max)
        for res, c in {
            4: 512,
            8: 512,
            16: 512,
            32: 512,
            64: 256 * channel_multiplier,
            128: 128 * channel_multiplier,
            256: 64 * channel_multiplier,
            512: 32 * channel_multiplier,
            1024: 16 * channel_multiplier,
        }.items()
    }


@dataclass(frozen=True)
class GeneratorConfig:
    size: int = 1024
    style_dim: int = 512
    n_mlp: int = 8
    channel_multiplier: int = 2
    channel_max: int = 512
    lr_mlp: float = 0.01

    @property
    def log_size(self) -> int:
        return int(math.log2(self.size))

    @property
    def n_latent(self) -> int:
        return self.log_size * 2 - 2

    @property
    def num_layers(self) -> int:
        return (self.log_size - 2) * 2 + 1

    @property
    def channels(self) -> dict:
        return channel_table(self.channel_multiplier, self.channel_max)


# ---------------------------------------------------------------------------
# init


def init_generator(key, cfg: GeneratorConfig):
    ch = cfg.channels
    keys = jax.random.split(key, cfg.n_mlp + 8 + 6 * cfg.log_size)
    ki = iter(keys)

    style = [
        L.init_equal_linear(next(ki), cfg.style_dim, cfg.style_dim)
        for _ in range(cfg.n_mlp)
    ]

    params = {
        "style": style,
        "input": jax.random.normal(next(ki), (1, 4, 4, ch[4]), jnp.float32),
        "conv1": L.init_styled_conv(next(ki), ch[4], ch[4], 3, cfg.style_dim),
        "to_rgb1": L.init_to_rgb(next(ki), ch[4], cfg.style_dim),
        "convs": [],
        "to_rgbs": [],
        "noises": [
            jax.random.normal(
                next(ki), (1, 2 ** ((i + 5) // 2), 2 ** ((i + 5) // 2), 1),
                jnp.float32,
            )
            for i in range(cfg.num_layers)
        ],
    }
    in_ch = ch[4]
    for i in range(3, cfg.log_size + 1):
        out_ch = ch[2 ** i]
        params["convs"].append(
            L.init_styled_conv(next(ki), in_ch, out_ch, 3, cfg.style_dim)
        )
        params["convs"].append(
            L.init_styled_conv(next(ki), out_ch, out_ch, 3, cfg.style_dim)
        )
        params["to_rgbs"].append(L.init_to_rgb(next(ki), out_ch, cfg.style_dim))
        in_ch = out_ch
    return params


# ---------------------------------------------------------------------------
# apply


def style_mlp(params, cfg: GeneratorConfig, z):
    """Mapping network: PixelNorm → n_mlp × EqualLinear(fused_lrelu)."""
    x = L.pixel_norm(z)
    for p in params["style"]:
        x = L.equal_linear(p, x, lr_mul=cfg.lr_mlp, activation=True)
    return x


def styles_to_latent(
    params,
    cfg: GeneratorConfig,
    styles: Sequence,
    *,
    input_is_latent=False,
    z_plus_latent=False,
    truncation=1.0,
    truncation_latent=None,
    inject_index=None,
):
    """Reference forward's style-preparation half (model.py:516-565)."""
    if not input_is_latent:
        mapped = []
        for s in styles:
            if not z_plus_latent:
                mapped.append(style_mlp(params, cfg, s))
            else:
                nb, nl, nd = s.shape
                mapped.append(
                    style_mlp(params, cfg, s.reshape(nb * nl, nd)).reshape(nb, nl, nd)
                )
        styles = mapped

    if truncation < 1:
        styles = [
            truncation_latent + truncation * (s - truncation_latent) for s in styles
        ]

    if len(styles) < 2:
        if styles[0].ndim < 3:
            latent = jnp.repeat(styles[0][:, None, :], cfg.n_latent, axis=1)
        else:
            latent = styles[0]
    else:
        assert inject_index is not None, "explicit inject_index required under jit"
        if styles[0].ndim < 3:
            latent = jnp.concatenate(
                [
                    jnp.repeat(styles[0][:, None, :], inject_index, axis=1),
                    jnp.repeat(
                        styles[1][:, None, :], cfg.n_latent - inject_index, axis=1
                    ),
                ],
                axis=1,
            )
        else:
            latent = jnp.concatenate(
                [styles[0][:, :inject_index], styles[1][:, inject_index:]], axis=1
            )
    return latent


def make_noise(params, cfg: GeneratorConfig, key=None, randomize=True,
               batch=1, dtype=jnp.float32):
    """Per-layer noise images: random or the stored buffers. `dtype` casts
    the draws (sampled in float32 so the random values match the f32 path
    bit-for-bit before rounding) — an f32 noise image added to a bf16
    synthesis pass would silently promote the whole tail back to f32."""
    if not randomize:
        return list(params["noises"])
    assert key is not None
    keys = jax.random.split(key, cfg.num_layers)
    return [
        jax.random.normal(
            keys[i], (batch, 2 ** ((i + 5) // 2), 2 ** ((i + 5) // 2), 1),
            jnp.float32,
        ).astype(dtype)
        for i in range(cfg.num_layers)
    ]


def generator_apply(
    params,
    cfg: GeneratorConfig,
    latent,
    noise: Optional[Sequence] = None,
    return_feature_ind: int = 999,
    packed: bool = True,
):
    """Synthesis network on a prepared W+ latent (B, n_latent, style_dim).

    reference model.py:567-590. `noise` is a list of num_layers arrays or
    Nones. Returns image, or (feat, skip) when return_feature_ind is hit
    (the early-exit teacher interface, model.py:581-582).

    `packed` runs the narrow-channel high-res stages (Cout ≤ 128) in
    space-to-depth packed layout — exact algebra, same MXU-lane win as the
    VToonify tail (docs/PERF.md); noise injection is applied per packed
    phase. Set False to force the plain per-stage path.
    """
    if noise is None:
        noise = [None] * cfg.num_layers

    batch = latent.shape[0]
    out = jnp.broadcast_to(
        params["input"].astype(latent.dtype),
        (batch,) + params["input"].shape[1:],
    )
    out = L.styled_conv(params["conv1"], out, latent[:, 0], noise=noise[0])
    skip = L.to_rgb(params["to_rgb1"], out, latent[:, 1])

    i = 1
    for idx in range(len(params["to_rgbs"])):
        conv1 = params["convs"][2 * idx]
        conv2 = params["convs"][2 * idx + 1]
        if packed and conv1["conv"]["weight"].shape[-1] <= 128:
            outp = L.styled_conv_up_packed(conv1, out, latent[:, i],
                                           noise=noise[2 * idx + 1])
            outp = L.styled_conv_packed(conv2, outp, latent[:, i + 1],
                                        noise=noise[2 * idx + 2])
            skip = L.to_rgb_packed(params["to_rgbs"][idx], outp,
                                   latent[:, i + 2], skip)
            out = L.depth_to_space2(outp)
        else:
            out = L.styled_conv(conv1, out, latent[:, i],
                                noise=noise[2 * idx + 1], upsample=True)
            out = L.styled_conv(conv2, out, latent[:, i + 1],
                                noise=noise[2 * idx + 2])
            skip = L.to_rgb(params["to_rgbs"][idx], out, latent[:, i + 2],
                            skip)
        i += 2
        if i > return_feature_ind:
            return out, skip
    return skip


def generate(
    params,
    cfg: GeneratorConfig,
    styles,
    *,
    input_is_latent=False,
    z_plus_latent=False,
    truncation=1.0,
    truncation_latent=None,
    inject_index=None,
    noise=None,
    return_latents=False,
):
    """Full reference-forward equivalent (styles → image)."""
    latent = styles_to_latent(
        params, cfg, styles,
        input_is_latent=input_is_latent, z_plus_latent=z_plus_latent,
        truncation=truncation, truncation_latent=truncation_latent,
        inject_index=inject_index,
    )
    img = generator_apply(params, cfg, latent, noise=noise)
    if return_latents:
        return img, latent
    return img


def mean_latent(params, cfg: GeneratorConfig, key, n_latent: int):
    z = jax.random.normal(key, (n_latent, cfg.style_dim), jnp.float32)
    return jnp.mean(style_mlp(params, cfg, z), axis=0, keepdims=True)


# ---------------------------------------------------------------------------
# discriminator (reference model.py:661-718)


@dataclass(frozen=True)
class DiscriminatorConfig:
    size: int = 256
    channel_multiplier: int = 2
    channel_max: int = 512

    @property
    def log_size(self) -> int:
        return int(math.log2(self.size))

    @property
    def channels(self) -> dict:
        return channel_table(self.channel_multiplier, self.channel_max)


def init_discriminator(key, cfg: DiscriminatorConfig):
    ch = cfg.channels
    keys = jax.random.split(key, cfg.log_size + 4)
    ki = iter(keys)
    params = {
        "conv_in": L.init_conv_layer(next(ki), 3, ch[cfg.size], 1),
        "blocks": [],
    }
    in_ch = ch[cfg.size]
    for i in range(cfg.log_size, 2, -1):
        out_ch = ch[2 ** (i - 1)]
        params["blocks"].append(L.init_res_block(next(ki), in_ch, out_ch))
        in_ch = out_ch
    # consumes cat[features, minibatch-stddev] — cat2-split at in_ch
    params["final_conv"] = L.init_conv_layer(next(ki), in_ch + 1, ch[4], 3)
    L.split_cat2_weight(params["final_conv"]["conv"], in_ch)
    params["final_linear"] = [
        L.init_equal_linear(next(ki), ch[4] * 4 * 4, ch[4]),
        L.init_equal_linear(next(ki), ch[4], 1),
    ]
    return params


def minibatch_stddev(x, stddev_group: int = 4, stddev_feat: int = 1):
    """reference model.py:704-712 (channel-last), WITHOUT the final concat.

    Returns the broadcast per-group stddev map (B, H, W, stddev_feat)
    separately; the caller feeds (x, std) to conv_layer_cat2 so the
    257-channel concat never materializes — a channel concat of a
    TP-sharded activation with a 1-channel plane forces a GSPMD
    all-to-all reshard (parallel/audit.py; round-3 dryrun abort class).
    """
    b, h, w, c = x.shape
    group = min(b, stddev_group)
    y = x.reshape(group, b // group, h, w, stddev_feat, c // stddev_feat)
    var = jnp.var(y, axis=0)  # (b//group, h, w, feat, c//feat)
    std = jnp.sqrt(var + 1e-8)
    std = jnp.mean(std, axis=(1, 2, 4), keepdims=True)  # over H, W, C//feat
    std = std.squeeze(4)  # (b//group, 1, 1, feat)
    return jnp.tile(std, (group, h, w, 1)).astype(x.dtype)


def discriminator_apply(params, cfg: DiscriminatorConfig, x):
    out = L.conv_layer(params["conv_in"], x, 1)
    for bp in params["blocks"]:
        out = L.res_block(bp, out)
    out = L.conv_layer_cat2(params["final_conv"], out, minibatch_stddev(out),
                            3)
    b = out.shape[0]
    # torch flattens NCHW (C major); transpose before reshape for parity.
    out = jnp.transpose(out, (0, 3, 1, 2)).reshape(b, -1)
    out = L.equal_linear(params["final_linear"][0], out, activation=True)
    out = L.equal_linear(params["final_linear"][1], out)
    return out
