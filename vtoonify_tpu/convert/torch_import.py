"""One-way converter: PyTorch state_dicts → vtoonify_tpu param pytrees.

Handles the reference checkpoint formats (SURVEY.md §5.4): StyleGAN2 /
DualStyleGAN `g_ema` dicts, VToonify `.pt`, pSp `encoder.pt` (with
`latent_avg`), BiSeNet `faceparsing.pth`, `exstyle_code.npy` style banks.

Torch is a dev-only dependency of this module (never imported by the runtime
path): inputs are *flat dicts of numpy arrays*. Use `flatten_torch_state`
to produce one from a torch.nn.Module or torch.load() result.

Layout rules (see nn/layers.py):
  linear  (out, in)        → (in, out)
  conv    (O, I, kh, kw)   → (kh, kw, I, O)
  modconv (1, O, I, kh, kw)→ (kh, kw, I, O)
  NCHW buffers             → NHWC
Weights stay RAW — equalized-LR scaling happens at apply time on both sides,
so conversion is purely a transpose (SURVEY.md §7.3 hard-part #2).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def flatten_torch_state(obj) -> dict:
    """torch Module / state_dict / nested ckpt dict → {key: np.ndarray}."""
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    out = {}
    for k, v in obj.items():
        if hasattr(v, "detach"):
            out[k] = v.detach().cpu().numpy()
        else:
            out[k] = np.asarray(v)
    return out


def _j(a):
    return jnp.asarray(np.ascontiguousarray(a), dtype=jnp.float32)


def _linear(sd, p):
    out = {"weight": _j(sd[f"{p}.weight"].T)}
    if f"{p}.bias" in sd:
        out["bias"] = _j(sd[f"{p}.bias"])
    return out


def _conv(sd, p, cat2_split=None):
    """cat2_split: store the weight pre-split at that cin index
    (nn/layers.py::split_cat2_weight) — convs that consume a channel
    concat keep TP kernel gradients collective-free that way."""
    w = np.transpose(sd[f"{p}.weight"], (2, 3, 1, 0))
    if cat2_split is None:
        out = {"weight": _j(w)}
    else:
        out = {"weight_a": _j(w[:, :, :cat2_split]),
               "weight_b": _j(w[:, :, cat2_split:])}
    if f"{p}.bias" in sd:
        out["bias"] = _j(sd[f"{p}.bias"])
    return out


def convert_equal_linear(sd, prefix):
    return _linear(sd, prefix)


def convert_equal_conv2d(sd, prefix):
    return _conv(sd, prefix)


def convert_conv_layer(sd, prefix, downsample=False, activate=True,
                       cat2_split=None):
    """ConvLayer is an nn.Sequential; indices depend on flags
    (reference model.py:593-637)."""
    ci = 1 if downsample else 0
    out = {"conv": _conv(sd, f"{prefix}.{ci}", cat2_split=cat2_split)}
    act_key = f"{prefix}.{ci + 1}.bias"
    if activate and act_key in sd:
        out["act_bias"] = _j(sd[act_key])
    return out


def convert_modulated_conv2d(sd, prefix):
    w = sd[f"{prefix}.weight"][0]  # (O, I, kh, kw)
    return {
        "weight": _j(np.transpose(w, (2, 3, 1, 0))),
        "modulation": _linear(sd, f"{prefix}.modulation"),
    }


def convert_styled_conv(sd, prefix):
    return {
        "conv": convert_modulated_conv2d(sd, f"{prefix}.conv"),
        "noise": {"weight": _j(sd[f"{prefix}.noise.weight"].reshape(()))},
        "act_bias": _j(sd[f"{prefix}.activate.bias"]),
    }


def convert_to_rgb(sd, prefix):
    return {
        "conv": convert_modulated_conv2d(sd, f"{prefix}.conv"),
        "bias": _j(np.transpose(sd[f"{prefix}.bias"], (0, 2, 3, 1))),
    }


def convert_res_block(sd, prefix):
    return {
        "conv1": convert_conv_layer(sd, f"{prefix}.conv1"),
        "conv2": convert_conv_layer(sd, f"{prefix}.conv2", downsample=True),
        "skip": convert_conv_layer(
            sd, f"{prefix}.skip", downsample=True, activate=False
        ),
    }


def convert_generator(sd, cfg, prefix=""):
    """StyleGAN2 Generator state_dict → params (cfg: GeneratorConfig)."""
    p = prefix + "." if prefix else ""
    n_res = cfg.log_size - 2
    return {
        # style.0 is the parameterless PixelNorm
        "style": [
            _linear(sd, f"{p}style.{i + 1}") for i in range(cfg.n_mlp)
        ],
        "input": _j(np.transpose(sd[f"{p}input.input"], (0, 2, 3, 1))),
        "conv1": convert_styled_conv(sd, f"{p}conv1"),
        "to_rgb1": convert_to_rgb(sd, f"{p}to_rgb1"),
        "convs": [
            convert_styled_conv(sd, f"{p}convs.{i}") for i in range(2 * n_res)
        ],
        "to_rgbs": [
            convert_to_rgb(sd, f"{p}to_rgbs.{i}") for i in range(n_res)
        ],
        "noises": [
            _j(np.transpose(sd[f"{p}noises.noise_{i}"], (0, 2, 3, 1)))
            for i in range(cfg.num_layers)
        ],
    }


def convert_discriminator(sd, cfg, prefix=""):
    p = prefix + "." if prefix else ""
    n_blocks = cfg.log_size - 2
    return {
        "conv_in": convert_conv_layer(sd, f"{p}convs.0"),
        "blocks": [
            convert_res_block(sd, f"{p}convs.{i + 1}") for i in range(n_blocks)
        ],
        "final_conv": convert_conv_layer(
            sd, f"{p}final_conv",
            # cat[features, minibatch-stddev]: split at cin-1
            cat2_split=sd[f"{p}final_conv.0.weight"].shape[1] - 1,
        ),
        "final_linear": [
            _linear(sd, f"{p}final_linear.0"),
            _linear(sd, f"{p}final_linear.1"),
        ],
    }


# --- plain torch layers -----------------------------------------------------


def convert_conv2d_torch(sd, prefix):
    return _conv(sd, prefix)


def convert_linear_torch(sd, prefix):
    return _linear(sd, prefix)


def convert_batch_norm(sd, prefix):
    return {
        "weight": _j(sd[f"{prefix}.weight"]),
        "bias": _j(sd[f"{prefix}.bias"]),
        "running_mean": _j(sd[f"{prefix}.running_mean"]),
        "running_var": _j(sd[f"{prefix}.running_var"]),
    }


def convert_adain(sd, prefix):
    return {"style": _linear(sd, f"{prefix}.style")}


def convert_ada_res_block(sd, prefix):
    """reference dualstylegan.py AdaResBlock: conv/conv2/norm/norm2."""
    return {
        "conv1": convert_conv_layer(sd, f"{prefix}.conv"),
        "conv2": convert_conv_layer(sd, f"{prefix}.conv2"),
        "norm1": convert_adain(sd, f"{prefix}.norm"),
        "norm2": convert_adain(sd, f"{prefix}.norm2"),
    }


# --- composite models --------------------------------------------------------


def convert_dualstylegan(sd, cfg, prefix=""):
    """DualStyleGAN state_dict → params (cfg: DualStyleGANConfig)."""
    p = prefix + "." if prefix else ""
    res = []
    ri = cfg.res_index_eff
    res.append(convert_ada_res_block(sd, f"{p}res.0"))
    j = 1
    for i in range(3, cfg.log_size + 1):
        for _ in range(2):
            if i < 3 + ri // 2:
                res.append(convert_ada_res_block(sd, f"{p}res.{j}"))
            else:
                res.append(_linear(sd, f"{p}res.{j}"))
            j += 1
    res.append(_linear(sd, f"{p}res.{j}"))
    return {
        "style": [
            _linear(sd, f"{p}style.{i + 1}") for i in range(cfg.n_mlp - 6)
        ],
        "generator": convert_generator(sd, cfg.generator, prefix=f"{p}generator"),
        "res": res,
    }


def convert_fusion(sd, prefix):
    # conv/conv2 consume cat[f_G, ·] with equal halves — cat2-split at cin/2
    half = sd[f"{prefix}.conv.weight"].shape[1] // 2
    return {
        "conv": _conv(sd, f"{prefix}.conv", cat2_split=half),
        "norm": convert_adain(sd, f"{prefix}.norm"),
        "conv2": _conv(sd, f"{prefix}.conv2", cat2_split=half),
        "linear": [
            _linear(sd, f"{prefix}.linear.0"),
            _linear(sd, f"{prefix}.linear.2"),
        ],
    }


def convert_vtoonify_res_block(sd, prefix):
    return {
        "conv1": _conv(sd, f"{prefix}.conv"),
        "conv2": _conv(sd, f"{prefix}.conv2"),
    }


def convert_vtoonify(sd, cfg, prefix=""):
    """VToonify state_dict → params (cfg: VToonifyConfig). Handles both the
    full model dict and partial ones (missing submodules are skipped)."""
    p = prefix + "." if prefix else ""
    is_d = cfg.backbone == "dualstylegan"
    out = {}

    if any(k.startswith(f"{p}generator.") for k in sd):
        if is_d:
            out["generator"] = convert_dualstylegan(
                sd, cfg.dualstylegan, prefix=f"{p}generator"
            )
        else:
            out["generator"] = convert_generator(
                sd, cfg.generator, prefix=f"{p}generator"
            )

    if any(k.startswith(f"{p}encoder.") for k in sd):
        n_down = sum(1 for r in cfg.encoder_res if r > 32)
        enc = {
            "stem": [
                _conv(sd, f"{p}encoder.0.0"),
                _conv(sd, f"{p}encoder.0.2"),
            ],
            "down": [
                [
                    _conv(sd, f"{p}encoder.{i + 1}.0"),
                    _conv(sd, f"{p}encoder.{i + 1}.2"),
                ]
                for i in range(n_down)
            ],
            "resblocks": [
                convert_vtoonify_res_block(
                    sd, f"{p}encoder.{n_down + 1}.{j}"
                )
                for j in range(cfg.num_res_layers)
            ],
            "final": _conv(sd, f"{p}encoder.{n_down + 2}"),
        }
        out["encoder"] = enc

    if any(k.startswith(f"{p}fusion_out.") for k in sd):
        n_fuse = len(cfg.encoder_res)
        if is_d:
            out["fusion_out"] = [
                convert_fusion(sd, f"{p}fusion_out.{i}") for i in range(n_fuse)
            ]
        else:
            # T fusion: cat[out, f_E] with equal halves
            out["fusion_out"] = [
                _conv(sd, f"{p}fusion_out.{i}",
                      cat2_split=sd[f"{p}fusion_out.{i}.weight"].shape[1]
                      // 2)
                for i in range(n_fuse)
            ]
        # skip fusion: cat[skip(RGB), f_E·m_E] — split at img channels
        out["fusion_skip"] = [
            _conv(sd, f"{p}fusion_skip.{i}",
                  cat2_split=sd[f"{p}fusion_skip.{i}.weight"].shape[0])
            for i in range(n_fuse)
        ]

    if is_d and any(k.startswith(f"{p}res.") for k in sd):
        out["res"] = [
            convert_ada_res_block(sd, f"{p}res.{j}") for j in range(7)
        ]
    return out


def convert_cond_discriminator(sd, cfg, prefix=""):
    """ConditionalDiscriminator (reference vtoonify.py:10-89)."""
    p = prefix + "." if prefix else ""
    base = convert_discriminator(sd, cfg.base, prefix=prefix)
    if cfg.use_condition:
        base["label_mapper"] = [
            _linear(sd, f"{p}label_mapper.0"),
            _linear(sd, f"{p}label_mapper.2"),
            _linear(sd, f"{p}label_mapper.4"),
        ]
        base["style_embed"] = _j(sd[f"{p}style_mapper.weight"])
    return base


# --- pSp encoder (reference model/encoder/encoders/psp_encoders.py) ----------


def convert_psp_encoder(sd, cfg, prefix=""):
    """GradualStyleEncoder state_dict → params (cfg: PSPEncoderConfig).

    Accepts either a bare encoder state_dict or the full pSp checkpoint's
    `state_dict` with `encoder.` prefixes (pass prefix="encoder")."""
    p = prefix + "." if prefix else ""

    def bottleneck(i):
        b = f"{p}body.{i}"
        out = {
            "bn0": convert_batch_norm(sd, f"{b}.res_layer.0"),
            "conv1": _conv(sd, f"{b}.res_layer.1"),
            "prelu": {"weight": _j(sd[f"{b}.res_layer.2.weight"])},
            "conv2": _conv(sd, f"{b}.res_layer.3"),
            "bn2": convert_batch_norm(sd, f"{b}.res_layer.4"),
            "se": {
                "fc1": _conv(sd, f"{b}.res_layer.5.fc1"),
                "fc2": _conv(sd, f"{b}.res_layer.5.fc2"),
            },
        }
        if f"{b}.shortcut_layer.0.weight" in sd:
            out["shortcut_conv"] = _conv(sd, f"{b}.shortcut_layer.0")
            out["shortcut_bn"] = convert_batch_norm(sd, f"{b}.shortcut_layer.1")
        return out

    def style_block(j):
        s = f"{p}styles.{j}"
        convs = []
        i = 0
        while f"{s}.convs.{i}.weight" in sd:
            convs.append(_conv(sd, f"{s}.convs.{i}"))
            i += 2  # LeakyReLU in between
        return {"convs": convs, "linear": _linear(sd, f"{s}.linear")}

    n_body = 0
    while f"{p}body.{n_body}.res_layer.1.weight" in sd:
        n_body += 1

    return {
        "input_conv": _conv(sd, f"{p}input_layer.0"),
        "input_bn": convert_batch_norm(sd, f"{p}input_layer.1"),
        "input_prelu": {"weight": _j(sd[f"{p}input_layer.2.weight"])},
        "body": [bottleneck(i) for i in range(n_body)],
        "styles": [style_block(j) for j in range(cfg.n_styles)],
        "latlayer1": _conv(sd, f"{p}latlayer1"),
        "latlayer2": _conv(sd, f"{p}latlayer2"),
    }


def load_psp_standalone(ckpt: dict, cfg):
    """Reference util.py:143-161: strip `encoder.` keys, keep latent_avg.

    Args: ckpt — a torch.load()'d pSp checkpoint dict already flattened to
    numpy (keys `state_dict`→flat dict, `latent_avg`).
    Returns (params, latent_avg).
    """
    sd = ckpt["state_dict"] if "state_dict" in ckpt else ckpt
    sub = {k[len("encoder."):]: v for k, v in sd.items()
           if k.startswith("encoder.")}
    params = convert_psp_encoder(sub, cfg)
    latent_avg = _j(ckpt["latent_avg"]) if "latent_avg" in ckpt else None
    return params, latent_avg


# --- BiSeNet (reference model/bisenet/model.py) -------------------------------


def convert_bisenet(sd, prefix=""):
    p = prefix + "." if prefix else ""

    def cbr(pre):
        return {"conv": _conv(sd, f"{pre}.conv"),
                "bn": convert_batch_norm(sd, f"{pre}.bn")}

    def basic(pre):
        out = {
            "conv1": _conv(sd, f"{pre}.conv1"),
            "bn1": convert_batch_norm(sd, f"{pre}.bn1"),
            "conv2": _conv(sd, f"{pre}.conv2"),
            "bn2": convert_batch_norm(sd, f"{pre}.bn2"),
        }
        if f"{pre}.downsample.0.weight" in sd:
            out["down_conv"] = _conv(sd, f"{pre}.downsample.0")
            out["down_bn"] = convert_batch_norm(sd, f"{pre}.downsample.1")
        return out

    def arm(pre):
        return {
            "conv": cbr(f"{pre}.conv"),
            "conv_atten": _conv(sd, f"{pre}.conv_atten"),
            "bn_atten": convert_batch_norm(sd, f"{pre}.bn_atten"),
        }

    def head(pre):
        return {"conv": cbr(f"{pre}.conv"),
                "conv_out": _conv(sd, f"{pre}.conv_out")}

    rn = f"{p}cp.resnet"
    resnet = {"conv1": _conv(sd, f"{rn}.conv1"),
              "bn1": convert_batch_norm(sd, f"{rn}.bn1")}
    for layer in ("layer1", "layer2", "layer3", "layer4"):
        resnet[layer] = [basic(f"{rn}.{layer}.0"), basic(f"{rn}.{layer}.1")]

    return {
        "resnet": resnet,
        "arm16": arm(f"{p}cp.arm16"),
        "arm32": arm(f"{p}cp.arm32"),
        "conv_head32": cbr(f"{p}cp.conv_head32"),
        "conv_head16": cbr(f"{p}cp.conv_head16"),
        "conv_avg": cbr(f"{p}cp.conv_avg"),
        "ffm": {
            "convblk": cbr(f"{p}ffm.convblk"),
            "conv1": _conv(sd, f"{p}ffm.conv1"),
            "conv2": _conv(sd, f"{p}ffm.conv2"),
        },
        "conv_out": head(f"{p}conv_out"),
        "conv_out16": head(f"{p}conv_out16"),
        "conv_out32": head(f"{p}conv_out32"),
    }


# --- RAFT (reference model/raft/core) ----------------------------------------


def convert_raft(sd, prefix=""):
    """RAFT (basic) state_dict → params. Handles the 'module.' DataParallel
    prefix of the released raft-things.pth automatically."""
    if any(k.startswith("module.") for k in sd):
        sd = {k[len("module."):]: v for k, v in sd.items()}
    p = prefix + "." if prefix else ""

    def res_block(pre, batch_norm):
        out = {
            "conv1": _conv(sd, f"{pre}.conv1"),
            "conv2": _conv(sd, f"{pre}.conv2"),
        }
        if f"{pre}.downsample.0.weight" in sd:
            out["down"] = _conv(sd, f"{pre}.downsample.0")
        if batch_norm:
            norms = {
                "norm1": convert_batch_norm(sd, f"{pre}.norm1"),
                "norm2": convert_batch_norm(sd, f"{pre}.norm2"),
            }
            if f"{pre}.norm3.weight" in sd:
                norms["norm3"] = convert_batch_norm(sd, f"{pre}.norm3")
            out["norms"] = norms
        return out

    def encoder(pre, batch_norm):
        out = {
            "conv1": _conv(sd, f"{pre}.conv1"),
            "conv2": _conv(sd, f"{pre}.conv2"),
            "layers": [
                [
                    res_block(f"{pre}.layer{li + 1}.0", batch_norm),
                    res_block(f"{pre}.layer{li + 1}.1", batch_norm),
                ]
                for li in range(3)
            ],
        }
        if batch_norm:
            out["bn1"] = convert_batch_norm(sd, f"{pre}.norm1")
        return out

    ub = f"{p}update_block"
    return {
        "fnet": encoder(f"{p}fnet", batch_norm=False),
        "cnet": encoder(f"{p}cnet", batch_norm=True),
        "update": {
            "enc": {
                k: _conv(sd, f"{ub}.encoder.{k}")
                for k in ("convc1", "convc2", "convf1", "convf2", "conv")
            },
            "gru": {
                k: _conv(sd, f"{ub}.gru.{k}")
                for k in ("convz1", "convr1", "convq1",
                          "convz2", "convr2", "convq2")
            },
            "flow_head": {
                "conv1": _conv(sd, f"{ub}.flow_head.conv1"),
                "conv2": _conv(sd, f"{ub}.flow_head.conv2"),
            },
            "mask": {
                "conv1": _conv(sd, f"{ub}.mask.0"),
                "conv2": _conv(sd, f"{ub}.mask.2"),
            },
        },
    }
