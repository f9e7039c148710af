"""One-way pytree → reference-PyTorch checkpoint exporter (the inverse of
`convert/torch_import.py`).

Lets models trained in this framework be consumed by the reference stack
(`style_transfer.py --ckpt`, the Gradio demo, the notebook): the trainers save
Orbax pytrees for exact resume, and this module turns `g_ema` params back
into the `{'g_ema': state_dict}` `torch.save` layout the reference expects
(`train_vtoonify_d.py:383-390`; encoder-only pretrain saves `:169-175`).

Every mapping here is the exact inverse of the corresponding convert_* reader;
`tests/test_torch_export.py` proves (a) value roundtrip through the importer
and (b) strict `load_state_dict` key compatibility with the reference module.
torch is only imported inside `save_reference_checkpoint` — the export dict
itself is plain numpy.
"""

from __future__ import annotations

import numpy as np


def _n(a):
    return np.asarray(a, dtype=np.float32)


def _fir_kernel(gain: float = 1.0) -> np.ndarray:
    """make_kernel([1,3,3,1]) (model.py:21-28): normalized binomial outer
    product; torch registers it as a buffer (Blur/Upsample), scaled by
    factor² on upsample paths."""
    k = np.array([1.0, 3.0, 3.0, 1.0])
    k = np.outer(k, k)
    return (k / k.sum() * gain).astype(np.float32)


def _linear(out, prefix, p):
    out[f"{prefix}.weight"] = _n(p["weight"]).T
    if "bias" in p:
        out[f"{prefix}.bias"] = _n(p["bias"])


def _conv(out, prefix, p):
    # (kh, kw, I, O) → (O, I, kh, kw); cat2-split storage (weight_a/weight_b,
    # nn/layers.py::split_cat2_weight) merges back to the torch cin layout
    if "weight_a" in p:
        w = np.concatenate([_n(p["weight_a"]), _n(p["weight_b"])], axis=2)
    else:
        w = _n(p["weight"])
    out[f"{prefix}.weight"] = np.transpose(w, (3, 2, 0, 1))
    if "bias" in p:
        out[f"{prefix}.bias"] = _n(p["bias"])


def _conv_layer(out, prefix, p, downsample=False):
    ci = 1 if downsample else 0
    _conv(out, f"{prefix}.{ci}", p["conv"])
    if "act_bias" in p:
        out[f"{prefix}.{ci + 1}.bias"] = _n(p["act_bias"])


def _modulated_conv(out, prefix, p):
    w = np.transpose(_n(p["weight"]), (3, 2, 0, 1))  # (O, I, kh, kw)
    out[f"{prefix}.weight"] = w[None]                # reference keeps (1,O,I,kh,kw)
    _linear(out, f"{prefix}.modulation", p["modulation"])


def _styled_conv(out, prefix, p):
    _modulated_conv(out, f"{prefix}.conv", p["conv"])
    out[f"{prefix}.noise.weight"] = _n(p["noise"]["weight"]).reshape(1)
    out[f"{prefix}.activate.bias"] = _n(p["act_bias"])


def _to_rgb(out, prefix, p):
    _modulated_conv(out, f"{prefix}.conv", p["conv"])
    out[f"{prefix}.bias"] = np.transpose(_n(p["bias"]), (0, 3, 1, 2))


def _res_block(out, prefix, p):
    _conv_layer(out, f"{prefix}.conv1", p["conv1"])
    _conv_layer(out, f"{prefix}.conv2", p["conv2"], downsample=True)
    _conv_layer(out, f"{prefix}.skip", p["skip"], downsample=True)


def export_generator(params, cfg, prefix=""):
    """StyleGAN2 Generator params → reference state_dict entries."""
    p = prefix + "." if prefix else ""
    out = {}
    for i, lin in enumerate(params["style"]):  # style.0 is PixelNorm
        _linear(out, f"{p}style.{i + 1}", lin)
    out[f"{p}input.input"] = np.transpose(_n(params["input"]), (0, 3, 1, 2))
    _styled_conv(out, f"{p}conv1", params["conv1"])
    _to_rgb(out, f"{p}to_rgb1", params["to_rgb1"])
    for i, c in enumerate(params["convs"]):
        _styled_conv(out, f"{p}convs.{i}", c)
        if i % 2 == 0:  # upsampling conv: Blur buffer, ×factor² gain
            out[f"{p}convs.{i}.conv.blur.kernel"] = _fir_kernel(4.0)
    for i, t in enumerate(params["to_rgbs"]):
        _to_rgb(out, f"{p}to_rgbs.{i}", t)
        out[f"{p}to_rgbs.{i}.upsample.kernel"] = _fir_kernel(4.0)
    for i, nz in enumerate(params["noises"]):
        out[f"{p}noises.noise_{i}"] = np.transpose(_n(nz), (0, 3, 1, 2))
    return out


def _adain(out, prefix, p):
    _linear(out, f"{prefix}.style", p["style"])


def _ada_res_block(out, prefix, p):
    _conv_layer(out, f"{prefix}.conv", p["conv1"])
    _conv_layer(out, f"{prefix}.conv2", p["conv2"])
    _adain(out, f"{prefix}.norm", p["norm1"])
    _adain(out, f"{prefix}.norm2", p["norm2"])


def export_dualstylegan(params, cfg, prefix=""):
    p = prefix + "." if prefix else ""
    out = {}
    for i, lin in enumerate(params["style"]):
        _linear(out, f"{p}style.{i + 1}", lin)
    out.update(export_generator(params["generator"], cfg.generator,
                                prefix=f"{p}generator"))
    ri = cfg.res_index_eff
    res = params["res"]
    _ada_res_block(out, f"{p}res.0", res[0])
    j = 1
    for i in range(3, cfg.log_size + 1):
        for _ in range(2):
            if i < 3 + ri // 2:
                _ada_res_block(out, f"{p}res.{j}", res[j])
            else:
                _linear(out, f"{p}res.{j}", res[j])
            j += 1
    _linear(out, f"{p}res.{j}", res[j])
    return out


def _fusion(out, prefix, p):
    _conv(out, f"{prefix}.conv", p["conv"])
    _adain(out, f"{prefix}.norm", p["norm"])
    _conv(out, f"{prefix}.conv2", p["conv2"])
    _linear(out, f"{prefix}.linear.0", p["linear"][0])
    _linear(out, f"{prefix}.linear.2", p["linear"][1])


def export_vtoonify(params, cfg, prefix="") -> dict:
    """VToonify params → reference state_dict ({key: np.ndarray}). Partial
    trees export partially (e.g. encoder-only pretrain checkpoints), the
    mirror of convert_vtoonify's partial handling."""
    p = prefix + "." if prefix else ""
    is_d = cfg.backbone == "dualstylegan"
    out = {}

    if "generator" in params:
        if is_d:
            out.update(export_dualstylegan(params["generator"],
                                           cfg.dualstylegan,
                                           prefix=f"{p}generator"))
        else:
            out.update(export_generator(params["generator"], cfg.generator,
                                        prefix=f"{p}generator"))

    if "encoder" in params:
        enc = params["encoder"]
        n_down = sum(1 for r in cfg.encoder_res if r > 32)
        _conv(out, f"{p}encoder.0.0", enc["stem"][0])
        _conv(out, f"{p}encoder.0.2", enc["stem"][1])
        for i, pair in enumerate(enc["down"]):
            _conv(out, f"{p}encoder.{i + 1}.0", pair[0])
            _conv(out, f"{p}encoder.{i + 1}.2", pair[1])
        for j, rb in enumerate(enc["resblocks"]):
            _conv(out, f"{p}encoder.{n_down + 1}.{j}.conv", rb["conv1"])
            _conv(out, f"{p}encoder.{n_down + 1}.{j}.conv2", rb["conv2"])
        _conv(out, f"{p}encoder.{n_down + 2}", enc["final"])

    if "fusion_out" in params:
        for i, f in enumerate(params["fusion_out"]):
            if is_d:
                _fusion(out, f"{p}fusion_out.{i}", f)
            else:
                _conv(out, f"{p}fusion_out.{i}", f)
        for i, f in enumerate(params["fusion_skip"]):
            _conv(out, f"{p}fusion_skip.{i}", f)

    if is_d and "res" in params:
        for j, rb in enumerate(params["res"]):
            _ada_res_block(out, f"{p}res.{j}", rb)
    return out


def save_reference_checkpoint(path: str, params, cfg, key: str = "g_ema"):
    """torch.save({key: state_dict}, path) in the reference layout
    (checkpoint/README.md). `params` may be a full VToonify tree, or a
    {'encoder': ...} pretrain subtree — the latter is saved as the bare
    encoder state_dict exactly like the reference's pretrain checkpoints
    (`torch.save({'g_ema': g_ema.encoder.state_dict()})`,
    train_vtoonify_d.py:169-175)."""
    import torch

    sd = export_vtoonify(params, cfg)
    if set(params) == {"encoder"}:
        sd = {k[len("encoder."):]: v for k, v in sd.items()}
    torch.save({key: {k: torch.from_numpy(np.ascontiguousarray(v))
                      for k, v in sd.items()}}, path)
    return path
