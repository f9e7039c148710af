"""Checkpointing: Orbax for native state, converters for reference artifacts.

Improves on the reference (SURVEY.md §5.4, where only EMA weights are saved
and resume is approximate): `save_train_state`/`load_train_state` persist the
FULL state — params, EMA, both optimizer states, step and RNG — so resume is
exact. `load_reference_*` functions ingest the PyTorch artifact zoo
(vtoonify_*.pt, generator.pt, encoder.pt, faceparsing.pth, exstyle_code.npy,
directions.npy) via vtoonify_tpu.convert (torch is imported lazily and only
for those).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


def save_pytree(path: str, tree) -> None:
    ocp = _ocp()
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, tree, force=True)


def load_pytree(path: str, target=None):
    ocp = _ocp()
    ckptr = ocp.PyTreeCheckpointer()
    if target is not None:
        return ckptr.restore(os.path.abspath(path), item=target)
    return ckptr.restore(os.path.abspath(path))


def save_train_state(path: str, state) -> None:
    """Persist a PretrainState/TrainDState/TrainTState NamedTuple exactly."""
    save_pytree(path, state._asdict())


def load_train_state(path: str, template):
    restored = load_pytree(path, target=template._asdict())
    return type(template)(**restored)


# --- reference-format loaders (torch dev-dependency) -------------------------


def _torch_load(path):
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)


def _flat(sd):
    from vtoonify_tpu.convert.torch_import import flatten_torch_state

    return flatten_torch_state(sd)


def load_reference_vtoonify(path: str, cfg):
    """vtoonify_*.pt ({'g_ema': state_dict}) → params."""
    from vtoonify_tpu.convert.torch_import import convert_vtoonify

    ckpt = _torch_load(path)
    sd = ckpt.get("g_ema", ckpt)
    return convert_vtoonify(_flat(sd), cfg)


def load_reference_dualstylegan(path: str, cfg):
    """generator.pt ({'g_ema': state_dict}) → DualStyleGAN params."""
    from vtoonify_tpu.convert.torch_import import convert_dualstylegan

    ckpt = _torch_load(path)
    sd = ckpt.get("g_ema", ckpt)
    return convert_dualstylegan(_flat(sd), cfg)


def load_reference_stylegan(path: str, cfg):
    from vtoonify_tpu.convert.torch_import import convert_generator

    ckpt = _torch_load(path)
    sd = ckpt.get("g_ema", ckpt)
    return convert_generator(_flat(sd), cfg)


def load_reference_faceparsing(path: str):
    from vtoonify_tpu.convert.torch_import import convert_bisenet

    return convert_bisenet(_flat(_torch_load(path)))


def load_reference_psp(path: str, cfg=None):
    """encoder.pt (pSp ckpt with state_dict + latent_avg) → (params,
    latent_avg)."""
    from vtoonify_tpu.convert.torch_import import load_psp_standalone
    from vtoonify_tpu.models.psp_encoder import PSPEncoderConfig

    ckpt = _torch_load(path)
    sd = _flat(ckpt["state_dict"])
    return load_psp_standalone(
        {"state_dict": sd, "latent_avg": np.asarray(ckpt["latent_avg"])},
        cfg or PSPEncoderConfig(),
    )


def load_exstyle_bank(path: str):
    """exstyle_code.npy → ({name: (1, 18, 512) z+ code}, ordered names)."""
    bank = np.load(path, allow_pickle=True).item()
    names = list(bank.keys())
    return {k: np.asarray(v) for k, v in bank.items()}, names


def load_directions(path: str):
    return np.asarray(np.load(path))
