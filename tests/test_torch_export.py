"""Exporter (pytree → reference torch checkpoint): value roundtrip through
the importer and STRICT load_state_dict key compatibility with the reference
module — the guarantee that models trained here run in the reference stack."""

import numpy as np
import pytest
import torch

import jax

from tests import reference_oracle as oracle
from vtoonify_tpu.convert.torch_export import (
    export_vtoonify,
    save_reference_checkpoint,
)
from vtoonify_tpu.convert.torch_import import (
    convert_vtoonify,
    flatten_torch_state,
)
from vtoonify_tpu.models.vtoonify import VToonifyConfig, init_vtoonify

oracle.install()
from model.vtoonify import VToonify  # noqa: E402

TINY_D = VToonifyConfig(in_size=32, out_size=128, channel_multiplier=1,
                        num_res_layers=2, backbone="dualstylegan")
TINY_T = VToonifyConfig(in_size=32, out_size=128, channel_multiplier=1,
                        num_res_layers=2, backbone="toonify")


def _tree_allclose(a, b, path=""):
    assert type(a) is type(b) or (
        isinstance(a, (dict,)) and isinstance(b, dict)), path
    if isinstance(a, dict):
        assert set(a) == set(b), (path, set(a) ^ set(b))
        for k in a:
            _tree_allclose(a[k], b[k], f"{path}.{k}")
    elif isinstance(a, (list, tuple)):
        assert len(a) == len(b), path
        for i, (x, y) in enumerate(zip(a, b)):
            _tree_allclose(x, y, f"{path}[{i}]")
    else:
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                                   err_msg=path)


@pytest.mark.parametrize("backbone", ["dualstylegan", "toonify"])
def test_export_roundtrip_and_strict_torch_load(backbone):
    cfg = TINY_D if backbone == "dualstylegan" else TINY_T
    params = init_vtoonify(jax.random.PRNGKey(11), cfg)
    sd = export_vtoonify(params, cfg)

    # (a) exact value roundtrip through the importer
    back = convert_vtoonify(sd, cfg)
    _tree_allclose(back, params)

    # (b) the exported key set IS the reference module's state_dict, strictly
    ref = VToonify(backbone=backbone, in_size=cfg.in_size,
                   out_size=cfg.out_size, channel_multiplier=1,
                   num_res_layers=cfg.num_res_layers)
    ref.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                         for k, v in sd.items()}, strict=True)


def test_export_values_survive_reference_forward():
    """Exported weights drive the reference torch model to the SAME output
    as our model produced with the original params (via the existing parity
    machinery: import(export(params)) == params ⇒ equality holds)."""
    cfg = TINY_D
    params = init_vtoonify(jax.random.PRNGKey(12), cfg)
    sd = export_vtoonify(params, cfg)
    ref = VToonify(backbone="dualstylegan", in_size=cfg.in_size,
                   out_size=cfg.out_size, channel_multiplier=1,
                   num_res_layers=cfg.num_res_layers)
    ref.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                         for k, v in sd.items()}, strict=True)
    # spot-check one leaf straight through torch: modulated conv1 weight
    w_torch = ref.generator.generator.conv1.conv.weight.detach().numpy()[0]
    w_ours = np.transpose(
        np.asarray(params["generator"]["generator"]["conv1"]["conv"]["weight"]),
        (3, 2, 0, 1))
    np.testing.assert_allclose(w_torch, w_ours, rtol=1e-6)


def test_save_reference_checkpoint_layouts(tmp_path):
    cfg = TINY_D
    params = init_vtoonify(jax.random.PRNGKey(13), cfg)

    # full model: {'g_ema': vtoonify_state_dict} loadable by the importer
    full = str(tmp_path / "vtoonify_s_d.pt")
    save_reference_checkpoint(full, params, cfg)
    ck = torch.load(full, map_location="cpu")
    assert set(ck) == {"g_ema"}
    back = convert_vtoonify(flatten_torch_state(ck["g_ema"]), cfg)
    _tree_allclose(back, params)

    # pretrain: bare encoder state_dict (reference train_vtoonify_d.py:169-175)
    pre = str(tmp_path / "pretrain.pt")
    save_reference_checkpoint(pre, {"encoder": params["encoder"]}, cfg)
    ck = torch.load(pre, map_location="cpu")
    assert not any(k.startswith("encoder.") for k in ck["g_ema"])
    ref = VToonify(backbone="dualstylegan", in_size=cfg.in_size,
                   out_size=cfg.out_size, channel_multiplier=1,
                   num_res_layers=cfg.num_res_layers)
    ref.encoder.load_state_dict(ck["g_ema"], strict=True)
