"""Integration: torch-saved reference-format checkpoints load end to end
(torch.save → utils.checkpoint loaders → working forward)."""

import numpy as np
import torch

import jax.numpy as jnp

from tests import reference_oracle as oracle

oracle.install()
from model.vtoonify import VToonify  # noqa: E402
from model.bisenet.model import BiSeNet  # noqa: E402

from vtoonify_tpu.models.vtoonify import VToonifyConfig, vtoonify_apply
from vtoonify_tpu.utils import checkpoint as ckpt_util


def test_load_reference_vtoonify_and_faceparsing(tmp_path):
    torch.manual_seed(7)
    cfg = VToonifyConfig(in_size=32, out_size=128, channel_multiplier=1,
                         num_res_layers=2, backbone="dualstylegan")
    ref = VToonify(in_size=32, out_size=128, channel_multiplier=1,
                   num_res_layers=2, backbone="dualstylegan").eval()
    vt_path = str(tmp_path / "vtoonify_s_d.pt")
    torch.save({"g_ema": ref.state_dict()}, vt_path)

    bn = BiSeNet(19).eval()
    bn_path = str(tmp_path / "faceparsing.pth")
    torch.save(bn.state_dict(), bn_path)

    # exstyle bank + directions in the reference formats
    rng = np.random.RandomState(8)
    bank = {f"style{i}.png": rng.randn(1, cfg.n_latent, 512).astype(np.float32)
            for i in range(3)}
    np.save(str(tmp_path / "exstyle_code.npy"), bank, allow_pickle=True)
    np.save(str(tmp_path / "directions.npy"),
            rng.randn(4, cfg.n_latent, 512).astype(np.float32))

    # config inference from checkpoint shapes matches the true config
    vt_params, inferred = ckpt_util.load_reference_vtoonify(vt_path)
    assert inferred == cfg
    vt_params, _ = ckpt_util.load_reference_vtoonify(vt_path, cfg)
    bn_params = ckpt_util.load_reference_faceparsing(bn_path)
    loaded_bank, names = ckpt_util.load_exstyle_bank(
        str(tmp_path / "exstyle_code.npy"))
    dirs = ckpt_util.load_directions(str(tmp_path / "directions.npy"))
    assert len(names) == 3 and dirs.shape[0] == 4

    # loaded params drive a forward that matches the torch model
    x = rng.randn(1, 32, 32, 22).astype(np.float32)
    style = rng.randn(1, cfg.n_latent, 512).astype(np.float32) * 0.3
    with torch.no_grad():
        ref_out = ref(oracle.to_nchw(x), torch.from_numpy(style), d_s=0.5)
    out = vtoonify_apply(vt_params, cfg, jnp.asarray(x), jnp.asarray(style),
                         d_s=0.5)
    np.testing.assert_allclose(np.asarray(out), oracle.to_nhwc(ref_out),
                               atol=1e-3, rtol=1e-3)

    from vtoonify_tpu.models.bisenet import bisenet_apply

    p = bisenet_apply(bn_params, jnp.asarray(
        rng.randn(1, 64, 64, 3).astype(np.float32)))
    assert p.shape == (1, 64, 64, 19)


def test_too_many_res_layers_rejected(tmp_path):
    """num_res_layers > 6 dualstylegan checkpoints are rejected up front:
    the reference's own forward crashes on them (its `self.res` ModuleList
    is always 7 entries — model/vtoonify.py:203-209,236-239)."""
    import pytest

    torch.manual_seed(9)
    ref = VToonify(in_size=32, out_size=128, channel_multiplier=1,
                   num_res_layers=7, backbone="dualstylegan").eval()
    vt_path = str(tmp_path / "vtoonify_bad.pt")
    torch.save({"g_ema": ref.state_dict()}, vt_path)
    with pytest.raises(ValueError, match="at most 6"):
        ckpt_util.load_reference_vtoonify(vt_path)
