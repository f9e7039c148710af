"""Parity: pSp GradualStyleEncoder (IR-SE-50) and BiSeNet vs the reference."""

from argparse import Namespace

import numpy as np
import torch

import jax.numpy as jnp

from tests import reference_oracle as oracle
from vtoonify_tpu.convert.torch_import import (
    convert_bisenet,
    convert_psp_encoder,
    flatten_torch_state,
)
from vtoonify_tpu.models.bisenet import bisenet_apply, init_bisenet
from vtoonify_tpu.models.psp_encoder import (
    PSPEncoderConfig,
    init_psp_encoder,
    psp_encoder_apply,
)

oracle.install()
from model.encoder.encoders.psp_encoders import GradualStyleEncoder  # noqa: E402
from model.bisenet.model import BiSeNet  # noqa: E402


def test_psp_encoder_parity():
    torch.manual_seed(30)
    opts = Namespace(input_nc=3, n_styles=18)
    ref = GradualStyleEncoder(50, "ir_se", opts).eval()
    cfg = PSPEncoderConfig()
    params = convert_psp_encoder(flatten_torch_state(ref), cfg)

    x = np.random.RandomState(31).randn(1, 256, 256, 3).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(oracle.to_nchw(x)).numpy()
    out = np.asarray(psp_encoder_apply(params, cfg, jnp.asarray(x)))
    assert out.shape == (1, 18, 512)
    np.testing.assert_allclose(out, ref_out, atol=2e-3, rtol=1e-3)

    # latent_avg hook behavior (util.py:157-160) — real pSp checkpoints store
    # latent_avg as (n_styles, 512)
    avg = np.random.RandomState(32).randn(18, 512).astype(np.float32)
    out2 = np.asarray(
        psp_encoder_apply(params, cfg, jnp.asarray(x), latent_avg=jnp.asarray(avg))
    )
    assert out2.shape == (1, 18, 512)
    np.testing.assert_allclose(out2, ref_out + avg[None], atol=2e-3, rtol=1e-3)


def test_psp_init_structure_matches():
    import jax

    cfg = PSPEncoderConfig()
    params = init_psp_encoder(jax.random.PRNGKey(0), cfg)
    assert len(params["body"]) == 24
    assert len(params["styles"]) == 18
    x = jnp.zeros((1, 256, 256, 3), jnp.float32)
    out = psp_encoder_apply(params, cfg, x)
    assert out.shape == (1, 18, 512)


def test_bisenet_parity():
    torch.manual_seed(33)
    ref = BiSeNet(19).eval()
    params = convert_bisenet(flatten_torch_state(ref))
    x = np.random.RandomState(34).randn(1, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        r0, r16, r32 = ref(oracle.to_nchw(x))
    o0, o16, o32 = bisenet_apply(params, jnp.asarray(x), heads=3)
    np.testing.assert_allclose(np.asarray(o0), oracle.to_nhwc(r0), atol=2e-3,
                               rtol=1e-3)
    np.testing.assert_allclose(np.asarray(o16), oracle.to_nhwc(r16), atol=2e-3,
                               rtol=1e-3)
    np.testing.assert_allclose(np.asarray(o32), oracle.to_nhwc(r32), atol=2e-3,
                               rtol=1e-3)


def test_bisenet_init_smoke():
    import jax

    params = init_bisenet(jax.random.PRNGKey(1))
    out = bisenet_apply(params, jnp.zeros((1, 64, 64, 3)))
    assert out.shape == (1, 64, 64, 19)
