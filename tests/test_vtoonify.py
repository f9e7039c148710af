"""Parity: DualStyleGAN, VToonify (D & T), ConditionalDiscriminator vs the
reference oracle (converted random-init torch weights)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from tests import reference_oracle as oracle
from vtoonify_tpu.convert.torch_import import (
    convert_cond_discriminator,
    convert_dualstylegan,
    convert_vtoonify,
    flatten_torch_state,
)
from vtoonify_tpu.models.dualstylegan import (
    DualStyleGANConfig,
    dualstylegan_apply,
)
from vtoonify_tpu.models.vtoonify import (
    CondDiscriminatorConfig,
    VToonifyConfig,
    cond_discriminator_apply,
    vtoonify_apply,
    zplus2wplus,
)

oracle.install()
from model.dualstylegan import DualStyleGAN  # noqa: E402
from model.vtoonify import ConditionalDiscriminator, VToonify  # noqa: E402

SIZE = 128
CM = 1


@pytest.fixture(scope="module")
def dsg_pair():
    torch.manual_seed(10)
    ref = DualStyleGAN(SIZE, 512, 8, channel_multiplier=CM).eval()
    cfg = DualStyleGANConfig(size=SIZE, channel_multiplier=CM)
    params = convert_dualstylegan(flatten_torch_state(ref), cfg)
    return ref, cfg, params


def _zero_noise(num_layers, sizes):
    return [torch.zeros(1, 1, s, s) for s in sizes]


def test_dualstylegan_parity(dsg_pair):
    ref, cfg, params = dsg_pair
    rng = np.random.RandomState(11)
    z = rng.randn(2, 512).astype(np.float32)
    ex = rng.randn(2, cfg.n_latent, 512).astype(np.float32)
    weights = [0.7] * 7 + [0.3] * (cfg.n_latent - 7)
    noise_t = [
        getattr(ref.generator.noises, f"noise_{i}")
        for i in range(ref.generator.num_layers)
    ]
    with torch.no_grad():
        img_ref, _ = ref(
            [torch.from_numpy(z)], torch.from_numpy(ex),
            noise=noise_t, use_res=True, interp_weights=weights,
        )
    noise_j = [jnp.asarray(oracle.to_nhwc(n)) for n in noise_t]
    img = dualstylegan_apply(
        params, cfg, [jnp.asarray(z)], jnp.asarray(ex),
        noise=noise_j, use_res=True, interp_weights=weights,
    )
    np.testing.assert_allclose(
        np.asarray(img), oracle.to_nhwc(img_ref), atol=5e-4, rtol=1e-3
    )


def test_dualstylegan_return_feat(dsg_pair):
    ref, cfg, params = dsg_pair
    rng = np.random.RandomState(12)
    zp = rng.randn(1, cfg.n_latent, 512).astype(np.float32)
    ex = rng.randn(1, cfg.n_latent, 512).astype(np.float32)
    noise_t = [
        getattr(ref.generator.noises, f"noise_{i}")
        for i in range(ref.generator.num_layers)
    ]
    ds = 0.5
    with torch.no_grad():
        feat_ref, skip_ref = ref(
            [torch.from_numpy(zp)], torch.from_numpy(ex),
            z_plus_latent=True, noise=noise_t, use_res=True,
            interp_weights=[ds] * cfg.n_latent, return_feat=True,
        )
    noise_j = [jnp.asarray(oracle.to_nhwc(n)) for n in noise_t]
    feat, skip = dualstylegan_apply(
        params, cfg, [jnp.asarray(zp)], jnp.asarray(ex),
        z_plus_latent=True, noise=noise_j, use_res=True,
        interp_weights=[ds] * cfg.n_latent, return_feat=True,
    )
    np.testing.assert_allclose(np.asarray(feat), oracle.to_nhwc(feat_ref),
                               atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(skip), oracle.to_nhwc(skip_ref),
                               atol=5e-4, rtol=1e-3)


@pytest.mark.parametrize("backbone", ["dualstylegan", "toonify"])
def test_vtoonify_parity(backbone):
    torch.manual_seed(20)
    ref = VToonify(in_size=32, out_size=SIZE, channel_multiplier=CM,
                   num_res_layers=2, backbone=backbone).eval()
    cfg = VToonifyConfig(in_size=32, out_size=SIZE, channel_multiplier=CM,
                         num_res_layers=2, backbone=backbone)
    params = convert_vtoonify(flatten_torch_state(ref), cfg)

    rng = np.random.RandomState(21)
    x = rng.randn(2, 32, 32, 22).astype(np.float32)
    style = rng.randn(2, cfg.n_latent, 512).astype(np.float32) * 0.3
    d_s = 0.5
    with torch.no_grad():
        out_ref = ref(oracle.to_nchw(x), torch.from_numpy(style), d_s=d_s)
    out = vtoonify_apply(params, cfg, jnp.asarray(x), jnp.asarray(style),
                         d_s=d_s)
    assert out.shape == (2, SIZE, SIZE, 3)
    np.testing.assert_allclose(
        np.asarray(out), oracle.to_nhwc(out_ref), atol=1e-3, rtol=1e-3
    )


def test_vtoonify_return_feat_and_mask():
    torch.manual_seed(22)
    ref = VToonify(in_size=32, out_size=SIZE, channel_multiplier=CM,
                   num_res_layers=2, backbone="dualstylegan").eval()
    cfg = VToonifyConfig(in_size=32, out_size=SIZE, channel_multiplier=CM,
                         num_res_layers=2, backbone="dualstylegan")
    params = convert_vtoonify(flatten_torch_state(ref), cfg)
    rng = np.random.RandomState(23)
    x = rng.randn(1, 32, 32, 22).astype(np.float32)
    style = rng.randn(1, 512).astype(np.float32)  # 1-D style path
    with torch.no_grad():
        f_ref, s_ref = ref(oracle.to_nchw(x), torch.from_numpy(style),
                           d_s=0.8, return_feat=True)
        img_ref, masks_ref = ref(oracle.to_nchw(x), torch.from_numpy(style),
                                 d_s=0.8, return_mask=True)
    f, s = vtoonify_apply(params, cfg, jnp.asarray(x), jnp.asarray(style),
                          d_s=0.8, return_feat=True)
    np.testing.assert_allclose(np.asarray(f), oracle.to_nhwc(f_ref),
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(s), oracle.to_nhwc(s_ref),
                               atol=1e-3, rtol=1e-3)
    img, masks = vtoonify_apply(params, cfg, jnp.asarray(x),
                                jnp.asarray(style), d_s=0.8, return_mask=True)
    assert len(masks) == len(masks_ref)
    np.testing.assert_allclose(np.asarray(img), oracle.to_nhwc(img_ref),
                               atol=1e-3, rtol=1e-3)
    for m, mr in zip(masks, masks_ref):
        np.testing.assert_allclose(np.asarray(m), oracle.to_nhwc(mr),
                                   atol=1e-4, rtol=1e-3)


def test_zplus2wplus():
    torch.manual_seed(24)
    ref = VToonify(in_size=32, out_size=SIZE, channel_multiplier=CM,
                   num_res_layers=2, backbone="dualstylegan").eval()
    cfg = VToonifyConfig(in_size=32, out_size=SIZE, channel_multiplier=CM,
                         num_res_layers=2, backbone="dualstylegan")
    params = convert_vtoonify(flatten_torch_state(ref), cfg)
    zp = np.random.RandomState(25).randn(1, cfg.n_latent, 512).astype(np.float32)
    with torch.no_grad():
        w_ref = ref.zplus2wplus(torch.from_numpy(zp)).numpy()
    w = np.asarray(zplus2wplus(params, cfg, jnp.asarray(zp)))
    np.testing.assert_allclose(w, w_ref, atol=1e-5, rtol=1e-4)


@pytest.mark.parametrize("use_condition", [False, True])
def test_cond_discriminator_parity(use_condition):
    torch.manual_seed(26)
    size = 64
    ref = ConditionalDiscriminator(size, channel_multiplier=1,
                                   use_condition=use_condition,
                                   style_num=10).eval()
    cfg = CondDiscriminatorConfig(size=size, channel_multiplier=1,
                                  use_condition=use_condition, style_num=10)
    params = convert_cond_discriminator(flatten_torch_state(ref), cfg)
    rng = np.random.RandomState(27)
    x = rng.randn(4, size, size, 3).astype(np.float32)
    deg = rng.rand(4, 1).astype(np.float32)
    sid = np.array([1, 3, 5, 7])
    with torch.no_grad():
        if use_condition:
            out_ref = ref(oracle.to_nchw(x), torch.from_numpy(deg),
                          torch.from_numpy(sid)).numpy()
        else:
            out_ref = ref(oracle.to_nchw(x)).numpy()
    out = np.asarray(
        cond_discriminator_apply(
            params, cfg, jnp.asarray(x),
            degree_label=jnp.asarray(deg) if use_condition else None,
            style_ind=jnp.asarray(sid) if use_condition else None,
        )
    )
    np.testing.assert_allclose(out, out_ref, atol=5e-4, rtol=1e-3)
