"""Model-level parity: StyleGAN2 generator/discriminator vs the reference
(random-init torch modules converted through vtoonify_tpu.convert — the same
path real pretrained checkpoints take). SURVEY.md §4 gap-fill, item (b)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from tests import reference_oracle as oracle
from vtoonify_tpu.convert.torch_import import (
    convert_discriminator,
    convert_generator,
    flatten_torch_state,
)
from vtoonify_tpu.models.generator import (
    DiscriminatorConfig,
    GeneratorConfig,
    discriminator_apply,
    generate,
    init_generator,
    make_noise,
    style_mlp,
    styles_to_latent,
    generator_apply,
)

oracle.install()
from model.stylegan.model import Discriminator, Generator  # noqa: E402

SIZE, STYLE_DIM, N_MLP, CM = 64, 32, 2, 1


@pytest.fixture(scope="module")
def gen_pair():
    torch.manual_seed(0)
    ref = Generator(SIZE, STYLE_DIM, N_MLP, channel_multiplier=CM).eval()
    cfg = GeneratorConfig(size=SIZE, style_dim=STYLE_DIM, n_mlp=N_MLP,
                          channel_multiplier=CM)
    params = convert_generator(flatten_torch_state(ref), cfg)
    return ref, cfg, params


def fixed_noise(ref):
    return [getattr(ref.noises, f"noise_{i}") for i in range(ref.num_layers)]


def test_style_mlp_parity(gen_pair):
    ref, cfg, params = gen_pair
    z = np.random.RandomState(1).randn(4, STYLE_DIM).astype(np.float32)
    ours = np.asarray(style_mlp(params, cfg, jnp.asarray(z)))
    with torch.no_grad():
        theirs = ref.style(torch.from_numpy(z)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5, rtol=1e-4)


def test_generator_w_parity(gen_pair):
    ref, cfg, params = gen_pair
    rng = np.random.RandomState(2)
    w = rng.randn(2, STYLE_DIM).astype(np.float32) * 0.1
    noise_t = fixed_noise(ref)
    with torch.no_grad():
        img_ref, _ = ref([torch.from_numpy(w)], input_is_latent=True,
                         noise=noise_t)
    noise_j = [jnp.asarray(oracle.to_nhwc(n)) for n in noise_t]
    img = generate(params, cfg, [jnp.asarray(w)], input_is_latent=True,
                   noise=noise_j)
    np.testing.assert_allclose(
        np.asarray(img), oracle.to_nhwc(img_ref), atol=2e-4, rtol=1e-3
    )


def test_generator_zplus_truncation_parity(gen_pair):
    ref, cfg, params = gen_pair
    rng = np.random.RandomState(3)
    zp = rng.randn(2, cfg.n_latent, STYLE_DIM).astype(np.float32)
    trunc_lat = rng.randn(1, STYLE_DIM).astype(np.float32) * 0.05
    noise_t = fixed_noise(ref)
    with torch.no_grad():
        img_ref, _ = ref([torch.from_numpy(zp)], z_plus_latent=True,
                         truncation=0.5,
                         truncation_latent=torch.from_numpy(trunc_lat),
                         noise=noise_t)
    noise_j = [jnp.asarray(oracle.to_nhwc(n)) for n in noise_t]
    img = generate(params, cfg, [jnp.asarray(zp)], z_plus_latent=True,
                   truncation=0.5, truncation_latent=jnp.asarray(trunc_lat),
                   noise=noise_j)
    np.testing.assert_allclose(
        np.asarray(img), oracle.to_nhwc(img_ref), atol=2e-4, rtol=1e-3
    )


def test_generator_early_exit(gen_pair):
    ref, cfg, params = gen_pair
    rng = np.random.RandomState(4)
    w = rng.randn(1, STYLE_DIM).astype(np.float32) * 0.1
    noise_t = fixed_noise(ref)
    with torch.no_grad():
        feat_ref, skip_ref = ref([torch.from_numpy(w)], input_is_latent=True,
                                 noise=noise_t, return_feature_ind=3)
    noise_j = [jnp.asarray(oracle.to_nhwc(n)) for n in noise_t]
    latent = styles_to_latent(params, cfg, [jnp.asarray(w)],
                              input_is_latent=True)
    feat, skip = generator_apply(params, cfg, latent, noise=noise_j,
                                 return_feature_ind=3)
    np.testing.assert_allclose(np.asarray(feat), oracle.to_nhwc(feat_ref),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(skip), oracle.to_nhwc(skip_ref),
                               atol=2e-4, rtol=1e-3)


def test_discriminator_parity():
    torch.manual_seed(5)
    size = 64
    ref = Discriminator(size, channel_multiplier=1).eval()
    cfg = DiscriminatorConfig(size=size, channel_multiplier=1)
    params = convert_discriminator(flatten_torch_state(ref), cfg)
    x = np.random.RandomState(6).randn(4, size, size, 3).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(oracle.to_nchw(x)).numpy()
    out = np.asarray(discriminator_apply(params, cfg, jnp.asarray(x)))
    np.testing.assert_allclose(out, out_ref, atol=5e-4, rtol=1e-3)


def test_generator_packed_stages_match_unpacked():
    """Packed (space-to-depth) execution of the narrow-channel stages — now
    incl. per-phase noise injection — is exact vs the plain per-stage path,
    for both the plain generator and DualStyleGAN (ModRes-free stages)."""
    import jax

    from vtoonify_tpu.models.dualstylegan import (
        DualStyleGANConfig,
        dualstylegan_apply,
        init_dualstylegan,
    )

    gcfg = GeneratorConfig(size=128, channel_multiplier=1)
    gp = init_generator(jax.random.PRNGKey(0), gcfg)
    b = 2
    lat = jax.random.normal(jax.random.PRNGKey(1),
                            (b, gcfg.n_latent, 512)) * 0.3
    noise = make_noise(gp, gcfg, jax.random.PRNGKey(2), randomize=True,
                       batch=b)
    a = np.asarray(generator_apply(gp, gcfg, lat, noise=noise, packed=True))
    u = np.asarray(generator_apply(gp, gcfg, lat, noise=noise, packed=False))
    np.testing.assert_allclose(a, u, atol=2e-5)

    dcfg = DualStyleGANConfig(size=128, channel_multiplier=1)
    dp = init_dualstylegan(jax.random.PRNGKey(3), dcfg)
    ex = jax.random.normal(jax.random.PRNGKey(4),
                           (b, dcfg.generator.n_latent, 512)) * 0.3
    for use_res in (True, False):
        kw = dict(input_is_latent=True, noise=noise, use_res=use_res,
                  interp_weights=[0.7] * dcfg.generator.n_latent)
        ap = np.asarray(dualstylegan_apply(dp, dcfg, [0.5 * lat], ex,
                                           packed=True, **kw))
        up = np.asarray(dualstylegan_apply(dp, dcfg, [0.5 * lat], ex,
                                           packed=False, **kw))
        np.testing.assert_allclose(ap, up, atol=2e-5)


def test_channel_max_caps_table_and_params():
    # channel_max (the standard StyleGAN2 knob; reference hardcodes 512 —
    # model.py:422-432) caps every table entry and every conv width, with
    # the default leaving the reference table untouched.
    from vtoonify_tpu.models.generator import channel_table

    assert channel_table(2) == channel_table(2, channel_max=512)
    capped = channel_table(1, channel_max=128)
    assert max(capped.values()) == 128
    assert capped[256] == 64  # entries under the cap are unchanged

    import jax

    cfg_small = GeneratorConfig(size=64, channel_multiplier=1,
                                channel_max=128)
    params = init_generator(jax.random.PRNGKey(0), cfg_small)
    widths = {
        a.shape[-1]
        for a in jax.tree_util.tree_leaves(params)
        if hasattr(a, "ndim") and a.ndim == 4
    }
    assert max(widths) <= 128
    out = generate(params, cfg_small,
                   [jax.random.normal(jax.random.PRNGKey(1), (1, 512))])
    assert out.shape == (1, 64, 64, 3)
