"""VToonify-T path: model blending parity + T pretrain/train step smoke."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests import reference_oracle as oracle
from vtoonify_tpu.convert.torch_import import (
    convert_generator,
    flatten_torch_state,
)
from vtoonify_tpu.models.generator import GeneratorConfig, generate
from vtoonify_tpu.models.vtoonify import (
    CondDiscriminatorConfig,
    VToonifyConfig,
    init_cond_discriminator,
    init_vtoonify,
)
from vtoonify_tpu.utils.blend import blend_generators

oracle.install()
from model.stylegan.model import Generator  # noqa: E402

SIZE, STYLE_DIM, N_MLP, CM = 64, 32, 2, 1


def test_blend_models_parity():
    import sys

    sys.path.insert(0, "/root/reference")
    from util import blend_models as ref_blend

    torch.manual_seed(70)
    g_low = Generator(SIZE, STYLE_DIM, N_MLP, channel_multiplier=CM)
    g_high = Generator(SIZE, STYLE_DIM, N_MLP, channel_multiplier=CM)
    cfg = GeneratorConfig(size=SIZE, style_dim=STYLE_DIM, n_mlp=N_MLP,
                          channel_multiplier=CM)
    n_layer = cfg.n_latent
    weight = [1] * 4 + [0.5] * 2 + [0] * (18 - 6)

    fused_sd = ref_blend(g_low, g_high, weight)
    ref_params = convert_generator(
        {k: v.detach().numpy() for k, v in fused_sd.items()}, cfg
    )

    ours = blend_generators(
        convert_generator(flatten_torch_state(g_low), cfg),
        convert_generator(flatten_torch_state(g_high), cfg),
        weight,
    )
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(ours),
        jax.tree_util.tree_leaves_with_path(ref_params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6,
                                   err_msg=str(pa))


TINY_T = VToonifyConfig(in_size=32, out_size=128, channel_multiplier=1,
                        num_res_layers=2, backbone="toonify")


@pytest.fixture(scope="module")
def tiny_t_bundle():
    from vtoonify_tpu.models.bisenet import init_bisenet
    from vtoonify_tpu.models.generator import init_generator

    key = jax.random.PRNGKey(80)
    ks = jax.random.split(key, 4)
    vt_params = init_vtoonify(ks[0], TINY_T)
    base_params = init_generator(ks[1], TINY_T.generator)
    parsing_params = init_bisenet(ks[2])
    directions = jax.random.normal(ks[3], (4, TINY_T.n_latent, 512)) * 0.1
    return vt_params, base_params, parsing_params, directions


def test_pretrain_t_step(tiny_t_bundle):
    from vtoonify_tpu.train.steps import (
        init_pretrain_state,
        pretrain_t_step,
        split_trainable,
    )

    vt_params, base_params, parsing_params, directions = tiny_t_bundle
    _, frozen = split_trainable(vt_params, pretrain=True)
    state = init_pretrain_state(vt_params)
    step = jax.jit(pretrain_t_step, static_argnames=("cfg", "batch", "lr"))
    state, metrics = step(state, frozen, base_params, parsing_params, TINY_T,
                          directions, 2, jax.random.PRNGKey(81))
    assert np.isfinite(float(metrics["emse"]))
    assert int(state.step) == 1


def test_train_t_step(tiny_t_bundle):
    from vtoonify_tpu.models.lpips import init_lpips
    from vtoonify_tpu.models.psp_encoder import (
        PSPEncoderConfig,
        init_psp_encoder,
    )
    from vtoonify_tpu.train.steps import (
        TrainDConfig,
        init_train_t_state,
        split_trainable,
        train_t_step,
    )

    vt_params, base_params, parsing_params, directions = tiny_t_bundle
    ks = jax.random.split(jax.random.PRNGKey(82), 4)
    dcfg = CondDiscriminatorConfig(size=64, channel_multiplier=1,
                                   use_condition=False)
    d_params = init_cond_discriminator(ks[0], dcfg)
    psp_cfg = PSPEncoderConfig(n_styles=TINY_T.n_latent)
    psp_params = init_psp_encoder(ks[1], psp_cfg)
    lpips_params = init_lpips(ks[2])
    tcfg = TrainDConfig(crop_size=96, lpips_size=64, aug_max_pad=40)

    _, frozen = split_trainable(vt_params, pretrain=False)
    state = init_train_t_state(vt_params, d_params, tcfg)
    step = jax.jit(
        train_t_step,
        static_argnames=("cfg", "dcfg", "tcfg", "psp_cfg", "batch"),
    )
    state2, metrics = step(
        state, frozen, base_params, parsing_params, psp_params, psp_cfg,
        None, lpips_params, TINY_T, dcfg, tcfg, directions, 2,
        jnp.asarray(0.5), ks[3],
    )
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    assert int(state2.step) == 1
