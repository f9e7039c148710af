"""Scratch: device-trace train_d_step and dump the top ops by self time."""
import glob
import os

import numpy as np

import jax
import jax.numpy as jnp

from vtoonify_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from vtoonify_tpu.models.bisenet import init_bisenet
from vtoonify_tpu.models.lpips import init_lpips
from vtoonify_tpu.models.psp_encoder import PSPEncoderConfig, init_psp_encoder
from vtoonify_tpu.models.vtoonify import (
    CondDiscriminatorConfig,
    VToonifyConfig,
    init_cond_discriminator,
    init_vtoonify,
)
from vtoonify_tpu.train.steps import (
    TrainDConfig,
    init_train_d_state,
    split_trainable,
    train_d_step,
)

batch = 2
cfg = VToonifyConfig()
ks = jax.random.split(jax.random.PRNGKey(0), 8)
vt_params = init_vtoonify(ks[0], cfg)
parsing_params = init_bisenet(ks[1])
directions = jax.random.normal(ks[2], (4, cfg.n_latent, 512)) * 0.1
style = jax.random.normal(ks[3], (batch, cfg.n_latent, 512)) * 0.3
dcfg = CondDiscriminatorConfig(size=256, channel_multiplier=2,
                               use_condition=True, style_num=4)
d_params = init_cond_discriminator(ks[4], dcfg)
psp_cfg = PSPEncoderConfig(n_styles=cfg.n_latent)
psp_params = init_psp_encoder(ks[5], psp_cfg)
lpips_params = init_lpips(ks[6])
tcfg = TrainDConfig(compute_dtype="bfloat16")

_, frozen = split_trainable(vt_params, pretrain=False)
state = init_train_d_state(vt_params, d_params, batch, cfg, tcfg)
style_ind = jnp.arange(batch) % 4
weights = tuple([0.5] * 7 + [1.0] * (cfg.n_latent - 7))

step_fn = jax.jit(train_d_step, donate_argnums=(0,),
                  static_argnames=("cfg", "dcfg", "tcfg", "psp_cfg"))


def run(state):
    return step_fn(
        state, frozen, parsing_params, psp_params, psp_cfg, None,
        lpips_params, cfg, dcfg, tcfg, directions, style, style_ind,
        jnp.asarray(0.5), weights, jnp.asarray(0.0), jnp.asarray(0.5),
        jnp.asarray(False), ks[7],
    )


state, m = run(state)
jax.block_until_ready(m)
np.asarray(m["d"])  # fence
logdir = "/tmp/jax-trace-step"
jax.profiler.start_trace(logdir)
for _ in range(2):
    state, m = run(state)
np.asarray(m["d"])
jax.profiler.stop_trace()
paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
print("trace files:", paths)
