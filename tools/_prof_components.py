"""Chained/fenced per-component timing of the stage-2 step: data synthesis
(w sampling + G + pSp + BiSeNet + augment), D update, G update."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from vtoonify_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

from vtoonify_tpu.models.bisenet import init_bisenet
from vtoonify_tpu.models.lpips import init_lpips
from vtoonify_tpu.models.psp_encoder import PSPEncoderConfig, init_psp_encoder
from vtoonify_tpu.models.vtoonify import (CondDiscriminatorConfig, VToonifyConfig,
                                          init_cond_discriminator, init_vtoonify)
from vtoonify_tpu.train import synth
from vtoonify_tpu.train.steps import (TrainDConfig, init_train_d_state,
                                      split_trainable, train_d_step)

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
weights = tuple([0.5] * 7 + [1.0] * (cfg.n_latent - 7))

def timeit(name, fn, x0, iters=4):
    x = fn(x0)
    jax.block_until_ready(x)
    np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0]
    t0 = time.perf_counter()
    for _ in range(iters):
        x = fn(x)
    np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0]
    print(f"{name}: {(time.perf_counter()-t0)/iters*1e3:.1f} ms", flush=True)

# synth only (keyed on a carried key so iterations chain)
@jax.jit
def synth_only(k):
    k, sub = jax.random.split(k)
    data = synth.synth_train_batch(
        sub, vt_params, cfg, parsing_params, psp_params, psp_cfg, None,
        directions, style, jnp.asarray(0.5), list(weights), style,
        jnp.asarray(0.5), jnp.asarray(False))
    return k + jnp.int32(jnp.sum(data["real_input"][0, 0, 0]) * 0).astype(jnp.uint32)

try:
    timeit("synth(total)", synth_only, jax.random.PRNGKey(1))
except Exception as e:
    print("synth sig mismatch:", type(e).__name__, str(e)[:300])

# full step for reference
state = init_train_d_state(vt_params, d_params, batch, cfg, tcfg)
step_fn = jax.jit(train_d_step, donate_argnums=(0,),
                  static_argnames=("cfg", "dcfg", "tcfg", "psp_cfg"))
def full(state):
    state, m = step_fn(state, frozen, parsing_params, psp_params, psp_cfg, None,
                       lpips_params, cfg, dcfg, tcfg, directions, style,
                       jnp.arange(batch) % 4, jnp.asarray(0.5), weights,
                       jnp.asarray(0.0), jnp.asarray(0.5), jnp.asarray(False), ks[7])
    return state
timeit("full step", full, state, iters=3)
