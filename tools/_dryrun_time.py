"""Timing breakdown of the dryrun train_d phase (setup/trace/compile/execute).

Usage: python tools/_dryrun_time.py   (env: DRYRUN_REMAT=0/1, DRYRUN_CROP,
DRYRUN_LPIPS, DRYRUN_PAD override the dryrun tcfg knobs for A/B)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

t0 = time.time()
import __graft_entry__ as g

assert g._force_cpu_mesh(8), "no 8-device CPU mesh"
jax.config.update("jax_cpu_enable_async_dispatch", False)

n_devices = 8

from vtoonify_tpu.parallel.mesh import shard_params
from vtoonify_tpu.train.steps import (
    TrainDConfig,
    init_train_d_state,
    split_trainable,
    train_d_step,
)

t1 = time.time()
print(f"imports: {t1 - t0:.1f}s", flush=True)

s = g._dryrun_setup(n_devices)
tcfg = TrainDConfig(
    crop_size=int(os.environ.get("DRYRUN_CROP", s["tcfg"].crop_size)),
    lpips_size=int(os.environ.get("DRYRUN_LPIPS", s["tcfg"].lpips_size)),
    aug_max_pad=int(os.environ.get("DRYRUN_PAD", s["tcfg"].aug_max_pad)),
    remat=os.environ.get("DRYRUN_REMAT", "1") == "1",
)
print(f"tcfg: crop={tcfg.crop_size} lpips={tcfg.lpips_size} "
      f"pad={tcfg.aug_max_pad} remat={tcfg.remat}", flush=True)
cfg, mesh, tp, batch = s["cfg"], s["mesh"], s["tp"], s["batch"]
t2 = time.time()
print(f"setup (zoo init): {t2 - t1:.1f}s", flush=True)

trainable, frozen = split_trainable(s["vt_params"], pretrain=False)
shapes = jax.eval_shape(
    lambda vp, dp: init_train_d_state(vp, dp, batch=batch, cfg=cfg,
                                      tcfg=tcfg),
    s["vt_params"], s["d_params"])
state = shapes._replace(
    trainable=shard_params(trainable, mesh, tp=tp > 1, min_channels=64),
    ema=shard_params(jax.tree_util.tree_map(np.copy, trainable), mesh,
                     tp=tp > 1, min_channels=64),
    d_params=shard_params(s["d_params"], mesh, tp=tp > 1, min_channels=64),
    g_opt_state=g._np_zeros(shapes.g_opt_state),
    d_opt_state=g._np_zeros(shapes.d_opt_state),
    wc_prev=np.zeros(shapes.wc_prev.shape, np.float32),
    step=np.zeros((), np.int32),
)
frozen_s = shard_params(frozen, mesh, tp=tp > 1, min_channels=64)
step = jax.jit(train_d_step, static_argnames=("cfg", "dcfg", "tcfg",
                                              "psp_cfg"))
args = (
    state, frozen_s, s["parsing_params"], s["psp_params"], s["psp_cfg"],
    None, s["lpips_params"], cfg, s["dcfg"], tcfg,
    s["directions"], s["style"], s["style_ind"],
    jnp.asarray(0.5), tuple([0.5] * 7 + [1.0] * (cfg.n_latent - 7)),
    jnp.asarray(0.0), jnp.asarray(0.5), jnp.asarray(False), s["key"],
)
t3 = time.time()
print(f"state init: {t3 - t2:.1f}s", flush=True)
lowered = step.lower(*args)
t4 = time.time()
print(f"lower (trace): {t4 - t3:.1f}s", flush=True)
compiled = lowered.compile()
t5 = time.time()
print(f"compile: {t5 - t4:.1f}s", flush=True)
dyn = [a for i, a in enumerate(args) if i not in (4, 7, 8, 9)]
if os.environ.get("DRYRUN_PROFILE"):
    with jax.profiler.trace("/tmp/dryrun-trace"):
        out = compiled(*dyn)
        jax.block_until_ready(out)
else:
    out = compiled(*dyn)
    jax.block_until_ready(out)
t6 = time.time()
print(f"execute: {t6 - t5:.1f}s", flush=True)
state2, metrics = out
for k, v in metrics.items():
    assert bool(jnp.isfinite(v)), f"non-finite {k}"
print(f"metrics={ {k: float(v) for k, v in metrics.items()} }")
print(f"TOTAL: {t6 - t0:.1f}s", flush=True)
