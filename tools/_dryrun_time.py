"""Timing breakdown of a dryrun phase (setup / lower / compile / execute).

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python tools/_dryrun_time.py train_d
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

phase = sys.argv[1] if len(sys.argv) > 1 else "train_d"
n_devices = 8

from vtoonify_tpu.parallel.mesh import shard_params
from vtoonify_tpu.train.steps import split_trainable

t1 = time.time()
print(f"imports: {t1 - t0:.1f}s", flush=True)

s = g._dryrun_setup(n_devices)
cfg, mesh, tp, batch = s["cfg"], s["mesh"], s["tp"], s["batch"]
t2 = time.time()
print(f"setup (zoo init): {t2 - t1:.1f}s", flush=True)

if phase == "train_d":
    from vtoonify_tpu.train.steps import init_train_d_state, train_d_step

    _, frozen = split_trainable(s["vt_params"], pretrain=False)
    state = g.init_train_d_state(s["vt_params"], s["d_params"], batch=batch,
                                 cfg=cfg, tcfg=s["tcfg"]) \
        if hasattr(g, "init_train_d_state") else None
    state = init_train_d_state(s["vt_params"], s["d_params"], batch=batch,
                               cfg=cfg, tcfg=s["tcfg"])
    state = state._replace(
        trainable=shard_params(state.trainable, mesh, tp=tp > 1),
        d_params=shard_params(state.d_params, mesh, tp=tp > 1),
    )
    frozen = shard_params(frozen, mesh, tp=tp > 1)
    step = jax.jit(train_d_step,
                   static_argnames=("cfg", "dcfg", "tcfg", "psp_cfg"))
    args = (
        state, frozen, s["parsing_params"], s["psp_params"], s["psp_cfg"],
        None, s["lpips_params"], cfg, s["dcfg"], s["tcfg"],
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
    out = compiled(*args)
    jax.block_until_ready(out)
    t6 = time.time()
    print(f"execute: {t6 - t5:.1f}s", flush=True)
    print(f"TOTAL: {t6 - t0:.1f}s", flush=True)
