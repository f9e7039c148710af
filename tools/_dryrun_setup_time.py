"""Per-model timing of _dryrun_setup's zoo init on the virtual CPU mesh."""
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

import __graft_entry__ as g

assert g._force_cpu_mesh(8)
sync = os.environ.get("DRYRUN_SYNC", "1") == "1"
jax.config.update("jax_cpu_enable_async_dispatch", not sync)
print(f"sync_dispatch={sync}", flush=True)

from vtoonify_tpu.models.bisenet import init_bisenet
from vtoonify_tpu.models.lpips import init_lpips
from vtoonify_tpu.models.psp_encoder import PSPEncoderConfig, init_psp_encoder
from vtoonify_tpu.models.vtoonify import (
    CondDiscriminatorConfig, VToonifyConfig,
    init_cond_discriminator, init_vtoonify,
)
from vtoonify_tpu.parallel.mesh import make_mesh, shard_params

cfg = VToonifyConfig(in_size=32, out_size=128, channel_multiplier=1,
                     num_res_layers=2, backbone="dualstylegan")
mesh = make_mesh(8, tp=2)
key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 8)


def t(name, fn):
    t0 = time.time()
    out = fn()
    jax.block_until_ready(out)
    print(f"{name}: {time.time() - t0:.1f}s", flush=True)
    return out


t0 = time.time()
vt = t("init_vtoonify", lambda: init_vtoonify(ks[0], cfg))
bn = t("init_bisenet", lambda: init_bisenet(ks[1]))
t("shard bisenet", lambda: shard_params(bn, mesh))
dcfg = CondDiscriminatorConfig(size=64, channel_multiplier=1,
                               use_condition=True, style_num=4)
t("init_cond_discriminator", lambda: init_cond_discriminator(ks[4], dcfg))
t("init_psp_encoder",
  lambda: init_psp_encoder(ks[5], PSPEncoderConfig(n_styles=cfg.n_latent)))
t("init_lpips", lambda: init_lpips(ks[6]))
print(f"TOTAL: {time.time() - t0:.1f}s", flush=True)
