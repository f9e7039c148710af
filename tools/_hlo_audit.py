"""Diagnostic: AOT-compile the dryrun phases on a virtual 8-device CPU mesh
and report the collective inventory of each compiled module (no execution —
safe on hosts with fewer cores than rendezvous participants).

Usage: PYTHONPATH="$PWD:$PYTHONPATH" python tools/_hlo_audit.py [phase ...]   phases: d, t
(the same inventory is guarded in-suite by tests/test_sharding.py::
test_hlo_collectives_{train_d,train_t,inference} — the inference audit covers
the dp×tp and sp frame graphs there)
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

# The environment's sitecustomize may have pinned a hardware platform.
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from vtoonify_tpu.parallel.audit import collective_counts, collective_lines  # noqa: E402


def main():
    phases = sys.argv[1:] or ["t"]
    unknown = set(phases) - {"d", "t"}
    if unknown:
        raise SystemExit(f"unknown phase(s) {sorted(unknown)}; "
                         "supported: d, t (see module docstring)")
    n_devices = 8

    from vtoonify_tpu.models.bisenet import init_bisenet
    from vtoonify_tpu.models.lpips import init_lpips
    from vtoonify_tpu.models.psp_encoder import PSPEncoderConfig, init_psp_encoder
    from vtoonify_tpu.models.vtoonify import (
        CondDiscriminatorConfig, VToonifyConfig,
        init_cond_discriminator, init_vtoonify,
    )
    from vtoonify_tpu.parallel.mesh import (
        make_mesh, shard_array_batch, shard_params,
    )
    from vtoonify_tpu.train.steps import (
        TrainDConfig, init_train_d_state, split_trainable, train_d_step,
    )

    cfg = VToonifyConfig(in_size=32, out_size=128, channel_multiplier=1,
                         num_res_layers=2, backbone="dualstylegan")
    tp = 2
    mesh = make_mesh(n_devices, tp=tp)
    batch = n_devices // tp

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    parsing_params = shard_params(init_bisenet(ks[1]), mesh)
    directions = jax.random.normal(ks[2], (4, cfg.n_latent, 512)) * 0.1
    styles = jax.random.normal(ks[3], (4, cfg.n_latent, 512)) * 0.3
    psp_cfg = PSPEncoderConfig(n_styles=cfg.n_latent)
    psp_params = init_psp_encoder(ks[5], psp_cfg)
    lpips_params = init_lpips(ks[6])
    tcfg = TrainDConfig(crop_size=96, lpips_size=64, aug_max_pad=40)

    def report(name, lowered):
        compiled = lowered.compile()
        text = compiled.as_text()
        counts = collective_counts(text)
        print(f"=== {name}: {counts}", flush=True)
        for op in ("all-to-all", "all-gather", "reduce-scatter"):
            for line in collective_lines(text, op)[:12]:
                print(f"  [{op}] {line[:400]}", flush=True)

    if "d" in phases:
        vt_params = init_vtoonify(ks[0], cfg)
        dcfg = CondDiscriminatorConfig(size=64, channel_multiplier=1,
                                       use_condition=True, style_num=4)
        d_params = init_cond_discriminator(ks[4], dcfg)
        _, frozen = split_trainable(vt_params, pretrain=False)
        state = init_train_d_state(vt_params, d_params, batch=batch, cfg=cfg,
                                   tcfg=tcfg)
        state = state._replace(
            trainable=shard_params(state.trainable, mesh, tp=True),
            d_params=shard_params(state.d_params, mesh, tp=True),
        )
        frozen = shard_params(frozen, mesh, tp=True)
        idx = np.arange(batch) % styles.shape[0]
        style_ind = shard_array_batch(jnp.asarray(idx), mesh)
        style = shard_array_batch(styles[jnp.asarray(idx)], mesh)
        low = jax.jit(train_d_step,
                      static_argnames=("cfg", "dcfg", "tcfg", "psp_cfg")).lower(
            state, frozen, parsing_params, psp_params, psp_cfg, None,
            lpips_params, cfg, dcfg, tcfg, directions, style, style_ind,
            jnp.asarray(0.5), tuple([0.5] * 7 + [1.0] * (cfg.n_latent - 7)),
            jnp.asarray(0.0), jnp.asarray(0.5), jnp.asarray(False), ks[7],
        )
        report("train_d_step dp4xtp2", low)

    if "t" in phases:
        from vtoonify_tpu.models.generator import init_generator
        from vtoonify_tpu.train.steps import init_train_t_state, train_t_step

        cfg_t = VToonifyConfig(in_size=32, out_size=128, channel_multiplier=1,
                               num_res_layers=2, backbone="toonify")
        kt = jax.random.split(jax.random.PRNGKey(1), 4)
        vt_t = init_vtoonify(kt[0], cfg_t)
        base_t = shard_params(init_generator(kt[1], cfg_t.generator), mesh,
                              tp=True)
        dcfg_t = CondDiscriminatorConfig(size=64, channel_multiplier=1,
                                         use_condition=False)
        d_t = init_cond_discriminator(kt[2], dcfg_t)
        _, frozen_t = split_trainable(vt_t, pretrain=False)
        frozen_t = shard_params(frozen_t, mesh, tp=True)
        tstate = init_train_t_state(vt_t, d_t, tcfg)
        tstate = tstate._replace(
            trainable=shard_params(tstate.trainable, mesh, tp=True),
            d_params=shard_params(tstate.d_params, mesh, tp=True),
        )
        low = jax.jit(train_t_step,
                      static_argnames=("cfg", "dcfg", "tcfg", "psp_cfg",
                                       "batch")).lower(
            tstate, frozen_t, base_t, parsing_params, psp_params, psp_cfg,
            None, lpips_params, cfg_t, dcfg_t, tcfg, directions, batch,
            jnp.asarray(0.5), kt[3],
        )
        report("train_t_step dp4xtp2", low)


if __name__ == "__main__":
    main()
