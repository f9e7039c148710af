"""Training-step benchmark: seconds/iteration for the two production stages.

Measures the REAL jitted training steps (the exact functions the trainers
drive, `train/steps.py`) at the production 1024px config with random-init
weights on the default backend (one TPU chip here; the CLI shards the same
steps over a dp×tp mesh for multi-chip). Prints ONE JSON line.

Stages:
  * pretrain — stage-1 encoder distillation (`pretrain_step`), reference
    recipe batch 1/GPU × 8 GPUs → we run the global batch on one chip.
  * full     — stage-2 GAN step (`train_d_step`: frozen-G data synthesis,
    D update, G update with adv+rec+LPIPS+mask+temporal, EMA) — three
    full-res G forwards per iteration, remat'd.

Env knobs: TRAIN_BENCH_STAGE (both|pretrain|full), TRAIN_BENCH_BATCH_PRE (8),
TRAIN_BENCH_BATCH_FULL (2), TRAIN_BENCH_BF16 (0; 1 = bfloat16 forwards with
f32 master weights — the --bf16 trainer flag), TRAIN_BENCH_SYNTH_FP32 (0;
1 = keep data synthesis f32, the --synth_fp32 flag), TRAIN_BENCH_REMAT (1;
0 = no rematerialization of the G forwards/LPIPS), TRAIN_BENCH_REMAT_SCOPE
(all|g|lpips — the remat-policy sweep), TRAIN_BENCH_ITERS (4),
TRAIN_BENCH_MFU (0; 1 = XLA cost analysis of each compiled step — FLOPs/iter
and achieved TFLOP/s vs the 197 TFLOP/s bf16 v5e peak).

State is donated exactly as in the CLI, and iterations are serialized by the
state dependency, so per-call dispatch overhead is pipelined away; the first
(compile) iteration is excluded.
"""

import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp


V5E_PEAK_BF16_TFLOPS = 197.0


def _time_steps(run_one, n_iters):
    state = run_one(None)            # first step (the AOT compile already ran)
    jax.block_until_ready(state)
    np.asarray(jax.tree_util.tree_leaves(state)[0])  # relay-safe fence
    t0 = time.perf_counter()
    for _ in range(n_iters):
        state = run_one(state)
    np.asarray(jax.tree_util.tree_leaves(state)[0])
    return (time.perf_counter() - t0) / n_iters


def _compiled_flops(compiled):
    """XLA cost analysis of an already-compiled step: total FLOPs/iter.
    (The step is AOT-compiled ONCE and reused for both the timing loop and
    this analysis — a second lower+compile through the remote-compile relay
    costs minutes and blew the bench's wall budget.)"""
    cost = compiled.cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    return float(cost.get("flops", 0.0))


def bench_pretrain(batch, n_iters, compute_dtype):
    from vtoonify_tpu.models.bisenet import init_bisenet
    from vtoonify_tpu.models.vtoonify import VToonifyConfig, init_vtoonify
    from vtoonify_tpu.train.steps import (
        init_pretrain_state,
        pretrain_step,
        split_trainable,
    )

    cfg = VToonifyConfig()
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    vt_params = init_vtoonify(ks[0], cfg)
    parsing_params = init_bisenet(ks[1])
    directions = jax.random.normal(ks[2], (4, cfg.n_latent, 512)) * 0.1
    style = jax.random.normal(ks[3], (batch, cfg.n_latent, 512)) * 0.3
    _, frozen = split_trainable(vt_params, pretrain=True)
    init_state = init_pretrain_state(vt_params)

    step_fn = jax.jit(pretrain_step, donate_argnums=(0,),
                      static_argnames=("cfg", "lr", "compute_dtype",
                                       "synth_dtype"))
    synth_dtype = ("float32"
                   if os.environ.get("TRAIN_BENCH_SYNTH_FP32", "0") == "1"
                   else None)
    d_s = jnp.asarray(0.5)
    compiled = step_fn.lower(init_state, frozen, parsing_params, cfg,
                             directions, style, d_s, ks[4],
                             compute_dtype=compute_dtype,
                             synth_dtype=synth_dtype).compile()

    def run_one(state):
        state = init_state if state is None else state
        new_state, _ = compiled(state, frozen, parsing_params, directions,
                                style, d_s, ks[4])
        return new_state

    flops = None
    if os.environ.get("TRAIN_BENCH_MFU", "0") == "1":
        flops = _compiled_flops(compiled)
    return _time_steps(run_one, n_iters), flops


def bench_full(batch, n_iters, compute_dtype):
    from vtoonify_tpu.models.bisenet import init_bisenet
    from vtoonify_tpu.models.lpips import init_lpips
    from vtoonify_tpu.models.psp_encoder import (
        PSPEncoderConfig,
        init_psp_encoder,
    )
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
    tcfg = TrainDConfig(
        compute_dtype=compute_dtype,
        synth_dtype=("float32"
                     if os.environ.get("TRAIN_BENCH_SYNTH_FP32", "0") == "1"
                     else None),
        remat=os.environ.get("TRAIN_BENCH_REMAT", "1") == "1",
        remat_scope=os.environ.get("TRAIN_BENCH_REMAT_SCOPE", "all"),
    )

    _, frozen = split_trainable(vt_params, pretrain=False)
    init_state = init_train_d_state(vt_params, d_params, batch, cfg, tcfg)
    style_ind = jnp.arange(batch) % 4
    weights = tuple([0.5] * 7 + [1.0] * (cfg.n_latent - 7))

    step_fn = jax.jit(train_d_step, donate_argnums=(0,),
                      static_argnames=("cfg", "dcfg", "tcfg", "psp_cfg"))
    d_s = jnp.asarray(0.5)
    ramp0, fuse_t = jnp.asarray(0.0), jnp.asarray(0.5)
    jitter = jnp.asarray(False)
    compiled = step_fn.lower(
        init_state, frozen, parsing_params, psp_params, psp_cfg, None,
        lpips_params, cfg, dcfg, tcfg, directions, style, style_ind,
        d_s, weights, ramp0, fuse_t, jitter, ks[7],
    ).compile()

    def run_one(state):
        state = init_state if state is None else state
        new_state, _ = compiled(
            state, frozen, parsing_params, psp_params, None,
            lpips_params, directions, style, style_ind,
            d_s, weights, ramp0, fuse_t, jitter, ks[7],
        )
        return new_state

    flops = None
    if os.environ.get("TRAIN_BENCH_MFU", "0") == "1":
        flops = _compiled_flops(compiled)
    return _time_steps(run_one, n_iters), flops


def main():
    from vtoonify_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    stage = os.environ.get("TRAIN_BENCH_STAGE", "both")
    n_iters = int(os.environ.get("TRAIN_BENCH_ITERS", "4"))
    bf16 = os.environ.get("TRAIN_BENCH_BF16", "0") == "1"
    dtype = "bfloat16" if bf16 else None
    rec = {
        "metric": "training s/iter @1024px (stage1+stage2, "
                  + ("bf16" if bf16 else "f32") + ")",
        "unit": "s/iter",
        "backend": jax.default_backend(),
    }

    if stage in ("both", "pretrain"):
        b = int(os.environ.get("TRAIN_BENCH_BATCH_PRE", "8"))
        s_iter, flops = bench_pretrain(b, n_iters, dtype)
        rec["pretrain_s_per_iter"] = round(s_iter, 4)
        rec["pretrain_batch"] = b
        if flops:
            tfs = flops / s_iter / 1e12
            rec["pretrain_tflops_per_iter"] = round(flops / 1e12, 2)
            rec["pretrain_achieved_tflops"] = round(tfs, 1)
            rec["pretrain_mfu_pct"] = round(100 * tfs / V5E_PEAK_BF16_TFLOPS, 1)
    if stage in ("both", "full"):
        b = int(os.environ.get("TRAIN_BENCH_BATCH_FULL", "2"))
        s_iter, flops = bench_full(b, n_iters, dtype)
        rec["full_s_per_iter"] = round(s_iter, 4)
        rec["full_batch"] = b
        if flops:
            tfs = flops / s_iter / 1e12
            rec["full_tflops_per_iter"] = round(flops / 1e12, 2)
            rec["full_achieved_tflops"] = round(tfs, 1)
            rec["full_mfu_pct"] = round(100 * tfs / V5E_PEAK_BF16_TFLOPS, 1)
    rec["value"] = rec.get("full_s_per_iter", rec.get("pretrain_s_per_iter"))
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
