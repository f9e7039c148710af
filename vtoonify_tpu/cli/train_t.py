"""VToonify-T trainer CLI — option-parity with reference
train_vtoonify_t.py:37-75: layer-wise model blending of the FFHQ base and a
style-finetuned StyleGAN builds the frozen G1, then encoder distillation
(--pretrain) and full training with an unconditional discriminator.
"""

from __future__ import annotations

import argparse
import functools
import os
import time

import numpy as np

# per-style blend-weight recipes (reference train_vtoonify_t.py:30-35)
STYLE_BLEND_WEIGHTS = {
    "cartoon": [0.75] * 7 + [1] * 11,
    "caricature": [0.75] * 7 + [1] * 11,
    "arcane": [0.75] * 7 + [1] * 11,
    "comic": [1] * 7 + [1] * 11,
    "pixar": [1] * 7 + [1] * 11,
    "illustration": [0.5] * 7 + [1] * 11,
}


def build_parser():
    p = argparse.ArgumentParser(description="Train VToonify-T (TPU-native)")
    p.add_argument("--iter", type=int, default=2000)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--start_iter", type=int, default=0)
    p.add_argument("--save_every", type=int, default=30000)
    p.add_argument("--save_begin", type=int, default=30000)
    p.add_argument("--log_every", type=int, default=200)

    p.add_argument("--adv_loss", type=float, default=0.01)
    p.add_argument("--grec_loss", type=float, default=0.1)
    p.add_argument("--perc_loss", type=float, default=0.01)
    p.add_argument("--tmp_loss", type=float, default=1.0)

    p.add_argument("--encoder_path", type=str, default=None)
    p.add_argument("--direction_path", type=str,
                   default="./checkpoint/directions.npy")
    p.add_argument("--stylegan_path", type=str,
                   default="./checkpoint/stylegan2-ffhq-config-f.pt",
                   help="FFHQ base StyleGAN (G0)")
    p.add_argument("--finetunegan_path", type=str,
                   default="./checkpoint/cartoon/finetune-000600.pt",
                   help="style-finetuned StyleGAN")
    p.add_argument("--weight", type=float, nargs="+",
                   default=[1] * 7 + [0] * 11,
                   help="layer-wise blending weights (18 at the production "
                        "1024px config — reference train_vtoonify_t.py:59; "
                        "n_latent entries generally, truncated if longer)")
    p.add_argument("--faceparsing_path", type=str,
                   default="./checkpoint/faceparsing.pth")
    p.add_argument("--style_encoder_path", type=str,
                   default="./checkpoint/encoder.pt")
    p.add_argument("--vgg_path", type=str, default=None)
    p.add_argument("--lpips_lin_path", type=str, default=None)
    p.add_argument("--allow_random_lpips", action="store_true",
                   help="explicitly allow a randomly-initialized LPIPS net "
                        "when --vgg_path is absent (tests/smoke only)")

    p.add_argument("--name", type=str, default="vtoonify_t_cartoon")
    p.add_argument("--pretrain", action="store_true")
    p.add_argument("--tiny", action="store_true",
                   help="32->128 debug config (tests/smoke)")
    p.add_argument("--tp", type=int, default=1)
    p.add_argument("--multihost", action="store_true")
    p.add_argument("--coordinator", type=str, default=None,
                   help="host:port of process 0 (multi-host manual launch; "
                        "defaults to VTOONIFY_COORDINATOR or auto-detect)")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--local_rank", type=int, default=0,
                   help="accepted for reference launch-script compatibility "
                        "(train_vtoonify_t.py:44); ignored — all local chips "
                        "are used automatically, pods use --multihost")
    p.add_argument("--resume", action="store_true",
                   help="exact resume from the last full train state "
                        "(params+EMA+optimizers+step; reference resume is "
                        "approximate --start_iter only)")
    p.add_argument("--debug_nans", action="store_true",
                   help="fail at the first NaN-producing primitive "
                        "(jax_debug_nans; slow, debug only)")
    p.add_argument("--profile", type=int, default=0, metavar="N",
                   help="capture an XLA device trace of N steps (written to "
                        "log/NAME/trace)")
    p.add_argument("--export_pt", action="store_true",
                   help="also save reference-format torch .pt checkpoints "
                        "(loadable by the reference style_transfer.py/demo) "
                        "alongside the Orbax pytrees")
    p.add_argument("--bf16", action="store_true",
                   help="run the student/D/LPIPS forwards AND the frozen-"
                        "teacher data synthesis in bfloat16 (float32 master "
                        "weights, optimizer state and loss arithmetic) — "
                        "halves activation HBM, MXU-native")
    p.add_argument("--synth_fp32", action="store_true",
                   help="with --bf16: keep the frozen-teacher data synthesis "
                        "(StyleGAN/DualStyleGAN/BiSeNet + augmentation) in "
                        "float32; targets then match the f32 trainer exactly "
                        "(~27%% more stage-1 time, ~6%% more stage-2)")
    p.add_argument("--matmul_precision", type=str, default=None,
                   choices=["default", "high", "highest"],
                   help="XLA f32 matmul/conv precision. The TPU default is a "
                        "single bf16 MXU pass (TF32-like, matching torch's "
                        "A100 default); 'highest' gives true f32 passes")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.encoder_path is None:
        args.encoder_path = os.path.join("./checkpoint/", args.name,
                                         "pretrain.ckpt")
    print("Load options")
    for k, v in sorted(vars(args).items()):
        print(f"{k}: {v}")

    if args.multihost:
        from vtoonify_tpu.parallel.multihost import initialize

        initialize(args.coordinator, args.num_processes,
                   args.process_id)

    import jax
    import jax.numpy as jnp

    from vtoonify_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    if args.matmul_precision is not None:
        import jax

        jax.config.update("jax_default_matmul_precision",
                          args.matmul_precision)

    from vtoonify_tpu.models.vtoonify import (
        CondDiscriminatorConfig,
        VToonifyConfig,
        init_cond_discriminator,
        init_vtoonify,
    )
    from vtoonify_tpu.models.lpips import load_lpips
    from vtoonify_tpu.parallel.mesh import make_mesh, shard_params
    from vtoonify_tpu.train import synth
    from vtoonify_tpu.train.logging import MetricsLogger, SampleGridLogger
    from vtoonify_tpu.utils.profiling import StepTrace
    from vtoonify_tpu.train.steps import (
        TrainDConfig,
        init_pretrain_state,
        init_train_t_state,
        pretrain_t_step,
        split_trainable,
        train_t_step,
    )
    from vtoonify_tpu.train.guards import (
        PreemptionGuard,
        check_finite_metrics,
        enable_nan_debugging,
        handle_preemption,
    )
    from vtoonify_tpu.utils import checkpoint as ckpt_util
    from vtoonify_tpu.utils.blend import blend_generators

    if args.debug_nans:
        enable_nan_debugging()
    guard = PreemptionGuard()

    if args.tiny:
        cfg = VToonifyConfig(in_size=32, out_size=128, channel_multiplier=1,
                             num_res_layers=2, backbone="toonify")
    else:
        cfg = VToonifyConfig(backbone="toonify")
    # blend recipes are written for 18 latents; at smaller configs use the
    # first 7 (structure) + tail (color) entries that exist
    if len(args.weight) > cfg.n_latent:
        args.weight = args.weight[:cfg.n_latent]
    assert len(args.weight) == cfg.n_latent, (
        f"--weight needs {cfg.n_latent} entries for out_size "
        f"{cfg.out_size}, got {len(args.weight)}")
    key = jax.random.PRNGKey(args.seed)
    kinit, key = jax.random.split(key)

    vt_params = init_vtoonify(kinit, cfg)
    base_params = ckpt_util.load_reference_stylegan(args.stylegan_path,
                                                    cfg.generator)
    finetune_params = ckpt_util.load_reference_stylegan(args.finetunegan_path,
                                                        cfg.generator)
    # G1 = blend(finetune as low, base as high) (train_vtoonify_t.py:348-354)
    vt_params["generator"] = blend_generators(finetune_params, base_params,
                                              args.weight)

    parsing_params = ckpt_util.load_reference_faceparsing(args.faceparsing_path)
    directions = jnp.asarray(ckpt_util.load_directions(args.direction_path))

    mesh = make_mesh(tp=args.tp)
    os.makedirs(f"checkpoint/{args.name}", exist_ok=True)
    log_dir = f"log/{args.name}"
    mlog = MetricsLogger(log_dir)
    tracer = StepTrace(os.path.join(log_dir, "trace"),
                       args.start_iter + 1, args.profile)

    if args.pretrain:
        state = init_pretrain_state(vt_params, args.lr)
        pre_state_path = f"checkpoint/{args.name}/pretrain_state.ckpt"
        if args.resume and os.path.exists(pre_state_path):
            state = ckpt_util.load_train_state(pre_state_path, state)
            args.start_iter = int(state.step)
            print(f"resumed pretrain state at step {args.start_iter}")
        _, frozen = split_trainable(vt_params, pretrain=True)
        frozen = shard_params(frozen, mesh, tp=args.tp > 1)
        base_sh = shard_params(base_params, mesh, tp=args.tp > 1)
        parsing_sh = shard_params(parsing_params, mesh)
        step_fn = jax.jit(pretrain_t_step, donate_argnums=(0,),
                          static_argnames=("cfg", "batch", "lr",
                                           "compute_dtype", "synth_dtype"))
        t0 = time.time()
        for idx in range(args.start_iter, args.iter):
            key, sub = jax.random.split(key)
            if args.profile:
                tracer.before(idx)
            state, metrics = step_fn(
                state, frozen, base_sh, parsing_sh, cfg, directions,
                args.batch, sub, lr=args.lr,
                compute_dtype="bfloat16" if args.bf16 else None,
                synth_dtype="float32" if args.synth_fp32 else None,
            )
            if args.profile:
                tracer.after(idx, metrics)
            if (idx + 1) % max(args.log_every // 10, 1) == 0:
                check_finite_metrics(metrics, idx)
                mlog.log(idx, metrics)
                print(f"iter {idx}: emse {float(metrics['emse']):.4f}",
                      flush=True)
            if handle_preemption(
                    guard,
                    lambda: ckpt_util.save_train_state(pre_state_path,
                                                       state),
                    idx + 1):
                tracer.close()
                return
            if ((idx + 1) >= args.save_begin
                    and (idx + 1) % args.save_every == 0) or (
                    idx + 1) == args.iter:
                name = ("pretrain.ckpt" if (idx + 1) == args.iter
                        else f"pretrain-{idx + 1:05d}.ckpt")
                ckpt_util.save_pytree(
                    f"checkpoint/{args.name}/{name}",
                    {"g_ema": {"encoder": state.ema_encoder}},
                )
                ckpt_util.save_train_state(pre_state_path, state)
                if args.export_pt:
                    from vtoonify_tpu.convert.torch_export import (
                        save_reference_checkpoint,
                    )

                    save_reference_checkpoint(
                        f"checkpoint/{args.name}/"
                        f"{name.removesuffix('.ckpt')}.pt",
                        {"encoder": state.ema_encoder}, cfg,
                    )
        tracer.close()
        return

    pre = ckpt_util.load_pytree(args.encoder_path)
    vt_params["encoder"] = pre["g_ema"]["encoder"]
    # fusion identity init — T's fusion modules are plain convs
    # (train_vtoonify_t.py:362-368); weights stored cat2-split, the identity
    # block sits entirely in weight_a (cin [0:c] = the out / skip operand)
    for fo in vt_params["fusion_out"]:
        wa = fo["weight_a"]
        c = wa.shape[-1]
        fo["weight_a"] = (wa * 0.01).at[1, 1, 0:c, :].add(jnp.eye(c))
        fo["weight_b"] = fo["weight_b"] * 0.01
    for fs in vt_params["fusion_skip"]:
        wa = fs["weight_a"]
        c = wa.shape[-1]
        fs["weight_a"] = (wa * 0.01).at[1, 1, 0:c, :].add(jnp.eye(c))
        fs["weight_b"] = fs["weight_b"] * 0.01

    psp_params, latent_avg, psp_cfg = ckpt_util.load_reference_psp(
        args.style_encoder_path
    )

    lpips_params, lpips_desc = load_lpips(
        args.vgg_path, args.lpips_lin_path,
        allow_random=args.allow_random_lpips,
    )
    print(f"LPIPS weights: {lpips_desc}")

    dcfg = CondDiscriminatorConfig(
        size=64 if args.tiny else 256,
        channel_multiplier=1 if args.tiny else 2,
        use_condition=False,
    )
    key, kd = jax.random.split(key)
    d_params = init_cond_discriminator(kd, dcfg)
    tcfg = TrainDConfig(adv_loss=args.adv_loss, grec_loss=args.grec_loss,
                        perc_loss=args.perc_loss, tmp_loss=args.tmp_loss,
                        lr=args.lr,
                        compute_dtype="bfloat16" if args.bf16 else None,
                        synth_dtype="float32" if args.synth_fp32 else None,
                        **({"crop_size": 96, "lpips_size": 64,
                            "aug_max_pad": 40} if args.tiny else {}))

    _, frozen = split_trainable(vt_params, pretrain=False)
    state = init_train_t_state(vt_params, d_params, tcfg)
    state_path = f"checkpoint/{args.name}/train_state.ckpt"
    if args.resume and os.path.exists(state_path):
        state = ckpt_util.load_train_state(state_path, state)
        args.start_iter = int(state.step)
        print(f"resumed full train state at step {args.start_iter}")
    state = state._replace(
        trainable=shard_params(state.trainable, mesh, tp=args.tp > 1),
        d_params=shard_params(state.d_params, mesh, tp=args.tp > 1),
    )
    frozen = shard_params(frozen, mesh, tp=args.tp > 1)
    base_sh = shard_params(base_params, mesh, tp=args.tp > 1)
    parsing_sh = shard_params(parsing_params, mesh)

    step_fn = jax.jit(train_t_step, donate_argnums=(0,),
                      static_argnames=("cfg", "dcfg", "tcfg", "psp_cfg",
                                       "batch"))
    glog = SampleGridLogger(log_dir, cfg, fix_degree=True, use_degree=False)

    def _synth_for_log(frozen_a, base_a, parsing_a, psp_a, latent_avg_a,
                       directions_a, trainable, sub):
        # mirrors train_t_step's internal key split (iteration 0's data)
        vt_all = {**frozen_a, **trainable}
        return synth.synth_train_t_batch(
            jax.random.split(sub)[0], base_a, cfg.generator, vt_all, cfg,
            parsing_a, psp_a, psp_cfg, latent_avg_a, directions_a,
            args.batch, aug_p=tcfg.aug_p, aug_max_pad=tcfg.aug_max_pad,
        )

    # params as jit arguments, not closure constants (relay 413; see
    # train_d.py note)
    synth_for_log = functools.partial(
        jax.jit(_synth_for_log), frozen, base_sh,
        parsing_sh, psp_params, latent_avg, directions)
    t0 = time.time()
    for idx in range(args.start_iter, args.iter):
        key, sub = jax.random.split(key)
        if idx == args.start_iter:
            glog.seed(synth_for_log(state.trainable, sub), 0.0)
        if args.profile:
            tracer.before(idx)
        state, metrics = step_fn(
            state, frozen, base_sh, parsing_sh, psp_params, psp_cfg,
            latent_avg, lpips_params, cfg, dcfg, tcfg, directions, args.batch,
            jnp.asarray(max(idx / (args.iter / 2.0) - 1, 0), jnp.float32),
            sub,
        )
        if args.profile:
            tracer.after(idx, metrics)
        if (idx + 1) % max(args.log_every // 10, 1) == 0:
            check_finite_metrics(metrics, idx)
            mlog.log(idx, metrics)
            m = {k: f"{float(v):.4f}" for k, v in metrics.items()}
            print(f"iter {idx}: {m}", flush=True)
        if (idx % args.log_every == 0 or (idx + 1) == args.iter):
            glog.log(idx, {**frozen, **state.ema}, 0.0)
        if handle_preemption(
                guard,
                lambda: ckpt_util.save_train_state(state_path, state),
                idx + 1):
            tracer.close()
            return
        if ((idx + 1) >= args.save_begin
                and (idx + 1) % args.save_every == 0) or (idx + 1) == args.iter:
            name = ("vtoonify.ckpt" if (idx + 1) == args.iter
                    else f"vtoonify_{idx + 1:05d}.ckpt")
            ckpt_util.save_pytree(f"checkpoint/{args.name}/{name}",
                                  {"g_ema": state.ema})
            ckpt_util.save_train_state(state_path, state)
            if args.export_pt:
                from vtoonify_tpu.convert.torch_export import (
                    save_reference_checkpoint,
                )

                save_reference_checkpoint(
                    f"checkpoint/{args.name}/{name.removesuffix('.ckpt')}.pt",
                    {**frozen, **state.ema}, cfg,
                )
    tracer.close()


if __name__ == "__main__":
    main()
