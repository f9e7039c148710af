"""VToonify-D trainer CLI — option-parity with reference
train_vtoonify_d.py:31-75; two stages: --pretrain (encoder distillation,
30k iters) then full training (2k iters).

Replaces torch.distributed.launch with a jax.sharding Mesh: batch is sharded
over all local devices ('dp'); multi-host works via jax.distributed.initialize
(use --multihost).
"""

from __future__ import annotations

import argparse
import functools
import os
import time

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description="Train VToonify-D (TPU-native)")
    p.add_argument("--iter", type=int, default=2000)
    p.add_argument("--batch", type=int, default=8,
                   help="global batch size (sharded over the dp mesh axis)")
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--start_iter", type=int, default=0)
    p.add_argument("--save_every", type=int, default=30000)
    p.add_argument("--save_begin", type=int, default=30000)
    p.add_argument("--log_every", type=int, default=200)

    p.add_argument("--adv_loss", type=float, default=0.01)
    p.add_argument("--grec_loss", type=float, default=0.1)
    p.add_argument("--perc_loss", type=float, default=0.01)
    p.add_argument("--tmp_loss", type=float, default=1.0)
    p.add_argument("--msk_loss", type=float, default=0.0005)

    p.add_argument("--fix_degree", action="store_true")
    p.add_argument("--fix_style", action="store_true")
    p.add_argument("--fix_color", action="store_true")
    p.add_argument("--exstyle_path", type=str,
                   default="./checkpoint/cartoon/refined_exstyle_code.npy")
    p.add_argument("--style_id", type=int, default=26)
    p.add_argument("--style_degree", type=float, default=0.5)

    p.add_argument("--encoder_path", type=str, default=None)
    p.add_argument("--direction_path", type=str,
                   default="./checkpoint/directions.npy")
    p.add_argument("--stylegan_path", type=str,
                   default="./checkpoint/cartoon/generator.pt")
    p.add_argument("--faceparsing_path", type=str,
                   default="./checkpoint/faceparsing.pth")
    p.add_argument("--style_encoder_path", type=str,
                   default="./checkpoint/encoder.pt")
    p.add_argument("--vgg_path", type=str, default=None,
                   help="torchvision vgg16 state_dict for LPIPS")
    p.add_argument("--lpips_lin_path", type=str, default=None,
                   help="LPIPS lin weights (defaults to the reference's "
                        "in-repo weights if present)")
    p.add_argument("--allow_random_lpips", action="store_true",
                   help="explicitly allow a randomly-initialized LPIPS net "
                        "when --vgg_path is absent (tests/smoke only — the "
                        "perceptual loss is meaningless with random weights)")

    p.add_argument("--name", type=str, default="vtoonify_d_cartoon")
    p.add_argument("--pretrain", action="store_true")
    p.add_argument("--resume", action="store_true",
                   help="exact resume from the last full train state "
                        "(params+EMA+optimizers+step; reference resume is "
                        "approximate, SURVEY.md §5.4)")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel mesh width")
    p.add_argument("--multihost", action="store_true")
    p.add_argument("--coordinator", type=str, default=None,
                   help="host:port of process 0 (multi-host manual launch; "
                        "defaults to VTOONIFY_COORDINATOR or auto-detect)")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--local_rank", type=int, default=0,
                   help="accepted for reference launch-script compatibility "
                        "(train_vtoonify_d.py:38); ignored — all local chips "
                        "are used automatically, pods use --multihost")
    p.add_argument("--debug_nans", action="store_true",
                   help="fail at the first NaN-producing primitive "
                        "(jax_debug_nans; slow, debug only)")
    p.add_argument("--profile", type=int, default=0, metavar="N",
                   help="capture an XLA device trace of N steps (written to "
                        "log/NAME/trace, viewable in TensorBoard/Perfetto)")
    p.add_argument("--tiny", action="store_true",
                   help="32->128 debug model config (hermetic smoke tests "
                        "only; checkpoints must match)")
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


def capability_suffix(args) -> str:
    """reference train_vtoonify_d.py:193-200 / README.md:137-142."""
    s = "_s"
    if args.fix_style:
        s += "%03d" % args.style_id
    s += "_d"
    if args.fix_degree:
        s += "%1.1f" % args.style_degree
    if not args.fix_color:
        s += "_c"
    return s


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

    from vtoonify_tpu.models.psp_encoder import PSPEncoderConfig
    from vtoonify_tpu.models.vtoonify import (
        CondDiscriminatorConfig,
        VToonifyConfig,
        init_cond_discriminator,
        init_vtoonify,
        zplus2wplus,
    )
    from vtoonify_tpu.models.lpips import load_lpips
    from vtoonify_tpu.parallel.mesh import (
        make_mesh,
        shard_array_batch,
        shard_params,
    )
    from vtoonify_tpu.train import synth
    from vtoonify_tpu.train.logging import MetricsLogger, SampleGridLogger
    from vtoonify_tpu.train.steps import (
        TrainDConfig,
        init_pretrain_state,
        init_train_d_state,
        pretrain_step,
        split_trainable,
        train_d_step,
    )
    from vtoonify_tpu.train.guards import (
        PreemptionGuard,
        check_finite_metrics,
        enable_nan_debugging,
        handle_preemption,
    )
    from vtoonify_tpu.utils import checkpoint as ckpt_util
    from vtoonify_tpu.utils.profiling import StepTrace

    if args.debug_nans:
        enable_nan_debugging()
    guard = PreemptionGuard()

    if args.tiny:
        cfg = VToonifyConfig(in_size=32, out_size=128, channel_multiplier=1,
                             num_res_layers=2, backbone="dualstylegan")
    else:
        cfg = VToonifyConfig(backbone="dualstylegan")
    key = jax.random.PRNGKey(args.seed)
    kinit, key = jax.random.split(key)

    # frozen backbone from the DualStyleGAN checkpoint; dilated ModRes copies
    # share the original ModRes weights (train_vtoonify_d.py:419-424)
    vt_params = init_vtoonify(kinit, cfg)
    ds_params = ckpt_util.load_reference_dualstylegan(args.stylegan_path,
                                                      cfg.dualstylegan)
    vt_params["generator"] = ds_params
    vt_params["res"] = [
        jax.tree_util.tree_map(lambda a: a, ds_params["res"][j])
        for j in range(7)
    ]

    parsing_params = ckpt_util.load_reference_faceparsing(args.faceparsing_path)
    directions = jnp.asarray(ckpt_util.load_directions(args.direction_path))
    bank, names = ckpt_util.load_exstyle_bank(args.exstyle_path)
    styles = jnp.concatenate(
        [
            zplus2wplus(vt_params, cfg, jnp.asarray(bank[n], jnp.float32))
            for n in names
        ],
        axis=0,
    )

    mesh = make_mesh(tp=args.tp)
    n_dp = mesh.shape["dp"]
    assert args.batch % n_dp == 0, "batch must divide dp mesh width"

    os.makedirs(f"checkpoint/{args.name}", exist_ok=True)
    rng = np.random.RandomState(args.seed)
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
        parsing_sh = shard_params(parsing_params, mesh)
        step_fn = jax.jit(pretrain_step, donate_argnums=(0,),
                          static_argnames=("cfg", "lr", "compute_dtype", "synth_dtype"))
        t0 = time.time()
        for idx in range(args.start_iter, args.iter):
            # d_s schedule (train_vtoonify_d.py:108-112)
            if args.fix_degree:
                d_s = args.style_degree
            else:
                d_s = 0.0 if idx <= args.iter / 4.0 else float(rng.rand())
            if args.fix_style:
                sel = np.full((args.batch,), args.style_id)
            else:
                sel = rng.randint(0, styles.shape[0], (args.batch,))
            style = shard_array_batch(styles[jnp.asarray(sel)], mesh)
            key, sub = jax.random.split(key)
            if args.profile:
                tracer.before(idx)
            state, metrics = step_fn(
                state, frozen, parsing_sh, cfg, directions, style,
                jnp.asarray(d_s, jnp.float32), sub, lr=args.lr,
                compute_dtype="bfloat16" if args.bf16 else None,
                synth_dtype="float32" if args.synth_fp32 else None,
            )
            if args.profile:
                tracer.after(idx, metrics)
            if (idx + 1) % max(args.log_every // 10, 1) == 0:
                check_finite_metrics(metrics, idx)
                mlog.log(idx, metrics, d_s=float(d_s))
                print(
                    f"iter {idx}: emse {float(metrics['emse']):.4f} "
                    f"({(time.time() - t0) / (idx - args.start_iter + 1):.2f}"
                    " s/it)",
                    flush=True,
                )
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

    # ---- full training ------------------------------------------------------
    pre = ckpt_util.load_pytree(args.encoder_path)
    vt_params["encoder"] = pre["g_ema"]["encoder"]
    # fusion identity init (train_vtoonify_d.py:433-438); weights are stored
    # cat2-split (layers.split_cat2_weight) — the identity block sits
    # entirely in weight_a (cin [0:c] = the f_G / skip operand)
    for fo in vt_params["fusion_out"]:
        wa = fo["conv"]["weight_a"]
        c = wa.shape[-1]
        fo["conv"]["weight_a"] = (wa * 0.01).at[1, 1, 0:c, :].add(jnp.eye(c))
        fo["conv"]["weight_b"] = fo["conv"]["weight_b"] * 0.01
    for fs in vt_params["fusion_skip"]:
        wa = fs["weight_a"]
        c = wa.shape[-1]
        fs["weight_a"] = (wa * 0.01).at[1, 1, 0:c, :].add(jnp.eye(c))
        fs["weight_b"] = fs["weight_b"] * 0.01

    psp_cfg = PSPEncoderConfig(n_styles=cfg.n_latent)
    psp_params, latent_avg, psp_cfg = ckpt_util.load_reference_psp(
        args.style_encoder_path, psp_cfg
    )

    lpips_params, lpips_desc = load_lpips(
        args.vgg_path, args.lpips_lin_path,
        allow_random=args.allow_random_lpips,
    )
    print(f"LPIPS weights: {lpips_desc}")

    dcfg = CondDiscriminatorConfig(
        size=64 if args.tiny else 256,
        channel_multiplier=1 if args.tiny else 2,
        use_condition=True, style_num=styles.shape[0],
    )
    key, kd = jax.random.split(key)
    d_params = init_cond_discriminator(kd, dcfg)
    tcfg = TrainDConfig(
        adv_loss=args.adv_loss, grec_loss=args.grec_loss,
        perc_loss=args.perc_loss, tmp_loss=args.tmp_loss,
        msk_loss=args.msk_loss, lr=args.lr,
        compute_dtype="bfloat16" if args.bf16 else None,
        synth_dtype="float32" if args.synth_fp32 else None,
        **({"crop_size": 96, "lpips_size": 64, "aug_max_pad": 40}
           if args.tiny else {}),
    )

    _, frozen = split_trainable(vt_params, pretrain=False)
    state = init_train_d_state(vt_params, d_params, args.batch, cfg, tcfg)
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
    parsing_sh = shard_params(parsing_params, mesh)

    step_fn = jax.jit(train_d_step, donate_argnums=(0,),
                      static_argnames=("cfg", "dcfg", "tcfg", "psp_cfg"))
    glog = SampleGridLogger(log_dir, cfg, args.fix_degree)

    def _synth_for_log(frozen_a, parsing_a, psp_a, latent_avg_a,
                       directions_a, trainable, sub, style, d_s_t, weights,
                       wc_prev, cft, ucj, xl_override):
        # mirrors train_d_step's internal key split so the seeded sample IS
        # iteration 0's data (reference train_vtoonify_d.py:271-276)
        vt_all = {**frozen_a, **trainable}
        return synth.synth_train_batch(
            jax.random.split(sub)[0], vt_all, cfg, parsing_a, psp_a,
            psp_cfg, latent_avg_a, directions_a, style, d_s_t, weights,
            wc_prev, cft, ucj, xl_override=xl_override, aug_p=tcfg.aug_p,
            aug_max_pad=tcfg.aug_max_pad,
        )

    # params enter as jit ARGUMENTS — a closure would inline the full frozen
    # VToonify-D + pSp trees as HLO constants (a ~GB remote-compile payload
    # the TPU relay rejects with 413; see tools/_drift_check.py)
    synth_for_log = functools.partial(
        jax.jit(_synth_for_log), frozen, parsing_sh, psp_params, latent_avg,
        directions)
    suffix = capability_suffix(args)
    t0 = time.time()
    for idx in range(args.start_iter, args.iter):
        if args.fix_degree or idx == 0:
            d_s = args.style_degree
        else:
            d_s = rng.randint(0, 6) / 5.0
        weights = tuple(
            [d_s] * 7
            + ([0.0] if args.fix_color else [1.0]) * (cfg.n_latent - 7)
        )
        if args.fix_style or idx == 0:
            sel = np.full((args.batch,), args.style_id)
        else:
            sel = rng.randint(0, styles.shape[0], (args.batch,))
        style = styles[jnp.asarray(sel)]
        xl_override = style if (not args.fix_color and args.fix_style) else None
        use_jitter = (idx > 0 and idx >= args.iter / 2.0
                      and not args.fix_color and not args.fix_style)
        key, sub = jax.random.split(key)
        style_sh = shard_array_batch(style, mesh)
        cft = jnp.asarray(idx / (args.iter / 2.0), jnp.float32)
        if idx == args.start_iter:
            glog.seed(
                synth_for_log(
                    state.trainable, sub, style_sh,
                    jnp.asarray(d_s, jnp.float32), weights, state.wc_prev,
                    cft, jnp.asarray(use_jitter), xl_override,
                ),
                d_s,
            )
        if args.profile:
            tracer.before(idx)
        state, metrics = step_fn(
            state, frozen, parsing_sh, psp_params, psp_cfg, latent_avg,
            lpips_params, cfg, dcfg, tcfg, directions,
            style_sh,
            shard_array_batch(jnp.asarray(sel), mesh),
            jnp.asarray(d_s, jnp.float32), weights,
            jnp.asarray(max(idx / (args.iter / 2.0) - 1, 0), jnp.float32),
            cft,
            jnp.asarray(use_jitter), sub, xl_override=xl_override,
        )
        if args.profile:
            tracer.after(idx, metrics)
        if (idx + 1) % max(args.log_every // 10, 1) == 0:
            check_finite_metrics(metrics, idx)
            mlog.log(idx, metrics, d_s=float(d_s))
            m = {k: f"{float(v):.4f}" for k, v in metrics.items()}
            print(f"iter {idx}: {m} "
                  f"({(time.time() - t0) / (idx - args.start_iter + 1):.2f}"
                  " s/it)", flush=True)
        if (idx == args.start_iter or (idx + 1) % args.log_every == 0
                or (idx + 1) == args.iter):
            glog.log(idx + 1, {**frozen, **state.ema}, d_s)
        if handle_preemption(
                guard,
                lambda: ckpt_util.save_train_state(state_path, state),
                idx + 1):
            tracer.close()
            return
        if ((idx + 1) >= args.save_begin
                and (idx + 1) % args.save_every == 0) or (idx + 1) == args.iter:
            name = (f"vtoonify{suffix}.ckpt" if (idx + 1) == args.iter
                    else f"vtoonify{suffix}_{idx + 1:05d}.ckpt")
            ckpt_util.save_pytree(
                f"checkpoint/{args.name}/{name}", {"g_ema": state.ema}
            )
            ckpt_util.save_train_state(state_path, state)
            if args.export_pt:
                from vtoonify_tpu.convert.torch_export import (
                    save_reference_checkpoint,
                )

                # full g_ema like the reference (frozen backbone + EMA
                # trainables, train_vtoonify_d.py:383-390)
                save_reference_checkpoint(
                    f"checkpoint/{args.name}/{name.removesuffix('.ckpt')}.pt",
                    {**frozen, **state.ema}, cfg,
                )
    tracer.close()


if __name__ == "__main__":
    main()
