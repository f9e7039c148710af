"""Jitted training steps (pretrain + full VToonify-D training).

Replaces the reference's DDP/optimizer machinery (train_vtoonify_d.py:81-390)
the pjit way: each step is ONE pure function — synthetic-data generation,
D update, G update and EMA all inside a single XLA program. Under a
jax.sharding Mesh with the batch sharded over 'dp', gradient all-reduces are
inserted automatically by GSPMD (no DDP object, no explicit NCCL calls —
SURVEY.md §2.5). `requires_grad` flipping becomes argument partitioning:
gradients are only taken w.r.t. the trainable subtree.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from vtoonify_tpu.models.vtoonify import (
    CondDiscriminatorConfig,
    VToonifyConfig,
    cond_discriminator_apply,
    vtoonify_apply,
)
from vtoonify_tpu.models.lpips import lpips_apply
from vtoonify_tpu.ops.interp import avg_pool
from vtoonify_tpu.train import synth
from vtoonify_tpu.train.ema import EMA_DECAY, ema_update
from vtoonify_tpu.train.losses import (
    d_logistic_loss,
    g_nonsaturating_loss,
    mask_loss,
    mse_loss,
)

ADAM_BETA1, ADAM_BETA2 = 0.9, 0.99  # train_vtoonify_d.py:448-451


def make_optimizer(lr: float = 1e-4):
    return optax.adam(lr, b1=ADAM_BETA1, b2=ADAM_BETA2)


def _mp_cast(compute_dtype):
    """Mixed-precision helpers: (castp, up).

    `castp` casts the float leaves of a pytree/array to the compute dtype
    (identity when compute_dtype is None); `up` casts them back to float32.
    Master weights, optimizer state and all loss arithmetic stay float32 —
    only the network forwards (and their rematerialized backward replays) run
    in the low-precision dtype, so gradients flow through the casts back to
    the float32 parameters. bfloat16 halves activation HBM and runs the convs
    MXU-native; the reference trains in float32 (torch default), so this is
    opt-in (TrainDConfig.compute_dtype / --bf16).
    """
    if compute_dtype is None:
        return (lambda t: t), (lambda t: t)
    dt = jnp.dtype(compute_dtype)

    def _to(dtype):
        def cast(t):
            return jax.tree_util.tree_map(
                lambda a: jnp.asarray(a).astype(dtype)
                if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating) else a,
                t,
            )
        return cast

    return _to(dt), _to(jnp.float32)


def _synth_cast(synth_dtype, compute_dtype):
    """(castp, up) for the frozen-teacher data synthesis: `synth_dtype`
    falling back to `compute_dtype`; "float32" forces identity. Casting the
    teacher params (and every float operand entering the synthesis — a
    single f32 scalar would promote the whole bf16 subgraph back to f32)
    runs synthesis + augmentation at half bandwidth; targets are cast back
    to float32 at the boundary so all loss arithmetic stays f32."""
    sdt = compute_dtype if synth_dtype is None else synth_dtype
    if sdt is not None and jnp.dtype(sdt) == jnp.float32:
        sdt = None
    return _mp_cast(sdt)


class PretrainState(NamedTuple):
    encoder: dict          # trainable encoder params
    ema_encoder: dict
    opt_state: tuple
    step: jnp.ndarray


class TrainDState(NamedTuple):
    trainable: dict        # {'encoder', 'fusion_out', 'fusion_skip'}
    ema: dict
    d_params: dict
    g_opt_state: tuple
    d_opt_state: tuple
    wc_prev: jnp.ndarray   # previous iteration's w' (color jitter carry)
    step: jnp.ndarray


def split_trainable(vt_params, pretrain: bool):
    keys = ("encoder",) if pretrain else ("encoder", "fusion_out", "fusion_skip")
    trainable = {k: vt_params[k] for k in keys}
    frozen = {k: v for k, v in vt_params.items() if k not in keys}
    return trainable, frozen


def init_pretrain_state(vt_params, lr: float = 1e-4) -> PretrainState:
    trainable, _ = split_trainable(vt_params, pretrain=True)
    opt = make_optimizer(lr)
    return PretrainState(
        encoder=trainable["encoder"],
        # real copies, not aliases: the step jits donate the state, and a
        # buffer aliased into two state fields would be donated twice
        ema_encoder=jax.tree_util.tree_map(jnp.copy, trainable["encoder"]),
        opt_state=opt.init(trainable),
        step=jnp.zeros((), jnp.int32),
    )


def pretrain_step(
    state: PretrainState,
    frozen,                    # {'generator', 'res', ...} of vt params
    parsing_params,
    cfg: VToonifyConfig,
    directions,
    style,                     # (B, n_latent, 512) pre-mapped w'' codes
    d_s,
    key,
    lr: float = 1e-4,
    compute_dtype: Optional[str] = None,
    synth_dtype: Optional[str] = None,
):
    """reference pretrain() body (train_vtoonify_d.py:99-151)."""
    opt = make_optimizer(lr)
    scast, sup = _synth_cast(synth_dtype, compute_dtype)
    batch = sup(synth.synth_pretrain_batch(
        key, scast({**frozen, "encoder": state.encoder}), cfg,
        scast(parsing_params), scast(directions), scast(style), scast(d_s),
    ))
    castp, up = _mp_cast(compute_dtype)
    frozen_c = castp(frozen)
    inp_c = castp(batch["real_input"])
    style_c = castp(style)
    d_s_c = castp(d_s)

    def loss_fn(trainable):
        params = {**frozen_c, **castp(trainable)}
        fake_feat, fake_skip = vtoonify_apply(
            params, cfg, inp_c, style_c, d_s_c, return_feat=True
        )
        return mse_loss(up(fake_feat), batch["real_feat"]) + mse_loss(
            up(fake_skip), batch["real_skip"]
        )

    trainable = {"encoder": state.encoder}
    loss, grads = jax.value_and_grad(loss_fn)(trainable)
    updates, opt_state = opt.update(grads, state.opt_state, trainable)
    trainable = optax.apply_updates(trainable, updates)
    ema_enc = ema_update(state.ema_encoder, trainable["encoder"], EMA_DECAY)
    return (
        PretrainState(trainable["encoder"], ema_enc, opt_state, state.step + 1),
        {"emse": loss},
    )


class TrainDConfig(NamedTuple):
    adv_loss: float = 0.01
    grec_loss: float = 0.1
    perc_loss: float = 0.01
    tmp_loss: float = 1.0
    msk_loss: float = 0.0005
    lr: float = 1e-4
    crop_size: int = 896        # temporal-loss crop (train_vtoonify_d.py:326)
    lpips_size: int = 512       # perceptual-loss resolution (":311-312")
    aug_p: float = 0.2
    aug_max_pad: Optional[int] = None
    remat: bool = True          # rematerialize G forwards + LPIPS (trades
    # FLOPs for HBM — the three full-res G forwards per iteration would
    # otherwise exceed one chip's HBM at the 1024px production config)
    remat_scope: str = "all"    # what remat=True checkpoints: "all"
    # (G forwards + LPIPS, the memory-safe default), "g" (G forwards
    # only), "lpips" (LPIPS only) — the bench_train.py remat-policy sweep
    # (TRAIN_BENCH_REMAT_SCOPE); docs/PERF.md records the measurements
    compute_dtype: Optional[str] = None  # e.g. "bfloat16": run the student/D/
    # LPIPS forwards in low precision with float32 master weights, optimizer
    # state and loss arithmetic
    synth_dtype: Optional[str] = None  # dtype of the frozen-teacher data
    # synthesis (StyleGAN/DualStyleGAN/BiSeNet forwards + augmentation).
    # None → follow compute_dtype; "float32" forces the old f32 synthesis.
    # bf16 synthesis shifts targets by ≲1–2 uint8 LSB (the same bound the
    # bf16 inference graph measures vs f32, tools/_drift_check.py) and roughly
    # halves the synthesis+augment bandwidth.


def init_train_d_state(vt_params, d_params, batch: int,
                       cfg: VToonifyConfig, tcfg: TrainDConfig) -> TrainDState:
    trainable, _ = split_trainable(vt_params, pretrain=False)
    g_opt = make_optimizer(tcfg.lr)
    d_opt = make_optimizer(tcfg.lr)
    return TrainDState(
        trainable=trainable,
        ema=jax.tree_util.tree_map(jnp.copy, trainable),  # no aliases: donated
        d_params=d_params,
        g_opt_state=g_opt.init(trainable),
        d_opt_state=d_opt.init(d_params),
        wc_prev=jnp.zeros((batch, cfg.n_latent, cfg.style_channels)),
        step=jnp.zeros((), jnp.int32),
    )


def train_d_step(
    state: TrainDState,
    frozen,                       # {'generator', 'res'}
    parsing_params,
    psp_params,
    psp_cfg,
    latent_avg,
    lpips_params,
    cfg: VToonifyConfig,
    dcfg: CondDiscriminatorConfig,
    tcfg: TrainDConfig,
    directions,
    style,                        # (B, n_latent, 512) selected exstyles
    style_ind,                    # (B,) int
    d_s,                          # traced scalar
    weights,                      # list of n_latent interp weights
    tmp_ramp,                     # max(idx/(iter/2)-1, 0)
    color_fuse_t,                 # i/(iter/2)
    use_color_jitter,             # traced bool
    key,
    xl_override=None,
):
    """One full VToonify-D iteration (train_vtoonify_d.py:212-342):
    synthesize pair → D step → G step (adv+rec+perc+mask+temporal) → EMA."""
    g_opt = make_optimizer(tcfg.lr)
    d_opt = make_optimizer(tcfg.lr)
    k_synth, k_crop = jax.random.split(key)

    vt_all = {**frozen, **state.trainable}
    scast, sup = _synth_cast(tcfg.synth_dtype, tcfg.compute_dtype)
    batch_data = sup(synth.synth_train_batch(
        k_synth, scast(vt_all), cfg, scast(parsing_params),
        scast(psp_params), psp_cfg, scast(latent_avg), scast(directions),
        scast(style), scast(d_s), scast(weights), scast(state.wc_prev),
        scast(color_fuse_t), use_color_jitter,
        xl_override=scast(xl_override), aug_p=tcfg.aug_p,
        aug_max_pad=tcfg.aug_max_pad,
    ))
    xl = batch_data["xl"]
    b = style.shape[0]
    degree_label = jnp.zeros((b, 1)) + d_s
    pool_to_256 = max(1, cfg.out_size // dcfg.size)

    castp, up = _mp_cast(tcfg.compute_dtype)
    frozen_c = castp(frozen)
    inp_c = castp(batch_data["real_input"])
    xl_c = castp(xl)
    d_s_c = castp(d_s)
    real_out_256 = avg_pool(batch_data["real_output"], pool_to_256)

    # ---- D step (G frozen) --------------------------------------------------
    fake_output = up(jax.lax.stop_gradient(
        vtoonify_apply(castp(vt_all), cfg, inp_c, xl_c, d_s_c)
    ))

    def d_loss_fn(d_params):
        d_params_c = castp(d_params)
        fake_pred = up(cond_discriminator_apply(
            d_params_c, dcfg, castp(avg_pool(fake_output, pool_to_256)),
            castp(degree_label), style_ind,
        ))
        real_pred = up(cond_discriminator_apply(
            d_params_c, dcfg, castp(real_out_256),
            castp(degree_label), style_ind,
        ))
        return d_logistic_loss(real_pred, fake_pred) * tcfg.adv_loss

    d_loss, d_grads = jax.value_and_grad(d_loss_fn)(state.d_params)
    d_updates, d_opt_state = d_opt.update(d_grads, state.d_opt_state,
                                          state.d_params)
    d_params = optax.apply_updates(state.d_params, d_updates)

    # ---- G step (D frozen) --------------------------------------------------
    cs = tcfg.crop_size
    max_off = cfg.out_size - cs
    off_w = jax.random.randint(k_crop, (), 0, max_off + 1)
    off_h = jax.random.randint(jax.random.fold_in(k_crop, 1), (), 0,
                               max_off + 1)

    def _vt_mask(tr, inp, xl_, ds_):
        return vtoonify_apply({**frozen_c, **castp(tr)}, cfg, inp, xl_, ds_,
                              return_mask=True)

    def _vt(tr, inp, xl_, ds_):
        return vtoonify_apply({**frozen_c, **castp(tr)}, cfg, inp, xl_, ds_)

    _lpips = lpips_apply
    if tcfg.remat:
        if tcfg.remat_scope in ("all", "g"):
            _vt_mask = jax.checkpoint(_vt_mask)
            _vt = jax.checkpoint(_vt)
        if tcfg.remat_scope in ("all", "lpips"):
            _lpips = jax.checkpoint(lpips_apply)

    d_params_c = castp(d_params)
    lpips_params_c = castp(lpips_params)

    def g_loss_fn(trainable):
        fake_output, m_Es = _vt_mask(trainable, inp_c, xl_c, d_s_c)
        fake_output = up(fake_output)
        m_Es = up(m_Es)
        fake_pred = up(cond_discriminator_apply(
            d_params_c, dcfg, castp(avg_pool(fake_output, pool_to_256)),
            castp(degree_label), style_ind,
        ))
        g_adv = g_nonsaturating_loss(fake_pred) * tcfg.adv_loss
        g_rec = mse_loss(fake_output, batch_data["real_output"]) * tcfg.grec_loss
        pool_to_512 = max(1, cfg.out_size // tcfg.lpips_size)
        g_feat = jnp.sum(up(
            _lpips(
                lpips_params_c,
                castp(avg_pool(fake_output, pool_to_512)),
                castp(avg_pool(batch_data["real_output"], pool_to_512)),
            )
        )) * tcfg.perc_loss
        g_msk = mask_loss(m_Es, d_s, tcfg.msk_loss)

        # temporal crop-consistency (train_vtoonify_d.py:326-334); note the
        # reference indexes H with `w` and W with `h` — the crop is square so
        # only the offset pairing matters; we keep (off_w → H, off_h → W).
        full = jnp.concatenate(
            [batch_data["real_input1024"],
             batch_data["mask1024"] * synth.PARSING_WEIGHT], axis=-1,
        )
        crop_input = jax.lax.dynamic_slice(
            full, (0, off_w, off_h, 0),
            (full.shape[0], cs, cs, full.shape[-1]),
        )
        crop_input = synth.down(synth.down(crop_input))
        crop_fake_output = jax.lax.dynamic_slice(
            fake_output, (0, off_w, off_h, 0),
            (fake_output.shape[0], cs, cs, 3),
        )
        fake_crop_output = up(_vt(trainable, castp(crop_input), xl_c, d_s_c))
        g_tmp = (
            jnp.mean(jnp.square(fake_crop_output - crop_fake_output))
            * tmp_ramp * tcfg.tmp_loss
        )
        total = g_adv + g_rec + g_feat + g_tmp + g_msk
        return total, {
            "g": g_adv, "gr": g_rec, "gf": g_feat, "tp": g_tmp, "msk": g_msk,
        }

    (g_total, metrics), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
        state.trainable
    )
    g_updates, g_opt_state = g_opt.update(g_grads, state.g_opt_state,
                                          state.trainable)
    trainable = optax.apply_updates(state.trainable, g_updates)
    ema = ema_update(state.ema, trainable, EMA_DECAY)

    metrics["d"] = d_loss
    new_state = TrainDState(
        trainable=trainable, ema=ema, d_params=d_params,
        g_opt_state=g_opt_state, d_opt_state=d_opt_state,
        wc_prev=batch_data["wc"], step=state.step + 1,
    )
    return new_state, metrics


# --- VToonify-T steps (reference train_vtoonify_t.py) ------------------------


def pretrain_t_step(
    state: PretrainState,
    frozen,                    # {'generator', ...} of T vt params (blended G1)
    base_params,               # un-blended base StyleGAN G0
    parsing_params,
    cfg: VToonifyConfig,
    directions,
    batch: int,
    key,
    lr: float = 1e-4,
    compute_dtype: Optional[str] = None,
    synth_dtype: Optional[str] = None,
):
    """reference train_vtoonify_t.py pretrain() body (:99-135)."""
    opt = make_optimizer(lr)
    vt_all = {**frozen, "encoder": state.encoder}
    scast, sup = _synth_cast(synth_dtype, compute_dtype)
    data = sup(synth.synth_pretrain_t_batch(
        key, scast(base_params), cfg.generator, scast(vt_all), cfg,
        scast(parsing_params), scast(directions), batch,
    ))
    castp, up = _mp_cast(compute_dtype)
    frozen_c = castp(frozen)
    inp_c = castp(data["real_input"])

    def loss_fn(trainable):
        params = {**frozen_c, **castp(trainable)}
        fake_feat, fake_skip = vtoonify_apply(
            params, cfg, inp_c, None, return_feat=True
        )
        return mse_loss(up(fake_feat), data["real_feat"]) + mse_loss(
            up(fake_skip), data["real_skip"]
        )

    trainable = {"encoder": state.encoder}
    loss, grads = jax.value_and_grad(loss_fn)(trainable)
    updates, opt_state = opt.update(grads, state.opt_state, trainable)
    trainable = optax.apply_updates(trainable, updates)
    ema_enc = ema_update(state.ema_encoder, trainable["encoder"], EMA_DECAY)
    return (
        PretrainState(trainable["encoder"], ema_enc, opt_state, state.step + 1),
        {"emse": loss},
    )


class TrainTState(NamedTuple):
    trainable: dict
    ema: dict
    d_params: dict
    g_opt_state: tuple
    d_opt_state: tuple
    step: jnp.ndarray


def init_train_t_state(vt_params, d_params, tcfg: TrainDConfig) -> TrainTState:
    trainable, _ = split_trainable(vt_params, pretrain=False)
    g_opt = make_optimizer(tcfg.lr)
    d_opt = make_optimizer(tcfg.lr)
    return TrainTState(
        trainable=trainable,
        ema=jax.tree_util.tree_map(jnp.copy, trainable),  # no aliases: donated
        d_params=d_params,
        g_opt_state=g_opt.init(trainable),
        d_opt_state=d_opt.init(d_params),
        step=jnp.zeros((), jnp.int32),
    )


def train_t_step(
    state: TrainTState,
    frozen,
    base_params,
    parsing_params,
    psp_params,
    psp_cfg,
    latent_avg,
    lpips_params,
    cfg: VToonifyConfig,
    dcfg: CondDiscriminatorConfig,   # use_condition=False for T
    tcfg: TrainDConfig,
    directions,
    batch: int,
    tmp_ramp,
    key,
):
    """One full VToonify-T iteration (train_vtoonify_t.py:192-276): no style
    degree, unconditional D, no mask loss."""
    g_opt = make_optimizer(tcfg.lr)
    d_opt = make_optimizer(tcfg.lr)
    k_synth, k_crop = jax.random.split(key)

    vt_all = {**frozen, **state.trainable}
    scast, sup = _synth_cast(tcfg.synth_dtype, tcfg.compute_dtype)
    data = sup(synth.synth_train_t_batch(
        k_synth, scast(base_params), cfg.generator, scast(vt_all), cfg,
        scast(parsing_params), scast(psp_params), psp_cfg,
        scast(latent_avg), scast(directions), batch,
        aug_p=tcfg.aug_p, aug_max_pad=tcfg.aug_max_pad,
    ))
    xl = data["xl"]
    pool_to_256 = max(1, cfg.out_size // dcfg.size)

    castp, up = _mp_cast(tcfg.compute_dtype)
    frozen_c = castp(frozen)
    inp_c = castp(data["real_input"])
    xl_c = castp(xl)

    fake_output = up(jax.lax.stop_gradient(
        vtoonify_apply(castp(vt_all), cfg, inp_c, xl_c)
    ))

    def d_loss_fn(d_params):
        d_params_c = castp(d_params)
        fake_pred = up(cond_discriminator_apply(
            d_params_c, dcfg, castp(avg_pool(fake_output, pool_to_256))
        ))
        real_pred = up(cond_discriminator_apply(
            d_params_c, dcfg, castp(avg_pool(data["real_output"], pool_to_256))
        ))
        return d_logistic_loss(real_pred, fake_pred) * tcfg.adv_loss

    d_loss, d_grads = jax.value_and_grad(d_loss_fn)(state.d_params)
    d_updates, d_opt_state = d_opt.update(d_grads, state.d_opt_state,
                                          state.d_params)
    d_params = optax.apply_updates(state.d_params, d_updates)

    cs = tcfg.crop_size
    max_off = cfg.out_size - cs
    off_w = jax.random.randint(k_crop, (), 0, max_off + 1)
    off_h = jax.random.randint(jax.random.fold_in(k_crop, 1), (), 0,
                               max_off + 1)

    def _vt(tr, inp, xl_):
        return vtoonify_apply({**frozen_c, **castp(tr)}, cfg, inp, xl_)

    _lpips = lpips_apply
    if tcfg.remat:
        if tcfg.remat_scope in ("all", "g"):
            _vt = jax.checkpoint(_vt)
        if tcfg.remat_scope in ("all", "lpips"):
            _lpips = jax.checkpoint(lpips_apply)

    d_params_c = castp(d_params)
    lpips_params_c = castp(lpips_params)

    def g_loss_fn(trainable):
        fake_output = up(_vt(trainable, inp_c, xl_c))
        fake_pred = up(cond_discriminator_apply(
            d_params_c, dcfg, castp(avg_pool(fake_output, pool_to_256))
        ))
        g_adv = g_nonsaturating_loss(fake_pred) * tcfg.adv_loss
        g_rec = mse_loss(fake_output, data["real_output"]) * tcfg.grec_loss
        pool_to_512 = max(1, cfg.out_size // tcfg.lpips_size)
        g_feat = jnp.sum(up(
            _lpips(
                lpips_params_c,
                castp(avg_pool(fake_output, pool_to_512)),
                castp(avg_pool(data["real_output"], pool_to_512)),
            )
        )) * tcfg.perc_loss

        full = jnp.concatenate(
            [data["real_input1024"], data["mask1024"] * synth.PARSING_WEIGHT],
            axis=-1,
        )
        crop_input = jax.lax.dynamic_slice(
            full, (0, off_w, off_h, 0),
            (full.shape[0], cs, cs, full.shape[-1]),
        )
        crop_input = synth.down(synth.down(crop_input))
        crop_fake_output = jax.lax.dynamic_slice(
            fake_output, (0, off_w, off_h, 0),
            (fake_output.shape[0], cs, cs, 3),
        )
        fake_crop_output = up(_vt(trainable, castp(crop_input), xl_c))
        g_tmp = (
            jnp.mean(jnp.square(fake_crop_output - crop_fake_output))
            * tmp_ramp * tcfg.tmp_loss
        )
        total = g_adv + g_rec + g_feat + g_tmp
        return total, {"g": g_adv, "gr": g_rec, "gf": g_feat, "tp": g_tmp}

    (_, metrics), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
        state.trainable
    )
    g_updates, g_opt_state = g_opt.update(g_grads, state.g_opt_state,
                                          state.trainable)
    trainable = optax.apply_updates(state.trainable, g_updates)
    ema = ema_update(state.ema, trainable, EMA_DECAY)

    metrics["d"] = d_loss
    return (
        TrainTState(trainable, ema, d_params, g_opt_state, d_opt_state,
                    state.step + 1),
        metrics,
    )
