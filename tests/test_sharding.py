"""Multi-device tests on the virtual 8-device CPU mesh (SURVEY.md §4(d)):
DP-sharded inference over the frame axis, and a DP×TP-sharded training step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vtoonify_tpu.models.bisenet import init_bisenet
from vtoonify_tpu.models.psp_encoder import PSPEncoderConfig, init_psp_encoder
from vtoonify_tpu.models.vtoonify import (
    CondDiscriminatorConfig,
    VToonifyConfig,
    init_cond_discriminator,
    init_vtoonify,
)
from vtoonify_tpu.parallel.mesh import (
    make_mesh,
    shard_array_batch,
    shard_params,
)

TINY = VToonifyConfig(in_size=32, out_size=128, channel_multiplier=1,
                      num_res_layers=2, backbone="dualstylegan")


def test_eight_devices_present():
    assert jax.device_count() >= 8


def test_dp_inference_frame_sharding():
    from vtoonify_tpu.pipeline.toonify import frame_graph

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 2)
    vt_params = init_vtoonify(ks[0], TINY)
    parsing_params = init_bisenet(ks[1])

    mesh = make_mesh(8, tp=1)
    vt_sh = shard_params(vt_params, mesh)
    pp_sh = shard_params(parsing_params, mesh)

    frames = np.random.RandomState(1).randint(
        0, 256, (8, 32, 32, 3), dtype=np.uint8
    )
    frames_sh = shard_array_batch(jnp.asarray(frames), mesh)
    s_w = jnp.zeros((1, TINY.n_latent, 512))

    fn = jax.jit(frame_graph, static_argnums=(1,),
                 static_argnames=("dtype",))
    out = fn(vt_sh, TINY, pp_sh, frames_sh, s_w, jnp.asarray(0.5),
             dtype=jnp.float32)
    out.block_until_ready()
    assert out.shape == (8, 128, 128, 3)
    # output stays sharded over dp — frames never gathered to one device
    assert len(out.sharding.device_set) == 8

    # matches the unsharded single-device result
    ref = fn(vt_params, TINY, parsing_params, jnp.asarray(frames), s_w,
             jnp.asarray(0.5), dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_dp_tp_train_step():
    from vtoonify_tpu.models.lpips import init_lpips
    from vtoonify_tpu.train.steps import (
        TrainDConfig,
        init_train_d_state,
        split_trainable,
        train_d_step,
    )

    key = jax.random.PRNGKey(10)
    ks = jax.random.split(key, 8)
    vt_params = init_vtoonify(ks[0], TINY)
    parsing_params = init_bisenet(ks[1])
    directions = jax.random.normal(ks[2], (4, TINY.n_latent, 512)) * 0.1
    styles = jax.random.normal(ks[3], (3, TINY.n_latent, 512)) * 0.3
    dcfg = CondDiscriminatorConfig(size=64, channel_multiplier=1,
                                   use_condition=True, style_num=3)
    d_params = init_cond_discriminator(ks[4], dcfg)
    psp_cfg = PSPEncoderConfig(n_styles=TINY.n_latent)
    psp_params = init_psp_encoder(ks[5], psp_cfg)
    lpips_params = init_lpips(ks[6])
    tcfg = TrainDConfig(crop_size=96, lpips_size=64, aug_max_pad=40)

    mesh = make_mesh(8, tp=2)  # 4-way DP × 2-way TP
    _, frozen = split_trainable(vt_params, pretrain=False)
    state = init_train_d_state(vt_params, d_params, batch=4, cfg=TINY,
                               tcfg=tcfg)
    # params TP-sharded over channel dims; batch DP-sharded
    state = state._replace(
        trainable=shard_params(state.trainable, mesh, tp=True),
        d_params=shard_params(state.d_params, mesh, tp=True),
    )
    frozen = shard_params(frozen, mesh, tp=True)
    parsing_sh = shard_params(parsing_params, mesh)
    style_ind = shard_array_batch(jnp.array([0, 1, 2, 0]), mesh)
    style = shard_array_batch(styles[jnp.array([0, 1, 2, 0])], mesh)

    step = jax.jit(train_d_step,
                   static_argnames=("cfg", "dcfg", "tcfg", "psp_cfg"))
    state2, metrics = step(
        state, frozen, parsing_sh, psp_params, psp_cfg, None, lpips_params,
        TINY, dcfg, tcfg, directions, style, style_ind, jnp.asarray(0.4),
        tuple([0.4] * 7 + [1.0] * (TINY.n_latent - 7)),
        jnp.asarray(0.0), jnp.asarray(0.5), jnp.asarray(False), ks[7],
    )
    jax.block_until_ready(state2)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    assert int(state2.step) == 1

    # the production mixed-precision config (bf16 forwards + bf16 data
    # synthesis) must also compile and run under the same dp4xtp2 sharding
    tcfg16 = tcfg._replace(compute_dtype="bfloat16")
    state16 = init_train_d_state(vt_params, d_params, batch=4, cfg=TINY,
                                 tcfg=tcfg16)
    state16 = state16._replace(
        trainable=shard_params(state16.trainable, mesh, tp=True),
        d_params=shard_params(state16.d_params, mesh, tp=True),
    )
    state16b, metrics16 = step(
        state16, frozen, parsing_sh, psp_params, psp_cfg, None, lpips_params,
        TINY, dcfg, tcfg16, directions, style, style_ind, jnp.asarray(0.4),
        tuple([0.4] * 7 + [1.0] * (TINY.n_latent - 7)),
        jnp.asarray(0.0), jnp.asarray(0.5), jnp.asarray(False), ks[7],
    )
    jax.block_until_ready(state16b)
    for k, v in metrics16.items():
        assert np.isfinite(float(v)), k
    for leaf in jax.tree_util.tree_leaves(state16b.trainable):
        assert leaf.dtype == jnp.float32


def _assert_tp_sharded(params, mesh, min_channels=256):
    """Wide conv kernels / linear weights must actually be TP-sharded on the
    mesh (their last dim split over 'tp'), everything else replicated."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_wide = 0
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        wide = (
            (leaf.ndim == 4 and leaf.shape[-1] >= min_channels)
            or (leaf.ndim == 2 and leaf.shape[-1] >= min_channels)
        )
        want = (
            P(*([None] * (leaf.ndim - 1) + ["tp"])) if wide else P()
        )
        assert leaf.sharding.is_equivalent_to(
            NamedSharding(mesh, want), leaf.ndim
        ), f"{jax.tree_util.keystr(path)}: {leaf.sharding} != {want}"
        n_wide += int(wide)
    assert n_wide > 0, "no wide params found — TP rule untested"


def test_dp_tp_pretrain_step():
    """Stage-1 encoder distillation on the dp4×tp2 mesh (the reference DDP
    wraps BOTH stages, train_vtoonify_d.py:454-461) — finite loss, f32 state,
    and the frozen generator's wide convs really split over 'tp'."""
    from vtoonify_tpu.train.steps import (
        init_pretrain_state,
        pretrain_step,
        split_trainable,
    )

    key = jax.random.PRNGKey(20)
    ks = jax.random.split(key, 4)
    vt_params = init_vtoonify(ks[0], TINY)
    parsing_params = init_bisenet(ks[1])
    directions = jax.random.normal(ks[2], (4, TINY.n_latent, 512)) * 0.1

    mesh = make_mesh(8, tp=2)
    _, frozen = split_trainable(vt_params, pretrain=True)
    frozen = shard_params(frozen, mesh, tp=True)
    _assert_tp_sharded(frozen["generator"], mesh)
    parsing_sh = shard_params(parsing_params, mesh)

    state = init_pretrain_state(vt_params)
    state = state._replace(
        encoder=shard_params(state.encoder, mesh),
        ema_encoder=shard_params(state.ema_encoder, mesh),
    )
    style = shard_array_batch(
        jax.random.normal(ks[3], (4, TINY.n_latent, 512)) * 0.3, mesh
    )

    step = jax.jit(pretrain_step, static_argnames=("cfg", "lr"))
    state2, metrics = step(state, frozen, parsing_sh, TINY, directions,
                           style, jnp.asarray(0.5), jax.random.PRNGKey(21))
    jax.block_until_ready(state2)
    assert np.isfinite(float(metrics["emse"]))
    assert int(state2.step) == 1
    for leaf in jax.tree_util.tree_leaves(state2.encoder):
        assert leaf.dtype == jnp.float32


def test_dp_tp_train_t_step():
    """Full T-backbone GAN step on the dp4×tp2 mesh (the reference's
    train_vtoonify_t.py DDP-wraps the same stage)."""
    from vtoonify_tpu.models.generator import init_generator
    from vtoonify_tpu.models.lpips import init_lpips
    from vtoonify_tpu.models.psp_encoder import (
        PSPEncoderConfig,
        init_psp_encoder,
    )
    from vtoonify_tpu.train.steps import (
        TrainDConfig,
        init_train_t_state,
        split_trainable,
        train_t_step,
    )

    tiny_t = VToonifyConfig(in_size=32, out_size=128, channel_multiplier=1,
                            num_res_layers=2, backbone="toonify")
    key = jax.random.PRNGKey(30)
    ks = jax.random.split(key, 8)
    vt_params = init_vtoonify(ks[0], tiny_t)
    base_params = init_generator(ks[1], tiny_t.generator)
    parsing_params = init_bisenet(ks[2])
    directions = jax.random.normal(ks[3], (4, tiny_t.n_latent, 512)) * 0.1
    dcfg = CondDiscriminatorConfig(size=64, channel_multiplier=1,
                                   use_condition=False)
    d_params = init_cond_discriminator(ks[4], dcfg)
    psp_cfg = PSPEncoderConfig(n_styles=tiny_t.n_latent)
    psp_params = init_psp_encoder(ks[5], psp_cfg)
    lpips_params = init_lpips(ks[6])
    tcfg = TrainDConfig(crop_size=96, lpips_size=64, aug_max_pad=40)

    mesh = make_mesh(8, tp=2)
    _, frozen = split_trainable(vt_params, pretrain=False)
    frozen = shard_params(frozen, mesh, tp=True)
    base_sh = shard_params(base_params, mesh, tp=True)
    parsing_sh = shard_params(parsing_params, mesh)
    state = init_train_t_state(vt_params, d_params, tcfg)
    state = state._replace(
        trainable=shard_params(state.trainable, mesh, tp=True),
        d_params=shard_params(state.d_params, mesh, tp=True),
    )
    _assert_tp_sharded(state.d_params, mesh)

    step = jax.jit(
        train_t_step,
        static_argnames=("cfg", "dcfg", "tcfg", "psp_cfg", "batch"),
    )
    state2, metrics = step(
        state, frozen, base_sh, parsing_sh, psp_params, psp_cfg, None,
        lpips_params, tiny_t, dcfg, tcfg, directions, 4, jnp.asarray(0.5),
        ks[7],
    )
    jax.block_until_ready(state2)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    assert int(state2.step) == 1


def test_dp_tp_inference_pipeline_e2e():
    """End-to-end ToonifyPipeline batch on a dp4×tp2 mesh: output matches the
    unsharded single-device pipeline to ≤1 uint8 LSB on a vanishing fraction
    of pixels (frame-axis DP + channel TP on the wide convs; GSPMD inserts
    all collectives).

    Why not bit-for-bit: under channel TP each wide conv is two half-channel
    convs combined by a psum, whereas the unsharded graph accumulates the
    full channel sum inside one conv — float addition is not associative, so
    a value landing exactly on a 0.5 quantization boundary can round to a
    neighbouring uint8 (observed: 1 pixel in 196 608). DP alone stays
    bit-exact (test_dp_inference_frame_sharding)."""
    from vtoonify_tpu.pipeline.toonify import ToonifyPipeline

    key = jax.random.PRNGKey(40)
    ks = jax.random.split(key, 2)
    vt_params = init_vtoonify(ks[0], TINY)
    parsing_params = init_bisenet(ks[1])

    frames = np.random.RandomState(2).randint(
        0, 256, (4, 32, 32, 3), dtype=np.uint8
    )
    s_w = jnp.zeros((1, TINY.n_latent, 512))

    mesh = make_mesh(8, tp=2)
    pipe_sh = ToonifyPipeline(vt_params, TINY, parsing_params,
                              dtype=jnp.float32, mesh=mesh)
    pipe_ref = ToonifyPipeline(vt_params, TINY, parsing_params,
                               dtype=jnp.float32)
    out = pipe_sh.process_batch(frames, s_w, 0.5)
    ref = pipe_ref.process_batch(frames, s_w, 0.5)
    assert out.shape == (4, 128, 128, 3)
    diff = np.abs(np.asarray(out).astype(np.int32)
                  - np.asarray(ref).astype(np.int32))
    assert diff.max() <= 1, f"TP divergence beyond the rounding LSB: {diff.max()}"
    frac = float((diff > 0).mean())
    assert frac <= 1e-3, f"too many quantization-edge pixels: {frac:.2e}"


def test_hlo_collectives_train_d():
    """Collective-inventory guard (VERDICT r3 #7): the compiled dp4×tp2
    D-train step must contain NO all-to-alls — an unintended GSPMD reshard
    is real ICI traffic on hardware and a rendezvous-deadlock hazard on
    thread-starved CPU hosts (the round-3 dryrun abort, MULTICHIP_r03)."""
    from vtoonify_tpu.models.lpips import init_lpips
    from vtoonify_tpu.parallel.audit import collective_counts
    from vtoonify_tpu.train.steps import (
        TrainDConfig,
        init_train_d_state,
        split_trainable,
        train_d_step,
    )

    key = jax.random.PRNGKey(50)
    ks = jax.random.split(key, 8)
    vt_params = init_vtoonify(ks[0], TINY)
    parsing_params = init_bisenet(ks[1])
    directions = jax.random.normal(ks[2], (4, TINY.n_latent, 512)) * 0.1
    styles = jax.random.normal(ks[3], (3, TINY.n_latent, 512)) * 0.3
    dcfg = CondDiscriminatorConfig(size=64, channel_multiplier=1,
                                   use_condition=True, style_num=3)
    d_params = init_cond_discriminator(ks[4], dcfg)
    psp_cfg = PSPEncoderConfig(n_styles=TINY.n_latent)
    psp_params = init_psp_encoder(ks[5], psp_cfg)
    lpips_params = init_lpips(ks[6])
    tcfg = TrainDConfig(crop_size=96, lpips_size=64, aug_max_pad=40)

    mesh = make_mesh(8, tp=2)
    _, frozen = split_trainable(vt_params, pretrain=False)
    state = init_train_d_state(vt_params, d_params, batch=4, cfg=TINY,
                               tcfg=tcfg)
    state = state._replace(
        trainable=shard_params(state.trainable, mesh, tp=True),
        d_params=shard_params(state.d_params, mesh, tp=True),
    )
    frozen = shard_params(frozen, mesh, tp=True)
    parsing_sh = shard_params(parsing_params, mesh)
    style_ind = shard_array_batch(jnp.array([0, 1, 2, 0]), mesh)
    style = shard_array_batch(styles[jnp.array([0, 1, 2, 0])], mesh)

    lowered = jax.jit(
        train_d_step, static_argnames=("cfg", "dcfg", "tcfg", "psp_cfg")
    ).lower(
        state, frozen, parsing_sh, psp_params, psp_cfg, None, lpips_params,
        TINY, dcfg, tcfg, directions, style, style_ind, jnp.asarray(0.4),
        tuple([0.4] * 7 + [1.0] * (TINY.n_latent - 7)),
        jnp.asarray(0.0), jnp.asarray(0.5), jnp.asarray(False), ks[7],
    )
    counts = collective_counts(lowered.compile().as_text())
    assert counts.get("all-reduce", 0) > 0, counts  # DP grad sync must exist
    assert counts.get("all-to-all", 0) == 0, counts


def test_hlo_collectives_train_t():
    """Same guard for the T-backbone step — the one that aborted round 3's
    dryrun (47 kernel-reshape all-to-alls from the upsample-kernel
    composition, since rewritten as a sharding-transparent einsum)."""
    from vtoonify_tpu.models.generator import init_generator
    from vtoonify_tpu.models.lpips import init_lpips
    from vtoonify_tpu.parallel.audit import collective_counts
    from vtoonify_tpu.train.steps import (
        TrainDConfig,
        init_train_t_state,
        split_trainable,
        train_t_step,
    )

    tiny_t = VToonifyConfig(in_size=32, out_size=128, channel_multiplier=1,
                            num_res_layers=2, backbone="toonify")
    key = jax.random.PRNGKey(60)
    ks = jax.random.split(key, 8)
    vt_params = init_vtoonify(ks[0], tiny_t)
    base_params = init_generator(ks[1], tiny_t.generator)
    parsing_params = init_bisenet(ks[2])
    directions = jax.random.normal(ks[3], (4, tiny_t.n_latent, 512)) * 0.1
    dcfg = CondDiscriminatorConfig(size=64, channel_multiplier=1,
                                   use_condition=False)
    d_params = init_cond_discriminator(ks[4], dcfg)
    psp_cfg = PSPEncoderConfig(n_styles=tiny_t.n_latent)
    psp_params = init_psp_encoder(ks[5], psp_cfg)
    lpips_params = init_lpips(ks[6])
    tcfg = TrainDConfig(crop_size=96, lpips_size=64, aug_max_pad=40)

    mesh = make_mesh(8, tp=2)
    _, frozen = split_trainable(vt_params, pretrain=False)
    frozen = shard_params(frozen, mesh, tp=True)
    base_sh = shard_params(base_params, mesh, tp=True)
    parsing_sh = shard_params(parsing_params, mesh)
    state = init_train_t_state(vt_params, d_params, tcfg)
    state = state._replace(
        trainable=shard_params(state.trainable, mesh, tp=True),
        d_params=shard_params(state.d_params, mesh, tp=True),
    )

    lowered = jax.jit(
        train_t_step,
        static_argnames=("cfg", "dcfg", "tcfg", "psp_cfg", "batch"),
    ).lower(
        state, frozen, base_sh, parsing_sh, psp_params, psp_cfg, None,
        lpips_params, tiny_t, dcfg, tcfg, directions, 4, jnp.asarray(0.5),
        ks[7],
    )
    counts = collective_counts(lowered.compile().as_text())
    assert counts.get("all-reduce", 0) > 0, counts
    assert counts.get("all-to-all", 0) == 0, counts


def test_hlo_collectives_inference():
    """Inference frame graph: DP sharding must compile collective-free except
    BiSeNet/InstanceNorm all-reduces; SP may add halo collective-permutes and
    all-gathers but still no all-to-alls."""
    from vtoonify_tpu.parallel.audit import collective_counts
    from vtoonify_tpu.parallel.mesh import (
        make_spatial_mesh, replicated, shard_array_spatial,
    )
    from vtoonify_tpu.pipeline.toonify import frame_graph

    key = jax.random.PRNGKey(65)
    ks = jax.random.split(key, 2)
    vt_params = init_vtoonify(ks[0], TINY)
    parsing_params = init_bisenet(ks[1])
    s_w = jnp.zeros((1, TINY.n_latent, 512))
    fn = jax.jit(frame_graph, static_argnums=(1,), static_argnames=("dtype",))

    mesh = make_mesh(8, tp=2)
    frames = shard_array_batch(
        jnp.zeros((4, 32, 32, 3), jnp.uint8), mesh)
    low = fn.lower(shard_params(vt_params, mesh, tp=True), TINY,
                   shard_params(parsing_params, mesh), frames, s_w,
                   jnp.asarray(0.5), dtype=jnp.float32)
    counts = collective_counts(low.compile().as_text())
    assert counts.get("all-to-all", 0) == 0, counts

    sp_mesh = make_spatial_mesh(8)
    rep = lambda t: jax.tree.map(  # noqa: E731
        lambda a: jax.device_put(a, replicated(sp_mesh)), t)
    frames_sp = shard_array_spatial(jnp.zeros((1, 64, 64, 3), jnp.uint8),
                                    sp_mesh)
    low = fn.lower(rep(vt_params), TINY, rep(parsing_params), frames_sp,
                   s_w, jnp.asarray(0.5), dtype=jnp.float32)
    counts = collective_counts(low.compile().as_text())
    assert counts.get("all-to-all", 0) == 0, counts


def test_sp_single_frame_inference():
    """SP latency scale-out: ONE frame, height axis sharded over 8 devices
    through the full frame graph (BiSeNet + VToonify, packed stages) —
    GSPMD halo exchanges + all-reduces, output bit-equal to single-device
    and still height-sharded (never gathered)."""
    from vtoonify_tpu.parallel.mesh import (
        make_spatial_mesh, replicated, shard_array_spatial,
    )
    from vtoonify_tpu.pipeline.toonify import frame_graph

    key = jax.random.PRNGKey(70)
    ks = jax.random.split(key, 2)
    vt_params = init_vtoonify(ks[0], TINY)
    parsing_params = init_bisenet(ks[1])

    frames = np.random.RandomState(3).randint(
        0, 256, (1, 64, 64, 3), dtype=np.uint8
    )
    s_w = jnp.zeros((1, TINY.n_latent, 512))

    fn = jax.jit(frame_graph, static_argnums=(1,), static_argnames=("dtype",))
    ref = fn(vt_params, TINY, parsing_params, jnp.asarray(frames), s_w,
             jnp.asarray(0.5), dtype=jnp.float32)

    mesh = make_spatial_mesh(8)
    rep = lambda t: jax.tree.map(  # noqa: E731
        lambda a: jax.device_put(a, replicated(mesh)), t)
    out = fn(rep(vt_params), TINY, rep(parsing_params),
             shard_array_spatial(jnp.asarray(frames), mesh), s_w,
             jnp.asarray(0.5), dtype=jnp.float32)
    out.block_until_ready()
    assert out.shape == (1, 256, 256, 3)
    assert len(out.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


@pytest.mark.e2e
def test_dryrun_multichip_fits_driver_budget():
    """The driver's multi-chip record is only as good as the dryrun that
    fits its measurement window (VERDICT r4 #1: MULTICHIP_r04 was rc=124
    after 3/5 phases). Runs the REAL __graft_entry__.dryrun_multichip(8) —
    subprocess isolation, np-materialized zoo, channel_max=128 configs —
    and asserts the whole thing lands well inside the budget. Measured
    359-568 s over four runs on the 1-core CI host (2026-08-20; the
    spread is host load — user time is stable at ~5m20, sys time grows
    under session filesystem pressure). The bound matches the train
    group's 720 s hang-guard cap and stays far under r4's failing
    >1200 s design."""
    import importlib.util
    import os
    import time

    path = os.path.join(os.path.dirname(__file__), "..",
                        "__graft_entry__.py")
    spec = importlib.util.spec_from_file_location("graft_entry_test", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    t0 = time.time()
    mod.dryrun_multichip(8)
    wall = time.time() - t0
    assert wall < 720, f"dryrun took {wall:.0f}s (budget regression)"


def test_quick_dp_tp_smoke():
    """Quick-tier multi-device smoke (VERDICT r4 weak #6: the default
    `-m quick` run proved nothing about multi-device paths). Tiny dp4×tp2
    grad step: batch dp-sharded, weight tp-sharded, GSPMD inserts the grad
    all-reduce — compiles in seconds, runs on every dev-loop invocation."""
    mesh = make_mesh(8, tp=2)
    x = shard_array_batch(jnp.asarray(
        np.random.RandomState(0).randn(8, 64).astype(np.float32)), mesh)
    w = shard_params(
        {"w": jnp.asarray(
            np.random.RandomState(1).randn(64, 128).astype(np.float32))},
        mesh, tp=True, min_channels=64)
    assert len(w["w"].sharding.device_set) == 8
    assert "'tp'" in str(w["w"].sharding.spec)

    @jax.jit
    def step(p, xb):
        loss, g = jax.value_and_grad(
            lambda q: jnp.mean(jnp.tanh(xb @ q["w"]) ** 2))(p)
        return loss, jax.tree_util.tree_map(lambda a, b: a - 0.1 * b, p, g)

    loss, w2 = step(w, x)
    jax.block_until_ready(w2)
    # numerically identical to the unsharded computation
    loss_ref, w2_ref = step(
        jax.device_get(w) | {}, jnp.asarray(jax.device_get(x)))
    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(w2["w"]), np.asarray(w2_ref["w"]),
                               rtol=1e-5)
