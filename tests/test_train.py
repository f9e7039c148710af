"""Training-stack tests: augmentation parity, LPIPS parity, loss parity, and
pretrain/full train-step smoke tests on a tiny config."""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from tests import reference_oracle as oracle
from vtoonify_tpu.convert.torch_import import (
    convert_bisenet,
    convert_cond_discriminator,
    convert_vtoonify,
    flatten_torch_state,
)
from vtoonify_tpu.models.lpips import convert_lpips, init_lpips, lpips_apply
from vtoonify_tpu.models.psp_encoder import PSPEncoderConfig, init_psp_encoder
from vtoonify_tpu.models.vtoonify import (
    CondDiscriminatorConfig,
    VToonifyConfig,
    init_cond_discriminator,
)
from vtoonify_tpu.train.augment import random_apply_affine, sample_affine
from vtoonify_tpu.train.losses import d_logistic_loss, g_nonsaturating_loss
from vtoonify_tpu.train.steps import (
    TrainDConfig,
    init_pretrain_state,
    init_train_d_state,
    pretrain_step,
    split_trainable,
    train_d_step,
)

oracle.install()


def test_augment_parity_with_explicit_G():
    from model.simple_augment import random_apply_affine as ref_aug

    rng = np.random.RandomState(50)
    img = rng.randn(2, 32, 32, 6).astype(np.float32)
    # mild random affines (the reference convention: G is the inverse matrix)
    theta = rng.uniform(-0.5, 0.5, size=(2,))
    Gs = []
    for i, t in enumerate(theta):
        c, s = np.cos(t), np.sin(t)
        sc = 1.0 + 0.1 * rng.randn()
        m = np.array([[c * sc, -s, 0.05], [s, c * sc, -0.03], [0, 0, 1]])
        Gs.append(np.linalg.inv(m))
    G = np.stack(Gs).astype(np.float32)

    ref_out, _ = ref_aug(
        torch.from_numpy(np.transpose(img, (0, 3, 1, 2)).copy()), 0.2,
        torch.from_numpy(G),
    )
    ours, _ = random_apply_affine(
        jnp.asarray(img), 0.2, G=jnp.asarray(G), max_pad=31
    )
    np.testing.assert_allclose(
        np.asarray(ours), oracle.to_nhwc(ref_out), atol=2e-4, rtol=1e-3
    )


def test_sample_affine_is_mild():
    G = sample_affine(jax.random.PRNGKey(0), 0.2, 64, 32, 32)
    assert G.shape == (64, 3, 3)
    # with p=0.2 most transforms should be near identity
    dev = jnp.linalg.norm(G - jnp.eye(3), axis=(1, 2))
    assert float(jnp.median(dev)) < 1.5
    assert bool(jnp.all(jnp.isfinite(G)))


def _torch_lpips(vgg_sd, lin_sd, x0, x1):
    """Inline torch oracle of net-lin LPIPS (networks_basic.py:27-92)."""
    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    chans = [(3, 64, 64), (64, 128, 128), (128, 256, 256, 256),
             (256, 512, 512, 512), (512, 512, 512, 512)]
    idxs = ((0, 2), (5, 7), (10, 12, 14), (17, 19, 21), (24, 26, 28))

    def feats(x):
        h = (x - shift) / scale
        out = []
        for si, stage in enumerate(idxs):
            if si > 0:
                h = F.max_pool2d(h, 2)
            for i in stage:
                w = torch.from_numpy(vgg_sd[f"features.{i}.weight"])
                b = torch.from_numpy(vgg_sd[f"features.{i}.bias"])
                h = F.relu(F.conv2d(h, w, b, padding=1))
            out.append(h)
        return out

    def unit(x):
        return x / (torch.sqrt(torch.sum(x ** 2, dim=1, keepdim=True)) + 1e-10)

    f0, f1 = feats(x0), feats(x1)
    val = 0
    for k in range(5):
        d = (unit(f0[k]) - unit(f1[k])) ** 2
        w = torch.from_numpy(lin_sd[f"lin{k}.model.1.weight"])
        val = val + F.conv2d(d, w).mean([2, 3], keepdim=True)
    return val


def test_lpips_parity():
    rng = np.random.RandomState(51)
    # random VGG16 + lin weights in torch layout
    chans = [3, 64, 64, 64, 128, 128, 128, 256, 256, 256, 256,
             512, 512, 512, 512, 512, 512, 512]
    conv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    conv_ch = [(3, 64), (64, 64), (64, 128), (128, 128), (128, 256),
               (256, 256), (256, 256), (256, 512), (512, 512), (512, 512),
               (512, 512), (512, 512), (512, 512)]
    vgg_sd = {}
    for i, (ci, co) in zip(conv_idx, conv_ch):
        vgg_sd[f"features.{i}.weight"] = (
            rng.randn(co, ci, 3, 3).astype(np.float32) * 0.05
        )
        vgg_sd[f"features.{i}.bias"] = rng.randn(co).astype(np.float32) * 0.05
    lin_sd = {
        f"lin{k}.model.1.weight": np.abs(
            rng.randn(1, c, 1, 1).astype(np.float32)
        )
        for k, c in enumerate([64, 128, 256, 512, 512])
    }
    params = convert_lpips(vgg_sd, lin_sd)

    x0 = rng.randn(2, 64, 64, 3).astype(np.float32).clip(-1, 1)
    x1 = rng.randn(2, 64, 64, 3).astype(np.float32).clip(-1, 1)
    ours = np.asarray(lpips_apply(params, jnp.asarray(x0), jnp.asarray(x1)))
    ref = _torch_lpips(
        vgg_sd, lin_sd,
        torch.from_numpy(np.transpose(x0, (0, 3, 1, 2)).copy()),
        torch.from_numpy(np.transpose(x1, (0, 3, 1, 2)).copy()),
    ).numpy()
    np.testing.assert_allclose(ours.reshape(-1), ref.reshape(-1), atol=1e-4,
                               rtol=1e-3)


def test_load_lpips_defaults(tmp_path):
    """The trainer's LPIPS loader: hard error without weights, and full
    parity through the default (vendored reference) lin heads when a VGG16
    state_dict is given (VERDICT r1 #3)."""
    from vtoonify_tpu.models.lpips import find_lin_weights, load_lpips

    with pytest.raises(ValueError, match="allow_random_lpips"):
        load_lpips(None, None, allow_random=False)

    lin_file = find_lin_weights()
    if lin_file is None:
        pytest.skip("vendored reference lin weights not present")
    lin_sd = {k: v.numpy() for k, v in
              torch.load(lin_file, map_location="cpu").items()}

    rng = np.random.RandomState(53)
    conv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    conv_ch = [(3, 64), (64, 64), (64, 128), (128, 128), (128, 256),
               (256, 256), (256, 256), (256, 512), (512, 512), (512, 512),
               (512, 512), (512, 512), (512, 512)]
    vgg_sd = {}
    for i, (ci, co) in zip(conv_idx, conv_ch):
        vgg_sd[f"features.{i}.weight"] = (
            rng.randn(co, ci, 3, 3).astype(np.float32) * 0.05
        )
        vgg_sd[f"features.{i}.bias"] = rng.randn(co).astype(np.float32) * 0.05
    vgg_path = str(tmp_path / "vgg16.pth")
    torch.save({k: torch.from_numpy(v) for k, v in vgg_sd.items()}, vgg_path)

    params, desc = load_lpips(vgg_path)  # lin heads default to the vendored file
    assert lin_file in desc
    x0 = rng.randn(2, 64, 64, 3).astype(np.float32).clip(-1, 1)
    x1 = rng.randn(2, 64, 64, 3).astype(np.float32).clip(-1, 1)
    ours = np.asarray(lpips_apply(params, jnp.asarray(x0), jnp.asarray(x1)))
    ref = _torch_lpips(
        vgg_sd, lin_sd,
        torch.from_numpy(np.transpose(x0, (0, 3, 1, 2)).copy()),
        torch.from_numpy(np.transpose(x1, (0, 3, 1, 2)).copy()),
    ).numpy()
    np.testing.assert_allclose(ours.reshape(-1), ref.reshape(-1), atol=1e-4,
                               rtol=1e-3)

    # random backbone still picks up the real lin heads
    params_r, desc_r = load_lpips(None, None, allow_random=True)
    assert "real lin heads" in desc_r
    got = np.asarray(params_r["lins"][0]["weight"]).reshape(-1)
    np.testing.assert_allclose(
        got, lin_sd["lin0.model.1.weight"].reshape(-1)
    )


def test_gan_losses_parity():
    rng = np.random.RandomState(52)
    r = rng.randn(8, 1).astype(np.float32)
    f = rng.randn(8, 1).astype(np.float32)
    ours_d = float(d_logistic_loss(jnp.asarray(r), jnp.asarray(f)))
    ref_d = float(
        F.softplus(-torch.from_numpy(r)).mean()
        + F.softplus(torch.from_numpy(f)).mean()
    )
    assert np.isclose(ours_d, ref_d, atol=1e-6)
    ours_g = float(g_nonsaturating_loss(jnp.asarray(f)))
    ref_g = float(F.softplus(-torch.from_numpy(f)).mean())
    assert np.isclose(ours_g, ref_g, atol=1e-6)


# --- tiny end-to-end training steps ----------------------------------------

TINY = VToonifyConfig(in_size=32, out_size=128, channel_multiplier=1,
                      num_res_layers=2, backbone="dualstylegan")


@pytest.fixture(scope="module")
def tiny_bundle():
    from vtoonify_tpu.models.bisenet import init_bisenet
    from vtoonify_tpu.models.vtoonify import init_vtoonify

    key = jax.random.PRNGKey(60)
    ks = jax.random.split(key, 4)
    vt_params = init_vtoonify(ks[0], TINY)
    parsing_params = init_bisenet(ks[1])
    directions = jax.random.normal(ks[2], (4, TINY.n_latent, 512)) * 0.1
    styles = jax.random.normal(ks[3], (3, TINY.n_latent, 512)) * 0.3
    return vt_params, parsing_params, directions, styles


def test_pretrain_step_runs_and_learns(tiny_bundle):
    vt_params, parsing_params, directions, styles = tiny_bundle
    trainable, frozen = split_trainable(vt_params, pretrain=True)
    state = init_pretrain_state(vt_params)

    step = jax.jit(pretrain_step, static_argnames=("cfg", "lr"))
    losses = []
    key = jax.random.PRNGKey(61)
    for i in range(3):
        key, sub = jax.random.split(key)
        state, metrics = step(
            state, frozen, parsing_params, TINY, directions,
            jnp.broadcast_to(styles[0:1], (2,) + styles.shape[1:]),
            jnp.asarray(0.5), sub,
        )
        losses.append(float(metrics["emse"]))
    assert all(np.isfinite(losses))
    assert int(state.step) == 3
    # params actually moved
    delta = jax.tree_util.tree_reduce(
        lambda acc, x: acc + float(jnp.sum(jnp.abs(x))),
        jax.tree_util.tree_map(
            lambda a, b: a - b, state.encoder, trainable["encoder"]
        ),
        0.0,
    )
    assert delta > 0


def test_train_d_step_runs(tiny_bundle):
    vt_params, parsing_params, directions, styles = tiny_bundle
    key = jax.random.PRNGKey(62)
    ks = jax.random.split(key, 4)
    dcfg = CondDiscriminatorConfig(size=64, channel_multiplier=1,
                                   use_condition=True, style_num=3)
    d_params = init_cond_discriminator(ks[0], dcfg)
    psp_cfg = PSPEncoderConfig(n_styles=TINY.n_latent)
    psp_params = init_psp_encoder(ks[1], psp_cfg)
    lpips_params = init_lpips(ks[2])
    tcfg = TrainDConfig(crop_size=96, lpips_size=64, aug_max_pad=80)

    _, frozen = split_trainable(vt_params, pretrain=False)
    state = init_train_d_state(vt_params, d_params, batch=2, cfg=TINY,
                               tcfg=tcfg)

    step = jax.jit(
        train_d_step,
        static_argnames=("cfg", "dcfg", "tcfg", "psp_cfg"),
    )
    b = 2
    style_ind = jnp.array([0, 2])
    state2, metrics = step(
        state, frozen, parsing_params, psp_params, psp_cfg, None,
        lpips_params, TINY, dcfg, tcfg, directions, styles[style_ind],
        style_ind, jnp.asarray(0.6),
        tuple([0.6] * 7 + [1.0] * (TINY.n_latent - 7)),
        jnp.asarray(0.0), jnp.asarray(0.5), jnp.asarray(False), ks[3],
    )
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    assert int(state2.step) == 1
    # D and G trainables both updated
    d_delta = jax.tree_util.tree_reduce(
        lambda acc, x: acc + float(jnp.sum(jnp.abs(x))),
        jax.tree_util.tree_map(lambda a, b: a - b, state2.d_params, d_params),
        0.0,
    )
    assert d_delta > 0


def test_train_steps_bf16_mixed_precision(tiny_bundle):
    """compute_dtype='bfloat16' (--bf16): network forwards run in bf16 while
    master weights, optimizer state and loss arithmetic stay float32. The
    bf16 pretrain loss must track the f32 loss on the same state/batch, and
    updated parameters must remain float32."""
    vt_params, parsing_params, directions, styles = tiny_bundle
    key = jax.random.PRNGKey(63)
    ks = jax.random.split(key, 4)
    style2 = jnp.broadcast_to(styles[0:1], (2,) + styles.shape[1:])

    state = init_pretrain_state(vt_params)
    _, frozen_pre = split_trainable(vt_params, pretrain=True)
    step = jax.jit(pretrain_step,
                   static_argnames=("cfg", "lr", "compute_dtype"))
    _, m32 = step(state, frozen_pre, parsing_params, TINY, directions,
                  style2, jnp.asarray(0.5), ks[0])
    s16, m16 = step(state, frozen_pre, parsing_params, TINY, directions,
                    style2, jnp.asarray(0.5), ks[0],
                    compute_dtype="bfloat16")
    l32, l16 = float(m32["emse"]), float(m16["emse"])
    assert np.isfinite(l16)
    assert abs(l16 - l32) / abs(l32) < 0.1, (l16, l32)
    for leaf in jax.tree_util.tree_leaves(s16.encoder):
        assert leaf.dtype == jnp.float32

    dcfg = CondDiscriminatorConfig(size=64, channel_multiplier=1,
                                   use_condition=True, style_num=3)
    d_params = init_cond_discriminator(ks[1], dcfg)
    psp_cfg = PSPEncoderConfig(n_styles=TINY.n_latent)
    psp_params = init_psp_encoder(ks[2], psp_cfg)
    lpips_params = init_lpips(jax.random.PRNGKey(64))
    tcfg = TrainDConfig(crop_size=96, lpips_size=64, aug_max_pad=80,
                        compute_dtype="bfloat16")
    _, frozen = split_trainable(vt_params, pretrain=False)
    dstate = init_train_d_state(vt_params, d_params, batch=2, cfg=TINY,
                                tcfg=tcfg)
    dstep = jax.jit(train_d_step,
                    static_argnames=("cfg", "dcfg", "tcfg", "psp_cfg"))
    style_ind = jnp.array([0, 2])
    dstate2, metrics = dstep(
        dstate, frozen, parsing_params, psp_params, psp_cfg, None,
        lpips_params, TINY, dcfg, tcfg, directions, styles[style_ind],
        style_ind, jnp.asarray(0.6),
        tuple([0.6] * 7 + [1.0] * (TINY.n_latent - 7)),
        jnp.asarray(0.0), jnp.asarray(0.5), jnp.asarray(False), ks[3],
    )
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
        assert jnp.asarray(v).dtype == jnp.float32, k
    for leaf in jax.tree_util.tree_leaves(
        (dstate2.trainable, dstate2.d_params, dstate2.ema)
    ):
        assert leaf.dtype == jnp.float32


def test_synth_dtype_bf16_tracks_f32(tiny_bundle):
    """bf16 data synthesis (synth_dtype following compute_dtype under --bf16)
    stays bf16 end to end — no f32 leaf (RNG draw, scalar) silently promotes
    the teacher forwards back to f32 — and its targets track the f32
    synthesis within low-precision rounding. --synth_fp32 (synth_dtype=
    'float32') restores the f32 path exactly."""
    from vtoonify_tpu.train import synth
    from vtoonify_tpu.train.steps import _mp_cast, _synth_cast

    vt_params, parsing_params, directions, styles = tiny_bundle
    key = jax.random.PRNGKey(71)
    style2 = jnp.broadcast_to(styles[0:1], (2,) + styles.shape[1:])
    d_s = jnp.asarray(0.5)

    b32 = synth.synth_pretrain_batch(
        key, vt_params, TINY, parsing_params, directions, style2, d_s)
    castp, _ = _mp_cast("bfloat16")
    b16 = synth.synth_pretrain_batch(
        key, castp(vt_params), TINY, castp(parsing_params),
        castp(directions), castp(style2), castp(d_s))

    for k, v in b16.items():
        assert v.dtype == jnp.bfloat16, (k, v.dtype)  # no promotion leak
    for k in b32:
        a = np.asarray(b32[k], np.float32)
        b = np.asarray(b16[k], np.float32)
        scale = max(1.0, float(np.abs(a).max()))
        assert np.abs(a - b).max() < 0.06 * scale, (
            k, float(np.abs(a - b).max()), scale)

    # "float32" forces identity casts (the --synth_fp32 escape hatch)
    scast, sup = _synth_cast("float32", "bfloat16")
    t = jnp.ones((2,), jnp.float32)
    assert scast(t).dtype == jnp.float32 and sup(t).dtype == jnp.float32


def test_remat_scope_traces_all_variants(tiny_bundle):
    """remat_scope ("all"/"g"/"lpips" under remat=True, plus remat=False)
    only changes WHAT the step rematerializes, never its math or output
    structure — all four variants must trace to identical output shapes
    (the bench_train.py remat-policy sweep relies on this knob)."""
    vt_params, parsing_params, directions, styles = tiny_bundle
    key = jax.random.PRNGKey(63)
    ks = jax.random.split(key, 4)
    dcfg = CondDiscriminatorConfig(size=64, channel_multiplier=1,
                                   use_condition=True, style_num=3)
    d_params = init_cond_discriminator(ks[0], dcfg)
    psp_cfg = PSPEncoderConfig(n_styles=TINY.n_latent)
    psp_params = init_psp_encoder(ks[1], psp_cfg)
    lpips_params = init_lpips(ks[2])
    _, frozen = split_trainable(vt_params, pretrain=False)

    shapes = []
    for remat, scope in ((True, "all"), (True, "g"), (True, "lpips"),
                         (False, "all")):
        tcfg = TrainDConfig(crop_size=96, lpips_size=64, aug_max_pad=80,
                            remat=remat, remat_scope=scope)
        state = init_train_d_state(vt_params, d_params, batch=2, cfg=TINY,
                                   tcfg=tcfg)
        style_ind = jnp.array([0, 2])
        out = jax.eval_shape(
            lambda st, tc=tcfg: train_d_step(
                st, frozen, parsing_params, psp_params, psp_cfg, None,
                lpips_params, TINY, dcfg, tc, directions, styles[style_ind],
                style_ind, jnp.asarray(0.6),
                tuple([0.6] * 7 + [1.0] * (TINY.n_latent - 7)),
                jnp.asarray(0.0), jnp.asarray(0.5), jnp.asarray(False),
                ks[3],
            ),
            state,
        )
        shapes.append(jax.tree_util.tree_map(
            lambda s: (s.shape, str(s.dtype)), out))
    assert shapes[0] == shapes[1] == shapes[2] == shapes[3]
