"""Synthetic paired-data engine — training uses NO real data.

Capability-parity with reference train_vtoonify_d.py:120-137 (pretrain) and
:238-276 (full training): random w latents + editing-direction noise through
the frozen StyleGAN/DualStyleGAN produce (content, stylized-target) pairs,
with anti-aliased downsampling, BiSeNet parsing-map inputs and joint geometric
augmentation. Everything here runs inside the jitted train step under
stop_gradient — the "data loader" IS the accelerator graph (zero host I/O).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vtoonify_tpu.models import dualstylegan as D
from vtoonify_tpu.models import generator as G
from vtoonify_tpu.models.bisenet import bisenet_apply
from vtoonify_tpu.models.vtoonify import VToonifyConfig
from vtoonify_tpu.ops.upfirdn2d import downsample_2x, make_kernel
from vtoonify_tpu.train.augment import random_apply_affine

BLUR_1D = make_kernel((1.0, 3.0, 3.0, 1.0))
PARSING_WEIGHT = 1.0 / 16.0


def down(x):
    """reference Downsample(kernel=[1,3,3,1], factor=2) (train_vtoonify_d.py:469)."""
    return downsample_2x(x, BLUR_1D.astype(x.dtype))


def _wdtype(params):
    """Working dtype of a (possibly low-precision-cast) param tree. The
    synthesis graph is dtype-polymorphic — the trainers opt into bf16 data
    synthesis by casting the frozen teacher params (steps._mp_cast); every
    RNG draw here follows this dtype so no f32 leaf silently promotes the
    teacher forwards back to float32 (see the f32-promotion-leak note in
    docs/PERF.md)."""
    for leaf in jax.tree_util.tree_leaves(params):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            return leaf.dtype
    return jnp.float32


def sample_content_w_batch(key, gen_params, gcfg: G.GeneratorConfig,
                           directions, batch: int):
    """w' = repeat_n(MLP(z)) with editing noise on layers 3:7
    (train_vtoonify_d.py:122-124, 239-241)."""
    k1, k2 = jax.random.split(key)
    z = jax.random.normal(k1, (batch, gcfg.style_dim), jnp.float32)
    w = G.style_mlp(gen_params, gcfg, z.astype(_wdtype(gen_params)))
    ws = jnp.repeat(w[:, None, :], gcfg.n_latent, axis=1)
    idx = jax.random.randint(k2, (batch,), 0, directions.shape[0])
    ws = ws.at[:, 3:7].add(directions[idx, 3:7])
    return ws


def stylegan_image(gen_params, gcfg, ws, key):
    """x'' = clamp(G0(w'), trunc 0.5 around 0) with random per-layer noise."""
    noise = G.make_noise(gen_params, gcfg, key, randomize=True,
                         batch=ws.shape[0], dtype=_wdtype(gen_params))
    img = G.generate(
        gen_params, gcfg, [0.5 * ws], input_is_latent=True, noise=noise
    )
    return jnp.clip(img, -1.0, 1.0)


def parsing_input(parsing_params, img512):
    """mask512 = BiSeNet(2·clamp(x512)); weighted concat happens downstream
    (train_vtoonify_d.py:129-130)."""
    return bisenet_apply(parsing_params, 2.0 * jnp.clip(img512, -1.0, 1.0))


def synth_pretrain_batch(key, vt_params, cfg: VToonifyConfig, parsing_params,
                         directions, style, d_s):
    """One pretrain iteration's frozen-teacher data
    (train_vtoonify_d.py:120-137). Returns dict with real_input (B,256,256,22),
    real_feat, real_skip."""
    ds_params = vt_params["generator"]
    gen_params = ds_params["generator"]
    gcfg = cfg.generator
    dcfg = cfg.dualstylegan
    k1, k2, k3 = jax.random.split(key, 3)
    batch = style.shape[0]

    ws = sample_content_w_batch(k1, gen_params, gcfg, directions, batch)
    img_gen = stylegan_image(gen_params, gcfg, ws, k2)
    img512 = down(img_gen)
    img256 = down(img512)
    mask512 = parsing_input(parsing_params, img512)
    real_input = jnp.concatenate(
        [img256, down(mask512) * PARSING_WEIGHT], axis=-1
    )

    noise = G.make_noise(gen_params, gcfg, k3, randomize=True, batch=batch,
                         dtype=_wdtype(gen_params))
    weights = [d_s] * dcfg.n_latent
    real_feat, real_skip = D.dualstylegan_apply(
        ds_params, dcfg, [0.5 * ws], style, input_is_latent=True, noise=noise,
        use_res=True, interp_weights=weights, return_feat=True,
    )
    return {
        "real_input": jax.lax.stop_gradient(real_input),
        "real_feat": jax.lax.stop_gradient(real_feat),
        "real_skip": jax.lax.stop_gradient(real_skip),
    }


def synth_train_batch(key, vt_params, cfg: VToonifyConfig, parsing_params,
                      psp_params, psp_cfg, latent_avg, directions, style,
                      d_s, weights, wc_prev, color_fuse_t, use_color_jitter,
                      xl_override=None, aug_p: float = 0.2,
                      aug_max_pad=None):
    """One full-training iteration's paired data (train_vtoonify_d.py:238-276).

    Returns dict with real_input (x_down), real_input1024, mask1024,
    real_output (y), xl (w''), wc (for the next iteration's color jitter).
    `color_fuse_t` = i/(iter/2) ramp value; `use_color_jitter` a traced bool.
    """
    from vtoonify_tpu.models.psp_encoder import psp_encoder_apply
    from vtoonify_tpu.models.vtoonify import zplus2wplus
    from vtoonify_tpu.ops.interp import avg_pool

    ds_params = vt_params["generator"]
    gen_params = ds_params["generator"]
    gcfg = cfg.generator
    dcfg = cfg.dualstylegan
    ks = jax.random.split(key, 5)
    batch = style.shape[0]

    wc = sample_content_w_batch(ks[0], gen_params, gcfg, directions, batch)
    xc = stylegan_image(gen_params, gcfg, wc, ks[1])

    if xl_override is not None:
        xl = xl_override  # fix_style & not fix_color: transfer that style's color
    else:
        # adaptive_avg_pool2d(xc, 256) (train_vtoonify_d.py:248); tiny configs
        # (<256px) upsample instead so pSp still sees 256px.
        if xc.shape[1] >= 256:
            xc256 = avg_pool(xc, xc.shape[1] // 256)
        else:
            from vtoonify_tpu.ops.interp import resize_bilinear

            xc256 = resize_bilinear(xc, (256, 256))
        xl_zp = psp_encoder_apply(
            psp_params, psp_cfg, xc256, latent_avg=latent_avg,
        )
        xl_w = zplus2wplus(vt_params, cfg, xl_zp)
        xl = jnp.concatenate([style[:, 0:7], xl_w[:, 7:18]], axis=1)
    xl = jax.lax.stop_gradient(xl)

    noise = G.make_noise(gen_params, gcfg, ks[2], randomize=True, batch=batch,
                         dtype=_wdtype(gen_params))
    xs = D.dualstylegan_apply(
        ds_params, dcfg, [0.5 * wc], xl, input_is_latent=True, noise=noise,
        use_res=True, interp_weights=list(weights),
    )
    xs = jnp.clip(xs, -1.0, 1.0)

    # color jitter: fuse wc[7:] with the previous iteration's (ramped)
    def jittered(_):
        wcf = wc.at[:, 7:].set(
            wc_prev[:, 7:] * (color_fuse_t - 1.0)
            + wc[:, 7:] * (2.0 - color_fuse_t)
        )
        return jnp.clip(
            G.generate(gen_params, gcfg, [0.5 * wcf], input_is_latent=True,
                       noise=G.make_noise(gen_params, gcfg, ks[3],
                                          randomize=True, batch=batch,
                                          dtype=_wdtype(gen_params))),
            -1.0, 1.0,
        )

    xc = jax.lax.cond(use_color_jitter, jittered, lambda _: xc, None)

    imgs, _ = random_apply_affine(
        jnp.concatenate([xc, xs], axis=-1), aug_p, key=ks[4],
        max_pad=aug_max_pad,
    )
    real_input1024 = imgs[..., 0:3]
    real_output = imgs[..., 3:6]
    real_input512 = down(real_input1024)
    real_input256 = down(real_input512)
    mask512 = parsing_input(parsing_params, real_input512)
    mask256 = down(mask512)
    mask1024 = jnp.repeat(jnp.repeat(mask512, 2, axis=1), 2, axis=2)
    real_input = jnp.concatenate(
        [real_input256, mask256 * PARSING_WEIGHT], axis=-1
    )
    sg = jax.lax.stop_gradient
    return {
        "real_input": sg(real_input),
        "real_input1024": sg(real_input1024),
        "mask1024": sg(mask1024),
        "real_output": sg(real_output),
        "xl": xl,
        "wc": sg(wc),
    }


# --- VToonify-T variants (reference train_vtoonify_t.py) ---------------------


def synth_pretrain_t_batch(key, base_params, gcfg, vt_params,
                           cfg: VToonifyConfig, parsing_params, directions,
                           batch: int):
    """T-pretrain teacher data (train_vtoonify_t.py:105-119): content from the
    un-blended base G0; teacher features from the blended G1 via the
    return_feature_ind=6 early exit."""
    k1, k2, k3 = jax.random.split(key, 3)
    ws = sample_content_w_batch(k1, base_params, gcfg, directions, batch)
    img_gen = stylegan_image(base_params, gcfg, ws, k2)
    img512 = down(img_gen)
    img256 = down(img512)
    mask512 = parsing_input(parsing_params, img512)
    real_input = jnp.concatenate(
        [img256, down(mask512) * PARSING_WEIGHT], axis=-1
    )
    gp = vt_params["generator"]
    noise = G.make_noise(gp, gcfg, k3, randomize=True, batch=batch,
                         dtype=_wdtype(gp))
    real_feat, real_skip = G.generator_apply(
        gp, gcfg, 0.5 * ws, noise=noise, return_feature_ind=6
    )
    sg = jax.lax.stop_gradient
    return {
        "real_input": sg(real_input),
        "real_feat": sg(real_feat),
        "real_skip": sg(real_skip),
    }


def synth_train_t_batch(key, base_params, gcfg, vt_params,
                        cfg: VToonifyConfig, parsing_params, psp_params,
                        psp_cfg, latent_avg, directions, batch: int,
                        aug_p: float = 0.2, aug_max_pad=None):
    """T full-training pair (train_vtoonify_t.py:193-218): xl = concat of the
    0.5-truncated first-7 content w and the pSp color code; y' from blended G1
    with NO extra truncation."""
    from vtoonify_tpu.models.psp_encoder import psp_encoder_apply
    from vtoonify_tpu.ops.interp import avg_pool, resize_bilinear

    ks = jax.random.split(key, 4)
    wc = sample_content_w_batch(ks[0], base_params, gcfg, directions, batch)
    xc = stylegan_image(base_params, gcfg, wc, ks[1])

    if xc.shape[1] >= 256:
        xc256 = avg_pool(xc, xc.shape[1] // 256)
    else:
        xc256 = resize_bilinear(xc, (256, 256))
    xl_zp = psp_encoder_apply(psp_params, psp_cfg, xc256,
                              latent_avg=latent_avg)
    nb, nl, nd = xl_zp.shape
    xl_w = G.style_mlp(base_params, gcfg, xl_zp.reshape(nb * nl, nd)).reshape(
        nb, nl, nd
    )
    xl = jnp.concatenate([wc[:, 0:7] * 0.5, xl_w[:, 7:18]], axis=1)
    xl = jax.lax.stop_gradient(xl)

    gp = vt_params["generator"]
    noise = G.make_noise(gp, gcfg, ks[2], randomize=True, batch=batch,
                         dtype=_wdtype(gp))
    xs = jnp.clip(
        G.generate(gp, gcfg, [xl], input_is_latent=True, noise=noise),
        -1.0, 1.0,
    )

    imgs, _ = random_apply_affine(
        jnp.concatenate([xc, xs], axis=-1), aug_p, key=ks[3],
        max_pad=aug_max_pad,
    )
    real_input1024 = imgs[..., 0:3]
    real_output = imgs[..., 3:6]
    real_input512 = down(real_input1024)
    real_input256 = down(real_input512)
    mask512 = parsing_input(parsing_params, real_input512)
    mask256 = down(mask512)
    mask1024 = jnp.repeat(jnp.repeat(mask512, 2, axis=1), 2, axis=2)
    real_input = jnp.concatenate(
        [real_input256, mask256 * PARSING_WEIGHT], axis=-1
    )
    sg = jax.lax.stop_gradient
    return {
        "real_input": sg(real_input),
        "real_input1024": sg(real_input1024),
        "mask1024": sg(mask1024),
        "real_output": sg(real_output),
        "xl": xl,
    }
