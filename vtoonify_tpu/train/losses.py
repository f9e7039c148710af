"""GAN + reconstruction losses (reference util.py:49-127, train_vtoonify_d.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def d_logistic_loss(real_pred, fake_pred):
    """reference util.py:68-72."""
    return jnp.mean(jax.nn.softplus(-real_pred)) + jnp.mean(
        jax.nn.softplus(fake_pred)
    )


def g_nonsaturating_loss(fake_pred):
    """reference util.py:85-88."""
    return jnp.mean(jax.nn.softplus(-fake_pred))


def d_r1_loss(d_apply, params, real_img):
    """reference util.py:75-82. In JAX "no weight gradients" is just: only
    differentiate w.r.t. the input (params enter as non-diff args)."""

    def pred_sum(x):
        return jnp.sum(d_apply(params, x))

    grad = jax.grad(pred_sum)(real_img)
    return jnp.mean(jnp.sum(jnp.square(grad).reshape(grad.shape[0], -1), axis=1))


def g_path_regularize(g_fn, latents, mean_path_length, key=None, decay=0.01,
                      noise=None):
    """StyleGAN2 path-length regularizer (reference util.py:91-108; part of
    the reference's loss surface though VToonify's trainers never call it).

    The torch version differentiates a stored autograd graph; functionally
    that is: grad of sum(g_fn(latents) * noise) w.r.t. latents. `g_fn` maps
    (B, n_latent, D) latents → (B, H, W, C) images. Returns
    (path_penalty, new_mean_path_length, path_lengths).
    """
    import math

    img_shape = jax.eval_shape(g_fn, latents).shape
    if noise is None:
        noise = jax.random.normal(key, img_shape) / math.sqrt(
            img_shape[1] * img_shape[2]
        )

    def scalar(lat):
        return jnp.sum(g_fn(lat) * noise)

    grad = jax.grad(scalar)(latents)
    path_lengths = jnp.sqrt(jnp.mean(jnp.sum(jnp.square(grad), axis=2),
                                     axis=1))
    path_mean = mean_path_length + decay * (
        jnp.mean(path_lengths) - mean_path_length
    )
    path_penalty = jnp.mean(jnp.square(path_lengths - path_mean))
    return path_penalty, jax.lax.stop_gradient(path_mean), path_lengths


def make_noise(key, batch, latent_dim, n_noise):
    """reference util.py:111-118: one (B, D) z, or a list of them."""
    if n_noise == 1:
        return jax.random.normal(key, (batch, latent_dim))
    return list(jax.random.normal(key, (n_noise, batch, latent_dim)))


def mixing_noise(key, batch, latent_dim, prob):
    """reference util.py:121-126: with probability `prob`, two zs for style
    mixing, else one. The list length is data-dependent — call OUTSIDE jit
    (the reference likewise branches on host-side random.random())."""
    kb, kn = jax.random.split(key)
    if prob > 0 and float(jax.random.uniform(kb)) < prob:
        return make_noise(kn, batch, latent_dim, 2)
    return [make_noise(kn, batch, latent_dim, 1)]


def mse_loss(a, b):
    return jnp.mean(jnp.square(a - b))


def mask_loss(m_Es, d_s, weight):
    """L_msk (reference train_vtoonify_d.py:315-319)."""
    gd_s = (1 - d_s) ** 2 * 0.9 + 0.1
    total = 0.0
    for m_E in m_Es:
        total = total + jax.nn.relu(jnp.mean(m_E) - gd_s) * weight
    return total
