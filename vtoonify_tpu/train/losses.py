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


def mse_loss(a, b):
    return jnp.mean(jnp.square(a - b))


def mask_loss(m_Es, d_s, weight):
    """L_msk (reference train_vtoonify_d.py:315-319)."""
    gd_s = (1 - d_s) ** 2 * 0.9 + 0.1
    total = 0.0
    for m_E in m_Es:
        total = total + jax.nn.relu(jnp.mean(m_E) - gd_s) * weight
    return total
