"""Exponential moving average of params as a pytree lerp.

reference util.py:54-59 (`accumulate`); decay 0.5**(32/10000) ≈ 0.99778
(train_vtoonify_d.py:95,210)."""

from __future__ import annotations

import jax

EMA_DECAY = 0.5 ** (32 / (10 * 1000))


def ema_update(ema_params, params, decay: float = EMA_DECAY):
    return jax.tree_util.tree_map(
        lambda e, p: e * decay + p * (1.0 - decay), ema_params, params
    )
