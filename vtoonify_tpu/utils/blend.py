"""Layer-wise StyleGAN model blending (the Toonify trick).

Capability-parity with reference util.py:195-228: generator params/buffers are
bucketed by synthesis layer 0..17 (conv1→0, to_rgb1→1, convs.i→i+1,
to_rgbs.i→2i+3, everything else unblended) and lerped per-layer:
result = high·(1−w) + low·w. Used by the T-trainer
(train_vtoonify_t.py:348-354) to build G1 from the FFHQ base and a
style-finetuned StyleGAN; per-style weight recipes at train_vtoonify_t.py:30-35.
"""

from __future__ import annotations

from typing import Sequence

import jax

DEFAULT_BLEND_WEIGHT = [1] * 7 + [0] * 11


def _layer_of_path(path) -> object:
    """Map a generator-param tree path to its blend-layer index (or None)."""
    keys = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
    if not keys:
        return None
    head = keys[0]
    if head == "conv1":
        return 0
    if head == "to_rgb1":
        return 1
    if head == "convs":
        return int(keys[1]) + 1
    if head == "to_rgbs":
        return int(keys[1]) * 2 + 3
    return None  # style MLP, input, noises: kept from the high model


def blend_generators(params_low, params_high,
                     weight: Sequence[float] = DEFAULT_BLEND_WEIGHT):
    """Per-layer lerp of two same-config generator param trees."""

    def blend(path, lo, hi):
        layer = _layer_of_path(path)
        if layer is None:
            return hi
        w = float(weight[layer])
        return hi * (1.0 - w) + lo * w

    return jax.tree_util.tree_map_with_path(blend, params_low, params_high)
