"""RAFT evaluation metrics (end-point error).

The reference vendors upstream RAFT's evaluate.py (Sintel/KITTI harnesses,
model/raft/evaluate.py — not wired into VToonify). This module provides the
metric core so flow quality can be validated after converting
raft-things.pth; dataset download/IO is the caller's concern (zero-egress
environments supply frames directly).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from vtoonify_tpu.models.raft import RAFTConfig, raft_apply


def end_point_error(flow_pred, flow_gt, valid=None):
    """Mean EPE (and accuracy buckets) — reference raft/evaluate.py metrics."""
    epe = jnp.sqrt(jnp.sum(jnp.square(flow_pred - flow_gt), axis=-1))
    if valid is not None:
        epe = jnp.where(valid, epe, 0.0)
        denom = jnp.maximum(jnp.sum(valid), 1)
        mean = jnp.sum(epe) / denom
    else:
        mean = jnp.mean(epe)
    return {
        "epe": float(mean),
        "1px": float(jnp.mean((epe < 1).astype(jnp.float32))),
        "3px": float(jnp.mean((epe < 3).astype(jnp.float32))),
        "5px": float(jnp.mean((epe < 5).astype(jnp.float32))),
    }


def evaluate_pairs(params, pairs, iters: int = 24,
                   cfg: RAFTConfig = RAFTConfig()):
    """pairs: iterable of (im1_u8, im2_u8, flow_gt) NHWC numpy arrays."""
    results = []
    for im1, im2, gt in pairs:
        _, flow = raft_apply(
            params, jnp.asarray(im1, jnp.float32),
            jnp.asarray(im2, jnp.float32), cfg, iters=iters,
        )
        results.append(end_point_error(flow, jnp.asarray(gt)))
    return {
        k: float(np.mean([r[k] for r in results])) for k in results[0]
    } if results else {}
