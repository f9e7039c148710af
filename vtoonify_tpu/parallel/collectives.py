"""Collective helpers — TPU-native equivalents of the reference's
model/stylegan/distributed.py (NCCL) utilities (SURVEY.md §2.5, §5.8).

Inside pjit/shard_map-ped code, gradient synchronization is implicit; these
helpers cover the explicit uses:
  * reduce_loss_dict — deterministic loss aggregation across the mesh
    (reference distributed.py:104-126 stacked sorted keys, but via psum/pmean
    over ICI instead of dist.reduce to rank 0)
  * all_gather_tree / reduce_sum — generic pytree collectives
  * host-level helpers (process_index/count, sync) for multi-host over DCN.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def reduce_loss_dict(loss_dict: dict, axis_name: str = "dp") -> dict:
    """Mean-reduce a dict of scalars over a mapped mesh axis, with the
    reference's deterministic sorted-key order (distributed.py:114-119)."""
    keys = sorted(loss_dict.keys())
    stacked = jnp.stack([loss_dict[k] for k in keys])
    reduced = jax.lax.pmean(stacked, axis_name)
    return {k: reduced[i] for i, k in enumerate(keys)}


def reduce_sum(x, axis_name: str = "dp"):
    """reference distributed.py:44-54."""
    return jax.lax.psum(x, axis_name)


def all_gather_tree(tree, axis_name: str = "dp"):
    """Gather each leaf along a new leading axis (the pickle-based
    all_gather at distributed.py:69-101, minus the pickles)."""
    return jax.tree_util.tree_map(
        lambda a: jax.lax.all_gather(a, axis_name), tree
    )


def gather_grad(grads, axis_name: str = "dp"):
    """Explicit gradient all-reduce-mean (distributed.py:57-66). Usually
    unnecessary: pjit inserts this automatically for replicated params."""
    return jax.tree_util.tree_map(
        lambda g: jax.lax.pmean(g, axis_name), grads
    )


# --- host-level (multi-process over DCN) -------------------------------------


def get_rank() -> int:
    return jax.process_index()


def get_world_size() -> int:
    return jax.process_count()


def synchronize():
    """Barrier across hosts (distributed.py:19-31): a tiny psum forces a
    cross-host rendezvous."""
    if jax.process_count() == 1:
        return
    x = jnp.ones(())
    jax.block_until_ready(
        jax.pmap(lambda v: jax.lax.psum(v, "i"), axis_name="i")(
            x[None].repeat(jax.local_device_count(), 0)
        )
    )
