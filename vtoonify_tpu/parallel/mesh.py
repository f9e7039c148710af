"""Device-mesh parallelism (jax.sharding + pjit — the TPU-native answer to the
reference's DDP/NCCL stack, SURVEY.md §2.4-2.5).

Strategies provided:
  * DP — batch/frame axis sharded over 'dp' (replaces
    nn.parallel.DistributedDataParallel, train_vtoonify_d.py:454-461).
    Gradient all-reduces ride ICI, inserted automatically by GSPMD when a
    jitted step mixes sharded batches with replicated params.
  * TP — optional channel sharding of the wide (≥256-channel) conv/linear
    weights over 'tp'; activations reshard automatically. The reference has no
    TP (SURVEY.md §2.4); this is headroom for batch-1 latency scale-out.
  * Video frames are embarrassingly parallel (SURVEY.md §5.7) — shard the
    frame axis with `shard_batch` for multi-chip inference.

Multi-host: call jax.distributed.initialize() before building the mesh; the
same mesh code then spans hosts over DCN.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, tp: int = 1,
              devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % tp == 0, f"{n} devices not divisible by tp={tp}"
    arr = np.array(devices).reshape(n // tp, tp)
    return Mesh(arr, ("dp", "tp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard the leading (batch/frame) axis over 'dp'."""
    return NamedSharding(mesh, P(*(("dp",) + (None,) * (ndim - 1))))


def param_partition_spec(path_leaf, min_channels: int = 256):
    """TP rule: shard the output-channel (last) dim of wide conv kernels and
    linear weights; replicate everything else."""
    a = path_leaf
    if a.ndim == 4 and a.shape[-1] >= min_channels:      # HWIO conv
        return P(None, None, None, "tp")
    if a.ndim == 2 and a.shape[-1] >= min_channels:      # (in, out) linear
        return P(None, "tp")
    return P()


def shard_params(params, mesh: Mesh, tp: bool = False, min_channels: int = 256):
    """Place a param pytree on the mesh (replicated, or TP-sharded)."""

    def place(a):
        if tp:
            spec = param_partition_spec(a, min_channels)
        else:
            spec = P()
        return jax.device_put(a, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, params)


def shard_array_batch(x, mesh: Mesh):
    return jax.device_put(x, shard_batch(mesh, np.ndim(x)))


def shard_process_local_batch(x_local, mesh: Mesh):
    """Multi-host data feeding: each process passes its own slice of the
    global batch (leading axis); returns the logically-global dp-sharded
    array. Replaces the reference's DistributedSampler + DDP input split
    (train_vtoonify_d.py:454-461) — on one process this degenerates to
    `shard_array_batch`."""
    sharding = shard_batch(mesh, np.ndim(x_local))
    global_shape = ((x_local.shape[0] * jax.process_count(),)
                    + tuple(x_local.shape[1:]))
    return jax.make_array_from_process_local_data(
        sharding, np.asarray(x_local), global_shape=global_shape)


def make_spatial_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D mesh over the 'sp' axis for spatial partitioning."""
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), ("sp",))


def shard_spatial(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """SP — shard the image-height axis of (B, H, W, C) tensors over 'sp'.

    Latency scale-out for a SINGLE frame (batch can't be split below 1):
    GSPMD spatially partitions every conv with automatic halo exchanges
    (collective-permutes over ICI), global reductions (BiSeNet pools,
    instance norms) become cross-device all-reduces, and the packed-stage
    space-to-depth reshapes reshard transparently. Verified bit-equal to
    the unsharded frame graph on an 8-device mesh
    (tests/test_sharding.py::test_sp_single_frame_inference). The reference
    has no analogue (its per-GPU unit is a whole frame); this is how one
    1024px frame uses a whole TPU slice."""
    assert ndim >= 2
    spec = [None] * ndim
    spec[1] = "sp"
    return NamedSharding(mesh, P(*spec))


def shard_array_spatial(x, mesh: Mesh):
    return jax.device_put(x, shard_spatial(mesh, np.ndim(x)))
