"""Worker process for tests/test_multihost.py — one rank of a 2-process
CPU 'pod' (gloo collectives over localhost). Exercises the real multi-host
stack end to end: parallel.multihost.initialize (env-var resolution),
make_mesh over GLOBAL devices, replicated-param placement,
shard_process_local_batch data feeding, a jitted DP grad step (GSPMD inserts
the cross-process grad all-reduce), reduce_loss_dict under shard_map, and the
host barrier. Prints one machine-checkable line; the test asserts both ranks
print identical, numerically-correct values.
"""

import os

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from vtoonify_tpu.parallel import collectives
    from vtoonify_tpu.parallel.mesh import (
        make_mesh,
        replicated,
        shard_params,
        shard_process_local_batch,
    )
    from vtoonify_tpu.parallel.multihost import initialize

    initialize()  # resolved from VTOONIFY_* env vars set by the test
    pid = jax.process_index()
    nproc = jax.process_count()
    nglobal = jax.device_count()

    # tp=2 mode (VTOONIFY_TEST_TP=1): 2 procs x 4 local devices, mesh
    # dp4 x tp2 — tp pairs stay intra-process, dp spans the process
    # boundary (the realistic pod layout: TP over ICI, DP across hosts).
    tp = 2 if os.environ.get("VTOONIFY_TEST_TP") == "1" else 1
    mesh = make_mesh(tp=tp)  # dp over all global devices

    # deterministic global problem, identical on both ranks
    full_x = np.random.RandomState(0).randn(8, 16).astype(np.float32)
    full_y = np.random.RandomState(2).randn(8, 4).astype(np.float32)
    w0 = np.random.RandomState(1).randn(16, 4).astype(np.float32)

    rows = 8 // nproc
    x = shard_process_local_batch(full_x[pid * rows:(pid + 1) * rows], mesh)
    y = shard_process_local_batch(full_y[pid * rows:(pid + 1) * rows], mesh)
    # under tp, w (16, 4) is output-channel sharded over 'tp'
    params = shard_params({"w": jnp.asarray(w0)}, mesh, tp=tp > 1,
                          min_channels=4)

    def loss_fn(p, xb, yb):
        return jnp.mean((xb @ p["w"] - yb) ** 2)

    @jax.jit
    def step(p, xb, yb):
        loss, g = jax.value_and_grad(loss_fn)(p, xb, yb)
        return loss, {"w": p["w"] - 0.1 * g["w"]}

    loss, new_params = step(params, x, y)
    wsum = float(jnp.sum(new_params["w"]))
    wspec = str(new_params["w"].sharding.spec).replace(" ", "")

    # reduce_loss_dict over the mapped dp axis (each device contributes its
    # local shard's mean -> pmean must recover the global mean)
    f = jax.shard_map(
        lambda xb: collectives.reduce_loss_dict(
            {"a": jnp.mean(xb), "b": jnp.mean(xb ** 2)}),
        mesh=mesh, in_specs=P("dp", None), out_specs=P())
    red = f(x)

    collectives.synchronize()  # cross-process barrier (pmap psum)

    print("MULTIHOST_OK pid=%d procs=%d global=%d "
          "loss=%.6f wsum=%.6f a=%.6f b=%.6f tp=%d wspec=%s"
          % (pid, nproc, nglobal, float(loss), wsum,
             float(red["a"]), float(red["b"]), tp, wspec), flush=True)


if __name__ == "__main__":
    main()
