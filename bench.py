"""Benchmark: frames/sec/chip for 1024px video toonification.

Runs the flagship per-frame graph (BiSeNet parsing + VToonify-D synthesis,
256px crop → 1024px output, bf16) and prints ONE JSON line. `vs_baseline` is
measured fps / 60 (the BASELINE.json north-star target of ≥60 fps per v5e
chip; the reference publishes no fps numbers — BASELINE.md).

Methodology: the graph is chained REPS times on-device with a data dependency
and reduced to a scalar, so the measurement is pure accelerator compute —
per-call dispatch/fetch overhead (which in tunneled dev environments can be
tens of ms and is not representative of production serving) is measured with a
null dispatch and subtracted.
"""

import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp


def _median_time(fn, *args, n=6):
    np.asarray(fn(*args))  # compile + first run
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    from vtoonify_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from vtoonify_tpu.models.bisenet import init_bisenet
    from vtoonify_tpu.models.vtoonify import VToonifyConfig, init_vtoonify
    from vtoonify_tpu.pipeline.toonify import frame_graph

    batch = int(os.environ.get("BENCH_BATCH", "16"))
    reps = int(os.environ.get("BENCH_REPS", "2"))

    cfg = VToonifyConfig()  # 256 → 1024, DualStyleGAN backbone
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    dtype = jnp.bfloat16

    def cast(t):
        return jax.tree_util.tree_map(
            lambda a: a.astype(dtype)
            if jnp.issubdtype(a.dtype, jnp.floating) else a,
            t,
        )

    vt_params = cast(init_vtoonify(k1, cfg))
    parsing_params = cast(init_bisenet(k2))

    rng = np.random.RandomState(0)
    frames = jnp.asarray(
        rng.randint(0, 256, (batch, 256, 256, 3), dtype=np.uint8)
    )
    s_w = jnp.asarray(rng.randn(1, cfg.n_latent, 512).astype(np.float32) * 0.3)
    d_s = jnp.asarray(0.5, jnp.float32)

    null = jax.jit(lambda a: jnp.sum(a.astype(jnp.uint32)))
    overhead = _median_time(null, frames)

    def chained(frames, s_w, d_s):
        acc = jnp.uint32(0)
        f = frames
        for _ in range(reps):
            out = frame_graph(vt_params, cfg, parsing_params, f, s_w, d_s,
                              dtype=dtype)
            acc = acc + jnp.sum(out.astype(jnp.uint32))
            f = frames ^ (out[0, 0, 0, 0] & 1)  # serialize iterations
        return acc

    total = _median_time(jax.jit(chained), frames, s_w, d_s)
    per_graph = max(total - overhead, 1e-9) / reps
    fps = batch / per_graph
    p50_ms = per_graph / batch * 1000

    print(
        json.dumps(
            {
                "metric": "frames/sec/chip @1024px toonify "
                          f"(batch {batch}, p50 {p50_ms:.1f} ms/frame)",
                "value": round(float(fps), 2),
                "unit": "fps",
                "vs_baseline": round(float(fps) / 60.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
