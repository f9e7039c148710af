"""Interleaved A/B: packed-out vs unpacked flagship graph device time
(controls session/thermal variance that separate bench runs can't)."""
import time

import numpy as np

import jax
import jax.numpy as jnp

from vtoonify_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
import bench

batch = 16
cfg, vt_params, parsing_params, frame_graph, frames, s_w, d_s = (
    bench._build_flagship(batch))


def make(packed):
    reps = 2

    def chained(fr, sw, ds):
        acc = jnp.uint32(0)
        f = fr
        for _ in range(reps):
            out = frame_graph(vt_params, cfg, parsing_params, f, sw, ds,
                              dtype=jnp.bfloat16, packed_out=packed)
            acc = acc + jnp.sum(out.astype(jnp.uint32))
            f = fr ^ (out[0, 0, 0, 0] & 1)
        return acc

    return jax.jit(chained)


null = jax.jit(lambda a: jnp.sum(a.astype(jnp.uint32)))
fns = {"unpacked": make(False), "packed": make(True)}
for name, f in fns.items():
    np.asarray(f(frames, s_w, d_s))  # compile
np.asarray(null(frames))

times = {k: [] for k in fns}
times["null"] = []
for it in range(8):
    for name, f in fns.items():
        t0 = time.perf_counter()
        np.asarray(f(frames, s_w, d_s))
        times[name].append(time.perf_counter() - t0)
    t0 = time.perf_counter()
    np.asarray(null(frames))
    times["null"].append(time.perf_counter() - t0)

ov = float(np.median(times["null"]))
for name in fns:
    med = float(np.median(times[name]))
    per = (med - ov) / 2 / batch
    print(f"{name}: {per * 1e3:.2f} ms/frame → {1 / per:.1f} fps "
          f"(median of 8, null={ov * 1e3:.1f} ms)")
