"""Batch-1 single-image latency attack (VERDICT r3 #5).

Splits the 23.4 ms p50 into its real constituents on hardware:

  1. chained  — N graph invocations chained ON DEVICE (output feeds next
                input), one dispatch+fetch: pure device time per frame.
  2. single   — one dispatch+fetch per frame (the CLI path's shape):
                device time + per-dispatch relay/runtime overhead.
  3. trace    — device busy time vs span on the XLA-op line, so gaps
                INSIDE one program (scheduling bubbles between kernels)
                are separated from host-side dispatch overhead.

Run on the real chip: `PYTHONPATH="$PWD:$PYTHONPATH" python tools/_b1_prof.py [batch]`.
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from vtoonify_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import bench  # noqa: E402

batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1
cfg, vt_params, parsing_params, frame_graph, frames, s_w, d_s = \
    bench._build_flagship(batch)

g = jax.jit(lambda fr, sw, ds: frame_graph(
    vt_params, cfg, parsing_params, fr, sw, ds,
    dtype=jnp.bfloat16, packed_out=True))

# warm
out = g(frames, s_w, d_s)
np.asarray(out)
null = jax.jit(lambda a: jnp.sum(a[0, 0].astype(jnp.uint32)))
np.asarray(null(frames))

REPS = 8


def chained(fr, sw, ds):
    acc = jnp.uint32(0)
    f = fr
    for _ in range(REPS):
        o = g(f, sw, ds)
        acc = acc + jnp.sum(o[0, 0].astype(jnp.uint32))
        # feed a byte of the output back so XLA can't parallelize reps
        f = jnp.bitwise_xor(fr, o[0, 0, 0, 0].astype(jnp.uint8))
    return acc


cf = jax.jit(chained)
np.asarray(cf(frames, s_w, d_s))

t_ch, t_si, t_nu = [], [], []
for it in range(10):
    t0 = time.perf_counter()
    np.asarray(cf(frames, s_w, d_s))
    t_ch.append((time.perf_counter() - t0))
    t0 = time.perf_counter()
    np.asarray(jnp.sum(g(frames, s_w, d_s)[0, 0].astype(jnp.uint32)))
    t_si.append(time.perf_counter() - t0)
    t0 = time.perf_counter()
    np.asarray(null(frames))
    t_nu.append(time.perf_counter() - t0)

ov = float(np.median(t_nu))
dev_ms = (float(np.median(t_ch)) - ov) / REPS * 1e3
e2e_ms = (float(np.median(t_si)) - ov) * 1e3
print(f"batch={batch}  device-chained {dev_ms:.2f} ms/invocation   "
      f"single-dispatch {e2e_ms:.2f} ms   null(ov) {ov * 1e3:.2f} ms")
print(f"  -> per-dispatch overhead beyond device time: "
      f"{e2e_ms - dev_ms:.2f} ms")

# trace one chained run; busy-vs-span on the op line exposes in-program gaps
logdir = "/tmp/jax-trace-b1"
jax.profiler.start_trace(logdir)
np.asarray(cf(frames, s_w, d_s))
jax.profiler.stop_trace()

import glob
from collections import defaultdict

from tensorflow.tsl.profiler.protobuf import xplane_pb2

paths = sorted(glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True))
xs = xplane_pb2.XSpace()
xs.ParseFromString(open(paths[-1], "rb").read())
for plane in xs.planes:
    if "TPU" not in plane.name and "tpu" not in plane.name.lower():
        continue
    ev_names = {k: v.name for k, v in plane.event_metadata.items()}
    for line in plane.lines:
        if not line.events:
            continue
        evs = sorted(line.events, key=lambda e: e.offset_ps)
        busy = sum(e.duration_ps for e in evs) / 1e9
        span = (evs[-1].offset_ps + evs[-1].duration_ps
                - evs[0].offset_ps) / 1e9
        if busy < 1.0:
            continue
        print(f"line {line.name!r}: busy {busy:.2f} ms  span {span:.2f} ms "
              f"({busy / span * 100:.0f}% occupied, {len(evs)} events)")
        agg = defaultdict(float)
        cnt = defaultdict(int)
        for e in evs:
            agg[ev_names.get(e.metadata_id, "?")] += e.duration_ps / 1e9
            cnt[ev_names.get(e.metadata_id, "?")] += 1
        for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:15]:
            print(f"   {ms / REPS:8.3f} ms/frame x{cnt[name]:<4d} {name[:100]}")
