"""Parse a jax device trace (xplane.pb) and print top ops by device self-time.
Usage: python tools/_xplane_top.py /tmp/jax-trace-step [N]"""
import glob, sys
from collections import defaultdict

from tensorflow.tsl.profiler.protobuf import xplane_pb2

logdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jax-trace"
topn = int(sys.argv[2]) if len(sys.argv) > 2 else 30
paths = sorted(glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True))
assert paths, f"no xplane.pb under {logdir}"
xs = xplane_pb2.XSpace()
xs.ParseFromString(open(paths[-1], "rb").read())

for plane in xs.planes:
    if "TPU" not in plane.name and "tpu" not in plane.name.lower():
        continue
    ev_names = {k: v.name for k, v in plane.event_metadata.items()}
    agg = defaultdict(float)
    cnt = defaultdict(int)
    total_by_line = {}
    for line in plane.lines:
        tot = 0.0
        for ev in line.events:
            name = ev_names.get(ev.metadata_id, "?")
            dur = ev.duration_ps / 1e9  # ms
            tot += dur
            key = (line.name, name)
            agg[key] += dur
            cnt[key] += 1
        total_by_line[line.name] = total_by_line.get(line.name, 0) + tot
    print(f"== plane {plane.name}")
    for ln, t in sorted(total_by_line.items(), key=lambda kv: -kv[1])[:6]:
        print(f"   line {ln!r}: {t:.2f} ms total")
    # top ops on the busiest op-level line
    if "XLA Ops" in total_by_line:
        best = "XLA Ops"
    else:
        best = max(total_by_line, key=lambda ln: total_by_line[ln])
    rows = [(k[1], v, cnt[k]) for k, v in agg.items() if k[0] == best]
    print(f"-- top ops on line {best!r}")
    for name, ms, n in sorted(rows, key=lambda r: -r[1])[:topn]:
        print(f"   {ms:9.3f} ms  x{n:<4d} {name[:110]}")
