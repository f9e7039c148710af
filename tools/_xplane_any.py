"""Parse a jax trace (xplane.pb) and print top ops per plane (any backend).
Usage: python tools/_xplane_any.py /tmp/dryrun-trace [N]"""
import glob
import sys
from collections import defaultdict

from tensorflow.tsl.profiler.protobuf import xplane_pb2

logdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/dryrun-trace"
topn = int(sys.argv[2]) if len(sys.argv) > 2 else 30
paths = sorted(glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True))
assert paths, f"no xplane.pb under {logdir}"
xs = xplane_pb2.XSpace()
xs.ParseFromString(open(paths[-1], "rb").read())

for plane in xs.planes:
    ev_names = {k: v.name for k, v in plane.event_metadata.items()}
    agg = defaultdict(float)
    cnt = defaultdict(int)
    total = 0.0
    for line in plane.lines:
        for ev in line.events:
            name = ev_names.get(ev.metadata_id, "?")
            dur = ev.duration_ps / 1e9  # ms
            total += dur
            agg[name] += dur
            cnt[name] += 1
    if total < 1.0:
        continue
    print(f"== plane {plane.name}: {total:.0f} ms total, "
          f"{sum(cnt.values())} events")
    for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:topn]:
        print(f"   {ms:9.1f} ms  x{cnt[name]:<5d} {name[:100]}")
