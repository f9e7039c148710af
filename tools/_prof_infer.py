"""Device-trace the flagship inference frame graph (batch 16) and dump trace."""
import numpy as np
import jax, jax.numpy as jnp
from vtoonify_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import bench

batch = 16
cfg, vt_params, parsing_params, frame_graph, frames, s_w, d_s = bench._build_flagship(batch)

import os
packed = os.environ.get("PROF_PACKED", "1") == "1"
f = jax.jit(lambda fr, sw, ds: jnp.sum(
    frame_graph(vt_params, cfg, parsing_params, fr, sw, ds,
                dtype=jnp.bfloat16, packed_out=packed).astype(jnp.uint32)))
np.asarray(f(frames, s_w, d_s))
logdir = "/tmp/jax-trace-infer"
jax.profiler.start_trace(logdir)
for _ in range(3):
    r = f(frames, s_w, d_s)
np.asarray(r)
jax.profiler.stop_trace()
print("trace done")
