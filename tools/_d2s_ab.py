"""A/B the Pallas depth-to-space vs XLA at the hot stage-2/inference shapes."""
import time
import numpy as np, jax, jax.numpy as jnp
from vtoonify_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from vtoonify_tpu.nn.layers import depth_to_space2
from vtoonify_tpu.ops.pallas_kernels import depth_to_space2_pallas

rng = np.random.RandomState(0)
# (label, shape, dtype): the stage-2 teacher interleave (f32 512->1024 RGB),
# its bf16 twin, and the batch-16 inference ToRGB unpack
cases = [
    ("train 512->1024 RGB f32", (2, 512, 512, 12), np.float32),
    ("train 512->1024 RGB bf16", (2, 512, 512, 12), np.float32),
    ("infer b16 512->1024 RGB bf16", (16, 512, 512, 12), np.float32),
]
for i, (label, shape, _) in enumerate(cases):
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    if "bf16" in label:
        x = x.astype(jnp.bfloat16)
    for name, fn in [("xla", depth_to_space2), ("pallas", depth_to_space2_pallas)]:
        # + small epilogue sum so the relayout can't be folded into the fetch
        f = jax.jit(lambda a, fn=fn: fn(a) * 2.0)
        r = f(x); jax.block_until_ready(r); np.asarray(r[0, :2, :2, 0], np.float32)
        ts = []
        for _ in range(6):
            t0 = time.perf_counter()
            r = f(x); jax.block_until_ready(r)
            np.asarray(r[0, :2, :2, 0], np.float32)
            ts.append(time.perf_counter() - t0)
        print(f"{label:34s} {name:6s}: p50 {sorted(ts)[3]*1e3:7.1f} ms")
