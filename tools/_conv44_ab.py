"""Isolate fusion.44 — the (3,3,128,128)@512^2 packed conv that the r3
roofline put at 45% of its padded-FLOP ideal (13.8 ms measured in-graph,
6.3 ms ideal at batch 16 bf16). Times candidate formulations on hardware
with the bench methodology (on-device chaining + null-dispatch subtraction).

Variants:
  conv      lax.conv_general_dilated, NHWC/HWIO, SAME (the production form)
  conv_ctx  same conv wrapped in the packed stage's real elementwise context
            (style modulation on input, demod+bias+lrelu on output) — measures
            what fusing costs vs the bare conv
  taps9     9 shifted (B*H*W,128)x(128,128) dot_generals accumulated (reads
            the input 9x — bandwidth-heavy control)
"""
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from vtoonify_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

B, H, W, C = 16, 512, 512, 128
key = jax.random.PRNGKey(0)
k1, k2, k3, k4 = jax.random.split(key, 4)
x0 = jax.random.normal(k1, (B, H, W, C), jnp.bfloat16)
w = jax.random.normal(k2, (3, 3, C, C), jnp.bfloat16) * 0.05
style = jax.random.normal(k3, (B, C), jnp.bfloat16)
bias = jax.random.normal(k4, (C,), jnp.bfloat16)
DN = lax.conv_dimension_numbers((B, H, W, C), (3, 3, C, C),
                                ("NHWC", "HWIO", "NHWC"))


def conv(x):
    return lax.conv_general_dilated(x, w, (1, 1), "SAME", dimension_numbers=DN)


def conv_ctx(x):
    xm = x * style[:, None, None, :]
    y = lax.conv_general_dilated(xm, w, (1, 1), "SAME", dimension_numbers=DN)
    demod = lax.rsqrt(jnp.sum((w.astype(jnp.float32) ** 2)) / C + 1e-8)
    y = y * demod.astype(x.dtype) + bias
    return jnp.where(y > 0, y, 0.2 * y) * jnp.bfloat16(2 ** 0.5)


def pallas_fold(x):
    # the folded production form through the slab kernel: conv+bias+lrelu,
    # one HBM read / one write, double-buffered DMA
    from vtoonify_tpu.ops.pallas_kernels import modconv3x3_fused_pallas
    import os
    rows = int(os.environ.get("AB_ROWS", "8"))
    return modconv3x3_fused_pallas(x, w, None, None, bias, rows=rows)


def taps9(x):
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((B, H, W, C), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            sl = xp[:, dy:dy + H, dx:dx + W, :]
            acc = acc + jax.lax.dot_general(
                sl.reshape(-1, C), w[dy, dx], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).reshape(B, H, W, C)
    return acc.astype(x.dtype)


def make(f, reps=4):
    def chained(x):
        acc = jnp.float32(0)
        h = x
        for _ in range(reps):
            out = f(h)
            acc = acc + jnp.sum(out[0, 0, 0].astype(jnp.float32))
            h = x + out[0, 0, 0, 0]
        return acc
    return jax.jit(chained), reps


null = jax.jit(lambda a: jnp.sum(a[0, 0, 0].astype(jnp.float32)))
import os as _os
# pallas_fold runs pl.pallas_call compiled (non-interpret) — TPU-only
_on_tpu = jax.devices()[0].platform == "tpu"
_default = "conv,conv_ctx,taps9" + (",pallas_fold" if _on_tpu else "")
_sel = [k.strip() for k in
        _os.environ.get("AB_VARIANTS", _default).split(",") if k.strip()]
_all = {"conv": conv, "conv_ctx": conv_ctx, "taps9": taps9,
        "pallas_fold": pallas_fold}
_unknown = [k for k in _sel if k not in _all]
if _unknown:
    raise SystemExit(f"unknown AB_VARIANTS {_unknown}; known: {sorted(_all)}")
fns = {k: make(_all[k]) for k in _sel}
for name, (f, _) in fns.items():
    np.asarray(f(x0))
np.asarray(null(x0))

times = {k: [] for k in fns}
times["null"] = []
for it in range(8):
    for name, (f, _) in fns.items():
        t0 = time.perf_counter()
        np.asarray(f(x0))
        times[name].append(time.perf_counter() - t0)
    t0 = time.perf_counter()
    np.asarray(null(x0))
    times["null"].append(time.perf_counter() - t0)

ov = float(np.median(times["null"]))
gflop = 2 * 9 * B * H * W * C * C / 1e9
for name, (f, reps) in fns.items():
    med = (float(np.median(times[name])) - ov) / reps
    print(f"{name}: {med * 1e3:.2f} ms/call  "
          f"{gflop / med / 1e3:.1f} TFLOP/s  "
          f"({gflop / med / 197e3 * 100:.0f}% of v5e bf16 peak)")
