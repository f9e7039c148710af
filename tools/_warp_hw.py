"""Hardware check + micro-bench of warp kernel v2 vs f64 oracle."""
import time
import numpy as np
import jax, jax.numpy as jnp
from vtoonify_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import vtoonify_tpu.train.augment as aug
from vtoonify_tpu.ops.pallas_kernels import affine_warp_bilinear_pallas

def oracle(img, coef, out_hw):
    """float64 bilinear-with-zeros reference."""
    img = np.asarray(img, np.float64)
    n, h, w, c = img.shape
    ho, wo = out_hw
    out = np.zeros((n, ho, wo, c))
    jj, ii = np.meshgrid(np.arange(ho), np.arange(wo), indexing="ij")
    for k in range(n):
        ax, bx, cx, ay, by, cy = np.asarray(coef[k], np.float64)
        fx = ax * ii + bx * jj + cx
        fy = ay * ii + by * jj + cy
        x0 = np.floor(fx).astype(int); y0 = np.floor(fy).astype(int)
        wx = fx - x0; wy = fy - y0
        def at(y, x):
            v = ((y >= 0) & (y < h) & (x >= 0) & (x < w))
            yc = np.clip(y, 0, h - 1); xc = np.clip(x, 0, w - 1)
            return img[k, yc, xc, :] * v[..., None]
        out[k] = ((1-wy)[...,None]*((1-wx)[...,None]*at(y0,x0) + wx[...,None]*at(y0,x0+1))
                  + wy[...,None]*((1-wx)[...,None]*at(y0+1,x0) + wx[...,None]*at(y0+1,x0+1)))
    return out

rng = np.random.RandomState(0)
# correctness at a production-like but small shape
n, h, w, c = 2, 1030, 1030, 6
ho, wo = 1024, 1024
img = jnp.asarray(np.tanh(rng.randn(n, h, w, c)).astype(np.float32))
a = 0.6
coef = np.stack([
    np.array([np.cos(a)*1.1, -np.sin(a)*1.1, 40.0, np.sin(a)*1.1, np.cos(a)*1.1, -25.0], np.float32),
    np.array([1.0, 0.0, 3.0, 0.0, 1.0, 3.0], np.float32),
])
coefj = jnp.asarray(coef)
ref = oracle(img, coef, (ho, wo))
for label, kw in [("lowp/DEFAULT", dict(precision=jax.lax.Precision.DEFAULT)),
                  ("f32/HIGHEST", dict(precision=jax.lax.Precision.HIGHEST))]:
    out = np.asarray(affine_warp_bilinear_pallas(img, coefj, (ho, wo), **kw))
    print(f"{label}: max err vs f64 oracle = {np.abs(out - ref).max():.2e}")

# perf at the true production shape
n, h, w, c = 2, 4126, 4126, 6
ho = wo = 4120
img = jnp.asarray(rng.randn(n, h, w, c).astype(np.float32))
coefj = jnp.asarray(np.tile(coef[:1], (2, 1)))
f = jax.jit(lambda im, co: affine_warp_bilinear_pallas(
    im, co, (ho, wo), precision=jax.lax.Precision.DEFAULT))
r = f(img, coefj); jax.block_until_ready(r); np.asarray(r[:, :2, :2, 0])
ts = []
for _ in range(6):
    t0 = time.perf_counter()
    r = f(img, coefj)
    jax.block_until_ready(r); np.asarray(r[:, :2, :2, 0])
    ts.append(time.perf_counter() - t0)
print(f"v2 production warp (2x4126^2x6 -> 4120^2): p50 {sorted(ts)[len(ts)//2]*1e3:.1f} ms")
