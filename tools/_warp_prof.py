import numpy as np, jax, jax.numpy as jnp
from vtoonify_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from vtoonify_tpu.ops.pallas_kernels import affine_warp_bilinear_pallas
rng = np.random.RandomState(0)
n, h, w, c = 2, 4120, 4120, 6
ho = wo = 2060
img = jnp.asarray(rng.randn(n, h, w, c).astype(np.float32))
coef = jnp.asarray(np.tile(np.array([[2.05, -1.1, 40.0, 1.1, 2.05, -25.0]], np.float32), (2, 1)))
f = jax.jit(lambda im, co: affine_warp_bilinear_pallas(
    im, co, (ho, wo), precision=jax.lax.Precision.DEFAULT))
r = f(img, coef); jax.block_until_ready(r); np.asarray(r[:, :2, :2, 0])
jax.profiler.start_trace("/tmp/jax-trace-warp")
for _ in range(2):
    r = f(img, coef)
np.asarray(r[:, :2, :2, 0])
jax.profiler.stop_trace()
print("done")
