"""bf16 vs f32 end-to-end frame-graph drift (README claim: <=1 uint8 LSB)."""
import numpy as np
import jax, jax.numpy as jnp
from vtoonify_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from vtoonify_tpu.models.bisenet import init_bisenet
from vtoonify_tpu.models.vtoonify import VToonifyConfig, init_vtoonify
from vtoonify_tpu.pipeline.toonify import frame_graph

cfg = VToonifyConfig()
k1, k2 = jax.random.split(jax.random.PRNGKey(0))
vt_params = init_vtoonify(k1, cfg)
parsing_params = init_bisenet(k2)
rng = np.random.RandomState(0)
frames = jnp.asarray(rng.randint(0, 256, (2, 256, 256, 3), dtype=np.uint8))
s_w = jnp.asarray(rng.randn(1, cfg.n_latent, 512).astype(np.float32) * 0.3)
d_s = jnp.asarray(0.5, jnp.float32)

def cast(t, dt):
    return jax.tree_util.tree_map(
        lambda a: a.astype(dt) if jnp.issubdtype(a.dtype, jnp.floating) else a, t)

outs = {}
for dt in (jnp.float32, jnp.bfloat16):
    # pass params as jit arguments (a closure would inline them as HLO
    # constants — a ~GB remote-compile payload the relay rejects with 413)
    f = jax.jit(lambda vp, pp, fr, sw, ds, dt=dt: frame_graph(
        vp, cfg, pp, fr, sw, ds, dtype=dt))
    outs[dt.__name__] = np.asarray(
        f(cast(vt_params, dt), cast(parsing_params, dt), frames, s_w, d_s)
    ).astype(np.int32)
d = np.abs(outs["float32"] - outs["bfloat16"])
print("uint8 LSB drift: max", d.max(), " mean", d.mean(), " p999", np.percentile(d, 99.9))
