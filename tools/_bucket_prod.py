"""One-off production-size bucketing drift measurement (VERDICT r2 #7;
SURVEY §7.3 #3). Compares size_bucket=32 vs exact-shape compilation at the
production config (256px-class crop → 1024px-class output) on real-photo
content, reporting the interior/halo uint8 deltas that tests/test_bucketing.py
pins at tiny config. Findings recorded in docs/PERF.md."""

import numpy as np

import jax
import jax.numpy as jnp


def main():
    import cv2

    from vtoonify_tpu.models.bisenet import init_bisenet
    from vtoonify_tpu.models.vtoonify import VToonifyConfig, init_vtoonify
    from vtoonify_tpu.pipeline.toonify import ToonifyPipeline

    cfg = VToonifyConfig()  # production 256→1024
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    vt = init_vtoonify(k1, cfg)
    bn = init_bisenet(k2)

    # real-photo content at the VERDICT-suggested crop: 360x408 → pads to
    # 384x416 under bucket 32 (24px bottom, 8px right reflected padding)
    img = cv2.cvtColor(cv2.imread("/root/reference/data/077436.jpg"),
                       cv2.COLOR_BGR2RGB)
    img = cv2.resize(img, (408, 360), interpolation=cv2.INTER_AREA)
    frames = img[None]
    rng = np.random.RandomState(5)
    s_w = jnp.asarray(rng.randn(1, cfg.n_latent, 512).astype(np.float32) * 0.3)

    for dtype in (jnp.float32, jnp.bfloat16):
        exact = ToonifyPipeline(vt, cfg, bn, dtype=dtype)
        bucketed = ToonifyPipeline(vt, cfg, bn, dtype=dtype, size_bucket=32)
        a = np.asarray(exact.process_batch(frames, s_w, 0.5)).astype(np.int32)
        b = np.asarray(bucketed.process_batch(frames, s_w, 0.5)
                       ).astype(np.int32)
        assert a.shape == b.shape == (1, 1440, 1632, 3), a.shape
        d = np.abs(a - b)
        name = jnp.dtype(dtype).name
        print(f"[{name}] max={d.max()} mean={d.mean():.4f} "
              f">1LSB={100 * (d > 1).mean():.3f}%")
        for band in (32, 64, 128, 256):
            interior = d[:, :-band, :-band]
            print(f"  [{name}] excluding {band}px halo at padded edges: "
                  f"max={interior.max()} >1LSB="
                  f"{100 * (interior > 1).mean():.4f}%")


if __name__ == "__main__":
    main()
