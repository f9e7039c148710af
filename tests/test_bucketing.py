"""Size-bucketing drift bound (VERDICT r1 #6 / SURVEY §7.3 #3).

Bit-exact bucketing via padding is impossible for this graph: BiSeNet's
attention/context heads take GLOBAL average pools and Fusion uses instance
norms, so padding perturbs global statistics. This test pins the measured
characterization: the global-stat component is ≤1 uint8 LSB everywhere, and
larger deviations are confined to the output band that maps to the reflected
padding near the crop edge."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vtoonify_tpu.models.bisenet import init_bisenet
from vtoonify_tpu.models.vtoonify import VToonifyConfig, init_vtoonify
from vtoonify_tpu.pipeline.toonify import ToonifyPipeline


@pytest.mark.slow
def test_bucketed_vs_exact_outputs():
    cfg = VToonifyConfig(in_size=32, out_size=128, channel_multiplier=1,
                         num_res_layers=2, backbone="dualstylegan")
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    vt = init_vtoonify(k1, cfg)
    bn = init_bisenet(k2)
    rng = np.random.RandomState(5)
    # 88x72 is not a multiple of the 32 bucket → pads to 96x96
    frames = rng.randint(0, 256, (2, 88, 72, 3), np.uint8)
    s_w = jnp.asarray(rng.randn(1, cfg.n_latent, 512).astype(np.float32) * 0.3)

    exact = ToonifyPipeline(vt, cfg, bn, dtype=jnp.float32)
    bucketed = ToonifyPipeline(vt, cfg, bn, dtype=jnp.float32, size_bucket=32)

    a = np.asarray(exact.process_batch(frames, s_w, 0.5)).astype(np.int32)
    b = np.asarray(bucketed.process_batch(frames, s_w, 0.5)).astype(np.int32)
    assert a.shape == b.shape == (2, 352, 288, 3)
    d = np.abs(a - b)

    # global-statistics drift (instance norms / global pools): ≤1 LSB over
    # the interior, 64px (output scale) away from the padded right/bottom
    assert d[:, :-64, :-64].max() <= 1
    # boundary halo from the reflected padding stays small and local
    assert d.max() <= 12
    assert d.mean() < 0.5
    assert (d > 1).mean() < 0.05


@pytest.mark.slow
def test_bucket_margin_paranoid_mode():
    """bucket_margin pads past the halo and crops it: the whole kept frame
    then sits at the global-stat floor (VERDICT r2 #7 optional mode; the
    production-scale halo measurement is in docs/PERF.md)."""
    cfg = VToonifyConfig(in_size=32, out_size=128, channel_multiplier=1,
                         num_res_layers=2, backbone="dualstylegan")
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    vt = init_vtoonify(k1, cfg)
    bn = init_bisenet(k2)
    rng = np.random.RandomState(6)
    frames = rng.randint(0, 256, (1, 88, 72, 3), np.uint8)
    s_w = jnp.asarray(rng.randn(1, cfg.n_latent, 512).astype(np.float32) * 0.3)

    exact = ToonifyPipeline(vt, cfg, bn, dtype=jnp.float32)
    margin = ToonifyPipeline(vt, cfg, bn, dtype=jnp.float32, size_bucket=32,
                             bucket_margin=16)

    a = np.asarray(exact.process_batch(frames, s_w, 0.5)).astype(np.int32)
    b = np.asarray(margin.process_batch(frames, s_w, 0.5)).astype(np.int32)
    assert a.shape == b.shape == (1, 352, 288, 3)
    d = np.abs(a - b)
    # the 16px input margin (64 output px) ejects the reflected-padding halo:
    # the former right/bottom halo band is no worse than the interior (the
    # no-margin characterization above allows 12 LSB there)
    interior_max = d[:, :-64, :-64].max()
    assert d[:, -64:, :].max() <= interior_max + 1
    assert d[:, :, -64:].max() <= interior_max + 1
    # what remains is a UNIFORM global-statistics shift: at this tiny config
    # the margin itself raises the padded fraction to 61% of the bucketed
    # frame (120x104 -> 128x128 on an 88x72 crop), so the floor is higher
    # than production scale, where padding is marginal and the measured
    # end-state is <=2 LSB (docs/PERF.md)
    assert d.max() <= 8
    assert (d > 4).mean() < 1e-3
