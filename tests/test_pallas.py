"""Pallas kernels vs XLA reference paths (interpret mode — hermetic CPU)."""

import numpy as np

import jax.numpy as jnp

from vtoonify_tpu.ops.fused_act import fused_leaky_relu
from vtoonify_tpu.ops.pallas_kernels import (
    blur_same_pallas,
    fused_leaky_relu_pallas,
)
from vtoonify_tpu.ops.upfirdn2d import make_kernel, upfirdn2d


def test_fused_lrelu_pallas_matches():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 16, 128).astype(np.float32))
    b = jnp.asarray(rng.randn(128).astype(np.float32))
    ref = fused_leaky_relu(x, b)
    out = fused_leaky_relu_pallas(x, b, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_blur_pallas_matches():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 16, 16, 128).astype(np.float32))
    k = make_kernel((1.0, 3.0, 3.0, 1.0))
    ref = upfirdn2d(x, k, pad=(2, 1))
    out = blur_same_pallas(x, k, pad=(2, 1), interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
