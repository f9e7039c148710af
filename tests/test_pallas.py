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


def test_affine_warp_pallas_matches_grid_sample():
    """One-hot-matmul affine warp kernel == grid_sample on affine grids
    (zeros padding, align_corners=False), incl. out-of-image regions."""
    import vtoonify_tpu.train.augment as aug
    from vtoonify_tpu.ops.interp import grid_sample

    rng = np.random.RandomState(3)
    n, h, w, c = 2, 40, 52, 6
    ho, wo = 30, 36
    img = jnp.asarray(rng.randn(n, h, w, c).astype(np.float32))
    theta = np.tile(np.eye(2, 3, dtype=np.float32), (n, 1, 1))
    for k in range(n):
        a = rng.uniform(-0.7, 0.7)
        s = rng.uniform(0.7, 1.4)
        rot = np.array([[np.cos(a), -np.sin(a)], [np.sin(a), np.cos(a)]]) * s
        theta[k, :2, :2] = rot
        theta[k, :, 2] = rng.uniform(-0.6, 0.6, 2)  # pushes samples off-image
    theta = jnp.asarray(theta)

    grid = aug._affine_grid(theta, (ho, wo), align_corners=False)
    ref = np.asarray(grid_sample(img, grid, align_corners=False,
                                 padding_mode="zeros"))
    old_force, old_interp = aug._FORCE_KERNEL, aug._INTERPRET
    aug._FORCE_KERNEL, aug._INTERPRET = True, True
    try:
        out = np.asarray(aug._affine_warp(img, theta, (ho, wo)))
    finally:
        aug._FORCE_KERNEL, aug._INTERPRET = old_force, old_interp
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_random_apply_affine_kernel_path_matches_xla():
    """The full augment pipeline produces the same output through the Pallas
    warp path as through the XLA grid_sample path (explicit-G hook)."""
    import vtoonify_tpu.train.augment as aug

    rng = np.random.RandomState(4)
    img = jnp.asarray(rng.randn(2, 24, 24, 6).astype(np.float32))
    G = np.tile(np.eye(3, dtype=np.float32), (2, 1, 1))
    G[0, 0, 2], G[0, 1, 2] = 0.1, -0.05
    a = 0.5
    G[1, :2, :2] = np.array([[np.cos(a), -np.sin(a)],
                             [np.sin(a), np.cos(a)]]) * 1.1
    G = jnp.asarray(np.linalg.inv(G))

    ref, _ = aug.random_apply_affine(img, 0.2, G=G, max_pad=14)
    old_force, old_interp = aug._FORCE_KERNEL, aug._INTERPRET
    aug._FORCE_KERNEL, aug._INTERPRET = True, True
    try:
        out, _ = aug.random_apply_affine(img, 0.2, G=G, max_pad=14)
    finally:
        aug._FORCE_KERNEL, aug._INTERPRET = old_force, old_interp
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_affine_warp_unaligned_shape_padding():
    """Physical-array padding path: images whose (H, W·C) minor dims are not
    (8, 128)-tile aligned are zero-padded inside the wrapper with validity
    masks still using logical bounds (unaligned sources fed directly to the
    Mosaic DMA corrupted copies on hardware — max-err 1.0 at 1030²·6; padded
    path re-verified at 2.9e-4 vs a float64 oracle)."""
    import vtoonify_tpu.train.augment as aug
    from vtoonify_tpu.ops.interp import grid_sample
    from vtoonify_tpu.ops.pallas_kernels import (affine_warp_bilinear_pallas,
                                                 affine_warp_supported)

    assert affine_warp_supported((1, 1030, 1030, 6))
    assert affine_warp_supported((1, 4126, 4126, 6))
    assert not affine_warp_supported((1, 80, 80, 6))  # below one box

    rng = np.random.RandomState(11)
    n, h, w, c = 1, 206, 210, 6  # h%8=6, (w*c)%128!=0
    ho, wo = 101, 103            # partial output tiles too
    img = jnp.asarray(rng.randn(n, h, w, c).astype(np.float32))
    theta = np.tile(np.eye(2, 3, dtype=np.float32), (n, 1, 1))
    a = 0.2
    theta[0, :2, :2] = np.array([[np.cos(a), -np.sin(a)],
                                 [np.sin(a), np.cos(a)]]) * 1.05
    theta[0, :, 2] = [0.21, -0.13]
    theta = jnp.asarray(theta)
    coef = aug._pixel_affine_coefs(theta, (ho, wo), (h, w))
    out = affine_warp_bilinear_pallas(img, coef, (ho, wo), interpret=True)
    grid = aug._affine_grid(theta, (ho, wo), align_corners=False)
    ref = np.asarray(grid_sample(img, grid, align_corners=False,
                                 padding_mode="zeros"))
    # 1e-3: the composed pixel coefs and the two-step normalized grid are
    # equivalent in exact arithmetic but round differently in f32 — at
    # ~200 px coordinates that is a few e-4 of value difference
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-3)

    # lowp (bfloat16 box storage — the TPU default-precision path): sampling
    # positions stay exact; only lerp VALUES round through bf16, as DEFAULT
    # MXU precision does anyway. [-1,1]-scale data → ≲1e-2 absolute.
    img01 = jnp.asarray(np.tanh(np.asarray(img)))
    out_lp = affine_warp_bilinear_pallas(img01, coef, (ho, wo),
                                         interpret=True, lowp=True)
    ref_lp = np.asarray(grid_sample(img01, grid, align_corners=False,
                                    padding_mode="zeros"))
    np.testing.assert_allclose(np.asarray(out_lp), ref_lp, atol=1.5e-2)

    # bf16 INPUT image (the bf16 data-synthesis path, augment.py routes it
    # to the kernel): output dtype follows the input; values bound as lowp.
    img_bf = img01.astype(jnp.bfloat16)
    out_bf = affine_warp_bilinear_pallas(img_bf, coef, (ho, wo),
                                         interpret=True, lowp=True)
    assert out_bf.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out_bf, np.float32), ref_lp,
                               atol=2e-2)


def test_affine_warp_bf16_augment_tracks_f32():
    """random_apply_affine on bf16 images (bf16 data synthesis) must track
    the f32 augment within value rounding: the sampling GRID stays float32
    (augment._affine_warp_xla) — a bf16 grid would carry ~1 px of coordinate
    rounding and blow this bound."""
    import vtoonify_tpu.train.augment as aug

    rng = np.random.RandomState(5)
    b, h, w, c = 2, 96, 96, 6
    img = jnp.asarray(np.tanh(rng.randn(b, h, w, c)).astype(np.float32))
    G = jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (b, 1, 1)))
    th = 0.25
    rot = np.array([[np.cos(th), -np.sin(th), 0.01],
                    [np.sin(th), np.cos(th), -0.02],
                    [0, 0, 1]], np.float32)
    G = G.at[1].set(jnp.asarray(np.linalg.inv(rot)))

    o32, _ = aug.random_apply_affine(img, 1.0, G=G)
    o16, _ = aug.random_apply_affine(img.astype(jnp.bfloat16), 1.0, G=G)
    assert o16.dtype == jnp.bfloat16
    d = np.abs(np.asarray(o32, np.float32) - np.asarray(o16, np.float32))
    assert d.max() < 0.05, d.max()


def test_depth_to_space2_pallas_exact():
    """Folded-minor Pallas depth-to-space is bit-identical to the XLA
    reshape/transpose form across channel widths incl. the RGB (C=3) case
    that triggers XLA's small-minor relayout pathology."""
    from vtoonify_tpu.nn.layers import depth_to_space2
    from vtoonify_tpu.ops.pallas_kernels import depth_to_space2_pallas

    rng = np.random.RandomState(3)
    for shape in [(2, 16, 16, 12), (1, 8, 24, 16), (2, 32, 8, 4),
                  (1, 16, 8, 128)]:
        x = jnp.asarray(rng.randn(*shape).astype(np.float32))
        ref = np.asarray(depth_to_space2(x))
        out = np.asarray(depth_to_space2_pallas(x, interpret=True))
        np.testing.assert_array_equal(out, ref)
        xb = x.astype(jnp.bfloat16)
        np.testing.assert_array_equal(
            np.asarray(depth_to_space2_pallas(xb, interpret=True),
                       np.float32),
            np.asarray(depth_to_space2(xb), np.float32))


def test_modconv3x3_fused_pallas_matches():
    """The fused styled-conv slab kernel vs the XLA reference, all three
    epilogue paths: modulated (s,d,bias), shared-style FOLDED (s=d=None —
    the frame graph's production case), and raw conv (no activation).
    Interpret mode; the double-buffered DMA schedule is the same code path
    hardware runs (ref /root/reference/model/stylegan/model.py:280-310 for
    the op being fused)."""
    import jax
    from jax import lax

    from vtoonify_tpu.ops.pallas_kernels import modconv3x3_fused_pallas

    b, h, w_, c, cout = 2, 16, 24, 8, 16
    key = jax.random.PRNGKey(3)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    x = jax.random.normal(k1, (b, h, w_, c), jnp.float32)
    w = jax.random.normal(k2, (3, 3, c, cout), jnp.float32) * 0.2
    s = jax.random.normal(k3, (b, c), jnp.float32) * 0.5 + 1.0
    d = jax.random.normal(k4, (b, cout), jnp.float32) * 0.1 + 1.0
    bias = jax.random.normal(k5, (cout,), jnp.float32)
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))

    def ref(xin, wk, dv=None, bv=None):
        y = lax.conv_general_dilated(xin, wk, (1, 1), "SAME",
                                     dimension_numbers=dn)
        if dv is not None:
            y = y * dv[:, None, None, :]
        if bv is not None:
            y = fused_leaky_relu(y, bv)
        return y

    # modulated path
    got = modconv3x3_fused_pallas(x, w, s, d, bias, rows=8, interpret=True)
    want = ref(x * s[:, None, None, :], w, d, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)

    # folded path (production frame graph): plain conv + bias + lrelu
    got = modconv3x3_fused_pallas(x, w, None, None, bias, rows=8,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref(x, w, None, bias)),
                               rtol=2e-5, atol=2e-5)

    # raw conv, no activation
    got = modconv3x3_fused_pallas(x, w, None, None, None, rows=8,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref(x, w)),
                               rtol=2e-5, atol=2e-5)
