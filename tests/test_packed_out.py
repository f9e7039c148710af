"""Packed-output tail (round 3 MFU push): the device graph ends in the
space-to-depth packed layout and the final depth-to-space runs host-side as a
uint8 byte permutation (no (2,3)-minor relayout, no unpacked full-res float
tensor on device). Pins the layer algebra, the native unpack, and the
pipeline/video-engine contracts. See docs/PERF.md and nn/layers.py
to_rgb_packed_stay / upsample_2x_packed."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vtoonify_tpu import native
from vtoonify_tpu.models.bisenet import init_bisenet
from vtoonify_tpu.models.vtoonify import (
    VToonifyConfig,
    init_vtoonify,
    vtoonify_apply,
)
from vtoonify_tpu.nn import layers as L
from vtoonify_tpu.ops.upfirdn2d import make_kernel, upsample_2x

TINY = VToonifyConfig(in_size=32, out_size=128, channel_multiplier=1,
                      num_res_layers=2, backbone="dualstylegan")


def test_upsample_2x_packed_matches_separable():
    """upsample_2x_packed == space_to_depth2(upsample_2x) to float rounding
    (fused 2-D taps vs two separable passes)."""
    rng = np.random.RandomState(50)
    x = jnp.asarray(rng.randn(2, 9, 13, 3).astype(np.float32))
    k = make_kernel([1, 3, 3, 1])
    ref = L.space_to_depth2(upsample_2x(x, k))
    got = L.upsample_2x_packed(x, k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_space_to_depth2_roundtrip():
    rng = np.random.RandomState(51)
    x = jnp.asarray(rng.randn(1, 8, 10, 5).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(L.depth_to_space2(L.space_to_depth2(x))), np.asarray(x))


def test_to_rgb_packed_stay_matches_unstay():
    rng = np.random.RandomState(52)
    cin = 16
    key = jax.random.PRNGKey(7)
    p = L.init_to_rgb(key, cin, 512)
    p["bias"] = jnp.asarray(rng.randn(1, 1, 1, 3).astype(np.float32) * 0.1)
    xp = jnp.asarray(rng.randn(2, 8, 8, 4 * cin).astype(np.float32))
    style = jnp.asarray(rng.randn(2, 512).astype(np.float32))
    skip = jnp.asarray(rng.randn(2, 8, 8, 3).astype(np.float32))

    ref = L.to_rgb_packed(p, xp, style, skip)
    got = L.depth_to_space2(L.to_rgb_packed_stay(p, xp, style, skip))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_native_depth_to_space2_u8():
    """Native unpack vs the jnp layer and the numpy fallback, both modes."""
    rng = np.random.RandomState(53)
    packed = rng.randint(0, 256, (6, 10, 12), np.uint8)
    ref = np.asarray(L.depth_to_space2(jnp.asarray(packed[None])))[0]

    out = native.depth_to_space2_u8(packed)
    np.testing.assert_array_equal(out, ref)
    out_bgr = native.depth_to_space2_u8(packed, bgr=True)
    np.testing.assert_array_equal(out_bgr, ref[..., ::-1])

    # generic channel count (C=4) exercises the memcpy path
    packed4 = rng.randint(0, 256, (4, 6, 16), np.uint8)
    ref4 = np.asarray(L.depth_to_space2(jnp.asarray(packed4[None])))[0]
    np.testing.assert_array_equal(native.depth_to_space2_u8(packed4), ref4)


@pytest.mark.slow
def test_vtoonify_packed_out_matches_unpacked():
    """Full model: packed_out image unpacks to the standard output within
    1 float-rounding step of the quantizer (the packed skip upsample fuses
    the separable FIR passes)."""
    key = jax.random.PRNGKey(9)
    k1, k2 = jax.random.split(key)
    params = init_vtoonify(k1, TINY)
    rng = np.random.RandomState(54)
    x = jnp.asarray(rng.randn(2, 32, 32, 22).astype(np.float32) * 0.3)
    style = jnp.asarray(rng.randn(2, TINY.n_latent, 512).astype(np.float32)
                        * 0.3)

    ref = vtoonify_apply(params, TINY, x, style, d_s=jnp.asarray(0.5))
    packed = vtoonify_apply(params, TINY, x, style, d_s=jnp.asarray(0.5),
                            packed_out=True)
    assert packed.shape == (2, 64, 64, 12)
    got = L.depth_to_space2(packed)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_pipeline_packed_output_end_to_end(tmp_path):
    """ToonifyPipeline(packed_output=True): process_image equals the unpacked
    pipeline within 1 uint8 LSB, process_batch returns the packed contract,
    the size-bucket crop works in packed rows, and the video engine writes
    identical geometry through the packed writer path."""
    import cv2

    from vtoonify_tpu.pipeline.toonify import ToonifyPipeline
    from vtoonify_tpu.pipeline.video import toonify_video

    k1, k2 = jax.random.split(jax.random.PRNGKey(11))
    vt = init_vtoonify(k1, TINY)
    bn = init_bisenet(k2)
    rng = np.random.RandomState(55)
    s_w = jnp.asarray(rng.randn(1, TINY.n_latent, 512).astype(np.float32)
                      * 0.3)

    plain = ToonifyPipeline(vt, TINY, bn, dtype=jnp.float32)
    packed = ToonifyPipeline(vt, TINY, bn, dtype=jnp.float32,
                             packed_output=True)

    frame = rng.randint(0, 256, (32, 32, 3), np.uint8)
    a = plain.process_image(frame, s_w, 0.5)
    b = packed.process_image(frame, s_w, 0.5)
    assert a.shape == b.shape == (128, 128, 3)
    d = np.abs(a.astype(np.int32) - b.astype(np.int32))
    assert d.max() <= 1  # quantizer rounding step from the fused FIR taps
    assert (d == 0).mean() > 0.99

    out = packed.process_batch(frame[None], s_w, 0.5)
    assert out.shape == (1, 64, 64, 12)

    # size-bucket crop in packed rows: 24×28 pads to 32×32, output crops back
    bucketed = ToonifyPipeline(vt, TINY, bn, dtype=jnp.float32,
                               packed_output=True, size_bucket=32)
    small = rng.randint(0, 256, (1, 24, 28, 3), np.uint8)
    outb = bucketed.process_batch(small, s_w, 0.5)
    assert outb.shape == (1, 48, 56, 12)
    assert native.depth_to_space2_u8(np.asarray(outb)[0]).shape == (96, 112, 3)

    # video engine drives the packed writer path
    src = str(tmp_path / "in.mp4")
    wr = cv2.VideoWriter(src, cv2.VideoWriter_fourcc(*"mp4v"), 10, (32, 32))
    for _ in range(5):
        wr.write(rng.randint(0, 255, (32, 32, 3), np.uint8))
    wr.release()
    dst = str(tmp_path / "out.mp4")
    result = toonify_video(packed, src, dst, s_w=s_w, scale_image=False,
                           batch_size=2, style_degree=0.5)
    assert result.frames_written == 5
    cap = cv2.VideoCapture(dst)
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 5
    assert int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)) == 128
    assert int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT)) == 128
    cap.release()
