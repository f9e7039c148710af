"""Op-level parity tests vs torch oracles (SURVEY.md §4 gap-fill, item (a)).

The torch computations here are independent oracles (torch is a dev-only test
dependency): plain functional calls with the documented upfirdn/fused-act
semantics — NOT imports of the reference implementation.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from vtoonify_tpu.ops import (
    upfirdn2d,
    fused_leaky_relu,
    conv2d,
    conv_transpose2d,
    resize_bilinear,
    resize_nearest,
    grid_sample,
    avg_pool,
    max_pool,
    adaptive_avg_pool,
)

RNG = np.random.RandomState(0)


def nchw(x_nhwc):
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)).copy())


def to_nhwc(t_nchw):
    return np.transpose(t_nchw.detach().numpy(), (0, 2, 3, 1))


def upfirdn2d_torch(x, k, up, down, pad):
    """Oracle: zero-stuff → pad (neg crops) → convolve(k) → stride."""
    up_x = up_y = up
    down_x = down_y = down
    pad_x0, pad_x1, pad_y0, pad_y1 = pad[0], pad[1], pad[0], pad[1]
    n, c, h, w = x.shape
    kh, kw = k.shape
    out = x.reshape(n * c, 1, h, 1, w, 1)
    out = F.pad(out, [0, up_x - 1, 0, 0, 0, up_y - 1])
    out = out.reshape(n * c, 1, h * up_y, w * up_x)
    out = F.pad(out, [max(pad_x0, 0), max(pad_x1, 0), max(pad_y0, 0), max(pad_y1, 0)])
    out = out[
        :,
        :,
        max(-pad_y0, 0) : out.shape[2] - max(-pad_y1, 0),
        max(-pad_x0, 0) : out.shape[3] - max(-pad_x1, 0),
    ]
    wt = torch.flip(k, [0, 1]).reshape(1, 1, kh, kw)
    out = F.conv2d(out, wt)
    out = out[:, :, ::down_y, ::down_x]
    oh = (h * up_y + pad_y0 + pad_y1 - kh + down_y) // down_y
    ow = (w * up_x + pad_x0 + pad_x1 - kw + down_x) // down_x
    return out.reshape(n, c, oh, ow)


@pytest.mark.parametrize(
    "up,down,pad,ksize",
    [
        (1, 1, (1, 1), 3),  # blur
        (1, 1, (2, 1), 4),  # blur pads for k4 (asymmetric)
        (2, 1, (2, 1), 4),  # upsample ×2
        (1, 2, (1, 1), 4),  # downsample ×2
        (2, 1, (1, 1), 4),  # modconv upsample blur pads
        (1, 1, (-1, 2), 4),  # negative pad (crop) case
        (1, 1, (-2, -1), 5),  # both negative
        (2, 2, (3, 0), 6),  # mixed up+down, wide kernel (augment wavelet shape)
    ],
)
def test_upfirdn2d_parity(up, down, pad, ksize):
    x = RNG.randn(2, 11, 9, 3).astype(np.float32)
    k = RNG.randn(ksize, ksize).astype(np.float32)
    ours = np.asarray(upfirdn2d(jnp.asarray(x), jnp.asarray(k), up, down, pad))
    ref = to_nhwc(
        upfirdn2d_torch(nchw(x), torch.from_numpy(k), up, down, pad)
    )
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-5)


def test_upfirdn2d_separable_matches_2d():
    x = RNG.randn(1, 16, 16, 4).astype(np.float32)
    k1 = np.array([1.0, 3.0, 3.0, 1.0], dtype=np.float32)
    k1 /= k1.sum()
    k2 = np.outer(k1, k1)
    for up, down, pad in [(2, 1, (2, 1)), (1, 2, (1, 1)), (1, 1, (2, 1))]:
        a = np.asarray(upfirdn2d(jnp.asarray(x), jnp.asarray(k1), up, down, pad))
        b = np.asarray(upfirdn2d(jnp.asarray(x), jnp.asarray(k2), up, down, pad))
        np.testing.assert_allclose(a, b, atol=1e-6)


def upfirdn2d_torch_axes(x, k, up, down, pad4):
    """Per-axis oracle: (up_x, up_y), (down_x, down_y), (x0, x1, y0, y1)."""
    up_x, up_y = up
    down_x, down_y = down
    pad_x0, pad_x1, pad_y0, pad_y1 = pad4
    n, c, h, w = x.shape
    kh, kw = k.shape
    out = x.reshape(n * c, 1, h, 1, w, 1)
    out = F.pad(out, [0, up_x - 1, 0, 0, 0, up_y - 1])
    out = out.reshape(n * c, 1, h * up_y, w * up_x)
    out = F.pad(out, [max(pad_x0, 0), max(pad_x1, 0),
                      max(pad_y0, 0), max(pad_y1, 0)])
    out = out[:, :,
              max(-pad_y0, 0): out.shape[2] - max(-pad_y1, 0),
              max(-pad_x0, 0): out.shape[3] - max(-pad_x1, 0)]
    out = F.conv2d(out, torch.flip(k, [0, 1]).reshape(1, 1, kh, kw))
    out = out[:, :, ::down_y, ::down_x]
    return out.reshape(n, c, out.shape[2], out.shape[3])


@pytest.mark.parametrize(
    "kshape,up,down,pad4",
    [
        ((1, 5), (2, 1), (1, 1), (3, 2, 0, 0)),   # W-only filter → folded
        ((5, 1), (1, 2), (1, 1), (0, 0, 3, 2)),   # H-only filter → folded
        ((1, 5), (1, 1), (2, 1), (-2, 1, 0, 0)),  # folded + downsample + crop
        ((3, 1), (2, 2), (1, 1), (1, 1, 1, 1)),   # 1-wide kernel but the other
        ((1, 3), (2, 2), (1, 1), (1, 1, 1, 1)),   # axis is NOT identity →
    ],                                            # generic route must keep it
)
def test_upfirdn2d_single_axis_kernels(kshape, up, down, pad4):
    """Single-row/column kernels with per-axis up/down/pad: the small-C folded
    path (the augment pipeline's calls) and the guard that keeps 1-wide
    kernels with a non-identity other axis on the generic route."""
    x = RNG.randn(2, 11, 9, 3).astype(np.float32)  # C=3 → folded when routed
    k = RNG.randn(*kshape).astype(np.float32)
    ours = np.asarray(upfirdn2d(jnp.asarray(x), jnp.asarray(k), up, down, pad4))
    ref = to_nhwc(upfirdn2d_torch_axes(nchw(x), torch.from_numpy(k), up, down,
                                       pad4))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-5)


def test_fused_leaky_relu():
    x = RNG.randn(2, 5, 5, 8).astype(np.float32)
    b = RNG.randn(8).astype(np.float32)
    ours = np.asarray(fused_leaky_relu(jnp.asarray(x), jnp.asarray(b)))
    xt = nchw(x)
    ref = F.leaky_relu(xt + torch.from_numpy(b).view(1, -1, 1, 1), 0.2) * np.sqrt(2)
    np.testing.assert_allclose(ours, to_nhwc(ref), atol=1e-6)


@pytest.mark.parametrize(
    "stride,padding,dilation,groups",
    [(1, 1, 1, 1), (2, 1, 1, 1), (1, 2, 2, 1), (1, 0, 1, 2), (1, 3, 2, 1)],
)
def test_conv2d_parity(stride, padding, dilation, groups):
    cin, cout = 6, 8
    x = RNG.randn(2, 12, 10, cin).astype(np.float32)
    w = RNG.randn(cout, cin // groups, 3, 3).astype(np.float32)
    ours = np.asarray(
        conv2d(
            jnp.asarray(x),
            jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
            stride=stride,
            padding=padding,
            dilation=dilation,
            groups=groups,
        )
    )
    ref = F.conv2d(
        nchw(x), torch.from_numpy(w), stride=stride, padding=padding,
        dilation=dilation, groups=groups,
    )
    np.testing.assert_allclose(ours, to_nhwc(ref), atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("stride,padding,groups", [(2, 0, 1), (2, 1, 1), (2, 0, 2)])
def test_conv_transpose2d_parity(stride, padding, groups):
    cin, cout = 6, 8
    x = RNG.randn(2, 7, 9, cin).astype(np.float32)
    w = RNG.randn(cin, cout // groups, 3, 3).astype(np.float32)
    ours = np.asarray(
        conv_transpose2d(
            jnp.asarray(x),
            jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
            stride=stride,
            padding=padding,
            groups=groups,
        )
    )
    ref = F.conv_transpose2d(
        nchw(x), torch.from_numpy(w), stride=stride, padding=padding, groups=groups
    )
    np.testing.assert_allclose(ours, to_nhwc(ref), atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("align", [True, False])
@pytest.mark.parametrize("size", [(16, 16), (7, 13), (33, 9)])
def test_resize_bilinear(align, size):
    x = RNG.randn(2, 11, 17, 3).astype(np.float32)
    ours = np.asarray(resize_bilinear(jnp.asarray(x), size, align_corners=align))
    ref = F.interpolate(nchw(x), size=size, mode="bilinear", align_corners=align)
    np.testing.assert_allclose(ours, to_nhwc(ref), atol=1e-5, rtol=1e-5)


def test_resize_nearest():
    x = RNG.randn(1, 10, 14, 2).astype(np.float32)
    ours = np.asarray(resize_nearest(jnp.asarray(x), (20, 28)))
    ref = F.interpolate(nchw(x), size=(20, 28), mode="nearest")
    np.testing.assert_allclose(ours, to_nhwc(ref), atol=1e-6)
    ours = np.asarray(resize_nearest(jnp.asarray(x), (5, 7)))
    ref = F.interpolate(nchw(x), size=(5, 7), mode="nearest")
    np.testing.assert_allclose(ours, to_nhwc(ref), atol=1e-6)


@pytest.mark.parametrize("align", [True, False])
@pytest.mark.parametrize("mode", ["zeros", "border"])
def test_grid_sample(align, mode):
    x = RNG.randn(2, 9, 11, 3).astype(np.float32)
    grid = (RNG.rand(2, 6, 7, 2).astype(np.float32) * 2.4) - 1.2  # incl. OOB
    ours = np.asarray(
        grid_sample(jnp.asarray(x), jnp.asarray(grid), align_corners=align,
                    padding_mode=mode)
    )
    ref = F.grid_sample(
        nchw(x), torch.from_numpy(grid), mode="bilinear", padding_mode=mode,
        align_corners=align,
    )
    np.testing.assert_allclose(ours, to_nhwc(ref), atol=1e-5, rtol=1e-5)


def test_pools():
    x = RNG.randn(2, 12, 12, 5).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(avg_pool(jnp.asarray(x), 2)),
        to_nhwc(F.avg_pool2d(nchw(x), 2)),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(max_pool(jnp.asarray(x), 3, stride=2, padding=1)),
        to_nhwc(F.max_pool2d(nchw(x), 3, stride=2, padding=1)),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(adaptive_avg_pool(jnp.asarray(x), 1)),
        to_nhwc(F.adaptive_avg_pool2d(nchw(x), 1)),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(adaptive_avg_pool(jnp.asarray(x), 6)),
        to_nhwc(F.adaptive_avg_pool2d(nchw(x), 6)),
        atol=1e-6,
    )
