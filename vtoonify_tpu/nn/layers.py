"""StyleGAN2-family building blocks as pure functions over param pytrees.

Each block is a pair of functions:
  * ``init_<block>(key, ...) -> params``  (random init, matching the
    reference's distributions where they are load-bearing)
  * ``<block>(params, x, ...) -> y``      (pure apply)

Parameters are stored RAW, exactly as the reference stores them — the
equalized learning-rate scaling (`1/sqrt(fan_in) * lr_mul`) is applied at
run time (reference model/stylegan/model.py:102,149). That keeps checkpoint
conversion a pure layout transpose and preserves training dynamics.

Layout: activations NHWC, conv kernels HWIO, linear weights (in, out).

TPU-first deviation from the reference: ModulatedConv2d uses the
scale-activations formulation — ``y = demod ⊙ conv(x ⊙ s, W)`` — instead of
materializing a per-sample weight and running a grouped conv with
groups=batch (reference model.py:298-304). The two are mathematically
identical for any linear conv; ours keeps batch a real batch dim so XLA can
tile the conv onto the MXU and demodulation becomes one (B,Ci)x(Ci,Co)
matmul. (Equivalence is the reference's own non-fused path, model.py:230-257.)
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
from jax import lax

from vtoonify_tpu.ops.convs import conv2d, conv_transpose2d
from vtoonify_tpu.ops.fused_act import fused_leaky_relu
from vtoonify_tpu.ops.upfirdn2d import blur, make_kernel, upsample_2x, downsample_2x

BLUR_KERNEL = (1.0, 3.0, 3.0, 1.0)


# ---------------------------------------------------------------------------
# elementwise


def pixel_norm(x, eps: float = 1e-8):
    """reference model.py:13-18 (channel-last here)."""
    return x * lax.rsqrt(jnp.mean(jnp.square(x), axis=-1, keepdims=True) + eps)


def leaky_relu(x, slope: float = 0.2):
    return jax.nn.leaky_relu(x, slope)


# ---------------------------------------------------------------------------
# equalized-LR linear / conv


def init_equal_linear(key, in_dim, out_dim, bias=True, bias_init=0.0, lr_mul=1.0):
    p = {"weight": jax.random.normal(key, (in_dim, out_dim), jnp.float32) / lr_mul}
    if bias:
        p["bias"] = jnp.full((out_dim,), bias_init, jnp.float32)
    return p


def equal_linear(p, x, lr_mul: float = 1.0, activation: bool = False):
    """reference model.py:133-162."""
    in_dim = p["weight"].shape[0]
    scale = (1.0 / math.sqrt(in_dim)) * lr_mul
    w = (p["weight"] * scale).astype(x.dtype)
    out = x @ w
    b = p.get("bias")
    if activation:
        out = fused_leaky_relu(out, None if b is None else b * lr_mul)
    elif b is not None:
        out = out + (b * lr_mul).astype(out.dtype)
    return out


def init_equal_conv2d(key, in_ch, out_ch, ksize, bias=True):
    p = {"weight": jax.random.normal(key, (ksize, ksize, in_ch, out_ch), jnp.float32)}
    if bias:
        p["bias"] = jnp.zeros((out_ch,), jnp.float32)
    return p


def equal_conv2d(p, x, stride=1, padding=0, dilation=1):
    """reference model.py:93-124 (incl. the VToonify dilation modification)."""
    kh, kw, cin, _ = p["weight"].shape
    scale = 1.0 / math.sqrt(cin * kh * kw)
    out = conv2d(
        x, (p["weight"] * scale).astype(x.dtype),
        stride=stride, padding=padding, dilation=dilation,
    )
    if "bias" in p:
        out = out + p["bias"].astype(out.dtype)
    return out


# ---------------------------------------------------------------------------
# ConvLayer = [Blur?] -> EqualConv2d -> [FusedLeakyReLU?]
# (reference model.py:593-637)


def init_conv_layer(key, in_ch, out_ch, ksize, downsample=False, bias=True,
                    activate=True):
    p = {"conv": init_equal_conv2d(key, in_ch, out_ch, ksize,
                                   bias=bias and not activate)}
    if activate and bias:
        p["act_bias"] = jnp.zeros((out_ch,), jnp.float32)
    return p


def conv_layer(p, x, ksize, downsample=False, activate=True, dilation=1,
               blur_kernel: Sequence[float] = BLUR_KERNEL):
    if downsample:
        kt = len(blur_kernel)
        pd = (kt - 2) + (ksize - 1)
        x = blur(x, make_kernel(blur_kernel).astype(x.dtype),
                 pad=((pd + 1) // 2, pd // 2))
        out = equal_conv2d(p["conv"], x, stride=2, padding=0)
    else:
        padding = ksize // 2 + dilation - 1
        out = equal_conv2d(p["conv"], x, stride=1, padding=padding,
                           dilation=dilation)
    if activate:
        out = fused_leaky_relu(out, p.get("act_bias"))
    return out


def split_cat2_weight(p, c1):
    """Convert a ``{"weight", ...}`` conv dict to cat2 SPLIT storage in
    place: ``weight`` (kh, kw, cin, cout) → ``weight_a`` = [:, :, :c1] and
    ``weight_b`` = [:, :, c1:].

    Why stored pre-split rather than sliced in apply: the transpose of a
    kernel slice is a pad, and under TP (cout-sharded kernels, channel-
    sharded activations) GSPMD computes the per-operand kernel gradients
    cin-sharded and inserts an all-to-all at that pad to reshard them back
    to the param's cout sharding. With two independent params each gradient
    is pinned to its param's sharding and the grad convs compile
    collective-free (measured: slice → 2 collective-permutes/all-to-alls
    per conv per call; split params → none, only the inherent cin
    all-gathers). Same arithmetic either way."""
    w = p.pop("weight")
    p["weight_a"] = w[:, :, :c1]
    p["weight_b"] = w[:, :, c1:]
    return p


def merge_cat2_weight(p):
    """Inverse of split_cat2_weight (checkpoint export): full weight."""
    return jnp.concatenate([p["weight_a"], p["weight_b"]], axis=2)


def conv_layer_cat2(p, x1, x2, ksize):
    """conv_layer(p, concatenate([x1, x2], axis=-1), ksize) WITHOUT the
    concat (same argument as conv2d_torch_cat2 — a concat along a TP-sharded
    channel axis forces a GSPMD all-to-all; applying the kernel per operand
    is the identical contraction regrouped). Non-downsample, activated form —
    the discriminators' minibatch-stddev append. The kernel is stored
    pre-split (see split_cat2_weight): x1 gets weight_a, x2 weight_b."""
    wa, wb = p["conv"]["weight_a"], p["conv"]["weight_b"]
    kh, kw = wa.shape[:2]
    cin = wa.shape[2] + wb.shape[2]
    scale = 1.0 / math.sqrt(cin * kh * kw)
    padding = ksize // 2
    out = conv2d(x1, (wa * scale).astype(x1.dtype),
                 padding=padding) + conv2d(
        x2, (wb * scale).astype(x2.dtype), padding=padding
    )
    if "bias" in p["conv"]:
        out = out + p["conv"]["bias"].astype(out.dtype)
    return fused_leaky_relu(out, p.get("act_bias"))


def init_res_block(key, in_ch, out_ch):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "conv1": init_conv_layer(k1, in_ch, in_ch, 3),
        "conv2": init_conv_layer(k2, in_ch, out_ch, 3, downsample=True),
        "skip": init_conv_layer(k3, in_ch, out_ch, 1, downsample=True,
                                bias=False, activate=False),
    }


def res_block(p, x):
    """reference model.py:640-658."""
    out = conv_layer(p["conv1"], x, 3)
    out = conv_layer(p["conv2"], out, 3, downsample=True)
    skip = conv_layer(p["skip"], x, 1, downsample=True, activate=False)
    return (out + skip) / math.sqrt(2)


# ---------------------------------------------------------------------------
# modulated conv


def init_modulated_conv2d(key, in_ch, out_ch, ksize, style_dim):
    k1, k2 = jax.random.split(key)
    return {
        "weight": jax.random.normal(k1, (ksize, ksize, in_ch, out_ch),
                                    jnp.float32),
        "modulation": init_equal_linear(k2, style_dim, in_ch, bias_init=1.0),
    }


def _compose_upsample_kernel(w_scaled, blur_kernel):
    """Fold the ×2-upsample blur into the transposed-conv kernel.

    The reference chain conv_transpose(stride 2, k=3) → Blur (4-tap, ×4 gain)
    is linear, so it equals ONE 6-tap kernel applied to the zero-stuffed
    input: c = conv_full(flip(W), 4·blur2d). Returns c (6, 6, cin, cout).
    """
    kh, kw, cin, cout = w_scaled.shape
    g = jnp.flip(w_scaled, axis=(0, 1))
    bk1 = make_kernel(blur_kernel).astype(jnp.float32)
    bk = jnp.outer(bk1, bk1) * 4.0
    kt = bk.shape[0]
    ch, cw = kh + kt - 1, kw + kt - 1
    # full convolution c[p,q,i,o] = Σ_{a,b} g[a,b,i,o]·bk[p−a,q−b], expressed
    # as one tiny einsum against a (kh,kw,ch,cw) tap tensor (constant-folded
    # by XLA when blur_kernel is static). Keeping the channel dims in place
    # (no transpose/reshape through cin·cout) lets a TP sharding of cout
    # propagate collective-free — the batch-of-planes conv formulation forced
    # GSPMD to all-to-all the kernel every call (found via parallel/audit.py;
    # also fewer ops for XLA to schedule).
    taps = jnp.zeros((kh, kw, ch, cw), jnp.float32)
    for a in range(kh):
        for b in range(kw):
            taps = taps.at[a, b, a:a + kt, b:b + kt].set(bk)
    return jnp.einsum("abio,abpq->pqio", g, taps.astype(w_scaled.dtype))


def _fused_upsample_conv(x, w_scaled, blur_kernel):
    """Phase-decomposed fused upsample conv (TPU-first replacement for the
    dilated transposed conv + separate blur).

    XLA executes a stride-2 lhs-dilated conv densely (75 % multiply-by-zero)
    and at 2× resolution; decomposing the 6-tap combined kernel into four
    3-tap polyphase kernels computes only the useful FLOPs at INPUT
    resolution with 4× the output channels — much better MXU lane
    utilization for the wide-resolution/narrow-channel tail. Numerically
    identical to the reference chain (pure linear algebra).
    """
    c = _compose_upsample_kernel(w_scaled, blur_kernel)
    # y[2u+a, 2v+b] = Σ_{d∈[-1,1]²} x[u+dy, v+dx] · c[2dy+3-2a?…]: even output
    # parity uses taps c[1::2], odd uses c[0::2] (see derivation in commit).
    phases = [
        c[1::2, 1::2], c[1::2, 0::2], c[0::2, 1::2], c[0::2, 0::2]
    ]  # (a,b) = (0,0),(0,1),(1,0),(1,1)
    cin, cout = c.shape[2], c.shape[3]
    # phase-MINOR (cout-major) channel packing, unlike the packed-stay tail's
    # phase-major convention: these convs are the wide (TP-shardable) stages,
    # and stacking the phases under cout keeps the sharded dim major through
    # the (cout,4)→4·cout merge — collective-free under GSPMD, where a concat
    # along the sharded axis forced an all-to-all of the kernel every call
    # (the round-3 dryrun abort; parallel/audit.py + the
    # test_hlo_collectives_* guards). The tail stages (cout ≤ 128) are never
    # TP-sharded, so their shared phase-major layout is unaffected.
    k_cat = jnp.stack(phases, axis=-1).reshape(3, 3, cin, 4 * cout)
    yp = conv2d(x, k_cat.astype(x.dtype), padding=1)  # (B, H, W, 4*cout)
    return _depth_to_space2_phase_minor(yp)


def _depth_to_space2_phase_minor(yp):
    """(B, H, W, 4C) cout-major packed (channel index = o·4 + (a·2+b)) →
    (B, 2H, 2W, C). Inverse of _fused_upsample_conv's stacking; see
    depth_to_space2 for the phase-major variant the packed tail uses."""
    b, h, w_, c4 = yp.shape
    c = c4 // 4
    yp = yp.reshape(b, h, w_, c, 2, 2)
    return jnp.transpose(yp, (0, 1, 4, 2, 5, 3)).reshape(b, 2 * h, 2 * w_, c)


def modulated_conv2d(p, x, style, demodulate=True, upsample=False,
                     downsample=False, blur_kernel: Sequence[float] = BLUR_KERNEL,
                     eps: float = 1e-8, fuse_upsample: bool = True):
    """reference model.py:170-306, scale-activations formulation (see module
    docstring for the equivalence argument).

    Shared-style weight folding: when the style batch is 1 while x carries a
    real batch (the video-inference case — one style code per video), the
    per-channel modulation s and demodulation d fold into the kernel itself
    (W′ = scale·W ⊙ s_in ⊙ d_out) instead of scaling activations. Exact same
    algebra on a kernel-sized tensor; on TPU this removes the elementwise
    producers/consumers XLA would otherwise fuse into the conv — which
    re-execute per window tap and cost ~35% of the conv's runtime on the
    packed high-res stages (measured: bare conv 85% of bf16 peak vs 62%
    with fused modulation context at (3,3,128,128)@512²)."""
    w = p["weight"]
    kh, kw, cin, cout = w.shape
    scale = 1.0 / math.sqrt(cin * kh * kw)

    s = equal_linear(p["modulation"], style)  # (B, cin)

    if demodulate:
        # d_b,o = rsqrt( sum_i s_bi^2 * (scale^2 * sum_hw W_hwio^2) + eps )
        w2 = (scale * scale) * jnp.sum(
            jnp.square(w), axis=(0, 1)
        )  # (cin, cout), f32
        d = lax.rsqrt(
            jnp.square(s.astype(jnp.float32)) @ w2 + eps
        )  # (B, cout), f32

    fold = s.shape[0] == 1 and x.shape[0] != 1
    if fold:
        wf = (w * scale) * s[0].astype(jnp.float32)[None, None, :, None]
        if demodulate:
            wf = wf * d[0][None, None, None, :]
        wsc = wf.astype(x.dtype)
    else:
        x = x * s[:, None, None, :].astype(x.dtype)
        wsc = (w * scale).astype(x.dtype)

    if upsample and fuse_upsample and kh == 3 and len(blur_kernel) == 4:
        out = _fused_upsample_conv(x, wsc, blur_kernel)
    elif upsample:
        out = conv_transpose2d(x, jnp.swapaxes(wsc, 2, 3), stride=2, padding=0)
        kt = len(blur_kernel)
        pd = (kt - 2) - (kh - 1)
        pad0 = (pd + 1) // 2 + 1  # + (factor - 1)
        pad1 = pd // 2 + 1
        out = blur(out, make_kernel(blur_kernel).astype(out.dtype),
                   pad=(pad0, pad1), upsample_factor=2)
    elif downsample:
        kt = len(blur_kernel)
        pd = (kt - 2) + (kh - 1)
        x = blur(x, make_kernel(blur_kernel).astype(x.dtype),
                 pad=((pd + 1) // 2, pd // 2))
        out = conv2d(x, wsc, stride=2, padding=0)
    else:
        out = conv2d(x, wsc, padding=kh // 2)

    if demodulate and not fold:
        out = out * d.astype(out.dtype)[:, None, None, :]
    return out


def init_noise_injection():
    return {"weight": jnp.zeros((), jnp.float32)}


def noise_injection(p, x, noise):
    """reference model.py:309-320; VToonify always passes explicit noise
    (zeroed at inference, model/vtoonify.py:266-267)."""
    if noise is None:
        return x
    return x + p["weight"].astype(x.dtype) * noise.astype(x.dtype)


def init_styled_conv(key, in_ch, out_ch, ksize, style_dim):
    k1, _ = jax.random.split(key)
    return {
        "conv": init_modulated_conv2d(k1, in_ch, out_ch, ksize, style_dim),
        "noise": init_noise_injection(),
        "act_bias": jnp.zeros((out_ch,), jnp.float32),
    }


def styled_conv(p, x, style, noise=None, upsample=False, demodulate=True):
    """reference model.py:336-370."""
    out = modulated_conv2d(p["conv"], x, style, demodulate=demodulate,
                           upsample=upsample)
    out = noise_injection(p["noise"], out, noise)
    return fused_leaky_relu(out, p["act_bias"])


def init_to_rgb(key, in_ch, style_dim):
    return {
        "conv": init_modulated_conv2d(key, in_ch, 3, 1, style_dim),
        "bias": jnp.zeros((1, 1, 1, 3), jnp.float32),
    }


def to_rgb(p, x, style, skip=None, blur_kernel: Sequence[float] = BLUR_KERNEL):
    """reference model.py:373-392 (1×1 mod conv without demodulation)."""
    out = modulated_conv2d(p["conv"], x, style, demodulate=False)
    out = out + p["bias"].astype(out.dtype)
    if skip is not None:
        skip = upsample_2x(skip, make_kernel(blur_kernel).astype(skip.dtype))
        out = out + skip
    return out


# ---------------------------------------------------------------------------
# plain torch-style layers (used by VToonify encoder / BiSeNet / pSp)


def init_conv2d_torch(key, in_ch, out_ch, ksize, bias=True):
    """torch nn.Conv2d default init: kaiming_uniform(a=√5) + uniform bias."""
    k1, k2 = jax.random.split(key)
    fan_in = in_ch * ksize * ksize
    bound = math.sqrt(6.0 / ((1 + 5.0) * fan_in))  # gain²=2/(1+a²)=1/3 → √(3·1/3/fan)
    p = {
        "weight": jax.random.uniform(
            k1, (ksize, ksize, in_ch, out_ch), jnp.float32, -bound, bound
        )
    }
    if bias:
        b_bound = 1.0 / math.sqrt(fan_in)
        p["bias"] = jax.random.uniform(k2, (out_ch,), jnp.float32, -b_bound, b_bound)
    return p


def conv2d_torch(p, x, stride=1, padding=0, dilation=1, groups=1):
    out = conv2d(x, p["weight"].astype(x.dtype), stride=stride, padding=padding,
                 dilation=dilation, groups=groups)
    if "bias" in p:
        out = out + p["bias"].astype(out.dtype)
    return out


def conv2d_torch_cat2(p, x1, x2, padding=0):
    """conv2d_torch(p, concatenate([x1, x2], axis=-1)) WITHOUT the concat.

    A channel concat of two TP-sharded activations forces GSPMD to
    all-to-all the operands (the round-3 dryrun abort class; see
    parallel/audit.py and tests/test_sharding.py::test_hlo_collectives_*).
    The conv is linear in its input channels, so applying the kernel per
    operand is the same contraction regrouped — concat-free, each piece
    independently shardable, the add fused into the conv epilogue by XLA.
    The kernel is stored pre-split (split_cat2_weight; slicing it in apply
    would put an all-to-all in the kernel-gradient path instead).
    Bit-level: partial-sum order changes (≤ float-rounding drift)."""
    out = conv2d(x1, p["weight_a"].astype(x1.dtype),
                 padding=padding) + conv2d(
        x2, p["weight_b"].astype(x2.dtype), padding=padding
    )
    if "bias" in p:
        out = out + p["bias"].astype(out.dtype)
    return out


def init_linear_torch(key, in_dim, out_dim, bias=True):
    k1, k2 = jax.random.split(key)
    bound = math.sqrt(6.0 / ((1 + 5.0) * in_dim))
    p = {"weight": jax.random.uniform(k1, (in_dim, out_dim), jnp.float32,
                                      -bound, bound)}
    if bias:
        b = 1.0 / math.sqrt(in_dim)
        p["bias"] = jax.random.uniform(k2, (out_dim,), jnp.float32, -b, b)
    return p


def linear_torch(p, x):
    out = x @ p["weight"].astype(x.dtype)
    if "bias" in p:
        out = out + p["bias"].astype(out.dtype)
    return out


def instance_norm_2d(x, eps: float = 1e-5):
    """torch nn.InstanceNorm2d(affine=False) — per (N, C) spatial stats."""
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mean) * lax.rsqrt(var + eps)


def batch_norm_2d(p, x, eps: float = 1e-5):
    """torch nn.BatchNorm2d in eval mode (running stats)."""
    inv = lax.rsqrt(p["running_var"] + eps) * p["weight"]
    return x * inv.astype(x.dtype) + (
        p["bias"] - p["running_mean"] * inv
    ).astype(x.dtype)


def batch_norm_2d_train(p, x, momentum: float = 0.1, eps: float = 1e-5):
    """torch nn.BatchNorm2d in TRAIN mode: normalize with the biased batch
    statistics (gradients flow through them), update the running buffers with
    the unbiased variance at torch's default momentum 0.1
    (reference model/raft/train.py:146-147 trains BN on the 'chairs' stage).
    Returns (y, updated_p)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(0, 1, 2))
    var = jnp.mean(jnp.square(xf - mean), axis=(0, 1, 2))  # biased
    inv = lax.rsqrt(var + eps) * p["weight"]
    y = x * inv.astype(x.dtype) + (p["bias"] - mean * inv).astype(x.dtype)
    n = x.shape[0] * x.shape[1] * x.shape[2]
    unbiased = var * (n / max(n - 1, 1))
    new_p = {
        **p,
        "running_mean": (1 - momentum) * p["running_mean"]
        + momentum * lax.stop_gradient(mean),
        "running_var": (1 - momentum) * p["running_var"]
        + momentum * lax.stop_gradient(unbiased),
    }
    return y, new_p


def init_batch_norm_2d(ch):
    return {
        "weight": jnp.ones((ch,), jnp.float32),
        "bias": jnp.zeros((ch,), jnp.float32),
        "running_mean": jnp.zeros((ch,), jnp.float32),
        "running_var": jnp.ones((ch,), jnp.float32),
    }


def prelu(p, x):
    """torch nn.PReLU with per-channel weight (channel-last)."""
    w = p["weight"].astype(x.dtype)
    return jnp.where(x >= 0, x, w * x)


# ---------------------------------------------------------------------------
# AdaIN + ModRes (reference model/dualstylegan.py:6-45)


def init_adaptive_instance_norm(key, fin, style_dim=512):
    p = init_linear_torch(key, style_dim, fin * 2)
    p["bias"] = p["bias"].at[:fin].set(1.0).at[fin:].set(0.0)
    return {"style": p}


def adaptive_instance_norm(p, x, style):
    fin = x.shape[-1]
    st = linear_torch(p["style"], style)  # (B, 2*fin)
    gamma = st[:, None, None, :fin]
    beta = st[:, None, None, fin:]
    return gamma * instance_norm_2d(x) + beta


def init_ada_res_block(key, fin, style_dim=512):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    p = {
        "conv1": init_conv_layer(k1, fin, fin, 3),
        "conv2": init_conv_layer(k2, fin, fin, 3),
        "norm1": init_adaptive_instance_norm(k3, fin, style_dim),
        "norm2": init_adaptive_instance_norm(k4, fin, style_dim),
    }
    # near-zero conv init → negligible residual at start (dualstylegan.py:35-36)
    p["conv1"]["conv"]["weight"] = p["conv1"]["conv"]["weight"] * 0.01
    p["conv2"]["conv"]["weight"] = p["conv2"]["conv"]["weight"] * 0.01
    return p


def ada_res_block(p, x, style, w=1.0, dilation=1):
    """reference dualstylegan.py:24-45. `w` may be a traced scalar; the
    reference's early-out at w==0 is a Python-level shortcut we only take for
    static zeros."""
    if isinstance(w, (int, float)) and w == 0:
        return x
    out = conv_layer(p["conv1"], adaptive_instance_norm(p["norm1"], x, style),
                     3, dilation=dilation)
    out = conv_layer(p["conv2"], adaptive_instance_norm(p["norm2"], out, style),
                     3, dilation=dilation)
    # keep the activation dtype: a traced f32 `w` would promote the residual
    # (and everything downstream) to f32 in bf16 graphs
    return out * jnp.asarray(w).astype(out.dtype) + x


# ---------------------------------------------------------------------------
# packed-layout tail execution (TPU-first, exact)
#
# The no-fusion high-res generator stages (e.g. 512→1024 with 64→32 channels)
# are dominated not by FLOPs but by 128-lane padding and inter-op relayouts.
# These variants keep activations in space-to-depth packing (2×2 spatial
# block → channel, phase-major) across the whole stage: the polyphase
# upsample conv simply skips its depth-to-space, the second conv runs as an
# equivalent (3,3,4C,4C) packed conv, and ToRGB unpacks once at the end.
# Bit-identical to the unpacked path (pure index algebra).


def _packed_kernel_3x3(w):
    """(3,3,C,Co) → equivalent packed (3,3,4C,4Co) kernel (phase-major)."""
    c, cout = w.shape[2], w.shape[3]
    kp = jnp.zeros((3, 3, 4, c, 4, cout), w.dtype)
    for a in range(2):
        for b_ in range(2):
            for dy in range(3):
                for dx in range(3):
                    ty, tx = a + dy - 1, b_ + dx - 1
                    m, p = ty // 2, ty % 2
                    n, q = tx // 2, tx % 2
                    kp = kp.at[m + 1, n + 1, p * 2 + q, :,
                               a * 2 + b_, :].add(w[dy, dx])
    return kp.reshape(3, 3, 4 * c, 4 * cout)


def depth_to_space2(yp):
    """(B, H, W, 4C) phase-major packed → (B, 2H, 2W, C).

    The reshape→transpose→reshape leaves XLA:TPU a relayout copy with (2, C)
    minor dims (~42× lane padding at C=3). A folded-minor Pallas alternative
    exists (ops/pallas_kernels.py::depth_to_space2_pallas, bit-identical in
    interpret mode) but current Mosaic rejects its lane de-interleave
    (unsupported shape cast, verified on v5e 2026-08-18), so the XLA form is
    the only production path."""
    b, h, w_, c4 = yp.shape
    c = c4 // 4
    yp = yp.reshape(b, h, w_, 2, 2, c)
    return jnp.transpose(yp, (0, 1, 3, 2, 4, 5)).reshape(b, 2 * h, 2 * w_, c)


def space_to_depth2(x):
    """(B, 2H, 2W, C) → (B, H, W, 4C) phase-major packed — the inverse of
    depth_to_space2."""
    b, h2, w2, c = x.shape
    x = x.reshape(b, h2 // 2, 2, w2 // 2, 2, c)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(
        b, h2 // 2, w2 // 2, 4 * c)


def upsample_2x_packed(x, kernel_1d):
    """space_to_depth2(upsample_2x(x, k)) computed natively in packed layout.

    Each output phase of the ×2 FIR upsample is a 2-tap-per-axis filter on the
    INPUT grid (phase 0 per axis: taps (K0, K1) at offsets (-1, 0); phase 1:
    (K2, K3) at (0, +1), K = 2·kernel_1d — verified against upsample_2x by
    impulse analysis), so all four phases are ONE 3×3 conv producing the
    phase-major (B, H, W, 4C) packed result — no 2H×2W unpacked tensor, no
    (2, C)-minor relayout. Values match the separable upfirdn2d path to float
    rounding (product order differs), not bit-exactly."""
    k = kernel_1d * 2.0
    assert k.shape[0] == 4, "packed upsample assumes the 4-tap blur kernel"
    c = x.shape[-1]
    z = jnp.zeros((), k.dtype)
    taps = [jnp.stack([k[0], k[1], z]), jnp.stack([z, k[2], k[3]])]
    eye = jnp.eye(c, dtype=k.dtype)
    blocks = []
    for py in range(2):
        for px in range(2):
            f = taps[py][:, None] * taps[px][None, :]  # (3, 3)
            blocks.append(f[:, :, None, None] * eye)   # (3, 3, C, C)
    w = jnp.concatenate(blocks, axis=-1).astype(x.dtype)  # (3, 3, C, 4C)
    return conv2d(x, w, padding=1)


def _pack_noise2(noise, dtype):
    """(B, 2H, 2W, 1) noise image → (B, H, W, 4) in the packed phase order
    (py, px) that depth_to_space2 unpacks."""
    b, s, s2, _ = noise.shape
    n = noise.astype(dtype).reshape(b, s // 2, 2, s2 // 2, 2)
    return jnp.transpose(n, (0, 1, 3, 2, 4)).reshape(b, s // 2, s2 // 2, 4)


def _add_noise_packed(y, p_noise, noise, cout):
    """NoiseInjection on a packed pre-activation (B, H, W, 4C): each phase
    block gets its phase's noise pixel (exactly noise_injection after
    depth_to_space2)."""
    if noise is None:
        return y
    n4 = _pack_noise2(noise, y.dtype)
    return y + p_noise["weight"].astype(y.dtype) * jnp.repeat(n4, cout,
                                                              axis=-1)


def _mod_sd(p, style, eps=1e-8):
    w = p["weight"]
    kh, kw, cin, cout = w.shape
    scale = 1.0 / math.sqrt(cin * kh * kw)
    s = equal_linear(p["modulation"], style)
    w2 = (scale * scale) * jnp.sum(jnp.square(w), axis=(0, 1))
    d = lax.rsqrt(jnp.square(s.astype(jnp.float32)) @ w2 + eps)
    return (w * scale), s, d


def _fold_sd(wsc, s, d):
    """Fold shared-batch modulation/demodulation into the (kh,kw,cin,cout)
    kernel (see modulated_conv2d's shared-style note)."""
    wf = wsc * s[0].astype(jnp.float32)[None, None, :, None]
    if d is not None:
        wf = wf * d[0][None, None, None, :]
    return wf


def styled_conv_up_packed(p, x, style, noise=None, blur_kernel=BLUR_KERNEL):
    """Upsampling styled conv; input unpacked (B,H,W,Cin), output PACKED
    (B,H,W,4Cout) — the polyphase conv without its depth-to-space. `noise`
    is the unpacked (B, 2H, 2W, 1) NoiseInjection image (or None)."""
    wsc, s, d = _mod_sd(p["conv"], style)
    fold = s.shape[0] == 1 and x.shape[0] != 1
    if fold:
        wsc = _fold_sd(wsc, s, d)
    c6 = _compose_upsample_kernel(wsc.astype(x.dtype), blur_kernel)
    phases = [c6[1::2, 1::2], c6[1::2, 0::2], c6[0::2, 1::2], c6[0::2, 0::2]]
    k_cat = jnp.concatenate(phases, axis=-1)
    xin = x if fold else x * s[:, None, None, :].astype(x.dtype)
    y = conv2d(xin, k_cat.astype(x.dtype), padding=1)
    cout = wsc.shape[-1]
    if not fold:
        dd = jnp.tile(d.astype(x.dtype), (1, 4))[:, None, None, :]
        y = y * dd
    y = _add_noise_packed(y, p["noise"], noise, cout)
    bias = jnp.tile(p["act_bias"], 4)
    return fused_leaky_relu(y, bias)


def styled_conv_packed(p, xp, style, noise=None):
    """Non-upsampling styled conv entirely in packed layout. `noise` is the
    unpacked (B, 2H, 2W, 1) NoiseInjection image (or None)."""
    wsc, s, d = _mod_sd(p["conv"], style)
    fold = s.shape[0] == 1 and xp.shape[0] != 1
    if fold:
        kp = _packed_kernel_3x3(_fold_sd(wsc, s, d).astype(xp.dtype))
        y = conv2d(xp, kp, padding=1)
    else:
        kp = _packed_kernel_3x3(wsc.astype(xp.dtype))
        sp = jnp.tile(s.astype(xp.dtype), (1, 4))[:, None, None, :]
        y = conv2d(xp * sp, kp, padding=1)
        dd = jnp.tile(d.astype(xp.dtype), (1, 4))[:, None, None, :]
        y = y * dd
    y = _add_noise_packed(y, p["noise"], noise, wsc.shape[-1])
    bias = jnp.tile(p["act_bias"], 4)
    return fused_leaky_relu(y, bias)


def _to_rgb_packed_conv(p, xp, style):
    """The block-diagonal packed 1×1 ToRGB conv + bias: (B,H,W,4Cin) →
    (B,H,W,12) phase-major packed RGB."""
    w = p["conv"]["weight"]  # (1,1,Cin,3)
    cin = w.shape[2]
    scale = 1.0 / math.sqrt(cin)
    s = equal_linear(p["conv"]["modulation"], style)
    fold = s.shape[0] == 1 and xp.shape[0] != 1
    wsc = w[0, 0] * scale  # (Cin, 3), f32
    if fold:
        wsc = wsc * s[0].astype(jnp.float32)[:, None]
    wsc = wsc.astype(xp.dtype)
    kp = jnp.zeros((1, 1, 4 * cin, 12), xp.dtype)
    for ph in range(4):
        kp = kp.at[0, 0, ph * cin:(ph + 1) * cin, ph * 3:(ph + 1) * 3].set(wsc)
    if fold:
        y = conv2d(xp, kp)
    else:
        sp = jnp.tile(s.astype(xp.dtype), (1, 4))[:, None, None, :]
        y = conv2d(xp * sp, kp)
    return y + jnp.tile(p["bias"].reshape(3), 4).astype(y.dtype)


def to_rgb_packed(p, xp, style, skip=None, blur_kernel=BLUR_KERNEL):
    """ToRGB on packed input; returns UNPACKED (B, 2H, 2W, 3) + skip chain."""
    out = depth_to_space2(_to_rgb_packed_conv(p, xp, style))
    if skip is not None:
        out = out + upsample_2x(skip, make_kernel(blur_kernel).astype(skip.dtype))
    return out


def to_rgb_packed_stay(p, xp, style, skip=None, blur_kernel=BLUR_KERNEL):
    """ToRGB on packed input, staying PACKED: returns (B, H, W, 12) — the
    phase-major form of to_rgb_packed's output. The skip chain is upsampled
    directly into packed layout (upsample_2x_packed), so the graph's final
    stage emits no 2H×2W float tensor at all: the depth-to-space becomes a
    pure uint8 index permutation downstream (host-side, or free in the
    output-conversion pass). Matches to_rgb_packed to float rounding (the
    packed skip upsample fuses the two separable FIR passes)."""
    out = _to_rgb_packed_conv(p, xp, style)
    if skip is not None:
        out = out + upsample_2x_packed(
            skip, make_kernel(blur_kernel).astype(skip.dtype))
    return out
