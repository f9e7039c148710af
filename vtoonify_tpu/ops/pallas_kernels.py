"""Pallas TPU kernels for the L0 hot ops (BASELINE.json perf targets).

These back the ops in ops/upfirdn2d.py and ops/fused_act.py on TPU. XLA
already fuses the pure-elementwise fused_leaky_relu into producer epilogues,
and expresses upfirdn as a depthwise conv — the Pallas versions exist to (a)
guarantee the fusion/tiling instead of hoping, and (b) fuse the *whole*
blur-resample chain (pad → FIR_y → FIR_x → stride) into one VMEM-resident
pass with no HBM round-trip between the two separable passes.

Layout: NHWC with C as the lane dimension (128-aligned tiles). Each grid step
processes one (batch, row-block) stripe; the horizontal pass reads the
vertical pass's result directly from VMEM scratch.

Production status (docs/PERF.md "Pallas kernel scorecard"): the affine-warp
kernel is the production augment path on TPU (6.4-30x over XLA's gather
form); the blur-chain / fused-act / modconv / depth-to-space kernels LOST
their on-hardware A/Bs to XLA's fusions (r2-r4 measurements in PERF.md) and
are kept as verified reference/insurance code — exercised by
tests/test_pallas.py, callable directly, but not dispatched by the ops.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# fused bias + leaky-relu × scale


def _fused_lrelu_kernel(x_ref, b_ref, o_ref, *, slope, scale):
    x = x_ref[...]
    b = b_ref[...]
    y = x + b
    o_ref[...] = jnp.where(y >= 0, y, y * slope) * scale


def fused_leaky_relu_pallas(x, bias, negative_slope: float = 0.2,
                            scale: float = math.sqrt(2.0),
                            interpret: bool = False):
    """(..., C) input + (C,) bias. Tiles over a flattened row dim."""
    orig_shape = x.shape
    c = x.shape[-1]
    n = int(x.size) // c
    x2 = x.reshape(n, c)
    rows = 256 if n % 256 == 0 else (8 if n % 8 == 0 else None)
    if rows is None:
        y = x2 + bias.astype(x.dtype)
        return (jnp.where(y >= 0, y, y * negative_slope) * scale).reshape(
            orig_shape
        )
    out = pl.pallas_call(
        functools.partial(_fused_lrelu_kernel, slope=negative_slope,
                          scale=scale),
        out_shape=jax.ShapeDtypeStruct((n, c), x.dtype),
        grid=(n // rows,),
        in_specs=[
            pl.BlockSpec((rows, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x2, bias.astype(x.dtype))
    return out.reshape(orig_shape)


# ---------------------------------------------------------------------------
# fused separable 2-D FIR blur (up=1, down=1) — the Blur module's hot case


def _blur_kernel(x_ref, ky_ref, kx_ref, o_ref, *, kt, pad_y0, pad_x0, h, w):
    """One (batch, channel-tile) slab: full H×W plane resident in VMEM.
    Vertical 1-D FIR then horizontal 1-D FIR, zero padding semantics."""
    x = x_ref[0]  # (H, W, ct)
    ky = ky_ref[...]
    kx = kx_ref[...]

    # vertical pass: y[i] = Σ_t x[i + t - pad_y0] · ky_flipped[t]
    acc = jnp.zeros_like(x)
    for t in range(kt):
        off = t - pad_y0
        lo = max(0, -off)
        hi = min(h, h - off)
        src = x[lo + off: hi + off, :, :]
        pad_top = lo
        pad_bot = h - hi
        src = jnp.pad(src, ((pad_top, pad_bot), (0, 0), (0, 0)))
        acc = acc + src * ky[kt - 1 - t]
    # horizontal pass
    out = jnp.zeros_like(acc)
    for t in range(kt):
        off = t - pad_x0
        lo = max(0, -off)
        hi = min(w, w - off)
        src = acc[:, lo + off: hi + off, :]
        src = jnp.pad(src, ((0, 0), (lo, w - hi), (0, 0)))
        out = out + src * kx[kt - 1 - t]
    o_ref[0] = out


def blur_same_pallas(x, kernel_1d, pad=(1, 1), interpret: bool = False):
    """Separable same-size blur (upfirdn up=1, down=1, pad symmetric so the
    output equals the input size: pad0 + pad1 == kt - 1). One fused pass."""
    b, h, w, c = x.shape
    kt = kernel_1d.shape[0]
    pad0, pad1 = pad
    assert pad0 + pad1 == kt - 1, "same-size blur only"
    ct = 128 if c % 128 == 0 else (c if c <= 256 else None)
    if ct is None:
        from vtoonify_tpu.ops.upfirdn2d import upfirdn2d

        return upfirdn2d(x, kernel_1d, pad=(pad0, pad1))
    k = kernel_1d.astype(x.dtype)
    return pl.pallas_call(
        functools.partial(_blur_kernel, kt=kt, pad_y0=pad0, pad_x0=pad0,
                          h=h, w=w),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), x.dtype),
        grid=(b, c // ct),
        in_specs=[
            pl.BlockSpec((1, h, w, ct), lambda i, j: (i, 0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kt,), lambda i, j: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((kt,), lambda i, j: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, ct), lambda i, j: (i, 0, 0, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, k, k)


# ---------------------------------------------------------------------------
# fused modulated 3×3 conv (stride 1, same pad) — the StyleGAN high-res tail
#
# In the XLA graph each styled conv at 1024²×32ch costs ~14 ms in context:
# the conv itself runs lane-padded (32→128 on both operands ≈ 16× waste) and
# the modulation/demodulation/activation elementwise passes + layout changes
# each re-stream the ~270 MB activation through HBM. This kernel does ONE
# HBM read and ONE write per tensor: slab-DMA a row stripe (with halo),
# scale by the per-sample style s, accumulate 3 row-matmuls with the taps
# packed into the contraction dim (K = 3·3·C), then apply demod, bias and
# leaky-relu in-register.


def _modconv3x3_kernel(s_ref, d_ref, b_ref, w_ref, x_hbm, o_ref, slab, sem,
                       *, rows, width, cin, cout, slope, gain, has_act,
                       has_mod, has_demod, nrstrips):
    bi = pl.program_id(0)
    ri = pl.program_id(1)
    step = bi * nrstrips + ri
    nsteps = pl.num_programs(0) * nrstrips
    slot = jax.lax.rem(step, 2)

    def _issue(b_, r_, slot_):
        pltpu.make_async_copy(
            x_hbm.at[b_, pl.ds(r_ * rows, rows + 2)],
            slab.at[slot_], sem.at[slot_],
        ).start()

    # double-buffered slab DMA: step k's copy was issued at step k-1; prime
    # at step 0 and prefetch the next strip before computing this one.
    @pl.when(step == 0)
    def _():
        _issue(bi, ri, slot)

    @pl.when(step + 1 < nsteps)
    def _():
        nri = ri + 1
        nbi = jnp.where(nri == nrstrips, bi + 1, bi)
        nri = jnp.where(nri == nrstrips, 0, nri)
        _issue(nbi, nri, 1 - slot)

    pltpu.make_async_copy(
        x_hbm.at[bi, pl.ds(ri * rows, rows + 2)], slab.at[slot], sem.at[slot]
    ).wait()

    xs = slab[slot]  # (rows+2, width+2, cin)
    if has_mod:
        # dynamic batch-row select via one-hot (Mosaic can't prove sublane
        # alignment for a direct dynamic index on packed bf16 rows)
        nb = s_ref.shape[0]
        sel = (jax.lax.broadcasted_iota(jnp.int32, (nb, 1), 0) == bi)
        s_row = jnp.sum(s_ref[...] * sel.astype(s_ref.dtype), axis=0)
        xs = xs * s_row  # style-modulated

    acc = jnp.zeros((rows * width, cout), jnp.float32)
    for dx in range(3):
        # dx-outer: ONE unaligned sublane shift per dx (reused by all three
        # dy taps) instead of nine
        xd = xs[:, dx:dx + width]  # (rows+2, width, cin)
        for dy in range(3):
            tap = xd[dy:dy + rows].reshape(rows * width, cin)
            acc = acc + jnp.dot(tap, w_ref[dy * 3 + dx],
                                preferred_element_type=jnp.float32)

    out = acc
    if has_demod:
        nb = d_ref.shape[0]
        sel = (jax.lax.broadcasted_iota(jnp.int32, (nb, 1), 0) == bi)
        out = out * jnp.sum(d_ref[...] * sel.astype(d_ref.dtype), axis=0)
    if has_act:
        out = out + b_ref[0]
        out = jnp.where(out >= 0, out, out * slope) * gain
    o_ref[0] = out.reshape(rows, width, cout).astype(o_ref.dtype)


def modconv3x3_fused_pallas(x, w, s=None, d=None, act_bias=None,
                            negative_slope: float = 0.2,
                            gain: float = math.sqrt(2.0),
                            rows: int = 8, interpret: bool = False):
    """Fused styled conv: lrelu(demod·conv(x·s, w) + bias)·√2.

    With s=None and d=None this is the shared-style FOLDED form (modulation
    and demodulation already folded into `w` — the frame graph's production
    case): a plain 3×3 conv with fused bias+lrelu, one HBM read and one
    write, double-buffered slab DMA.

    Args:
      x: (B, H, W, C) NHWC; H divisible by `rows`.
      w: (3, 3, C, Cout) — already scaled by the equalized-LR factor.
      s: (B, C) per-sample modulation or None; d: (B, Cout) demod or None;
      act_bias: (Cout,) or None (None ⇒ no activation, raw conv out).
    """
    b, h, wd, c = x.shape
    cout = w.shape[-1]
    assert h % rows == 0
    # right-pad W so HBM slab slices are tile-aligned (multiple of 8), and
    # pad Cin to the 128-lane tile (Mosaic lays the HBM buffer out padded
    # anyway; zero weight rows make the junk lanes inert)
    wp = ((wd + 2 + 7) // 8) * 8
    cp = ((c + 127) // 128) * 128
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, wp - wd - 1), (0, cp - c)))
    w_taps = jnp.pad(w.reshape(9, c, cout), ((0, 0), (0, cp - c), (0, 0)))
    has_mod = s is not None
    s = (jnp.pad(s, ((0, 0), (0, cp - c))) if has_mod
         else jnp.ones((1, cp), x.dtype))
    has_demod = d is not None
    if d is None:
        d = jnp.ones((1, cout), x.dtype)
    has_act = act_bias is not None
    if act_bias is None:
        act_bias = jnp.zeros((cout,), x.dtype)

    kern = functools.partial(
        _modconv3x3_kernel, rows=rows, width=wd, cin=cp, cout=cout,
        slope=negative_slope, gain=gain, has_act=has_act,
        has_mod=has_mod, has_demod=has_demod, nrstrips=h // rows,
    )
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, h, wd, cout), x.dtype),
        grid=(b, h // rows),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),          # s (whole)
            pl.BlockSpec(memory_space=pltpu.VMEM),          # d (whole)
            pl.BlockSpec(memory_space=pltpu.VMEM),          # bias (whole)
            pl.BlockSpec(memory_space=pltpu.VMEM),          # w (whole)
            pl.BlockSpec(memory_space=pltpu.ANY),           # x (HBM)
        ],
        out_specs=pl.BlockSpec((1, rows, wd, cout),
                               lambda bi, ri: (bi, ri, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, rows + 2, wp, cp), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        # the cross-grid-step double buffering (step k issues step k+1's slab
        # DMA into the other slot) requires SEQUENTIAL grid execution — pin
        # both dims to ARBITRARY so a future Megacore/parallel default can't
        # silently corrupt the slot/semaphore handoff (ADVICE r3)
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(pltpu.GridDimensionSemantics.ARBITRARY,
                                 pltpu.GridDimensionSemantics.ARBITRARY),
        ),
        interpret=interpret,
    )(s.astype(x.dtype), d.astype(x.dtype),
      act_bias.astype(x.dtype)[None], w_taps.astype(x.dtype), xp)


# ---------------------------------------------------------------------------
# affine bilinear warp (the augment pipeline's grid_sample)
#
# TPU has no hardware gather: XLA lowers grid_sample's four corner gathers to
# per-index loops — the production stage-2 augment call (batch-2 4126²×6 →
# 2060²×6 warp inside random_apply_affine) measures 712 ms through the gather
# path vs 111 ms through this kernel (6.4×), taking the whole training step
# from 0.93 to 0.43 s/iter. The warp is reformulated as dense one-hot lerp
# contractions, which the MXU/VPU eat: for each TH×TW
# output tile it DMAs the (bounded) input box the affine maps the tile into,
# builds the y-axis lerp weights as a (TP, BH) two-nonzero matrix, contracts
# it with the box on the MXU, applies the x-axis lerp as a masked elementwise
# multiply over the box lanes, and sums channels back out with a constant
# (BW·C, Cpad) selection matmul. Exact bilinear-with-zeros-padding semantics
# (validity factorizes per axis, so per-corner masks are products of per-axis
# masks). Everything stays 2D with ≥8×128-friendly shapes — Mosaic has no
# 2D→1D shape casts and no cheap 3D reductions.
#
# The box size is static: BH ≈ BW ≈ s_bound·(TH+TW) covers any affine whose
# coefficient magnitudes are ≤ s_bound (the augment's distribution keeps
# |A| < 1.6 beyond 5σ; default bound 2.25). Pixels mapped outside the box
# (out-of-distribution transforms) read as zeros — the same value the
# zeros-padding mode gives out-of-image samples.
#
# v2 geometry (device-trace driven; the v1 kernel was the top op of the
# stage-2 train step at 81 ms/iter, DMA-bound at ~78× read amplification):
#   * square 16×16 tiles — the box span s·(th+tw-2) is minimized for a given
#     tile area by square tiles (71 px vs 89 for 8×32);
#   * channels padded to the next divisor of 128 (6→8 for the augment pair)
#     so the lane alignment of box starts drops from 64 px to 128/cphys=16 px
#     — alignment slack was 116% of the span on the 6-channel production shape;
#   * `lowp` stores the image/box in bfloat16, halving DMA bytes. Error-free
#     relative to DEFAULT precision: the MXU rounds both contraction operands
#     to bf16 per pass anyway, so box values already passed through bf16 twice;
#   * transposed (C, TP) output blocks — TP = th·tw ≥ 128 is the minor dim, so
#     HBM writes are dense. The v1 (TP, C≤8) block was lane-padded to 128
#     (16× write amplification, re-read by the reassembly transpose).


def _warp_geometry(h, w, c, tile, s_bound, lowp):
    """Static box/alignment geometry shared by the wrapper and
    `affine_warp_supported`. Returns
    (sub, cphys, align, hp, wp, bh, bw):
      sub: sublane tile of the storage dtype (rows align);
      cphys: channels padded to a divisor of 128 (lane-exact alignment);
      align: x-start alignment in pixels (= 128/cphys);
      hp, wp: physical (padded) image dims;
      bh, bw: unclamped DMA box dims (rows, pixels)."""
    th, tw = tile
    sub = 16 if lowp else 8
    cphys = next((d for d in (1, 2, 4, 8, 16, 32, 64, 128) if d >= c),
                 -(-c // 128) * 128)
    align = max(1, 128 // cphys)
    hp = -(-h // sub) * sub
    wp = -(-w // align) * align
    # box extent: affine spread s·(th+tw-2), +3 for the floor-1…+2 corner
    # window, + alignment slack (sub sublanes / `align` lanes from aligning
    # the start down)
    span = int(math.ceil(s_bound * (th + tw - 2))) + 3
    bh = -(-(span + sub) // sub) * sub
    bw = -(-(span + align) // align) * align
    return sub, cphys, align, hp, wp, bh, bw


def _affine_warp_kernel(coef_ref, xmap_ref, smat_ref, img_hbm, o_ref, box2,
                        sem2, *, th, tw, bh, bw, cphys, h, w, hp, wp, sub,
                        align, precision, lowp, nit):
    # h, w: LOGICAL image bounds (zero-padding validity); hp, wp: physical
    # array dims, padded so every DMA offset/size is tile aligned — Mosaic
    # silently corrupts copies from HBM arrays with unaligned minor dims.
    #
    # One grid step = one (n, j) output ROW STRIP; the x-tiles of the strip
    # run in an inner fori_loop with double-buffered box DMAs. Measured on
    # hardware: Mosaic's per-grid-step machinery costs ~0.5 µs/step — a
    # no-op kernel took 70 of the 87 ms total over the 133k per-tile grid
    # steps of a 4120²-out probe — so tiny tiles must amortize it through
    # an inner loop, not the grid.
    n = pl.program_id(0)
    j = pl.program_id(1)
    ax, bx, cx = coef_ref[n, 0], coef_ref[n, 1], coef_ref[n, 2]
    ay, by, cy = coef_ref[n, 3], coef_ref[n, 4], coef_ref[n, 5]
    j0f = (j * th).astype(jnp.float32)
    j1f = j0f + (th - 1)

    def _src(g):
        """HBM slice of the input box that x-tile g of this strip maps into."""
        i0f = jnp.asarray(g * tw, jnp.float32)
        i1f = i0f + (tw - 1)
        # affine ⇒ per-tile coordinate extrema are at tile corners
        fx_min = (jnp.minimum(ax * i0f, ax * i1f)
                  + jnp.minimum(bx * j0f, bx * j1f) + cx)
        fy_min = (jnp.minimum(ay * i0f, ay * i1f)
                  + jnp.minimum(by * j0f, by * j1f) + cy)
        # sublane-align the row start, lane-align the (W·C) DMA offset; the
        # box carries enough slack (_warp_geometry) to cover the align-down
        ys_ = jnp.clip(jnp.floor(fy_min).astype(jnp.int32) - 1, 0, hp - bh)
        ys_ = (ys_ // sub) * sub
        xs_ = jnp.clip(jnp.floor(fx_min).astype(jnp.int32) - 1, 0, wp - bw)
        xs_ = (xs_ // align) * align
        return ys_, xs_, img_hbm.at[n, pl.ds(ys_, bh),
                                    pl.ds(xs_ * cphys, bw * cphys)]

    def _issue(g, slot):
        _, _, src = _src(g)
        pltpu.make_async_copy(src, box2.at[slot], sem2.at[slot]).start()

    _issue(0, 0)

    mdt = jnp.bfloat16 if lowp else jnp.float32
    tp = th * tw
    ltw = tw.bit_length() - 1
    p = jax.lax.broadcasted_iota(jnp.int32, (tp, 1), 0)
    jj = ((j * th) + (p >> ltw)).astype(jnp.float32)
    pi = (p & (tw - 1)).astype(jnp.float32)
    rio = jax.lax.broadcasted_iota(jnp.int32, (tp, bh), 1)
    xq = xmap_ref[...]                               # (1, bw·cphys): lane → x

    def body(g, carry):
        slot = jax.lax.rem(g, 2)

        @pl.when(g < nit - 1)
        def _():
            _issue(g + 1, 1 - slot)

        ys, xs, src = _src(g)
        pltpu.make_async_copy(src, box2.at[slot], sem2.at[slot]).wait()
        box = box2.at[slot]

        ii = (g * tw).astype(jnp.float32) + pi       # (tp, 1)
        fx = ax * ii + bx * jj + cx
        fy = ay * ii + by * jj + cy
        x0f = jnp.floor(fx)
        y0f = jnp.floor(fy)
        wx = fx - x0f
        wy = fy - y0f
        x0 = x0f.astype(jnp.int32)
        y0 = y0f.astype(jnp.int32)

        # per-axis corner validity (global image bounds, zeros padding)
        vy0 = ((y0 >= 0) & (y0 <= h - 1)).astype(jnp.float32)
        vy1 = ((y0 >= -1) & (y0 <= h - 2)).astype(jnp.float32)
        vx0 = ((x0 >= 0) & (x0 <= w - 1)).astype(jnp.float32)
        vx1 = ((x0 >= -1) & (x0 <= w - 2)).astype(jnp.float32)

        ly0 = y0 - ys                                # (tp, 1) box-local rows
        lx0 = x0 - xs

        # lerp VALUES may round through bf16 in lowp mode — identical to
        # what DEFAULT MXU precision does to f32 operands per pass
        w_y = (jnp.where(rio == ly0, (1.0 - wy) * vy0, 0.0)
               + jnp.where(rio == ly0 + 1, wy * vy1, 0.0))
        t1 = jnp.dot(w_y.astype(mdt), box[...],
                     preferred_element_type=jnp.float32, precision=precision)

        wxe = (jnp.where(xq == lx0, (1.0 - wx) * vx0, 0.0)
               + jnp.where(xq == lx0 + 1, wx * vx1, 0.0))
        # channel re-collection: smat[k mod cphys, k] = 1 sums each
        # channel's lanes; transposed result (cphys, tp) keeps the out
        # block's minor dim a lane multiple so HBM writes stay dense
        res = jax.lax.dot_general(
            smat_ref[...], (t1 * wxe).astype(mdt), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        o_ref[0, 0, pl.ds(g * cphys, cphys), :] = res.astype(o_ref.dtype)
        return carry

    jax.lax.fori_loop(0, nit, body, 0)


def affine_warp_supported(img_shape, tile=(16, 16), s_bound: float = 2.25,
                          lowp: bool = True) -> bool:
    """True when the compiled-TPU path handles this image shape: the full
    (unclamped) box must fit inside the padded image so every DMA keeps its
    static sublane/lane alignment. Smaller images (tiny test configs) clamp
    the box to the image and may issue unaligned copies — route those to the
    XLA gather path (interpret mode doesn't care). Checked with lowp=True
    (the stricter 16-sublane geometry), so a supported shape works in both
    storage dtypes."""
    _, h, w, c = img_shape
    _, _, _, hp, wp, bh, bw = _warp_geometry(h, w, c, tile, s_bound, lowp)
    return hp >= bh and wp >= bw


def affine_warp_bilinear_pallas(img, coef, out_hw, s_bound: float = 2.25,
                                tile=(16, 16), interpret: bool = False,
                                precision=jax.lax.Precision.HIGHEST,
                                lowp=None):
    """Bilinear warp of an NHWC image along a per-sample PIXEL-space affine.

    Args:
      img: (N, H, W, C) float32.
      coef: (N, 6) float32 [ax, bx, cx, ay, by, cy]: source coords of output
        pixel (row j, col i) are fx = ax·i + bx·j + cx, fy = ay·i + by·j + cy.
      out_hw: (Ho, Wo) output size.
      s_bound: static bound on |ax|,|bx|,|ay|,|by| the input box must cover;
        samples mapped outside the box read as zeros.
      precision: MXU precision of the two contractions. Sampling POSITIONS
        are exact at any setting (corner selection is integer compares);
        precision only rounds the lerp VALUES. DEFAULT (one bf16 pass, with
        lowp bf16 storage/output) gives ≤ ~1e-2 absolute error on [-1, 1]
        images (≈2 uint8 LSB, measured 7.6e-3 vs a float64 oracle on
        hardware) at full speed; HIGHEST is f32-exact (2.2e-4 vs the same
        oracle — pure f32 rounding) at ~6× the MXU cost. Mosaic does not
        implement HIGH.
      lowp: store the image/box in bfloat16, halving the DMA traffic that
        dominates the kernel. None → True iff precision is DEFAULT (whose
        MXU passes round the same operands to bf16 regardless, so lowp
        storage adds no error class — measured 5.8e-3 vs the f64 oracle).

    Returns (N, Ho, Wo, C) `img.dtype` — grid_sample(mode='bilinear',
    padding_mode='zeros') of the equivalent affine grid (the XLA path's
    input-dtype-out convention). In lowp mode the kernel emits bf16 and the
    cast to img.dtype happens after the reassembly transpose, keeping that
    transpose at half bandwidth — the values already rounded through bf16
    in the contractions, so this loses nothing.
    """
    import numpy as np

    n, h, w, c = img.shape
    ho, wo = out_hw
    th, tw = tile
    if lowp is None:
        lowp = precision == jax.lax.Precision.DEFAULT
    assert tw & (tw - 1) == 0, "tile width must be a power of two"
    assert (th * tw) % 128 == 0, "out minor dim th·tw must be a lane multiple"
    sub, cphys, align, hp, wp, bh, bw = _warp_geometry(
        h, w, c, tile, s_bound, lowp)
    # physical array padded to (sub, `align`)-multiples — Mosaic DMA silently
    # corrupts copies from HBM arrays with unaligned minor dims (hardware
    # check: unaligned 1030²·6 → max-err 1.0 vs the f64 oracle). Validity
    # masks keep using the LOGICAL h, w, so padded pixels never leak in.
    if (hp, wp, cphys) != (h, w, c):
        img = jnp.pad(
            img, ((0, 0), (0, hp - h), (0, wp - w), (0, cphys - c)))
    bh = min(bh, hp)
    bw = min(bw, wp)
    st = jnp.bfloat16 if lowp else jnp.float32
    njt = pl.cdiv(ho, th)
    nit = pl.cdiv(wo, tw)
    tp = th * tw

    xmap = jnp.asarray(np.arange(bw * cphys, dtype=np.int32) // cphys)[None]
    smat_np = np.zeros((cphys, bw * cphys), np.float32)
    smat_np[np.arange(bw * cphys) % cphys, np.arange(bw * cphys)] = 1.0
    smat = jnp.asarray(smat_np, dtype=st)              # 0/1: exact in bf16

    kern = functools.partial(_affine_warp_kernel, th=th, tw=tw, bh=bh, bw=bw,
                             cphys=cphys, h=h, w=w, hp=hp, wp=wp, sub=sub,
                             align=align, precision=precision, lowp=lowp,
                             nit=nit)
    coef8 = jnp.pad(coef.astype(jnp.float32), ((0, 0), (0, 2)))
    # lowp: emit bf16 straight from the kernel — the values already rounded
    # through bf16 in the contractions, and a half-width output halves the
    # reassembly-transpose bytes; cast to the caller's dtype after the crop
    # (XLA folds the convert into the downstream consumer)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n, njt, nit * cphys, tp), st),
        grid=(n, njt),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),      # coef (whole, scalar)
            pl.BlockSpec(memory_space=pltpu.VMEM),      # lane → x map
            pl.BlockSpec(memory_space=pltpu.VMEM),      # channel-sum matrix
            pl.BlockSpec(memory_space=pl.ANY),          # img (HBM)
        ],
        out_specs=pl.BlockSpec(
            (1, 1, nit * cphys, tp),
            lambda ni, j: (ni, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, bh, bw * cphys), st),     # double-buffered boxes
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(coef8, xmap, smat, img.astype(st).reshape(n, hp, wp * cphys))
    out = out.reshape(n, njt, nit, cphys, th, tw)
    out = jnp.transpose(out, (0, 1, 4, 2, 5, 3)).reshape(
        n, njt * th, nit * tw, cphys
    )
    return out[:, :ho, :wo, :c].astype(img.dtype)


# ---------------------------------------------------------------------------
# depth-to-space ×2 — the packed-stage unpack / polyphase interleave
#
# depth_to_space2's reshape→transpose→reshape leaves XLA:TPU a copy whose
# minor dims are (2, C) — for the RGB stages C=3, so the tiled layout pads
# the lane dim ~42× and the "free" relayout costs ms on megapixel tensors
# (device trace: the 512²→1024² f32 interleave pair cost ~8.5 ms/iter in the
# stage-2 step before bf16 synthesis). This kernel keeps the minor dim FOLDED
# (W·4C lanes in, W·2C out): phase selection is a strided lane slice and the
# row interleave is a sublane stack — no small-minor tiling anywhere.
#
# STATUS: interpret-mode reference only. On-hardware A/B (v5e, 2026-08-18)
# found current Mosaic rejects the lane de-interleave — the in-kernel
# reshape (th, W·4C) → (th, W, 4C) lowers to an unsupported vector shape
# cast ("infer-vector-layout: unsupported shape cast", vector<1x8x6144xf32>
# → vector<8x512x12xf32>) — and there is no Mosaic-supported primitive for
# a periodic lane compaction at stride 4C. Production uses the XLA form
# (nn/layers.py::depth_to_space2); the ~8.5 ms relayout cost was instead
# halved by bf16 synthesis.


def _d2s2_kernel(x_ref, o_ref, *, w, c):
    x = x_ref[0]                                  # (th, W·4C)
    th = x.shape[0]
    x4 = x.reshape(th, w, 4 * c)
    x0 = x4[:, :, : 2 * c].reshape(th, w * 2 * c)   # phase rows a=0
    x1 = x4[:, :, 2 * c:].reshape(th, w * 2 * c)    # phase rows a=1
    o_ref[0] = jnp.stack([x0, x1], axis=1).reshape(2 * th, w * 2 * c)


def depth_to_space2_pallas(yp, rows: int = 8, interpret: bool = True):
    """(B, H, W, 4C) phase-major packed → (B, 2H, 2W, C), as depth_to_space2
    (nn/layers.py) — strided-lane/sublane shuffles on a folded minor dim
    instead of XLA's small-minor relayout copy. Requires H % rows == 0.

    Interpret-only reference (see STATUS above): Mosaic rejects the lane
    de-interleave on hardware, so interpret defaults to True and compiled
    mode is refused to keep the broken path uncallable by accident."""
    if not interpret:
        raise NotImplementedError(
            "depth_to_space2_pallas is an interpret-mode reference only: "
            "Mosaic rejects the in-kernel lane de-interleave on TPU "
            "(unsupported shape cast, v5e 2026-08-18). Use "
            "nn.layers.depth_to_space2 (XLA) in production.")
    b, h, w, c4 = yp.shape
    c = c4 // 4
    assert h % rows == 0
    out = pl.pallas_call(
        functools.partial(_d2s2_kernel, w=w, c=c),
        out_shape=jax.ShapeDtypeStruct((b, 2 * h, w * 2 * c), yp.dtype),
        grid=(b, h // rows),
        in_specs=[
            pl.BlockSpec((1, rows, w * c4), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2 * rows, w * 2 * c),
                               lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(yp.reshape(b, h, w * c4))
    return out.reshape(b, 2 * h, 2 * w, c)
