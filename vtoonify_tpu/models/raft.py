"""RAFT optical flow (basic variant) — TPU-native functional rebuild.

Capability-parity with reference model/raft/core/{raft,extractor,update,
corr}.py: feature/context encoders, 4-level all-pairs correlation pyramid,
SepConvGRU iterative updates, convex-upsampling mask. Used by the
parsing-map smoother (reference smooth_parsing_map.py). Inputs are uint8-range
[0,255] images (raft.py:89-90).

TPU-first notes: the default correlation volume is ONE batched matmul (MXU)
+ avg-pool pyramid + bilinear gathers — sufficient at the 1/8-resolution
sizes this framework uses (SURVEY.md §2.1). The reference's optional
alt_cuda_corr kernel (model/raft/alt_cuda_corr/correlation_kernel.cu,
memory-saving on-the-fly lookup) has a TPU-native equivalent here:
`RAFTConfig(corr_impl="alt")` skips the O((H·W)²) volume entirely and
computes each lookup window directly from a feature pyramid of image2 —
exact by linearity (avg-pool and bilinear sampling commute with the
feature dot product), chunked over window offsets to bound transients.
The update loop is a statically unrolled `iters`-step recurrence (no
data-dependent control flow).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from vtoonify_tpu.nn import layers as L
from vtoonify_tpu.ops.interp import avg_pool, grid_sample, resize_bilinear


@dataclass(frozen=True)
class RAFTConfig:
    hidden_dim: int = 128
    context_dim: int = 128
    corr_levels: int = 4
    corr_radius: int = 4
    # "allpairs": materialized all-pairs volume (reference CorrBlock).
    # "alt": memory-efficient on-the-fly lookup (reference alt_cuda_corr);
    # identical outputs, O(H·W·C) memory instead of O((H·W)²).
    corr_impl: str = "allpairs"


# --- encoders (extractor.py BasicEncoder) -----------------------------------


def _init_res_block(key, in_planes, planes, stride):
    ks = jax.random.split(key, 3)
    p = {
        "conv1": L.init_conv2d_torch(ks[0], in_planes, planes, 3),
        "conv2": L.init_conv2d_torch(ks[1], planes, planes, 3),
    }
    if stride != 1:
        p["down"] = L.init_conv2d_torch(ks[2], in_planes, planes, 1)
    return p


def _norm(x, kind, p=None):
    if kind == "instance":
        return L.instance_norm_2d(x)
    if kind == "batch":
        return L.batch_norm_2d(p, x)
    return x


def _res_block(p, x, stride, norm_fn, norms, train_bn=False):
    new_norms = dict(norms) if (train_bn and norms) else None

    def nrm(h, name):
        if train_bn and norm_fn == "batch":
            y, new_norms[name] = L.batch_norm_2d_train(norms[name], h)
            return y
        return _norm(h, norm_fn, norms.get(name) if norms else None)

    y = jax.nn.relu(nrm(L.conv2d_torch(p["conv1"], x, stride=stride,
                                       padding=1), "norm1"))
    y = jax.nn.relu(nrm(L.conv2d_torch(p["conv2"], y, padding=1), "norm2"))
    if "down" in p:
        x = nrm(L.conv2d_torch(p["down"], x, stride=stride), "norm3")
    return jax.nn.relu(x + y), new_norms


def init_basic_encoder(key, output_dim, norm_fn):
    ks = jax.random.split(key, 10)
    p = {
        "conv1": L.init_conv2d_torch(ks[0], 3, 64, 7),
        "layers": [],
        "conv2": L.init_conv2d_torch(ks[7], 128, output_dim, 1),
    }
    dims = [(64, 64, 1), (64, 96, 2), (96, 128, 2)]
    for i, (cin, cout, stride) in enumerate(dims):
        p["layers"].append([
            _init_res_block(ks[1 + 2 * i], cin, cout, stride),
            _init_res_block(ks[2 + 2 * i], cout, cout, 1),
        ])
    if norm_fn == "batch":
        p["bn1"] = L.init_batch_norm_2d(64)
        for li, (cin, cout, stride) in enumerate(dims):
            for bi, s in ((0, stride), (1, 1)):
                norms = {
                    "norm1": L.init_batch_norm_2d(cout),
                    "norm2": L.init_batch_norm_2d(cout),
                }
                if s != 1:
                    norms["norm3"] = L.init_batch_norm_2d(cout)
                p["layers"][li][bi]["norms"] = norms
    return p


def basic_encoder_apply(p, x, norm_fn, train_bn=False):
    """train_bn (batch norm_fn only): use batch statistics and additionally
    return the params tree with updated running buffers —
    `(out, new_p)` instead of `out`."""
    train_bn = train_bn and norm_fn == "batch"
    h = L.conv2d_torch(p["conv1"], x, stride=2, padding=3)
    if train_bn:
        new_p = dict(p)
        h, new_p["bn1"] = L.batch_norm_2d_train(p["bn1"], h)
    else:
        h = _norm(h, norm_fn, p.get("bn1"))
    h = jax.nn.relu(h)
    strides = [1, 2, 2]
    new_layers = []
    for li, layer in enumerate(p["layers"]):
        row = []
        for bi, blk in enumerate(layer):
            s = strides[li] if bi == 0 else 1
            h, norms_upd = _res_block(blk, h, s, norm_fn, blk.get("norms"),
                                      train_bn)
            if train_bn:
                row.append({**blk, "norms": norms_upd})
        new_layers.append(row)
    out = L.conv2d_torch(p["conv2"], h)
    if train_bn:
        new_p["layers"] = new_layers
        return out, new_p
    return out


# --- correlation pyramid (corr.py CorrBlock) --------------------------------


def build_corr_pyramid(fmap1, fmap2, num_levels=4):
    """All-pairs correlation: (B, H1, W1, H2, W2) then avg-pool pyramid over
    the (H2, W2) axes. fmaps are (B, H, W, C)."""
    b, h, w, c = fmap1.shape
    f1 = fmap1.reshape(b, h * w, c)
    f2 = fmap2.reshape(b, h * w, c)
    corr = jnp.einsum("bnc,bmc->bnm", f1, f2,
                      preferred_element_type=jnp.float32)
    corr = corr / jnp.sqrt(jnp.asarray(c, jnp.float32))
    corr = corr.reshape(b * h * w, h, w, 1)
    pyramid = [corr]
    for _ in range(num_levels - 1):
        corr = avg_pool(corr, 2)
        pyramid.append(corr)
    return pyramid


def _window_delta(radius):
    """(2r+1, 2r+1, 2) lookup-window offsets. NOTE: the reference builds
    delta = stack(meshgrid(dy, dx)) and adds it to (x, y)-ordered coords
    (corr.py:36-41) — i.e. the x offset varies along the FIRST window axis.
    Mirrored exactly for checkpoint parity."""
    d = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    dyg, dxg = jnp.meshgrid(d, d, indexing="ij")
    return jnp.stack([dyg, dxg], axis=-1)


def _norm_grid(coords_lvl, hl, wl):
    """bilinear_sampler: pixel coords → [-1,1] with align_corners=True.
    A degenerate 1-pixel axis (tiny inputs) collapses to coordinate 0
    (the reference divides by zero there, corr.py utils bilinear_sampler)."""
    gx = (2 * coords_lvl[..., 0] / (wl - 1) - 1) if wl > 1 else (
        jnp.zeros_like(coords_lvl[..., 0])
    )
    gy = (2 * coords_lvl[..., 1] / (hl - 1) - 1) if hl > 1 else (
        jnp.zeros_like(coords_lvl[..., 1])
    )
    return jnp.stack([gx, gy], axis=-1)


def lookup_corr(pyramid, coords, radius=4):
    """coords: (B, H, W, 2) pixel positions in image2. Returns
    (B, H, W, levels*(2r+1)^2) — reference corr.py:29-50."""
    b, h, w, _ = coords.shape
    delta = _window_delta(radius)

    out = []
    for i, corr in enumerate(pyramid):
        centroid = coords.reshape(b * h * w, 1, 1, 2) / (2 ** i)
        coords_lvl = centroid + delta[None]
        hl, wl = corr.shape[1], corr.shape[2]
        grid = _norm_grid(coords_lvl, hl, wl)
        sampled = grid_sample(corr, grid, align_corners=True,
                              padding_mode="zeros")
        out.append(sampled.reshape(b, h, w, -1))
    return jnp.concatenate(out, axis=-1)


def build_fmap_pyramid(fmap, num_levels=4):
    """Avg-pool pyramid of the (B, H, W, C) image-2 feature map — the "alt"
    lookup's state. Memory O(H·W·C·4/3) vs the all-pairs volume's O((H·W)²);
    at 1/8-res of a 1024² frame that is 22 MB vs 1.4 GB per batch item."""
    pyr = [fmap]
    for _ in range(num_levels - 1):
        pyr.append(avg_pool(pyr[-1], 2))
    return pyr


def lookup_corr_alt(fmap1, fmap2_pyramid, coords, radius=4, offset_chunk=9):
    """Memory-efficient on-the-fly correlation lookup — TPU-native equivalent
    of the reference's optional alt_cuda_corr kernel
    (model/raft/alt_cuda_corr/correlation_kernel.cu, corr.py:5-9 fallback).

    Exact w.r.t. `lookup_corr(build_corr_pyramid(f1, f2), ...)` by linearity:
    corr(n, m) = f1ₙ·f2ₘ/√C is linear in f2ₘ, so avg-pooling the volume over
    (H2, W2) equals correlating against the avg-pooled f2, and bilinearly
    sampling the volume equals correlating against the bilinearly sampled f2.
    Per level, the (2r+1)² window offsets are processed in chunks: one
    grid_sample of the level's feature map at `coords/2ⁱ + delta` followed by
    an MXU batched dot with fmap1 — the transient is (B, H, W, chunk, C)
    instead of a resident (B·H·W, H, W) volume.

    fmap1: (B, H, W, C); fmap2_pyramid: from `build_fmap_pyramid`.
    Returns (B, H, W, levels*(2r+1)^2), channel order identical to
    `lookup_corr` (window row-major, x offset on the first window axis).
    """
    b, h, w, c = fmap1.shape
    n_off = (2 * radius + 1) ** 2
    delta = _window_delta(radius).reshape(n_off, 2)
    offset_chunk = max(1, min(offset_chunk, n_off))
    while n_off % offset_chunk:
        offset_chunk -= 1
    f1 = fmap1.astype(jnp.float32)
    inv_sqrt_c = 1.0 / jnp.sqrt(jnp.asarray(c, jnp.float32))

    out = []
    for i, f2l in enumerate(fmap2_pyramid):
        hl, wl = f2l.shape[1], f2l.shape[2]
        centroid = coords / (2 ** i)  # (B, H, W, 2)
        lvl = []
        for s in range(0, n_off, offset_chunk):
            dk = delta[s:s + offset_chunk]  # (k, 2)
            pos = centroid[:, :, :, None, :] + dk[None, None, None]
            grid = _norm_grid(pos, hl, wl).reshape(b, h, w * dk.shape[0], 2)
            smp = grid_sample(f2l.astype(jnp.float32), grid,
                              align_corners=True, padding_mode="zeros")
            smp = smp.reshape(b, h, w, dk.shape[0], c)
            lvl.append(jnp.einsum("bhwc,bhwkc->bhwk", f1, smp,
                                  preferred_element_type=jnp.float32))
        out.append(jnp.concatenate(lvl, axis=-1) * inv_sqrt_c)
    return jnp.concatenate(out, axis=-1)


# --- update block (update.py) ------------------------------------------------


def init_update_block(key, cfg: RAFTConfig):
    ks = jax.random.split(key, 16)
    cor_planes = cfg.corr_levels * (2 * cfg.corr_radius + 1) ** 2
    hd = cfg.hidden_dim
    return {
        "enc": {
            "convc1": L.init_conv2d_torch(ks[0], cor_planes, 256, 1),
            "convc2": L.init_conv2d_torch(ks[1], 256, 192, 3),
            "convf1": L.init_conv2d_torch(ks[2], 2, 128, 7),
            "convf2": L.init_conv2d_torch(ks[3], 128, 64, 3),
            "conv": L.init_conv2d_torch(ks[4], 64 + 192, 128 - 2, 3),
        },
        "gru": {
            name: _init_conv_rect(
                ks[5 + i], hd + 128 + hd, hd,
                (1, 5) if name.endswith("1") else (5, 1),
            )
            for i, name in enumerate(
                ("convz1", "convr1", "convq1", "convz2", "convr2", "convq2")
            )
        },
        "flow_head": {
            "conv1": L.init_conv2d_torch(ks[11], hd, 256, 3),
            "conv2": L.init_conv2d_torch(ks[12], 256, 2, 3),
        },
        "mask": {
            "conv1": L.init_conv2d_torch(ks[13], 128, 256, 3),
            "conv2": L.init_conv2d_torch(ks[14], 256, 64 * 9, 1),
        },
    }


def _init_conv_rect(key, in_ch, out_ch, khw):
    import math as _math

    kh, kw = khw
    k1, k2 = jax.random.split(key)
    fan_in = in_ch * kh * kw
    bound = _math.sqrt(6.0 / ((1 + 5.0) * fan_in))
    b = 1.0 / _math.sqrt(fan_in)
    return {
        "weight": jax.random.uniform(k1, (kh, kw, in_ch, out_ch), jnp.float32,
                                     -bound, bound),
        "bias": jax.random.uniform(k2, (out_ch,), jnp.float32, -b, b),
    }


def _sep_conv(p, x, horizontal: bool):
    """(1,5)/(5,1) GRU convs with same-padding."""
    from vtoonify_tpu.ops.convs import conv2d

    w = p["weight"]
    pad = ((0, 0), (2, 2)) if w.shape[0] == 1 else ((2, 2), (0, 0))
    out = conv2d(x, w.astype(x.dtype), padding=pad)
    return out + p["bias"].astype(out.dtype)


def sep_conv_gru(p, h, x):
    """SepConvGRU (update.py:33-60)."""
    hx = jnp.concatenate([h, x], axis=-1)
    z = jax.nn.sigmoid(_sep_conv(p["convz1"], hx, True))
    r = jax.nn.sigmoid(_sep_conv(p["convr1"], hx, True))
    q = jnp.tanh(_sep_conv(p["convq1"],
                           jnp.concatenate([r * h, x], axis=-1), True))
    h = (1 - z) * h + z * q

    hx = jnp.concatenate([h, x], axis=-1)
    z = jax.nn.sigmoid(_sep_conv(p["convz2"], hx, False))
    r = jax.nn.sigmoid(_sep_conv(p["convr2"], hx, False))
    q = jnp.tanh(_sep_conv(p["convq2"],
                           jnp.concatenate([r * h, x], axis=-1), False))
    return (1 - z) * h + z * q


def update_block_apply(p, net, inp, corr, flow):
    e = p["enc"]
    cor = jax.nn.relu(L.conv2d_torch(e["convc1"], corr))
    cor = jax.nn.relu(L.conv2d_torch(e["convc2"], cor, padding=1))
    flo = jax.nn.relu(L.conv2d_torch(e["convf1"], flow, padding=3))
    flo = jax.nn.relu(L.conv2d_torch(e["convf2"], flo, padding=1))
    out = jax.nn.relu(
        L.conv2d_torch(e["conv"], jnp.concatenate([cor, flo], axis=-1),
                       padding=1)
    )
    motion = jnp.concatenate([out, flow], axis=-1)

    net = sep_conv_gru(p["gru"], net, jnp.concatenate([inp, motion], axis=-1))
    fh = p["flow_head"]
    delta = L.conv2d_torch(
        fh["conv2"],
        jax.nn.relu(L.conv2d_torch(fh["conv1"], net, padding=1)),
        padding=1,
    )
    m = p["mask"]
    mask = 0.25 * L.conv2d_torch(
        m["conv2"], jax.nn.relu(L.conv2d_torch(m["conv1"], net, padding=1))
    )
    return net, mask, delta


# --- full model ---------------------------------------------------------------


def init_raft(key, cfg: RAFTConfig = RAFTConfig()):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "fnet": init_basic_encoder(k1, 256, "instance"),
        "cnet": init_basic_encoder(k2, cfg.hidden_dim + cfg.context_dim,
                                   "batch"),
        "update": init_update_block(k3, cfg),
    }


def _coords_grid(b, h, w):
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    return jnp.broadcast_to(jnp.stack([xs, ys], axis=-1)[None], (b, h, w, 2))


def upsample_flow_convex(flow, mask):
    """Convex-combination 8× upsampling (raft.py:72-83). flow (B,h,w,2)."""
    b, h, w, _ = flow.shape
    mask = mask.reshape(b, h, w, 9, 8, 8)
    mask = jax.nn.softmax(mask, axis=3)

    # 3×3 neighborhood of 8*flow with zero padding (F.unfold semantics)
    fp = jnp.pad(8 * flow, ((0, 0), (1, 1), (1, 1), (0, 0)))
    neigh = jnp.stack(
        [
            fp[:, dy:dy + h, dx:dx + w, :]
            for dy in range(3)
            for dx in range(3)
        ],
        axis=3,
    )  # (B, h, w, 9, 2)
    up = jnp.einsum("bhwkyx,bhwkc->bhwyxc", mask, neigh)
    return up.transpose(0, 1, 3, 2, 4, 5).reshape(b, 8 * h, 8 * w, 2)


def raft_apply(params, image1, image2, cfg: RAFTConfig = RAFTConfig(),
               iters: int = 12, test_mode: bool = True,
               train_bn: bool = False, flow_init=None):
    """image1/image2: (B, H, W, 3) in [0, 255]. Returns (flow_lr, flow_up) in
    test mode, else the list of per-iteration upsampled flows — and with
    train_bn (the reference's 'chairs' stage trains the context encoder's
    BatchNorm, model/raft/train.py:146-147) the non-test return is
    (flows_up, params_with_updated_bn_buffers). flow_init: optional
    (B, H/8, W/8, 2) warm-start flow (reference raft.py:124-125, used by the
    Sintel submission's per-sequence warm start)."""
    x1 = 2 * (image1 / 255.0) - 1.0
    x2 = 2 * (image2 / 255.0) - 1.0

    fmap1 = basic_encoder_apply(params["fnet"], x1, "instance")
    fmap2 = basic_encoder_apply(params["fnet"], x2, "instance")
    alt = cfg.corr_impl == "alt"
    pyramid = (build_fmap_pyramid(fmap2, cfg.corr_levels) if alt
               else build_corr_pyramid(fmap1, fmap2, cfg.corr_levels))

    if train_bn and not test_mode:
        cnet, new_cnet = basic_encoder_apply(params["cnet"], x1, "batch",
                                             train_bn=True)
    else:
        cnet = basic_encoder_apply(params["cnet"], x1, "batch")
    net = jnp.tanh(cnet[..., : cfg.hidden_dim])
    inp = jax.nn.relu(cnet[..., cfg.hidden_dim:])

    b, h, w, _ = fmap1.shape
    coords0 = _coords_grid(b, h, w)
    coords1 = _coords_grid(b, h, w)
    if flow_init is not None:
        coords1 = coords1 + flow_init

    flows_up = []
    for _ in range(iters):
        corr = (lookup_corr_alt(fmap1, pyramid, coords1, cfg.corr_radius)
                if alt else lookup_corr(pyramid, coords1, cfg.corr_radius))
        flow = coords1 - coords0
        net, up_mask, delta = update_block_apply(params["update"], net, inp,
                                                 corr, flow)
        coords1 = coords1 + delta
        flow_up = upsample_flow_convex(coords1 - coords0, up_mask)
        flows_up.append(flow_up)

    if test_mode:
        return coords1 - coords0, flows_up[-1]
    if train_bn:
        return flows_up, {**params, "cnet": new_cnet}
    return flows_up
