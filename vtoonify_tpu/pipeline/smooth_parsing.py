"""Offline parsing-map smoothing with RAFT optical flow.

Capability-parity with reference smooth_parsing_map.py: frames are 2×
upsampled, BiSeNet parsing is predicted per frame, and for each frame a
±window temporal neighborhood is flow-aligned (RAFT, 20 iters) and fused with
spatial × temporal Gaussian weights; the fused maps are 2× downsampled and
saved as `<basename>_parsingmap.npy` for `--parsing_map_path`.

TPU-native: the per-frame fusion (flow + warp + weights + blend) is one jitted
graph over the whole (2·window+1) neighborhood batch.
"""

from __future__ import annotations

import functools
import os

import numpy as np

import jax
import jax.numpy as jnp

from vtoonify_tpu.models.bisenet import bisenet_apply
from vtoonify_tpu.models.raft import RAFTConfig, raft_apply
from vtoonify_tpu.ops.interp import grid_sample, resize_bilinear
from vtoonify_tpu.ops.upfirdn2d import downsample_2x, make_kernel

BLUR_1D = make_kernel((1.0, 3.0, 3.0, 1.0))


def warp_backward(x, flow):
    """Backward-warp x (B,H,W,C) by flow (B,H,W,2); returns (warped, mask)
    (reference smooth_parsing_map.py:38-74, align_corners=True, with the
    binarized validity mask)."""
    b, h, w, _ = x.shape
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    grid = jnp.stack([xs, ys], axis=-1)[None] + flow
    gx = 2.0 * grid[..., 0] / max(w - 1, 1) - 1.0
    gy = 2.0 * grid[..., 1] / max(h - 1, 1) - 1.0
    vgrid = jnp.stack([gx, gy], axis=-1)
    out = grid_sample(x, vgrid, align_corners=True, padding_mode="zeros")
    mask = grid_sample(jnp.ones_like(x[..., :1]), vgrid, align_corners=True,
                       padding_mode="zeros")
    mask = jnp.where(mask < 0.9999, 0.0, 1.0)
    return out * mask, mask


def _pad_div8(x):
    """InputPadder 'sintel' mode: replicate-pad H,W up to /8."""
    h, w = x.shape[1:3]
    ph = (-h) % 8
    pw = (-w) % 8
    pads = ((0, 0), (ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2), (0, 0))
    return jnp.pad(x, pads, mode="edge"), (ph, pw)


def _unpad(x, ph_pw):
    ph, pw = ph_pw
    h, w = x.shape[1:3]
    return x[:, ph // 2: h - (ph - ph // 2), pw // 2: w - (pw - pw // 2), :]


def fuse_window(raft_params, frames_win, parses_win, center: int,
                iters: int = 20, sigma_s: float = 0.2,
                alt_corr: bool = False):
    """Fuse one temporal window (K frames) onto its center frame.

    frames_win: (K, H, W, 3) in [-1, 1] (2×-upsampled); parses_win: (K, H, W, 19).
    Returns the fused (1, H/2, W/2, 19) parsing map (downsampled).
    """
    k = frames_win.shape[0]
    window = center
    image1 = jnp.broadcast_to(frames_win[center][None], frames_win.shape)
    image1p, pads = _pad_div8(image1)
    image2p, _ = _pad_div8(frames_win)

    _, flow_up = raft_apply(
        raft_params, (image1p + 1) * 255.0 / 2, (image2p + 1) * 255.0 / 2,
        RAFTConfig(corr_impl="alt" if alt_corr else "allpairs"),
        iters=iters, test_mode=True,
    )
    flow_up = _unpad(flow_up, pads)

    stacked = jnp.concatenate([frames_win, parses_win], axis=-1)
    output, mask = warp_backward(stacked, flow_up)
    aligned_is = output[..., 0:3]
    aligned_ps = output[..., 3:]

    ws = jnp.exp(
        -jnp.mean(jnp.square(aligned_is - frames_win[center][None]), axis=-1,
                  keepdims=True)
        / (2 * sigma_s ** 2)
    ) * mask[..., 0:1]
    aligned_ps = aligned_ps.at[window].set(parses_win[center])
    ws = ws.at[window].set(1.0)

    wt = jnp.exp(
        -jnp.square(jnp.arange(k, dtype=jnp.float32) - window)
        / (2 * (window + 0.5) ** 2)
    ).reshape(k, 1, 1, 1)
    weights = ws * wt
    weights = weights / jnp.sum(weights, axis=0, keepdims=True)
    fused = jnp.sum(aligned_ps * weights, axis=0, keepdims=True)
    return downsample_2x(fused, BLUR_1D.astype(fused.dtype))


def smooth_video_parsing_maps(raft_params, parsing_params, frames_u8,
                              window: int = 5, iters: int = 20,
                              progress=None, alt_corr: bool = False):
    """frames_u8: (N, H, W, 3) uint8 video frames → (N, H, W, 19) smoothed
    parsing maps (frames are internally 2×-upsampled, fused at 2×, then
    downsampled back — reference smooth_parsing_map.py:127-166).

    alt_corr: use RAFT's memory-efficient on-the-fly correlation — the
    2×-upsampled frames make the all-pairs volume the smoother's peak HBM
    consumer at HD inputs (a 2160×3840 fused frame is 130k 1/8-res pixels
    → a 67 GB/pair volume; the alt path needs ~130 MB)."""
    frames = jnp.asarray(frames_u8, jnp.float32) / 127.5 - 1.0
    n, h, w, _ = frames.shape
    frames2x = resize_bilinear(frames, (2 * h, 2 * w), align_corners=False)

    parse_fn = jax.jit(lambda p, x: bisenet_apply(p, 2.0 * x))
    parses = jnp.concatenate(
        [parse_fn(parsing_params, frames2x[i: i + 1]) for i in range(n)],
        axis=0,
    )

    # replicate-pad the sequence ends (reference :129,:138 concatenates the
    # first/last `window` frames)
    idx = np.concatenate(
        [np.arange(window), np.arange(n), np.arange(n - window, n)]
    )
    frames_ext = frames2x[jnp.asarray(idx)]
    parses_ext = parses[jnp.asarray(idx)]

    fuse = jax.jit(functools.partial(fuse_window, center=window, iters=iters,
                                     alt_corr=alt_corr))
    out = []
    rng = range(n)
    if progress is not None:
        rng = progress(rng)
    for ii in rng:
        i = ii + window
        fused = fuse(
            raft_params,
            frames_ext[i - window: i + window + 1],
            parses_ext[i - window: i + window + 1],
        )
        out.append(np.asarray(fused[0]))
    return np.stack(out)


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description="Smooth Parsing Maps (TPU-native)")
    p.add_argument("--window_size", type=int, default=5)
    p.add_argument("--faceparsing_path", type=str,
                   default="./checkpoint/faceparsing.pth")
    p.add_argument("--raft_path", type=str,
                   default="./checkpoint/raft-things.pth")
    p.add_argument("--video_path", type=str, required=True)
    p.add_argument("--output_path", type=str, default="./output/")
    p.add_argument("--alt_corr", action="store_true",
                   help="memory-efficient on-the-fly RAFT correlation "
                        "(for HD inputs whose all-pairs volume exceeds HBM)")
    args = p.parse_args(argv)

    from vtoonify_tpu.convert.torch_import import convert_raft
    from vtoonify_tpu.pipeline.video import iterate_video_frames
    from vtoonify_tpu.utils import checkpoint as ckpt_util

    import torch

    raft_sd = {
        k: v.numpy()
        for k, v in torch.load(args.raft_path, map_location="cpu").items()
    }
    raft_params = convert_raft(raft_sd)
    parsing_params = ckpt_util.load_reference_faceparsing(args.faceparsing_path)

    frames = np.stack([f for _, f in iterate_video_frames(args.video_path)])
    maps = smooth_video_parsing_maps(raft_params, parsing_params, frames,
                                     window=args.window_size,
                                     alt_corr=args.alt_corr)
    basename = os.path.basename(args.video_path).split(".")[0]
    np.save(os.path.join(args.output_path, basename + "_parsingmap.npy"), maps)
    print("Done!")


if __name__ == "__main__":
    main()
