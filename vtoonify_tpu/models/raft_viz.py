"""Optical-flow color coding + directory demo driver (RAFT tooling surface).

Implements the Middlebury flow color wheel (Baker et al., "A Database and
Evaluation Methodology for Optical Flow", ICCV 2007) with the exact floor/
interpolation conventions of the visualizer the reference vendors
(/root/reference/model/raft/core/utils/flow_viz.py:21-132), and a headless
equivalent of the reference's demo driver
(/root/reference/model/raft/demo.py:41-62): consecutive frames of a
directory → RAFT flow → color-coded image stacked under the source frame,
written to files (the reference pops a cv2 window; we are headless).

Flow arrays here are NHWC-style (H, W, 2) with (u, v) = (x, y) displacement,
matching `models/raft.py`'s output channel order.
"""

from __future__ import annotations

import glob
import os
from typing import List, Optional

import numpy as np

# (segment length, held-at-255 channel, ramped channel, ramp ascending?)
# — the six hue arcs R→Y→G→C→B→M→R with Scharstein's unequal lengths.
_WHEEL_SEGMENTS = (
    (15, 0, 1, True),   # R held, G rises  (red → yellow)
    (6, 1, 0, False),   # G held, R falls  (yellow → green)
    (4, 1, 2, True),    # G held, B rises  (green → cyan)
    (11, 2, 1, False),  # B held, G falls  (cyan → blue)
    (13, 2, 0, True),   # B held, R rises  (blue → magenta)
    (6, 0, 2, False),   # R held, B falls  (magenta → red)
)


def make_colorwheel() -> np.ndarray:
    """(55, 3) float64 wheel in [0, 255], Scharstein's floor quantization."""
    rows = []
    for length, hold, ramp, ascending in _WHEEL_SEGMENTS:
        seg = np.zeros((length, 3))
        seg[:, hold] = 255.0
        r = np.floor(255.0 * np.arange(length) / length)
        seg[:, ramp] = r if ascending else 255.0 - r
        rows.append(seg)
    return np.concatenate(rows, axis=0)


def colorize_flow_uv(u: np.ndarray, v: np.ndarray,
                     bgr: bool = False) -> np.ndarray:
    """Color-code pre-normalized flow components (radius 1 = saturated).

    Radii ≤ 1 desaturate toward white at the center; radii > 1 are dimmed to
    75% (the out-of-range convention).
    """
    wheel = make_colorwheel() / 255.0
    ncols = wheel.shape[0]
    rad = np.sqrt(np.square(u) + np.square(v))
    fk = (np.arctan2(-v, -u) / np.pi + 1.0) / 2.0 * (ncols - 1)
    k0 = np.floor(fk).astype(np.int32)
    k1 = np.where(k0 + 1 == ncols, 0, k0 + 1)
    f = (fk - k0)[..., None]
    col = (1.0 - f) * wheel[k0] + f * wheel[k1]
    inside = (rad <= 1.0)[..., None]
    col = np.where(inside, 1.0 - rad[..., None] * (1.0 - col), 0.75 * col)
    img = np.floor(255.0 * col).astype(np.uint8)
    return img[..., ::-1] if bgr else img


def flow_to_image(flow: np.ndarray, clip_flow: Optional[float] = None,
                  bgr: bool = False) -> np.ndarray:
    """(H, W, 2) flow → (H, W, 3) uint8 visualization.

    Normalizes by the max radius in the field (so the brightest pixel is the
    largest motion), exactly like the vendored visualizer's `flow_to_image`.
    """
    if flow.ndim != 3 or flow.shape[-1] != 2:
        raise ValueError(f"expected (H, W, 2) flow, got {flow.shape}")
    flow = np.asarray(flow, np.float64)
    if clip_flow is not None:
        flow = np.clip(flow, 0, clip_flow)
    u, v = flow[..., 0], flow[..., 1]
    rad_max = float(np.sqrt(np.square(u) + np.square(v)).max())
    scale = 1.0 / (rad_max + 1e-5)
    return colorize_flow_uv(u * scale, v * scale, bgr=bgr)


def list_image_pairs(image_dir: str) -> List[tuple]:
    """Sorted consecutive (*.png|*.jpg) pairs, demo.py:50-55 semantics."""
    images = sorted(
        glob.glob(os.path.join(image_dir, "*.png"))
        + glob.glob(os.path.join(image_dir, "*.jpg"))
    )
    return list(zip(images[:-1], images[1:]))


def demo_directory(raft_params, image_dir: str, out_dir: str,
                   iters: int = 20, cfg=None) -> List[str]:
    """Flow between each consecutive frame pair; writes [frame; flow-viz]
    stacks as PNGs into out_dir. Returns the written paths."""
    import jax
    from PIL import Image

    from vtoonify_tpu.models.raft import RAFTConfig, raft_apply
    from vtoonify_tpu.models.raft_data import InputPadder

    cfg = cfg or RAFTConfig()
    os.makedirs(out_dir, exist_ok=True)

    @jax.jit
    def _flow(im1, im2):
        _, flow_up = raft_apply(raft_params, im1, im2, cfg, iters=iters,
                                test_mode=True)
        return flow_up

    written = []
    for idx, (path1, path2) in enumerate(list_image_pairs(image_dir)):
        img1 = np.asarray(Image.open(path1).convert("RGB"), np.uint8)
        img2 = np.asarray(Image.open(path2).convert("RGB"), np.uint8)
        padder = InputPadder(img1.shape, mode="sintel")
        x1, x2 = padder.pad(img1[None].astype(np.float32),
                            img2[None].astype(np.float32))
        flow = padder.unpad(np.asarray(_flow(x1, x2)))[0]
        viz = flow_to_image(flow)
        stack = np.concatenate([img1, viz], axis=0)
        out_path = os.path.join(out_dir, f"flow_{idx:04d}.png")
        Image.fromarray(stack).save(out_path)
        written.append(out_path)
    return written


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(
        description="RAFT flow demo over a frame directory (TPU-native)")
    p.add_argument("--model", type=str, required=True,
                   help="raft-things.pth (reference torch checkpoint)")
    p.add_argument("--path", type=str, required=True,
                   help="directory of *.png/*.jpg frames")
    p.add_argument("--out", type=str, default="./output/raft_demo")
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args(argv)

    import torch

    from vtoonify_tpu.convert.torch_import import convert_raft

    sd = {
        k.replace("module.", "", 1): v
        for k, v in torch.load(args.model, map_location="cpu").items()
    }
    params = convert_raft(sd)
    paths = demo_directory(params, args.path, args.out, iters=args.iters)
    print(f"wrote {len(paths)} flow visualizations to {args.out}")


if __name__ == "__main__":
    main()
