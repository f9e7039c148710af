"""RAFT evaluation metrics (end-point error).

The reference vendors upstream RAFT's evaluate.py (Sintel/KITTI harnesses,
model/raft/evaluate.py — not wired into VToonify). This module provides the
metric core so flow quality can be validated after converting
raft-things.pth; dataset download/IO is the caller's concern (zero-egress
environments supply frames directly).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from vtoonify_tpu.models.raft import RAFTConfig, raft_apply


def end_point_error(flow_pred, flow_gt, valid=None):
    """Mean EPE (and accuracy buckets) — reference raft/evaluate.py metrics."""
    epe = jnp.sqrt(jnp.sum(jnp.square(flow_pred - flow_gt), axis=-1))
    if valid is not None:
        epe = jnp.where(valid, epe, 0.0)
        denom = jnp.maximum(jnp.sum(valid), 1)
        mean = jnp.sum(epe) / denom
    else:
        mean = jnp.mean(epe)
    return {
        "epe": float(mean),
        "1px": float(jnp.mean((epe < 1).astype(jnp.float32))),
        "3px": float(jnp.mean((epe < 3).astype(jnp.float32))),
        "5px": float(jnp.mean((epe < 5).astype(jnp.float32))),
    }


def evaluate_pairs(params, pairs, iters: int = 24,
                   cfg: RAFTConfig = RAFTConfig()):
    """pairs: iterable of (im1_u8, im2_u8, flow_gt) NHWC numpy arrays."""
    results = []
    for im1, im2, gt in pairs:
        _, flow = raft_apply(
            params, jnp.asarray(im1, jnp.float32),
            jnp.asarray(im2, jnp.float32), cfg, iters=iters,
        )
        results.append(end_point_error(flow, jnp.asarray(gt)))
    return {
        k: float(np.mean([r[k] for r in results])) for k in results[0]
    } if results else {}


def main(argv=None):
    """`vtoonify-raft-eval` — the reference's evaluate.py __main__
    (model/raft/evaluate.py:168-196): load a torch RAFT checkpoint, run the
    Sintel-train / KITTI-train validation harness, print the EPE metrics."""
    import argparse
    import contextlib
    import json
    import os

    p = argparse.ArgumentParser(
        description="Evaluate a RAFT checkpoint (Sintel/KITTI EPE)")
    p.add_argument("--model", required=True,
                   help="torch RAFT checkpoint (e.g. raft-things.pth)")
    p.add_argument("--dataset", required=True,
                   choices=["chairs", "sintel", "kitti"])
    p.add_argument("--data_root", default="datasets",
                   help="directory holding Sintel/ or KITTI/")
    p.add_argument("--dstype", default="clean", choices=["clean", "final"],
                   help="Sintel rendering pass")
    p.add_argument("--iters", type=int, default=None,
                   help="refinement iterations (default: the reference's "
                        "32 for sintel, 24 for kitti)")
    p.add_argument("--submission", type=str, default=None, metavar="DIR",
                   help="write a leaderboard submission for --dataset into "
                        "DIR instead of validating (reference evaluate.py "
                        "create_{sintel,kitti}_submission)")
    p.add_argument("--warm_start", action="store_true",
                   help="Sintel submission: forward-interpolate each "
                        "sequence's low-res flow into the next frame's init")
    p.add_argument("--small", action="store_true",
                   help="(reference flag) small architecture — unsupported")
    p.add_argument("--mixed_precision", action="store_true",
                   help="bf16 matmul/conv compute — the TPU analog of the "
                        "reference's torch.cuda.amp autocast")
    p.add_argument("--alternate_corr", action="store_true",
                   help="memory-efficient on-the-fly correlation "
                        "(alt_cuda_corr equivalent; exact)")
    args = p.parse_args(argv)
    if args.small:
        raise SystemExit(
            "--small: the small RAFT architecture is not supported; "
            "VToonify uses the full model (raft-things.pth)")

    import torch

    import jax

    from vtoonify_tpu.convert.torch_import import convert_raft
    from vtoonify_tpu.models.raft_data import validate_kitti, validate_sintel

    sd = {k.replace("module.", "", 1): v
          for k, v in torch.load(args.model, map_location="cpu").items()}
    params = convert_raft(sd)
    cfg = RAFTConfig(corr_impl="alt" if args.alternate_corr else "allpairs")

    ctx = (jax.default_matmul_precision("bfloat16")
           if args.mixed_precision else contextlib.nullcontext())
    with ctx:
        if args.submission is not None:
            from vtoonify_tpu.models.raft_data import (
                create_kitti_submission,
                create_sintel_submission,
            )

            if args.dataset == "chairs":
                raise SystemExit(
                    "--submission: chairs has no leaderboard test split")
            if args.dataset == "sintel":
                written = create_sintel_submission(
                    params, os.path.join(args.data_root, "Sintel"),
                    args.submission, iters=args.iters or 32,
                    warm_start=args.warm_start, cfg=cfg)
            else:
                written = create_kitti_submission(
                    params, os.path.join(args.data_root, "KITTI"),
                    args.submission, iters=args.iters or 24, cfg=cfg)
            print(json.dumps({"dataset": args.dataset,
                              "submission": args.submission,
                              "files": len(written)}))
            return {"files": len(written)}
        if args.dataset == "chairs":
            from vtoonify_tpu.models.raft_data import validate_chairs

            split = os.path.join(args.data_root, "chairs_split.txt")
            metrics = validate_chairs(
                params,
                os.path.join(args.data_root, "FlyingChairs_release/data"),
                split_file=split if os.path.exists(split) else None,
                iters=args.iters or 24, cfg=cfg)
        elif args.dataset == "sintel":
            metrics = validate_sintel(
                params, os.path.join(args.data_root, "Sintel"),
                dstype=args.dstype, iters=args.iters or 32, cfg=cfg)
        else:
            metrics = validate_kitti(
                params, os.path.join(args.data_root, "KITTI"),
                iters=args.iters or 24, cfg=cfg)
    print(json.dumps({"dataset": args.dataset, **metrics}))
    return metrics
