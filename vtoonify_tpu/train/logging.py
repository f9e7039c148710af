"""Training observability: fixed-sample image grids + loss history jsonl.

The reference saves a fixed-input sample grid to log/NAME/%05d.jpg every
`log_every` iterations, seeding the fixed pair at iteration 0
(train_vtoonify_d.py:271-276,361-376) — for GAN training this is the primary
sanity instrument. This module rebuilds that: `SampleGridLogger` freezes one
synthesized (input, target, style, degree) tuple and renders the EMA
generator's output on it next to the target; `MetricsLogger` appends one JSON
line of scalar losses per logged step (exceeds the reference's stdout-only
scalars).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def to_uint8(img: np.ndarray) -> np.ndarray:
    """[-1, 1] float image → uint8, matching torchvision save_image exactly
    (mul(255).add_(0.5).clamp_(0,255).byte() — round-half-UP, which np.round
    is not): the reference writes its training grids through torchvision
    (train_vtoonify_d.py:361-376). utils/image.to_uint8 (truncating) matches
    the reference's plain save path instead — distinct on purpose."""
    x = (np.asarray(img, np.float32) + 1.0) * 127.5 + 0.5
    return np.floor(np.clip(x, 0, 255)).astype(np.uint8)


def save_image_grid(path: str, images: np.ndarray, nrow: int,
                    pad: int = 2) -> None:
    """Tile (N, H, W, 3) images in [-1, 1] into a grid jpg, `nrow` per row
    (torchvision utils.save_image layout: black padding between cells)."""
    from PIL import Image

    imgs = to_uint8(images)
    n, h, w = imgs.shape[:3]
    ncol = nrow
    nr = (n + ncol - 1) // ncol
    grid = np.zeros(
        (nr * h + pad * (nr + 1), ncol * w + pad * (ncol + 1), 3), np.uint8
    )
    for i in range(n):
        r, c = divmod(i, ncol)
        y = pad + r * (h + pad)
        x = pad + c * (w + pad)
        grid[y:y + h, x:x + w] = imgs[i]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(grid).save(path, quality=92)


class MetricsLogger:
    """Appends one JSON line per logged step to log/NAME/metrics.jsonl."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, "metrics.jsonl")
        self._t0 = time.time()

    def log(self, step: int, metrics: dict, **extra) -> None:
        rec = {"step": int(step), "wall_s": round(time.time() - self._t0, 3)}
        rec.update({k: float(v) for k, v in metrics.items()})
        rec.update(extra)
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")


class SampleGridLogger:
    """Fixed-sample grids (reference train_vtoonify_d.py:271-276,361-376).

    `seed(batch_data, d_s)` captures the fixed (real_input, real_output, xl,
    d_s) at iteration 0; `log(step, ema_full_params, d_s_now)` renders rows
    [target, g_ema(fixed d_s), g_ema(current d_s) if degree varies] at 256px
    to log/NAME/%05d.jpg.
    """

    def __init__(self, log_dir: str, cfg, fix_degree: bool,
                 use_degree: bool = True):
        import jax
        import jax.numpy as jnp

        from vtoonify_tpu.models.vtoonify import vtoonify_apply
        from vtoonify_tpu.ops.interp import avg_pool, resize_bilinear

        os.makedirs(log_dir, exist_ok=True)
        self.log_dir = log_dir
        # T has no style degree: one rendered row, no degree arg
        # (train_vtoonify_t.py:295-303)
        self.fix_degree = fix_degree or not use_degree

        self._fixed = None

        def render(params, sample_in, xl, d_s):
            if use_degree:
                out = vtoonify_apply(params, cfg, sample_in, xl, d_s)
            else:
                out = vtoonify_apply(params, cfg, sample_in, xl)
            out = jnp.clip(out, -1.0, 1.0)
            if out.shape[1] > 256:
                out = avg_pool(out, out.shape[1] // 256)
            elif out.shape[1] < 256:
                out = resize_bilinear(out, (256, 256))
            return out

        self._render = jax.jit(render)
        self._pool = lambda y: (
            avg_pool(y, y.shape[1] // 256) if y.shape[1] > 256
            else (resize_bilinear(y, (256, 256)) if y.shape[1] < 256 else y)
        )

    def seed(self, batch_data: dict, d_s) -> None:
        if self._fixed is not None:
            return
        self._fixed = {
            "in": np.asarray(batch_data["real_input"]),
            "out": np.asarray(self._pool(batch_data["real_output"])),
            "xl": np.asarray(batch_data["xl"]),
            "d_s": np.asarray(d_s, np.float32),
        }

    def log(self, step: int, ema_full_params, d_s_now) -> str:
        import jax.numpy as jnp

        assert self._fixed is not None, "seed() must run at iteration 0"
        f = self._fixed
        rows = [f["out"]]
        rows.append(np.asarray(self._render(
            ema_full_params, jnp.asarray(f["in"]), jnp.asarray(f["xl"]),
            jnp.asarray(f["d_s"]),
        )))
        if not self.fix_degree:
            rows.append(np.asarray(self._render(
                ema_full_params, jnp.asarray(f["in"]), jnp.asarray(f["xl"]),
                jnp.asarray(d_s_now, jnp.float32),
            )))
        grid = np.concatenate(rows, axis=0)
        path = os.path.join(self.log_dir, f"{step:05d}.jpg")
        save_image_grid(path, grid, nrow=f["out"].shape[0])
        return path
