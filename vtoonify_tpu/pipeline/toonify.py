"""The per-frame toonification graph + pipeline object.

TPU-native design (BASELINE.json north star): BiSeNet parsing, input
normalization, VToonify synthesis and uint8 re-quantization are fused into ONE
jitted graph per input-shape bucket — frames go device-side as uint8 (4×
less H2D traffic than float32) and come back as uint8 (16× less D2H than an
f32 4H×4W frame). The reference runs parsing and synthesis as separate
dispatches with float tensors (style_transfer.py:171-177).

Compute dtype is bfloat16 by default (MXU-native); params are cast once at
pipeline build.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vtoonify_tpu.models.bisenet import bisenet_apply
from vtoonify_tpu.models.psp_encoder import PSPEncoderConfig, psp_encoder_apply
from vtoonify_tpu.models.vtoonify import (
    VToonifyConfig,
    vtoonify_apply,
    zplus2wplus,
)
from vtoonify_tpu.ops.interp import resize_bilinear, resize_nearest

PARSING_WEIGHT = 1.0 / 16.0  # reference style_transfer.py:174


def _cast_tree(tree, dtype):
    return jax.tree_util.tree_map(
        lambda a: a.astype(dtype) if jnp.issubdtype(a.dtype, jnp.floating) else a,
        tree,
    )


def frame_graph(vt_params, vt_cfg: VToonifyConfig, parsing_params, frames_u8,
                s_w, d_s, dtype=jnp.bfloat16, packed_out: bool = False):
    """uint8 frames (B, H, W, 3) → stylized uint8 (B, 4H, 4W, 3).

    Equivalent to reference style_transfer.py:165-177: BiSeNet on the 2×
    bilinear-upsampled frame (×2 gain), nearest ×0.5 downsample of the logits,
    1/16-weighted concat, VToonify forward, clamp.

    packed_out: quantize in the space-to-depth packed layout and return
    (B, 2H, 2W, 12) uint8 phase-major — the synthesis tail never materializes
    an unpacked full-res float tensor (no (2,3)-minor relayout on device);
    the depth-to-space finishes as a byte permutation fused into the host's
    BGR/encode pass (native.depth_to_space2_u8). Same bytes over D2H.
    """
    x = frames_u8.astype(dtype) / jnp.asarray(127.5, dtype) - 1.0
    b, h, w, _ = x.shape
    x2 = resize_bilinear(x, (2 * h, 2 * w), align_corners=False)
    logits = bisenet_apply(parsing_params, 2.0 * x2)
    x_p = resize_nearest(logits, (h, w))
    inputs = jnp.concatenate(
        [x, x_p.astype(dtype) * jnp.asarray(PARSING_WEIGHT, dtype)], axis=-1
    )
    # a batch-1 style (one style code per video — the standard case) is NOT
    # broadcast to the frame batch: the modulated convs fold
    # modulation/demodulation into their kernels (nn/layers.py) instead of
    # per-window activation scaling — identical algebra, measurably less
    # fused elementwise work in the high-res tail. A (B, L, 512) style still
    # styles each frame individually.
    s_w_b = s_w.astype(dtype)
    if s_w_b.ndim == 2:
        s_w_b = s_w_b[None]
    y = vtoonify_apply(vt_params, vt_cfg, inputs, s_w_b, d_s=d_s,
                       packed_out=packed_out)
    y = jnp.clip(y, -1.0, 1.0)
    return jnp.round((y.astype(jnp.float32) + 1.0) * 127.5).astype(jnp.uint8)


def frame_graph_with_parsing(vt_params, vt_cfg: VToonifyConfig, frames_u8,
                             x_p, s_w, d_s, dtype=jnp.bfloat16,
                             packed_out: bool = False):
    """Variant taking precomputed parsing maps (B, H, W, 19) — the
    --parsing_map_path capability (style_transfer.py:168-174)."""
    x = frames_u8.astype(dtype) / jnp.asarray(127.5, dtype) - 1.0
    b = x.shape[0]
    inputs = jnp.concatenate(
        [x, x_p.astype(dtype) * jnp.asarray(PARSING_WEIGHT, dtype)], axis=-1
    )
    s_w_b = s_w.astype(dtype)
    if s_w_b.ndim == 2:
        s_w_b = s_w_b[None]
    y = vtoonify_apply(vt_params, vt_cfg, inputs, s_w_b, d_s=d_s,
                       packed_out=packed_out)
    y = jnp.clip(y, -1.0, 1.0)
    return jnp.round((y.astype(jnp.float32) + 1.0) * 127.5).astype(jnp.uint8)


class ToonifyPipeline:
    """Programmatic API over the jitted per-frame graph.

    Holds device-resident (optionally bf16-cast) params and a jit cache keyed
    by input shape. Style codes are computed once per image/video
    (style_transfer.py:138-150) and frozen.
    """

    def __init__(
        self,
        vt_params,
        vt_cfg: VToonifyConfig,
        parsing_params,
        psp_params=None,
        psp_cfg: Optional[PSPEncoderConfig] = None,
        latent_avg=None,
        exstyle=None,  # z+ exemplar code (1, n_latent, 512), pre-zplus2wplus
        dtype=jnp.bfloat16,
        mesh=None,  # optional jax.sharding Mesh: shard the frame axis over
        # 'dp'; when the mesh has a 'tp' axis > 1, the wide (≥256-channel)
        # conv/linear weights are additionally channel-sharded over 'tp'.
        # A mesh with an 'sp' axis (parallel.mesh.make_spatial_mesh) instead
        # shards each frame's HEIGHT over the devices — single-frame latency
        # scale-out via GSPMD conv halo exchanges, bit-equal to unsharded
        # execution (tests/test_sharding.py::test_sp_single_frame_inference)
        size_bucket: Optional[int] = None,  # round H,W up to a multiple and
        # crop the output — one compiled program per bucket instead of per
        # exact crop size. NOT bit-exact: BiSeNet's global average pools and
        # Fusion's instance norms see the reflected padding, measured ≤1 uint8
        # LSB over the interior with larger (≤~12 LSB) deviations confined to
        # the output band nearest the padded edge (tests/test_bucketing.py)
        packed_output: bool = False,  # process_batch returns space-to-depth
        # PACKED (B, 2H, 2W, 12) uint8: the device graph skips the final
        # depth-to-space relayout; consumers finish it on host via
        # `unpack_frame` (the video engine's writer thread and process_image
        # do this automatically, fused with the BGR conversion)
        bucket_margin: int = 0,  # paranoid bucketing: reflect-pad this many
        # extra pixels on ALL sides before bucket rounding and crop them from
        # the output — ejects the padding halo from the kept region. The
        # production-scale measurement (docs/PERF.md) shows the halo decays
        # within 32px of the padded edge, so bucket_margin=32 leaves bucketed
        # outputs at the ≤2-LSB global-stat floor for production-size crops
        # (for tiny crops the margin itself inflates the padded fraction and
        # with it the uniform global-stat shift — see tests/test_bucketing.py)
    ):
        self.vt_cfg = vt_cfg
        self.dtype = dtype
        self.mesh = mesh
        self.size_bucket = size_bucket
        self.bucket_margin = bucket_margin
        self.packed_output = packed_output
        # Keep an f32 copy of the pieces used for style preparation (done once,
        # accuracy matters more than speed there).
        self._vt_params_f32 = vt_params
        self.vt_params = _cast_tree(vt_params, dtype)
        self.parsing_params = _cast_tree(parsing_params, dtype)
        if mesh is not None:
            from vtoonify_tpu.parallel.mesh import shard_params

            use_tp = "tp" in mesh.shape and mesh.shape["tp"] > 1
            self.vt_params = shard_params(self.vt_params, mesh, tp=use_tp)
            self.parsing_params = shard_params(self.parsing_params, mesh)
        self.psp_params = psp_params
        self.psp_cfg = psp_cfg or PSPEncoderConfig()
        self.latent_avg = latent_avg
        self.exstyle_w = None
        if exstyle is not None:
            self.exstyle_w = zplus2wplus(
                self._vt_params_f32, vt_cfg, jnp.asarray(exstyle)
            )

        self._frame_fn = jax.jit(
            functools.partial(frame_graph, dtype=self.dtype,
                              packed_out=packed_output),
            static_argnums=(1,),
        )
        self._frame_fn_parsing = jax.jit(
            functools.partial(frame_graph_with_parsing, dtype=self.dtype,
                              packed_out=packed_output),
            static_argnums=(1,),
        )

    @staticmethod
    def unpack_frame(packed_u8: np.ndarray, bgr: bool = False) -> np.ndarray:
        """Host-side finish for packed_output: (2H, 2W, 12) uint8 phase-major
        → (4H, 4W, 3) RGB (or BGR for encoders), one native pass."""
        from vtoonify_tpu import native

        return native.depth_to_space2_u8(packed_u8, bgr=bgr)

    # -- style preparation ---------------------------------------------------

    def compute_style(self, aligned_face_u8: np.ndarray,
                      color_transfer: bool = False):
        """Aligned 256×256 face → frozen per-video style code s_w (1, L, 512).

        reference style_transfer.py:140-149: pSp z+ → w+, then splice the
        exemplar: structure-only (layers :7) or full color transfer.
        """
        if self.psp_params is None:
            raise RuntimeError("pipeline built without a pSp encoder")
        x = jnp.asarray(aligned_face_u8, jnp.float32)[None] / 127.5 - 1.0
        zp = psp_encoder_apply(self.psp_params, self.psp_cfg, x,
                               latent_avg=self.latent_avg)
        s_w = zplus2wplus(self._vt_params_f32, self.vt_cfg, zp)
        if self.vt_cfg.backbone == "dualstylegan" and self.exstyle_w is not None:
            if color_transfer:
                s_w = self.exstyle_w
            else:
                s_w = jnp.concatenate(
                    [self.exstyle_w[:, :7], s_w[:, 7:]], axis=1
                )
        return s_w

    # -- frame processing ----------------------------------------------------

    def _place(self, frames):
        if self.mesh is None:
            return jnp.asarray(frames)
        if "sp" in self.mesh.shape:
            from vtoonify_tpu.parallel.mesh import shard_array_spatial

            return shard_array_spatial(jnp.asarray(frames), self.mesh)
        from vtoonify_tpu.parallel.mesh import shard_array_batch

        return shard_array_batch(jnp.asarray(frames), self.mesh)

    def process_batch(self, frames_u8: np.ndarray, s_w, d_s: float):
        """(B, H, W, 3) uint8 → (B, 4H, 4W, 3) uint8 device array (async);
        with packed_output, (B, 2H, 2W, 12) phase-major — finish with
        `unpack_frame` host-side."""
        frames_u8 = np.asarray(frames_u8)
        pad_h = pad_w = 0
        mg = self.bucket_margin if self.size_bucket else 0
        if self.size_bucket:
            m = self.size_bucket
            if mg:
                frames_u8 = np.pad(
                    frames_u8, ((0, 0), (mg, mg), (mg, mg), (0, 0)),
                    mode="reflect",
                )
            h, w = frames_u8.shape[1:3]
            pad_h, pad_w = (-h) % m, (-w) % m
            if pad_h or pad_w:
                frames_u8 = np.pad(
                    frames_u8, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)),
                    mode="reflect",
                )
        out = self._frame_fn(
            self.vt_params, self.vt_cfg, self.parsing_params,
            self._place(frames_u8), s_w, jnp.asarray(d_s, jnp.float32),
        )
        if pad_h or pad_w or mg:
            s = 2 if self.packed_output else 4  # packed rows cover 2 pixels
            oh = out.shape[1] - s * (pad_h + mg)
            ow = out.shape[2] - s * (pad_w + mg)
            out = out[:, s * mg:oh, s * mg:ow]
        return out

    def process_batch_with_parsing(self, frames_u8: np.ndarray, x_p, s_w,
                                   d_s: float):
        return self._frame_fn_parsing(
            self.vt_params, self.vt_cfg, self._place(np.asarray(frames_u8)),
            self._place(np.asarray(x_p)), s_w, jnp.asarray(d_s, jnp.float32),
        )

    def process_image(self, frame_u8: np.ndarray, s_w, d_s: float) -> np.ndarray:
        out = np.asarray(self.process_batch(frame_u8[None], s_w, d_s)[0])
        if self.packed_output:
            out = self.unpack_frame(out)
        return out
