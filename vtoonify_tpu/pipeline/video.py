"""Double-buffered video engine: decode → device → encode, overlapped.

The reference's video loop is fully serialized per batch (CPU decode → H2D →
GPU forward → D2H → CPU encode, style_transfer.py:99-183). Here the engine
exploits JAX's asynchronous dispatch: up to `max_in_flight` device batches are
enqueued before the first result is fetched, decoding runs ahead on a
prefetch thread, and encoding runs on a writer thread — so host decode/encode
and TPU compute all overlap (SURVEY.md §7.3 #9, where the ≥60 fps/chip target
is won).
"""

from __future__ import annotations

import collections
import queue
import threading
from dataclasses import dataclass
from typing import Callable, Iterable, Optional

import numpy as np

from vtoonify_tpu.pipeline import crop as crop_mod


@dataclass
class VideoResult:
    frames_written: int
    crop_params: Optional[tuple]
    stages: Optional[dict] = None  # StageTimer summary when profiling


def iterate_video_frames(path: str):
    """Decode frames as RGB uint8 arrays (native swizzle when available)."""
    import cv2

    from vtoonify_tpu import native

    cap = cv2.VideoCapture(path)
    try:
        fps = cap.get(cv2.CAP_PROP_FPS)
        n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        for _ in range(n):
            ok, frame = cap.read()
            if not ok:
                break
            yield fps, native.rgb_to_bgr(np.ascontiguousarray(frame))
    finally:
        cap.release()


class _PrefetchIterator:
    """Decode-ahead thread: pulls items from an iterator into a bounded queue.

    The engine's main thread blocks in `np.asarray` (D2H fetch) once
    `max_in_flight` batches are enqueued; without prefetch, decoding is
    serialized with those stalls. With it, cv2 decode runs concurrently and
    the main-thread "decode" stage in the profile measures only *exposed*
    decode time (queue waits), not total decoder work.
    """

    _SENTINEL = object()

    def __init__(self, iterator, depth: int = 16):
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._err = None
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, args=(iterator,),
                                        daemon=True)
        self._thread.start()

    def _put(self, item) -> bool:
        while not self._stop.is_set():
            try:
                self._q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def _run(self, iterator):
        try:
            for item in iterator:
                if not self._put(item):
                    return
        except BaseException as e:  # surfaced on the consumer thread
            self._err = e
        finally:
            self._put(self._SENTINEL)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._SENTINEL:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item

    def close(self):
        """Stop the producer early (e.g. frame_limit hit) and drain."""
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        self._thread.join()


class _AsyncWriter:
    """cv2.VideoWriter fed from a bounded queue on a worker thread."""

    def __init__(self, path: str, fps: float, size_wh, maxsize: int = 8,
                 timer=None, packed: bool = False):
        import cv2

        self._cv2 = cv2
        self._writer = cv2.VideoWriter(
            path, cv2.VideoWriter_fourcc(*"mp4v"), fps, size_wh
        )
        self._q: queue.Queue = queue.Queue(maxsize=maxsize)
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._count = 0
        self._timer = timer
        self._packed = packed
        self._thread.start()

    def _run(self):
        import contextlib

        from vtoonify_tpu import native

        while True:
            item = self._q.get()
            if item is None:
                break
            ctx = (self._timer.stage("encode") if self._timer is not None
                   else contextlib.nullcontext())
            with ctx:
                if self._packed:
                    # packed_output pipeline: finish the depth-to-space as a
                    # byte permutation fused with the BGR swap
                    self._writer.write(
                        native.depth_to_space2_u8(item, bgr=True))
                else:
                    self._writer.write(native.rgb_to_bgr(item))
            self._count += 1

    def write(self, frame_rgb_u8: np.ndarray):
        self._q.put(frame_rgb_u8)

    def close(self) -> int:
        self._q.put(None)
        self._thread.join()
        self._writer.release()
        return self._count


def toonify_video(
    pipeline,
    in_path: str,
    out_path: str,
    *,
    style_degree: float = 0.5,
    color_transfer: bool = False,
    landmarker=None,
    scale_image: bool = True,
    padding=(200, 200, 200, 200),
    batch_size: Optional[int] = None,  # None → resolution-aware auto
    max_in_flight: int = 3,
    crop_out_path: Optional[str] = None,
    s_w=None,
    parsing_maps: Optional[np.ndarray] = None,
    frame_limit: Optional[int] = None,
    timer=None,
) -> VideoResult:
    """Stylize a video end to end (reference style_transfer.py video branch).

    First frame fixes the crop parameters and the style code for the whole
    video (style_transfer.py:113-150). `s_w` may be passed directly to skip
    alignment (hermetic path). `parsing_maps` (N, H, W, 19) overrides BiSeNet
    (the --parsing_map_path capability). Pass a
    `vtoonify_tpu.utils.profiling.StageTimer` as `timer` to get a
    decode/preprocess/dispatch/fetch/encode breakdown in `result.stages`.

    `batch_size=None` (the default) picks a resolution-aware batch from the
    first frame's crop size via `model_api.dynamic_batch_size` — 16 at the
    standard 256px crop on an accelerator, where measured fps/chip saturates
    (docs/PERF.md), scaling down for larger crops.
    """
    import contextlib

    def timed(name):
        return (timer.stage(name) if timer is not None
                else contextlib.nullcontext())

    crop_params = None
    writer = None
    crop_writer = None
    in_flight = collections.deque()
    frames_done = 0
    batch = []
    first = True
    frame_idx = 0

    def flush_ready(block: bool):
        nonlocal frames_done
        while in_flight and (block or len(in_flight) >= max_in_flight):
            dev_batch, count = in_flight.popleft()
            with timed("fetch"):
                host = np.asarray(dev_batch)  # blocks until TPU done
            for k in range(count):
                writer.write(host[k])
            frames_done += count

    def submit(frames):
        arr = np.stack(frames)
        with timed("dispatch"):
            if parsing_maps is not None:
                pm = parsing_maps[frame_idx - len(frames): frame_idx]
                out = pipeline.process_batch_with_parsing(
                    arr, pm, s_w, style_degree
                )
            else:
                out = pipeline.process_batch(arr, s_w, style_degree)
        in_flight.append((out, len(frames)))
        flush_ready(block=False)

    frame_iter = _PrefetchIterator(
        iterate_video_frames(in_path),
        depth=max(16, 2 * (batch_size or 16)),
    )
    while True:
        with timed("decode"):
            item = next(frame_iter, None)
        if item is None:
            break
        fps, frame = item
        if frame_limit is not None and frame_idx >= frame_limit:
            break
        if first:
            if scale_image and landmarker is not None:
                crop_params = crop_mod.get_video_crop_parameter(
                    frame, landmarker, padding
                )
            frame = crop_mod.preprocess_frame(frame, crop_params, scale_image)
            h, w = frame.shape[:2]
            if batch_size is None:
                import jax

                from vtoonify_tpu.pipeline.model_api import dynamic_batch_size

                batch_size = dynamic_batch_size(
                    w, h,
                    on_accelerator=jax.default_backend() != "cpu",
                )
            writer = _AsyncWriter(
                out_path, fps, (4 * w, 4 * h), timer=timer,
                packed=getattr(pipeline, "packed_output", False))
            if crop_out_path:
                crop_writer = _AsyncWriter(crop_out_path, fps, (w, h))
            if s_w is None:
                aligned = crop_mod.align_face(frame, landmarker)
                s_w = pipeline.compute_style(aligned, color_transfer)
            first = False
        else:
            with timed("preprocess"):
                frame = crop_mod.preprocess_frame(frame, crop_params,
                                                  scale_image)

        if crop_writer is not None:
            crop_writer.write(frame)
        batch.append(frame)
        frame_idx += 1
        if len(batch) == batch_size:
            submit(batch)
            batch = []

    frame_iter.close()
    if batch:
        submit(batch)
    flush_ready(block=True)

    written = writer.close() if writer else 0
    if crop_writer is not None:
        crop_writer.close()
    return VideoResult(
        frames_written=written, crop_params=crop_params,
        stages=timer.summary() if timer is not None else None,
    )
