"""Profiling / tracing utilities (SURVEY.md §5.1 gap-fill — the reference has
none; tqdm only). Wraps jax.profiler for device traces plus lightweight
per-stage wall timers for the video pipeline."""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


@contextlib.contextmanager
def device_trace(logdir: str = "/tmp/jax-trace"):
    """Capture an XLA device trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up in device traces."""
    return jax.profiler.TraceAnnotation(name)


class StepTrace:
    """Device-trace a contiguous window of training steps (--profile N).

    Call `before(idx)` ahead of the step and `after(idx, result)` behind it;
    the window [first_step, first_step + n_steps) is captured to
    `<logdir>` (TensorBoard/Perfetto format)."""

    def __init__(self, logdir: str, first_step: int, n_steps: int):
        self.logdir = logdir
        self.first = first_step
        self.last = first_step + n_steps - 1
        self._active = False

    def before(self, step: int):
        if step == self.first:
            jax.profiler.start_trace(self.logdir)
            self._active = True

    def after(self, step: int, *results):
        if not self._active:
            return
        if step == self.last:
            for r in results:
                jax.block_until_ready(r)
            jax.profiler.stop_trace()
            self._active = False
            print(f"device trace written to {self.logdir}", flush=True)

    def close(self):
        """Flush a still-open trace — call after the training loop so a
        --profile window extending past the final iteration isn't silently
        lost (without this, jax.profiler is left tracing and no file is
        written)."""
        if self._active:
            jax.profiler.stop_trace()
            self._active = False
            print(f"device trace (truncated window) written to "
                  f"{self.logdir}", flush=True)


class StageTimer:
    """Accumulating wall-clock stage timer for host-side pipeline phases
    (decode / preprocess / device / encode)."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> dict:
        return {
            k: {"total_s": self.totals[k], "count": self.counts[k],
                "mean_ms": 1000 * self.totals[k] / max(self.counts[k], 1)}
            for k in self.totals
        }
