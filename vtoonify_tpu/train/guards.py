"""Training guards: preemption-safe checkpointing + NaN fail-fast.

Fills the two auxiliary-subsystem gaps the reference leaves open
(SURVEY.md §5.2/§5.3 — it has no sanitizer story and no failure handling;
"failures surface as crashes", checkpoint cadence is the only mitigation):

  * PreemptionGuard — TPU/GKE preemption and job schedulers deliver SIGTERM
    with a grace window before the kill. The guard flips a flag from the
    signal handler; the training loop polls it once per iteration and, when
    set, saves the FULL train state (params+EMA+optimizers+step — the same
    file `--resume` reads) and exits cleanly. Combined with the trainers'
    exact-resume, a preempted run continues bit-for-bit where it left off
    instead of losing everything since the last cadence save.
  * check_finite_metrics — fail-fast loss sanitizer: a non-finite loss means
    every iteration after it is wasted work (the optimizer state is already
    poisoned), so raise immediately with the offending metrics. With
    --debug_nans the trainers also flip `jax_debug_nans` so JAX re-runs the
    failing program un-jitted and names the exact primitive that produced
    the first NaN.
"""

from __future__ import annotations

import math
import signal
from typing import Iterable


class PreemptionGuard:
    """Installs handlers for `signals`; `requested` turns True on delivery.

    Handlers chain: a previously-installed handler (e.g. a cluster agent's)
    still runs. Handler installation only works in the main thread; the
    guard is a no-op (never requested) elsewhere.
    """

    def __init__(self, signals: Iterable[int] = (signal.SIGTERM,)):
        self.requested = False
        self.signum = None
        self._prev = {}
        for s in signals:
            try:
                self._prev[s] = signal.signal(s, self._handle)
            except ValueError:       # not in main thread
                pass

    def _handle(self, signum, frame):
        self.requested = True
        self.signum = signum
        prev = self._prev.get(signum)
        if callable(prev):
            prev(signum, frame)

    def uninstall(self):
        for s, prev in self._prev.items():
            try:
                signal.signal(s, prev if prev is not None else signal.SIG_DFL)
            except ValueError:
                pass
        self._prev = {}


def handle_preemption(guard: PreemptionGuard, save_fn, step: int) -> bool:
    """If preemption was requested, run `save_fn()` and report True (the
    caller returns from its training loop). Separated from the loop for
    unit-testing (tests/test_guards.py)."""
    if not guard.requested:
        return False
    save_fn()
    print(f"preemption (signal {guard.signum}) at step {step}: full train "
          "state saved — rerun with --resume to continue exactly",
          flush=True)
    return True


def check_finite_metrics(metrics: dict, step: int) -> None:
    """Raise if any loss is NaN/Inf — the poisoned-optimizer fail-fast."""
    bad = {k: float(v) for k, v in metrics.items()
           if not math.isfinite(float(v))}
    if bad:
        raise FloatingPointError(
            f"non-finite training metrics at step {step}: {bad} — the "
            "optimizer state is already poisoned; stopping. Re-run with "
            "--debug_nans to have JAX name the primitive that produced the "
            "first NaN, and resume from the last checkpoint with --resume."
        )


def enable_nan_debugging() -> None:
    """`--debug_nans`: JAX re-runs the failing jitted program op-by-op and
    raises at the first NaN-producing primitive (slower; debug only)."""
    import jax

    jax.config.update("jax_debug_nans", True)
