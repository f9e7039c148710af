"""Unit tests for the training guards (train/guards.py): preemption-safe
checkpointing and the NaN fail-fast sanitizer (SURVEY §5.2/§5.3 — the
reference has neither; failures surface as crashes)."""

import os
import signal

import numpy as np
import pytest

from vtoonify_tpu.train.guards import (
    PreemptionGuard,
    check_finite_metrics,
    handle_preemption,
)


def test_preemption_guard_catches_sigterm_and_chains():
    seen = []
    prev = signal.signal(signal.SIGTERM, lambda s, f: seen.append(s))
    try:
        guard = PreemptionGuard()
        assert not guard.requested
        os.kill(os.getpid(), signal.SIGTERM)
        assert guard.requested and guard.signum == signal.SIGTERM
        assert seen == [signal.SIGTERM]  # previous handler still ran
    finally:
        guard.uninstall()
        signal.signal(signal.SIGTERM, prev)


def test_handle_preemption_saves_once_and_reports():
    guard = PreemptionGuard(signals=())  # no handlers — drive flag directly
    saves = []
    assert not handle_preemption(guard, lambda: saves.append(1), step=3)
    assert saves == []
    guard.requested = True
    guard.signum = signal.SIGTERM
    assert handle_preemption(guard, lambda: saves.append(1), step=3)
    assert saves == [1]


def test_check_finite_metrics():
    check_finite_metrics({"g": np.float32(0.1), "d": 2.0}, step=7)  # fine
    with pytest.raises(FloatingPointError, match="step 9.*'d'"):
        check_finite_metrics({"g": 0.1, "d": float("nan")}, step=9)
    with pytest.raises(FloatingPointError, match="inf"):
        check_finite_metrics({"g": float("inf")}, step=1)


def test_trainers_expose_the_flags():
    from vtoonify_tpu.cli import train_d, train_t

    for mod in (train_d, train_t):
        opts = {a.option_strings[0] for a in mod.build_parser()._actions
                if a.option_strings}
        assert "--debug_nans" in opts
        assert "--resume" in opts
