"""Multi-host smoke test — a REAL 2-process JAX 'pod' on localhost.

The reference's multi-GPU story is torch.distributed.launch + DDP + NCCL
(train_vtoonify_d.py:446-461); ours is jax.distributed.initialize + a global
mesh + GSPMD (SURVEY.md §2.5/§5.8). This test brings up two actual processes
(2 local CPU devices each -> a 4-device global mesh, gloo TCP collectives),
runs a data-parallel grad step where the gradient all-reduce crosses the
process boundary, and checks both ranks computed the identical, numerically
correct result. Hermetic: no TPU, no network beyond loopback.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.e2e

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_multihost_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _worker_env(port: int, pid: int, local_devices: int = 2,
                tp: bool = False) -> dict:
    env = dict(os.environ)
    # N virtual CPU devices per process (the parent's conftest pins 8 for the
    # in-process suite; the workers get their own count)
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "host_platform_device_count" not in f]
    env["XLA_FLAGS"] = " ".join(
        flags +
        [f"--xla_force_host_platform_device_count={local_devices}"])
    if tp:
        env["VTOONIFY_TEST_TP"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    # hermetic interpreter: the repo only. The environment's PYTHONPATH may
    # carry a sitecustomize that registers a hardware PJRT plugin at startup,
    # which would claim the backend before jax.distributed.initialize runs.
    env["PYTHONPATH"] = REPO
    env["VTOONIFY_COORDINATOR"] = f"127.0.0.1:{port}"
    env["VTOONIFY_NUM_PROCESSES"] = "2"
    env["VTOONIFY_PROCESS_ID"] = str(pid)
    return env


def test_initialize_rejects_ranks_without_coordinator(monkeypatch):
    """Explicit ranks with no coordinator must error clearly, not silently
    fall into cluster auto-detection with the user's ranks dropped."""
    from vtoonify_tpu.parallel import multihost

    monkeypatch.delenv(multihost.ENV_COORDINATOR, raising=False)
    with pytest.raises(ValueError, match="coordinator"):
        multihost.initialize(num_processes=2, process_id=1)


def _run_pod(port: int, local_devices: int = 2, tp: bool = False):
    procs = [
        subprocess.Popen([sys.executable, WORKER],
                         env=_worker_env(port, pid, local_devices, tp),
                         cwd=REPO, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {pid} failed:\n{out}"

    lines = [next(ln for ln in out.splitlines() if "MULTIHOST_OK" in ln)
             for out in outs]
    return [dict(kv.split("=") for kv in ln.split()[1:]) for ln in lines]


def _check_numerics(parsed):
    # both ranks must agree bit-for-bit on every reduced quantity
    for k in ("loss", "wsum", "a", "b"):
        assert parsed[0][k] == parsed[1][k], (k, parsed)

    # and match the single-process numpy ground truth (the DP grad step's
    # all-reduce crossed the process boundary to get here)
    full_x = np.random.RandomState(0).randn(8, 16).astype(np.float32)
    full_y = np.random.RandomState(2).randn(8, 4).astype(np.float32)
    w0 = np.random.RandomState(1).randn(16, 4).astype(np.float32)
    err = full_x @ w0 - full_y
    loss = (err ** 2).mean()
    grad = 2.0 / err.size * (full_x.T @ err)
    wsum = (w0 - 0.1 * grad).sum()
    assert float(parsed[0]["loss"]) == pytest.approx(loss, rel=1e-4)
    assert float(parsed[0]["wsum"]) == pytest.approx(wsum, rel=1e-3)
    assert float(parsed[0]["a"]) == pytest.approx(full_x.mean(), abs=1e-5)
    assert float(parsed[0]["b"]) == pytest.approx((full_x ** 2).mean(),
                                                  rel=1e-4)


def test_two_process_dp_step():
    parsed = _run_pod(_free_port())
    # topology: 2 processes x 2 local devices = 4-device global mesh
    for pid, d in enumerate(parsed):
        assert d["pid"] == str(pid)
        assert d["procs"] == "2" and d["global"] == "4"
        assert d["tp"] == "1"
    _check_numerics(parsed)


def test_two_process_dp_tp_step():
    """Pod-shaped topology (VERDICT r4 #8): 2 processes x 4 local devices,
    dp4 x tp2 mesh spanning both — tp pairs intra-process (ICI), the dp
    grad all-reduce across the process boundary (DCN), with w genuinely
    output-channel-sharded over 'tp'."""
    parsed = _run_pod(_free_port(), local_devices=4, tp=True)
    for pid, d in enumerate(parsed):
        assert d["pid"] == str(pid)
        assert d["procs"] == "2" and d["global"] == "8"
        assert d["tp"] == "2"
        assert "'tp'" in d["wspec"], d["wspec"]  # really TP-sharded
    _check_numerics(parsed)
