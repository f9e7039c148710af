"""Driver-contract tests for __graft_entry__.py.

The driver compile-checks `entry()` single-chip and runs
`dryrun_multichip(n)` on virtual CPU devices each round; a signature or
trace regression there only surfaces in the official round artifacts
(MULTICHIP_r04.json's rc=124 was exactly such a silent gap). This test
catches trace-level breakage locally: it materializes the full-size
flagship params like the driver does, then abstractly evaluates the graph
with jax.eval_shape — tracing every layer without paying an XLA compile.
(The dryrun itself has its own gate:
tests/test_sharding.py::test_dryrun_multichip_fits_driver_budget.)
"""

import importlib.util
import os

import jax
import jax.numpy as jnp


def _load_graft_entry():
    path = os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py")
    spec = importlib.util.spec_from_file_location("graft_entry_contract", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_traces_at_flagship_config():
    mod = _load_graft_entry()
    fn, args = mod.entry()

    frames, s_w, d_s = args
    assert frames.shape == (1, 256, 256, 3) and frames.dtype == jnp.uint8
    assert s_w.shape[0] == 1 and s_w.shape[-1] == 512
    assert d_s.shape == ()

    # Trace the full 256->1024 graph without compiling it.
    out = jax.eval_shape(fn, *args)
    assert out.shape == (1, 1024, 1024, 3), out.shape
    assert out.dtype == jnp.uint8, out.dtype
