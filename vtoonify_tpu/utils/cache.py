"""Persistent XLA compilation cache.

Remote-compile environments (and TPU pods generally) pay minutes per
large-graph compile with no cross-process reuse; JAX's persistent cache
eliminates that (measured 202 s → 0.4 s on this harness). Call
`enable_compilation_cache()` early — entry points do this by default.

CPU backends are deliberately excluded: XLA:CPU persists AOT machine code
whose cache key does not cover the effective target-feature set (host ISA
plus XLA-internal `prefer-no-gather/scatter` pseudo-features that vary by
compiling process), so a shared cache can hand an executable built for a
different target to this host — observed here as a hard `abort()`
mid-training-step after a `cpu_aot_loader.cc "machine type doesn't match"`
warning. CPU compiles are cheap; the cache only ever paid for itself on
the accelerator's minutes-long remote compiles.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None,
                             min_compile_secs: float = 1.0) -> str | None:
    import jax

    if jax.default_backend() == "cpu":
        return None
    path = path or os.environ.get(
        "VTOONIFY_COMPILE_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"),
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    return path
