"""Persistent XLA compilation cache.

Remote-compile environments (and TPU pods generally) pay minutes per
large-graph compile with no cross-process reuse; JAX's persistent cache
eliminates that (measured 202 s → 0.4 s on this harness). Call
`enable_compilation_cache()` early — entry points do this by default.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None,
                             min_compile_secs: float = 1.0) -> str:
    import jax

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
