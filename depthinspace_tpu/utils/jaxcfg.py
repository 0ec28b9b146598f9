"""JAX runtime configuration helpers.

In this environment every XLA compilation pays a substantial fixed latency
(the backend compile service round-trip), and *eager* op-by-op dispatch is
pathologically slow. Two consequences shape the framework:

1. Everything on any hot path is jitted (the ops layer exports jitted
   wrappers; the train/eval steps are single fused jit programs).
2. The persistent compilation cache should be enabled at process start so
   repeated runs (tests, resumed training) skip recompilation.
"""

from __future__ import annotations

import os

import jax

_DEFAULT_CACHE_DIR = os.path.expanduser("~/.cache/depthinspace_tpu/jax_cache")


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    cache_dir = cache_dir or os.environ.get("DIS_JAX_CACHE_DIR",
                                            _DEFAULT_CACHE_DIR)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
