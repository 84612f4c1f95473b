"""Persistent XLA compilation cache.

The per-config compile of the jitted pipeline costs minutes through a
tunnel-attached TPU; caching compiled executables on disk makes every
rerun of an already-seen (config, shapes) pair start in seconds. Safe to
call multiple times; honors an existing JAX_COMPILATION_CACHE_DIR.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> str:
    import jax

    cache_dir = (
        path
        or os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or os.path.expanduser("~/.cache/vo_tpu_xla")
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
