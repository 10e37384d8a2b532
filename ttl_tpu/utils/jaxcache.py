"""Persistent XLA compilation cache.

First compiles over the tunneled TPU run 1-4 minutes; the persistent cache
brings repeat invocations down to seconds. Called by the CLI, runner, and
bench entry points.
"""
from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get("TTL_JAX_CACHE_DIR",
                                  os.path.expanduser("~/.cache/jax_ttl"))
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:  # older jax without these knobs: cache is best-effort
        pass
