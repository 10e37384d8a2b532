"""Per-entry-point JAX runtime setup: platform honoring + persistent cache.

First compiles over the tunneled TPU run 1-4 minutes; the persistent cache
brings repeat invocations down to seconds. Called by the CLI, runner, and
bench entry points.
"""
from __future__ import annotations

import os


def honor_platform_env() -> None:
    """Re-apply JAX_PLATFORMS through jax.config.

    Some backend plugins hook `get_backend` and initialize their client
    regardless of the JAX_PLATFORMS *environment variable* (observed with
    the tunneled-TPU relay plugin: `JAX_PLATFORMS=cpu python -m ttl_tpu`
    still attempted the relay connection, hanging for minutes whenever the
    relay was unreachable). Setting the platform through `jax.config`
    before first backend use routes around the hook, making
    `JAX_PLATFORMS=cpu` behave as documented for every ttl_tpu entry
    point.

    Call this ONLY from true process entry points (cli/predict/serve/bench
    mains) - the process was launched with that environment, so re-applying
    it is always correct there. Library code (e.g. TTLPredictor) must NOT
    call it: inside a host process that pinned a platform via jax.config
    (the test harness pins cpu), re-applying the host's env var would flip
    the whole process back to the relay platform mid-session."""
    import jax

    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        try:
            jax.config.update("jax_platforms", plat)
        except Exception:  # backends already initialized: nothing to fix
            pass


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
