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


def _host_cpu_fingerprint() -> str:
    """Short stable hash of this host's CPU feature flags.

    XLA:CPU's persistent cache stores AOT *machine code*; loading an entry
    compiled on a host with a different feature set logs
    "could lead to execution errors such as SIGILL" and can crash on a
    less-capable host. Sessions here migrate between hosts with slightly
    different CPU features, so CPU cache directories are keyed by this
    fingerprint: a migrated host recompiles into a fresh directory instead
    of executing foreign machine code."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    import hashlib

                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    return hashlib.sha256(flags.encode()).hexdigest()[:10]
    except OSError:
        pass
    return "nofp"


def _cache_dir_for(path: str, platforms: str | None,
                   fingerprint: str) -> str:
    """CPU platform -> host-fingerprinted subdir; device platforms keep
    `path` as-is (device code doesn't depend on host CPU features, and a
    host migration must not cold the TPU cache)."""
    first = (platforms or "").split(",")[0].strip().lower()
    if first == "cpu":
        return f"{path}-cpu-{fingerprint}"
    return path


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get("TTL_JAX_CACHE_DIR",
                                  os.path.expanduser("~/.cache/jax_ttl"))
    platforms = getattr(jax.config, "jax_platforms", None) \
        or os.environ.get("JAX_PLATFORMS")
    path = _cache_dir_for(path, platforms, _host_cpu_fingerprint())
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:  # older jax without these knobs: cache is best-effort
        pass
