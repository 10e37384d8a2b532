"""Host-fingerprinted CPU compilation cache (ttl_tpu.utils.jaxcache).

XLA:CPU's persistent cache stores AOT machine code; executing an entry
compiled on a host with different CPU features can SIGILL. Sessions migrate
between hosts, so CPU cache paths are keyed by a feature fingerprint while
device-platform paths stay stable (device code is host-independent and the
TPU cache must survive host migration).
"""
import jax

from ttl_tpu.utils.jaxcache import (_cache_dir_for, _host_cpu_fingerprint,
                                    enable_compilation_cache)


def test_cpu_platform_gets_fingerprint_suffix():
    assert _cache_dir_for("/c/jax_ttl", "cpu", "abc123") \
        == "/c/jax_ttl-cpu-abc123"
    # first platform in a comma list decides
    assert _cache_dir_for("/c/jax_ttl", "cpu,axon", "abc123") \
        == "/c/jax_ttl-cpu-abc123"


def test_device_platforms_keep_path_stable():
    for plat in ("axon", "tpu", "axon,cpu", None, ""):
        assert _cache_dir_for("/c/jax_ttl", plat, "abc123") == "/c/jax_ttl"


def test_fingerprint_is_stable_and_short():
    a, b = _host_cpu_fingerprint(), _host_cpu_fingerprint()
    assert a == b
    assert 4 <= len(a) <= 16


def test_enable_applies_fingerprint_under_cpu(tmp_path):
    # the test harness pins jax_platforms="cpu" (conftest), so the
    # configured directory must carry this host's fingerprint
    base = str(tmp_path / "jc")
    enable_compilation_cache(base)
    try:
        got = jax.config.jax_compilation_cache_dir
        assert got == f"{base}-cpu-{_host_cpu_fingerprint()}"
    finally:
        # restore the session cache for the rest of the suite
        import os
        enable_compilation_cache(os.path.expanduser("~/.cache/jax_ttl_cpu"))
