"""Test harness: force JAX onto a virtual 8-device CPU mesh.

Bench and production run on real TPU; tests validate numerics and sharding
on host CPU so they run anywhere (and so multi-chip programs execute without
N physical chips). The session's sitecustomize imports jax at interpreter
boot with JAX_PLATFORMS=axon baked in, so env vars are too late here - the
platform must be overridden through jax.config before first backend use.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# persistent compile cache: repeat test runs skip CPU XLA compilation
from ttl_tpu.utils.jaxcache import enable_compilation_cache  # noqa: E402

enable_compilation_cache(os.path.expanduser("~/.cache/jax_ttl_cpu"))
