"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip hardware isn't available in CI; sharding tests run on a virtual
CPU mesh per the build contract. Must run before jax initializes.
"""

import os

# Force CPU: the environment exports JAX_PLATFORMS=axon (real TPU via a
# tunnel) — unit tests must not run on bench hardware. Must be a hard
# override, not setdefault.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Persistent compilation cache: XLA compiles dominate test wall-clock on
# this 1-core CI host; cache across runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
