"""Test configuration: force a virtual 8-device CPU mesh.

This machine's /root/.axon_site sitecustomize imports jax at interpreter
start and pins the `axon` platform (ONE real TPU behind a tunnel), so env
changes made here are normally too late: the suite would silently run on
bench hardware with a single device. If that happened, re-exec pytest with
the sitecustomize stripped and the CPU platform forced.
"""

import os
import sys

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

# jax pre-imported means the sitecustomize ran and latched the axon
# platform into jax.config; retarget to CPU and rebuild the backends
# in-process (env vars alone are too late at this point).
if "jax" in sys.modules:
    import jax
    import jax._src.xla_bridge as xb

    jax.config.update("jax_platforms", "cpu")
    xb._clear_backends()
