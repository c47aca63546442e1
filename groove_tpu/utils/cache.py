"""Persistent XLA compilation cache defaulting.

On this deployment the TPU compiles through a remote service (~2 min per
fresh program); without a persistent cache every CLI/shell/GUI invocation
pays it again. bench.py already defaults JAX_COMPILATION_CACHE_DIR to the
repo's .jax_cache/; the interactive entry points route through here so
they behave the same. Respects an existing env var / explicit config.
"""

from __future__ import annotations

import os
from pathlib import Path


def ensure_compile_cache() -> None:
    """Point JAX's persistent compilation cache at <repo>/.jax_cache unless
    the user already configured one. Safe to call before or after jax
    import (uses jax.config when jax is already loaded)."""
    default = str(Path(__file__).resolve().parents[2] / ".jax_cache")
    path = os.environ.get("JAX_COMPILATION_CACHE_DIR") or default
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", path)
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    try:
        import jax

        if jax.config.jax_compilation_cache_dir is None:
            jax.config.update("jax_compilation_cache_dir", path)
    except Exception:
        pass
