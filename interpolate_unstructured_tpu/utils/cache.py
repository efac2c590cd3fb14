"""Persistent XLA compile cache setup.

Remote-TPU compiles through the axon tunnel take 30s-6min each; a
disk-backed compilation cache makes every re-run after the first pay
none of it.  Tests configure this in conftest.py; benchmarks and user
scripts call :func:`enable_compile_cache`.
"""

from __future__ import annotations

import os


def enable_compile_cache(path: str = "/tmp/jax_cache") -> None:
    """Turn on jax's persistent compilation cache at ``path``.

    Safe to call multiple times and before/after backend init.
    """
    import jax

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
