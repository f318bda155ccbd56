"""Filesystem helpers (reference ``utils/system_utils.py``)."""
from __future__ import annotations

import os


def mkdir_p(path: str):
    os.makedirs(path, exist_ok=True)


def enable_persistent_compile_cache(cache_dir: str | None = None):
    """Point JAX at an on-disk compilation cache.

    The axon remote-compile relay makes cold compiles of the big train step
    take many minutes; the persistent cache stores the compiled executable so
    a fresh process skips the relay entirely (verified: works with the axon
    backend).  Call BEFORE the first jit execution.
    """
    import jax

    if cache_dir is None:
        cache_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def search_for_max_iteration(folder: str):
    """Max iteration_N subdirectory (reference :28-30)."""
    if not os.path.isdir(folder):
        return None
    saved = [int(f.split("_")[-1]) for f in os.listdir(folder)
             if f.startswith("iteration_")]
    return max(saved) if saved else None
