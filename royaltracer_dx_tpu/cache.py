"""Persistent XLA compilation cache setup.

Compiles of the jitted render pipelines are expensive (minutes on a small
host); caching them on disk makes repeat runs and the test suite fast.
Importing this module (or calling enable()) is idempotent.
"""

from __future__ import annotations

import os

import jax

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")


def enable(cache_dir: str | None = None) -> None:
    cache_dir = cache_dir or os.environ.get("RTDX_JAX_CACHE", _DEFAULT_DIR)
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these flags


enable()
