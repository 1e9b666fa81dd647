"""Persistent XLA compilation cache setup.

The remote TPU compile service in this environment takes minutes for the
larger graphs; caching compiled executables on disk makes every process
after the first start warm. Called automatically by bench/entry points;
safe to call multiple times and before/after backend init.
"""

from __future__ import annotations

import os


def enable_compile_cache(cache_dir: str | None = None) -> None:
    import jax

    if cache_dir is None:
        cache_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
            ".jax_cache",
        )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass
