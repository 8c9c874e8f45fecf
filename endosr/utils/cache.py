"""Persistent XLA compilation cache.

Compiles through the TPU tunnel take 30s–minutes; enabling JAX's persistent
cache makes every repeat invocation (bench re-runs, resumed training, test
drivers) start hot. Call ``enable_compilation_cache()`` once at startup.
"""

from __future__ import annotations

import os

__all__ = ["enable_compilation_cache"]


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    import jax

    cache_dir = cache_dir or os.environ.get(
        "ENDOSR_JAX_CACHE", os.path.expanduser("~/.cache/endosr_jax")
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # older jax or read-only fs — never fatal
        pass
