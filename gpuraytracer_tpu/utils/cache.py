"""Persistent XLA compilation cache setup.

The megakernel's unrolled triangle loop produces a large Mosaic program
(~4 min compile at 512^2/16spp). Enabling JAX's persistent cache makes that a
one-time cost per (config, machine): subsequent processes load the compiled
binary in seconds. Called by the CLI and bench entry points; library code
never mutates global config.
"""
from __future__ import annotations

import os

DEFAULT_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    import jax

    cache_dir = cache_dir or os.environ.get("GPURT_CACHE_DIR",
                                            DEFAULT_CACHE_DIR)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
