"""Persistent XLA compilation cache.

First compiles through the tunneled TPU backend take minutes and jax's
in-memory executable cache dies with the process (and with every new jit
closure — each sweep lambda builds fresh train/eval steps). Pointing jax at
an on-disk cache makes recompiles of identical programs near-instant across
lambdas, processes, and rounds. The cache directory is host/toolchain
specific and git-ignored.
"""

from __future__ import annotations

import logging
import os

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def enable_compile_cache(cache_dir: str | None = None) -> None:
    """Idempotent; safe to call before or after backend init."""
    import jax

    path = cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                       _DEFAULT_DIR)
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception as e:  # never let caching break the run
        logging.getLogger(__name__).warning(
            "persistent compile cache unavailable (%s)", e)
