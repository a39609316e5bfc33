"""Persistent XLA compilation cache for serving entry points.

Every process that builds the engine compiles dozens of programs (decode
blocks x length buckets, vocoder buckets, conditioning shapes). On rigs where
compilation goes through a remote compile service this dominates cold-start
by minutes; the persistent cache serializes compiled executables to disk so
only the first-ever boot pays. Library code never flips global JAX config on
import — entry points (server CLI, bench, tools) opt in explicitly.
"""
from __future__ import annotations

import os

from .logger import setup_logger

logger = setup_logger(__file__)

_DEFAULT_DIR = os.path.expanduser("~/.cache/auralis_tpu_xla")


def enable_persistent_compile_cache(cache_dir: str | None = None) -> bool:
    """Point JAX's compilation cache at `cache_dir` (created if absent).
    Returns False (with a log line) on backends that don't support
    executable serialization instead of raising."""
    import jax

    path = cache_dir or os.environ.get("AURALIS_XLA_CACHE_DIR", _DEFAULT_DIR)
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache everything: on remote-compile rigs even trivial programs
        # cost seconds, so the default min-compile-time filter is wrong here
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        logger.info("XLA compilation cache: %s", path)
        return True
    except Exception as e:  # pragma: no cover — backend without support
        logger.warning("persistent compile cache unavailable: %s", e)
        return False
