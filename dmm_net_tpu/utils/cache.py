"""Persistent XLA compilation cache setup.

Solver scans and the full train step compile slowly (minutes on small
hosts); caching compiled executables across processes makes reruns fast.
Called by every CLI entry point and the test conftest.
"""

from __future__ import annotations

import os

import jax

DEFAULT_CACHE_DIR = os.environ.get(
    "DMM_COMPILATION_CACHE", os.path.join(os.path.dirname(__file__),
                                          "..", "..", ".jax_cache"))


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    d = os.path.abspath(cache_dir or DEFAULT_CACHE_DIR)
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
