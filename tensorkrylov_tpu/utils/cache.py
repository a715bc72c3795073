"""Persistent XLA compilation cache helper.

Remote-compiled TPU programs here take minutes to build; enabling the
persistent cache makes re-runs (benchmarks, experiments, resumed jobs)
start in seconds.
"""
from __future__ import annotations

import os

import jax

__all__ = ["enable_compilation_cache"]

DEFAULT_DIR = os.path.expanduser("~/.cache/jax_comp")


def enable_compilation_cache(path: str = DEFAULT_DIR, min_compile_secs: float = 1.0) -> str:
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", min_compile_secs)
    return path
