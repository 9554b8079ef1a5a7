"""Persistent compilation cache — the .trtcache analog.

The reference compiles ONNX models once and persists engines as
<model>.trtcache (libavfilter/tensorrt.cpp:198-222,461-496).  The TPU
equivalent is JAX's persistent compilation cache: XLA programs (including
every Pallas kernel and jitted filter chain) are cached on disk and reused
across processes, turning the 20-40 s first-compile into a millisecond
cache hit.
"""
from __future__ import annotations

import os

import jax

DEFAULT_DIR = os.path.expanduser("~/.cache/gmat_tpu/xla")


def enable(cache_dir: str = DEFAULT_DIR, min_compile_time: float = 0.0):
    """Turn on the on-disk compilation cache for this process."""
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # 0.0: persist EVERY program — trivial programs compile fast on a
    # quiet tunnel but take minutes when it is contended (CLAUDE.md)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_time)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir
