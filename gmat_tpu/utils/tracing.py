"""Tracing/profiling — the NVTX + Nsight analog for TPU.

The reference injects NVTX ranges from Python for Nsight
(metrans/python/app_extract.py:5-8,24-29 'Frame#n' ranges).  Here the same
API maps onto jax.profiler TraceAnnotations and xprof traces:

    with trace_range(f"Frame#{i}"):
        out = pipeline(batch)

    start_trace("/tmp/gmat_trace"); ... ; stop_trace()   # xprof dump
"""
from __future__ import annotations

import contextlib
import functools
import time
from typing import Iterator

import jax


@contextlib.contextmanager
def trace_range(name: str) -> Iterator[None]:
    """NVTX push/pop analog (shows up in xprof timelines)."""
    with jax.profiler.TraceAnnotation(name):
        yield


def annotate_fn(name: str):
    """Decorator version for hot functions."""
    def deco(fn):
        @functools.wraps(fn)
        def wrapped(*a, **kw):
            with jax.profiler.TraceAnnotation(name):
                return fn(*a, **kw)
        return wrapped
    return deco


_active = False


def start_trace(logdir: str) -> None:
    global _active
    jax.profiler.start_trace(logdir)
    _active = True


def stop_trace() -> None:
    global _active
    if _active:
        jax.profiler.stop_trace()
        _active = False


@contextlib.contextmanager
def device_timer(label: str = "", sync=None):
    """Wall-clock a device region — the StopWatch analog (NvCommon.h:209)
    with a RELIABLE device sync.

    Pass a zero-arg callable returning the region's output via `sync`
    (a pre-existing array value also works for re-timing it); the timer
    synchronizes by reading ONE scalar back to host, which is
    the only dependable barrier on the tunneled runtime
    (block_until_ready can return early there; see CLAUDE.md).  Without
    `sync` there is nothing to wait on and 'seconds' measures dispatch
    time only — 'sync_missing' is set so callers can't misread it.
    """
    import numpy as np

    out = {"label": label, "seconds": None}
    t0 = time.perf_counter()
    try:
        yield out
    finally:
        if sync is not None:
            val = sync() if callable(sync) else sync
            leaf = jax.tree_util.tree_leaves(val)
            if leaf:
                float(np.asarray(leaf[0]).ravel()[0])  # real host barrier
            else:
                # a sync that yields an EMPTY pytree (lambda: None)
                # provides no barrier: flag it like the missing case so
                # dispatch-only time can't be misread as synced
                out["sync_missing"] = True
        else:
            out["sync_missing"] = True
        out["seconds"] = time.perf_counter() - t0
