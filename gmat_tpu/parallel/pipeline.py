"""Multi-chip frame pipeline — SPMD scale-out over the ICI mesh.

Where the reference scales by N processes x `-gpu` ordinals
(AppSelect.cpp:49-56) / N sessions x host threads (AppMeTrans.cpp:342-344),
the TPU rebuild shards the frame batch across a data-parallel mesh axis:
hosts feed their local chips, every chip runs the same jitted ladder on
its shard, no cross-chip traffic in steady state (frames are
embarrassingly parallel).  The reserved "model" axis carries tensor-
parallel in-graph inference when a model outgrows one chip
(shard_sr_params in mesh.py).
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import numpy as np
from jax.sharding import Mesh

from ..core.frame import FrameBatch
from . import mesh as pm


class ShardedPipeline:
    """Runs `fn(FrameBatch) -> FrameBatch/array` data-parallel on a mesh.

    fn must be shape-preserving per frame (each chip processes its shard
    independently).  Batches are padded to a multiple of the data-axis
    size, uploaded sharded, and results gathered lazily.
    """

    def __init__(self, fn: Callable, mesh: Optional[Mesh] = None):
        self.mesh = mesh or pm.make_mesh()
        self.n_data = self.mesh.shape[pm.DATA_AXIS]
        self._fn = jax.jit(fn)

    def pad(self, n: int) -> int:
        return (self.n_data - n % self.n_data) % self.n_data

    def shard(self, fb: FrameBatch) -> FrameBatch:
        pad = self.pad(fb.batch)
        if pad:
            planes = {k: np.concatenate([np.asarray(v),
                                         np.repeat(np.asarray(v[-1:]), pad,
                                                   axis=0)])
                      for k, v in fb.planes.items()}
            fb = fb.with_planes(planes)
        return pm.shard_batch(fb, self.mesh)

    def __call__(self, fb: FrameBatch):
        with self.mesh:
            return self._fn(self.shard(fb))


def run_sharded(fn: Callable, fb: FrameBatch, mesh: Optional[Mesh] = None):
    """One-shot helper: shard -> jit(fn) -> device result, trimmed back
    to the ORIGINAL batch length (shard() pads ragged batches by
    repeating the last frame; a caller aggregating the raw result would
    silently count the phantom frames)."""
    n = fb.batch
    out = ShardedPipeline(fn, mesh)(fb)
    return jax.tree_util.tree_map(
        lambda a: a[:n] if hasattr(a, "shape") and a.ndim >= 1
        and a.shape[0] >= n else a, out)
