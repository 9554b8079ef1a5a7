"""Scene-change scoring — TPU rebuild of select_cuda's GPU SAD.

Reference: vf_select_cuda.c:308-358 (get_scene_score) + scene_sad_cuda.cu:
  sad   = sum over planes of |cur - prev|        (all planes, full res)
  mafd  = sad / total_pixel_count / 2^(bitdepth-8)
  diff  = |mafd - prev_mafd|
  score = clip(min(mafd, diff) / 100, 0, 1)

Here the whole decoded batch is scored in one jitted reduction: SAD between
consecutive frames is a batched jnp reduction (VPU work, HBM-bound), so a
GOP of frames is scored in a single pass instead of one kernel launch per
frame pair.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.frame import FrameBatch


def batch_sad(fb: FrameBatch, prev_last: Optional[dict] = None) -> jax.Array:
    """(N,) sum-abs-diff between frame i and i-1 across all planes.

    Element 0 compares against `prev_last` (the final frame of the previous
    batch, as a dict of planes) or is 0 when there is no predecessor.
    """
    total = None
    for name, arr in fb.planes.items():
        a = arr.astype(jnp.int32)
        cur = a
        if prev_last is not None:
            prv = jnp.concatenate([prev_last[name].astype(jnp.int32)[None],
                                   a[:-1]], axis=0)
        else:
            prv = jnp.concatenate([a[:1], a[:-1]], axis=0)
        axes = tuple(range(1, a.ndim))
        # accumulate in f32: int32 overflows at 4K (3840*2160*255 > 2^31);
        # |diff| <= 65535 is exact in f32 and the sum's rounding error is
        # ~1e-7 relative, invisible in mafd
        s = jnp.sum(jnp.abs(cur - prv).astype(jnp.float32), axis=axes)
        total = s if total is None else total + s
    if prev_last is None:
        total = total.at[0].set(0)
    return total


def scene_scores(fb: FrameBatch, prev_last: Optional[dict] = None,
                 prev_mafd: float | jax.Array = 0.0,
                 bitdepth: int = 8) -> Tuple[jax.Array, jax.Array]:
    """Per-frame scene score (N,) plus the final mafd (carry for the next
    batch).  Exact select_cuda math."""
    sad = batch_sad(fb, prev_last).astype(jnp.float64
                                          if jax.config.jax_enable_x64
                                          else jnp.float32)
    count = 0
    for p in fb.fmt.planes:
        sh = fb.fmt.plane_shape(p.name, fb.height, fb.width)
        count += sh[0] * sh[1] * (sh[2] if len(sh) > 2 else 1)
    mafd = sad / count / (1 << (bitdepth - 8))
    prev = jnp.concatenate([jnp.asarray([prev_mafd], mafd.dtype), mafd[:-1]])
    diff = jnp.abs(mafd - prev)
    score = jnp.clip(jnp.minimum(mafd, diff) / 100.0, 0.0, 1.0)
    if prev_last is None:
        # first frame of the stream has no predecessor: score 0 like the
        # reference (prev_picref == NULL -> ret 0)
        score = score.at[0].set(0.0)
    return score, mafd[-1]


def scene_scores_mafd(fb: FrameBatch, prev_last: Optional[dict] = None,
                      prev_mafd: float | jax.Array = 0.0,
                      bitdepth: int = 8):
    """Like scene_scores but also returns the full per-frame mafd array —
    callers scoring a padded batch need the carry at the last REAL frame,
    not at the padded tail (a duplicate frame's mafd is 0)."""
    sad = batch_sad(fb, prev_last).astype(jnp.float64
                                          if jax.config.jax_enable_x64
                                          else jnp.float32)
    count = 0
    for p in fb.fmt.planes:
        sh = fb.fmt.plane_shape(p.name, fb.height, fb.width)
        count += sh[0] * sh[1] * (sh[2] if len(sh) > 2 else 1)
    mafd = sad / count / (1 << (bitdepth - 8))
    prev = jnp.concatenate([jnp.asarray([prev_mafd], mafd.dtype), mafd[:-1]])
    diff = jnp.abs(mafd - prev)
    score = jnp.clip(jnp.minimum(mafd, diff) / 100.0, 0.0, 1.0)
    if prev_last is None:
        score = score.at[0].set(0.0)
    return score, mafd
