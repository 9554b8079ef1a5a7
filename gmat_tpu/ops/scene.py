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

# BT.601 luma weights — the reference scene SAD operates on true luma
# (scene_sad_cuda.cu:38-76 reads the Y plane); RGB batches reduce to it
_LUMA601 = (0.299, 0.587, 0.114)


def _score_view(fmt, planes: dict) -> dict:
    """Planes the SAD actually reads.  YUV batches pass through (the
    reference sums all planes).  RGB batches reduce to BT.601 luma at
    8-bit scale — NOT the old channel-0 proxy; >8-bit and float samples
    normalize to 0..255 so mafd uses bitdepth 8.

    The channel axis is detected from the ARRAY: csc produces
    channels-last for every RGB format (plane_shape is (h, w, c)), but
    direct constructors may hold 'planar' float batches as NCHW
    (FrameBatch.validate is opt-in) — keying on the format flag alone
    mis-read csc-produced rgbpf32 as NCHW and reduced image ROWS as
    channels."""
    if not fmt.is_rgb:
        return planes
    arr = planes["rgb"]
    nc = len(fmt.channel_order)
    ax = (arr.ndim - 1 if arr.shape[-1] == nc
          else arr.ndim - 3 if arr.ndim >= 3 and arr.shape[-3] == nc
          else arr.ndim - 1)
    idx = {c: i for i, c in enumerate(fmt.channel_order)}
    a = arr.astype(jnp.float32)
    y = (_LUMA601[0] * jnp.take(a, idx["r"], axis=ax)
         + _LUMA601[1] * jnp.take(a, idx["g"], axis=ax)
         + _LUMA601[2] * jnp.take(a, idx["b"], axis=ax))
    if fmt.is_float:
        y = y * 255.0
    elif fmt.bits > 8:
        y = y * (1.0 / (1 << (fmt.bits - 8)))
    return {"y601": y}


def score_depth(fmt) -> int:
    """Effective bit depth of the SAD input (RGB reduces to 8-bit luma)."""
    return 8 if fmt.is_rgb else fmt.bits


def _score_count(fmt, h: int, w: int) -> int:
    """Sample count the mafd normalizes by, matching _score_view."""
    if fmt.is_rgb:
        return h * w
    count = 0
    for p in fmt.planes:
        sh = fmt.plane_shape(p.name, h, w)
        count += sh[0] * sh[1] * (sh[2] if len(sh) > 2 else 1)
    return count


def batch_sad(fb: FrameBatch, prev_last: Optional[dict] = None) -> jax.Array:
    """(N,) sum-abs-diff between frame i and i-1 across the score planes
    (all YUV planes, or true luma for RGB batches).

    Element 0 compares against `prev_last` (the final frame of the previous
    batch, as a dict of RAW planes) or is 0 when there is no predecessor.
    """
    planes = _score_view(fb.fmt, fb.planes)
    prev = (_score_view(fb.fmt, prev_last)
            if prev_last is not None else None)
    total = None
    for name, arr in planes.items():
        a = (arr if arr.dtype.kind == "f"
             else arr.astype(jnp.int32)).astype(jnp.float32)
        cur = a
        if prev is not None:
            p = prev[name].astype(jnp.float32)
            if p.ndim == a.ndim - 1:
                p = p[None]
            prv = jnp.concatenate([p, a[:-1]], axis=0)
        else:
            prv = jnp.concatenate([a[:1], a[:-1]], axis=0)
        axes = tuple(range(1, a.ndim))
        # accumulate in f32: int32 overflows at 4K (3840*2160*255 > 2^31);
        # |diff| <= 65535 is exact in f32 and the sum's rounding error is
        # ~1e-7 relative, invisible in mafd
        s = jnp.sum(jnp.abs(cur - prv), axis=axes)
        total = s if total is None else total + s
    if prev_last is None:
        total = total.at[0].set(0)
    return total


def scene_scores(fb: FrameBatch, prev_last: Optional[dict] = None,
                 prev_mafd: float | jax.Array = 0.0,
                 bitdepth: int = 8) -> Tuple[jax.Array, jax.Array]:
    """Per-frame scene score (N,) plus the final mafd (carry for the next
    batch).  Exact select_cuda math."""
    score, mafd = scene_scores_mafd(fb, prev_last, prev_mafd, bitdepth)
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
    count = _score_count(fb.fmt, fb.height, fb.width)
    mafd = sad / count / (1 << (bitdepth - 8))
    prev = jnp.concatenate([jnp.asarray([prev_mafd], mafd.dtype), mafd[:-1]])
    diff = jnp.abs(mafd - prev)
    score = jnp.clip(jnp.minimum(mafd, diff) / 100.0, 0.0, 1.0)
    if prev_last is None:
        score = score.at[0].set(0.0)
    return score, mafd
