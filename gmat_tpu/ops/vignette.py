"""vignette — natural lens vignetting (make or reverse).

Rebuild of ffmpeg's `libavfilter/vf_vignette.c`:
- factor map (update_context :146-188): per-luma-pixel
  f = cos^4(angle * dnorm) with dnorm = hypot((int)((x-x0)*xscale),
  (int)((y-y0)*yscale)) / dmax (note the INT truncation of the scaled
  offsets), 0 beyond the circle, reciprocal in backward mode, stored to
  float32 like the C's fmap.
- application (filter_frame :246-276): luma dst = clip_u8(fmap[x]*src
  + dither), chroma dst = clip_u8(fmap[x<<hsub]*(src-127) + 127 +
  dither) sampling the luma map at subsample-even positions; the +127
  happens in FLOAT (the C expression is float until the double dither
  joins).
- dither (get_dither_value :190-198): one LCG draw per pixel
  (state*1664525 + 1013904223), value = state/2^32 BEFORE the update,
  scanned plane-by-plane within the frame with state persisting across
  frames.

TPU-first formulation: the per-pixel LCG is jumped in closed form —
state_k = A_k*s0 + C_k (mod 2^32) with static per-geometry A/C vectors
(wrapped cumprod/cumsum), so only the per-frame 32-bit seeds cross the
tunnel; fmap and A/C are device-resident jit arguments (never HLO
constants), and per-plane slices of A/C are static slices of those
arguments.  The float->int conversion of the backward mode's inf/nan*0
pixels reproduces x86-64 cvttsd2si (INT_MIN -> clipped 0) like the
repo's vf_lut lane; the dither sum runs under a scoped jax.enable_x64
because a float32 dither could flip truncation boundaries.
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

import jax
import jax.numpy as jnp

_LCG_A = 1664525
_LCG_C = 1013904223

_JUMP_CACHE: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}


def lcg_jump_tables(n: int):
    """(A, C) uint32 vectors with state_k = A[k]*s0 + C[k] (mod 2^32)
    for the k-th draw of the LCG (k in [0, n))."""
    t = _JUMP_CACHE.get(n)
    if t is not None:
        return t
    A = np.empty(n, np.uint32)
    A[0] = 1
    if n > 1:
        A[1:] = np.cumprod(np.full(n - 1, _LCG_A, np.uint32),
                           dtype=np.uint32)
    S = np.zeros(n, np.uint32)           # sum_{j<k} A_j, wrapped
    if n > 1:
        S[1:] = np.cumsum(A[:n - 1], dtype=np.uint32)
    C = (np.uint32(_LCG_C) * S).astype(np.uint32)
    _JUMP_CACHE[n] = (A, C)
    return A, C


def lcg_after(s0: int, n: int) -> int:
    """State after n draws (host bookkeeping across frames)."""
    a, c = 1, 0
    base_a, base_c = _LCG_A, _LCG_C
    k = n
    while k:
        if k & 1:
            a = (a * base_a) & 0xFFFFFFFF
            c = (c * base_a + base_c) & 0xFFFFFFFF
        base_c = (base_c * base_a + base_c) & 0xFFFFFFFF
        base_a = (base_a * base_a) & 0xFFFFFFFF
        k >>= 1
    return (a * s0 + c) & 0xFFFFFFFF


def natural_fmap(w: int, h: int, x0: float, y0: float, xscale: float,
                 yscale: float, angle: float, backward: bool) -> np.ndarray:
    """The float32 factor map (update_context :146-188)."""
    xx = ((np.arange(w, dtype=np.float64) - x0)
          * np.float32(xscale)).astype(np.int64)
    yy = ((np.arange(h, dtype=np.float64) - y0)
          * np.float32(yscale)).astype(np.int64)
    dmax = np.hypot(w / 2.0, h / 2.0)
    dnorm = np.hypot(xx[None, :].astype(np.float64),
                     yy[:, None].astype(np.float64)) / dmax
    c = np.cos(angle * dnorm)
    f = (c * c) * (c * c)
    f = np.where(dnorm > 1.0, 0.0, f)
    if backward:
        with np.errstate(divide="ignore"):
            f = 1.0 / f
    return f.astype(np.float32)


def apply_vignette(planes, fmap: jnp.ndarray, A: jnp.ndarray,
                   C: jnp.ndarray, seeds: jnp.ndarray, offsets,
                   do_dither: bool, subs):
    """One batch: `planes` list of (N, ph, pw) uint8; fmap (h, w) f32
    DEVICE array; A/C flat per-frame-pixel jump tables (device args);
    seeds (N,) uint32 per-frame dither states; offsets[p] = pixel
    offset of plane p within a frame's dither stream; subs[p] =
    (hsub, vsub)."""
    outs = []
    for p, plane in enumerate(planes):
        n, ph, pw = plane.shape
        hsub, vsub = subs[p]
        fm = fmap[:: 1 << vsub][:ph, :: 1 << hsub][:, :pw]
        chroma = p in (1, 2)
        src = plane.astype(jnp.float32)
        if chroma:
            # float until the double dither joins (+127 in FLOAT)
            val = fm[None] * (src - jnp.float32(127.0)) \
                + jnp.float32(127.0)
        else:
            val = fm[None] * src
        with jax.enable_x64():
            acc = val.astype(jnp.float64)
            if do_dither:
                o = offsets[p]
                a_k = jax.lax.slice(A, (o,), (o + ph * pw,)) \
                    .astype(jnp.uint64)
                c_k = jax.lax.slice(C, (o,), (o + ph * pw,)) \
                    .astype(jnp.uint64)
                st = (a_k[None, :] * seeds.astype(jnp.uint64)[:, None]
                      + c_k[None, :]) & jnp.uint64(0xFFFFFFFF)
                dv = st.astype(jnp.float64) / jnp.float64(2.0 ** 32)
                acc = acc + dv.reshape(n, ph, pw)
            # double -> int: cvttsd2si saturates inf/nan/overflow to
            # INT_MIN, which av_clip_uint8 turns into 0 (the backward
            # mode's beyond-the-circle border)
            big = jnp.float64(2 ** 31)
            iv = jnp.where(jnp.isfinite(acc) & (acc > -big) & (acc < big),
                           acc.astype(jnp.int64),
                           jnp.int64(-(2 ** 31)))
            out = jnp.clip(iv, 0, 255).astype(plane.dtype)
        outs.append(out)
    return outs
