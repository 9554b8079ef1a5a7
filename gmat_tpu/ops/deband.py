"""deband — banding-artifact remover (vf_deband.c analog).

Per-pixel 4-reference sampling at a static pseudo-random offset field
(frand(x, y) = fract(sinf(x*12.9898 + y*78.233) * 43758.545), the
shadertoy hash the C uses, vf_deband.c:113-118), averaged and selected
against per-plane thresholds (:129-176 deband_8_c / :300-358
deband_16_c; coupling variants :179-298).

The offset table is built once per (W, H, range, direction) in float32
numpy.  Note: the C's table depends on the platform libm's sinf (a
huge-argument sine), so table values are NOT portable across libms —
the C itself produces different offsets on different builds.  Our
float32 numpy transcription is one such legitimate instantiation; the
per-pixel filter math downstream of the table is exact.

Chroma planes index the LUMA-width table at pos = y*planewidth[0] + x
with chroma coordinates (:151-152) — reproduced by slicing the luma
table to the plane's dimensions.
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

import jax
import jax.numpy as jnp

_TABLE_CACHE: Dict[Tuple, Tuple[np.ndarray, np.ndarray]] = {}


def offset_table(w: int, h: int, rng: int, direction: float):
    """(x_pos, y_pos) int32 (h, w) tables (config_input :396-403)."""
    key = (w, h, rng, float(direction))
    tab = _TABLE_CACHE.get(key)
    if tab is not None:
        return tab
    f32 = np.float32
    x = np.arange(w, dtype=np.float32)[None, :]
    y = np.arange(h, dtype=np.float32)[:, None]
    arg = (x * f32(12.9898) + y * f32(78.233)).astype(np.float32)
    r = (np.sin(arg, dtype=np.float32) * f32(43758.545)).astype(np.float32)
    r = (r - np.floor(r)).astype(np.float32)
    d = f32(direction)
    dir_ = np.full_like(r, -d) if direction < 0 else (r * d)
    dist = (np.full_like(r, -rng) if rng < 0
            else (r * f32(rng))).astype(np.int32)   # C int trunc
    x_pos = (np.cos(dir_, dtype=np.float32)
             * dist.astype(np.float32)).astype(np.int32)
    y_pos = (np.sin(dir_, dtype=np.float32)
             * dist.astype(np.float32)).astype(np.int32)
    _TABLE_CACHE[key] = (x_pos, y_pos)
    return x_pos, y_pos


def _refs(plane: jnp.ndarray, x_pos: jnp.ndarray, y_pos: jnp.ndarray):
    """The four clipped reference samples (±y_pos, ±x_pos) per pixel;
    plane (N, h, w) -> four (N, h, w) int32 arrays.

    x_pos/y_pos are DEVICE arrays passed as jit arguments — the (h, w)
    index maps must never bake into the compiled program as constants
    (a 1080p pair is ~16 MB of HLO constant; the remote-compile tunnel
    rejects requests past ~100 MB and uploads at ~30 MB/s)."""
    n, h, w = plane.shape
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    iyp = jnp.clip(yy + y_pos, 0, h - 1)
    iym = jnp.clip(yy - y_pos, 0, h - 1)
    ixp = jnp.clip(xx + x_pos, 0, w - 1)
    ixm = jnp.clip(xx - x_pos, 0, w - 1)
    flat = plane.reshape(n, h * w).astype(jnp.int32)

    def g(iy, ix):
        idx = (iy * w + ix).reshape(-1)
        return jnp.take(flat, idx, axis=1).reshape(n, h, w)

    return g(iyp, ixp), g(iym, ixp), g(iym, ixm), g(iyp, ixm)


def deband_plane(plane: jnp.ndarray, x_pos: jnp.ndarray, y_pos: jnp.ndarray,
                 thr: int, blur: bool) -> jnp.ndarray:
    """Uncoupled per-plane kernel (deband_8_c / deband_16_c)."""
    r0, r1, r2, r3 = _refs(plane, x_pos, y_pos)
    src = plane.astype(jnp.int32)
    avg = (r0 + r1 + r2 + r3) // 4
    if blur:
        cond = jnp.abs(src - avg) < thr
    else:
        cond = ((jnp.abs(src - r0) < thr) & (jnp.abs(src - r1) < thr)
                & (jnp.abs(src - r2) < thr) & (jnp.abs(src - r3) < thr))
    return jnp.where(cond, avg, src).astype(plane.dtype)


def deband_coupled(planes, x_pos, y_pos, thrs, blur: bool):
    """Coupling variant (444/RGB only): every plane must pass its
    threshold test for ANY plane to be replaced (:179-298)."""
    avgs, cmps, srcs = [], [], []
    for plane, thr in zip(planes, thrs):
        r0, r1, r2, r3 = _refs(plane, x_pos, y_pos)
        src = plane.astype(jnp.int32)
        avg = (r0 + r1 + r2 + r3) // 4
        if blur:
            cmp_ = jnp.abs(src - avg) < thr
        else:
            cmp_ = ((jnp.abs(src - r0) < thr) & (jnp.abs(src - r1) < thr)
                    & (jnp.abs(src - r2) < thr)
                    & (jnp.abs(src - r3) < thr))
        avgs.append(avg)
        cmps.append(cmp_)
        srcs.append(src)
    all_pass = cmps[0]
    for c in cmps[1:]:
        all_pass = all_pass & c
    return [jnp.where(all_pass, a, s).astype(p.dtype)
            for p, a, s in zip(planes, avgs, srcs)]
