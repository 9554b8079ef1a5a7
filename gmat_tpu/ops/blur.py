"""boxblur + gblur cores — TPU rebuilds of the upstream blur family.

boxblur (ffmpeg-gpu/libavfilter/vf_boxblur.c + boxblur.c):
  The C slides a running sum along each row/column (BLUR macro,
  vf_boxblur.c:126-153): window sums with HALF-SAMPLE mirrored edges,
  scaled by the rounded fixed-point reciprocal
  ``inv = ((1<<16) + len/2) / len`` and emitted as ``(sum*inv +
  (1<<15)) >> 16`` with the destination store truncating to the sample
  width.  Because every step is linear in exact integers, the running
  sum vectorizes to a cumsum-difference window sum — bit-identical,
  including the C's int32 two's-complement wraparound (XLA int32 mul
  wraps; gcc's signed overflow behaves the same in practice) and the
  low-bits store.  One fused XLA program per (plane shape, radius).

gblur (ffmpeg-gpu/libavfilter/vf_gblur.c + vf_gblur_init.h):
  Young-van-Vliet style recursive gaussian: per plane, ``steps``
  forward+backward first-order IIR passes along rows then columns in
  float32 (horiz_slice_c/do_vertical_columns), boundary poles scaled by
  ``boundaryscale``, then one postscale multiply + clip + lrintf.
  set_params (vf_gblur.c:201-209) is evaluated in float64 and truncated
  to float32 exactly like the C's double-math-into-float-fields.  The
  sequential recurrences map to lax.scan carrying a whole row/column
  front per step — batch and the perpendicular axis stay vectorized.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# boxblur


def _box_line(x: jnp.ndarray, radius: int, axis: int,
              mask: int) -> jnp.ndarray:
    """Exact BLUR() over one axis of an int32 array (vf_boxblur.c:126-153).

    Window sums use half-sample mirrored edges (src[-k] == src[k-1],
    src[len-1+k] == src[len-k]); the fixed-point scale reproduces the
    C's int arithmetic including wraparound, and `mask` reproduces the
    uint8/uint16 destination store.
    """
    if radius == 0:
        return x
    length = 2 * radius + 1
    inv = ((1 << 16) + length // 2) // length
    pad = [(0, 0)] * x.ndim
    pad[axis] = (radius, radius)
    xp = jnp.pad(x, pad, mode="symmetric")
    c = jnp.cumsum(xp, axis=axis, dtype=jnp.int32)
    # window[i] = sum(xp[i .. i+2r]) = c[i+2r] - c[i-1]
    n = x.shape[axis]
    hi = jax.lax.slice_in_dim(c, 2 * radius, 2 * radius + n, axis=axis)
    lo = jax.lax.slice_in_dim(c, 0, n, axis=axis)
    first = jax.lax.slice_in_dim(xp, 0, n, axis=axis)
    win = hi - lo + first
    out = (win * jnp.int32(inv) + jnp.int32(1 << 15)) >> 16
    return out & mask


def box_blur_plane(plane: jnp.ndarray, radius: int, power: int) -> jnp.ndarray:
    """hblur then vblur with `power` box passes each (vf_boxblur.c:
    blur_power/hblur/vblur, filter_frame:243-254).  (N, H, W) u8/u16."""
    dt = plane.dtype
    mask = 0xffff if dt == jnp.uint16 else 0xff
    x = plane.astype(jnp.int32)
    if radius and power:
        for _ in range(power):
            x = _box_line(x, radius, axis=2, mask=mask)
        for _ in range(power):
            x = _box_line(x, radius, axis=1, mask=mask)
    return x.astype(dt)


# ---------------------------------------------------------------------------
# gblur


def gblur_params(sigma: float, steps: int):
    """set_params (vf_gblur.c:201-209): double math, float storage."""
    lam = (sigma * sigma) / (2.0 * steps)
    dnu = (1.0 + 2.0 * lam - math.sqrt(1.0 + 4.0 * lam)) / (2.0 * lam)
    postscale = math.pow(dnu / lam, steps)
    boundaryscale = 1.0 / (1.0 - dnu)
    return (np.float32(postscale), np.float32(boundaryscale),
            np.float32(dnu))


def _iir_axis(x: jnp.ndarray, nu, bscale, steps: int,
              axis: int) -> jnp.ndarray:
    """`steps` forward+backward IIR passes along `axis` in float32,
    exactly horiz_slice_c / do_vertical_columns (vf_gblur_init.h:45-95):
    scale the first element by bscale, accumulate forwards, scale the
    last, accumulate backwards."""
    moved = jnp.moveaxis(x, axis, 0)          # (L, ...) scan axis first
    nu = jnp.float32(nu)
    bscale = jnp.float32(bscale)

    def fwd(carry, row):
        v = row + nu * carry
        return v, v

    def bwd(carry, row):
        v = row + nu * carry
        return v, v

    for _ in range(steps):
        head = moved[0] * bscale
        _, rest = jax.lax.scan(fwd, head, moved[1:])
        moved = jnp.concatenate([head[None], rest])
        tail = moved[-1] * bscale
        _, rest = jax.lax.scan(bwd, tail, moved[:-1], reverse=True)
        moved = jnp.concatenate([rest, tail[None]])
    return jnp.moveaxis(moved, 0, axis)


def gblur_plane(plane: jnp.ndarray, sigma: float, sigma_v: float,
                steps: int, maxv: float) -> jnp.ndarray:
    """One plane (N, H, W): horizontal IIR steps, vertical IIR steps,
    postscale+clip+lrintf (vf_gblur.c filter_frame:216-296).  `maxv` is
    (1<<depth)-1 for integer samples (the postscale_c clip bound);
    float samples clip to ±FLT_MAX i.e. not at all."""
    dt = plane.dtype
    is_float = jnp.issubdtype(dt, jnp.floating)
    x = plane.astype(jnp.float32)
    psH, bsH, nuH = gblur_params(sigma, steps)
    psV, bsV, nuV = gblur_params(sigma_v, steps)
    x = _iir_axis(x, nuH, bsH, steps, axis=2)
    x = _iir_axis(x, nuV, bsV, steps, axis=1)
    x = x * (psH * psV)
    if is_float:
        return x.astype(dt)
    x = jnp.clip(x, 0.0, maxv)
    return jnp.rint(x).astype(dt)
