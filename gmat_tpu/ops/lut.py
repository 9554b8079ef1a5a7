"""Fast exact LUT application.

On TPU, a per-pixel table gather (jnp.take) runs on the VPU's scalar
gather path at ~150 MP/s — measured 7.2 ms/frame for a 720p batch,
which made one attached `eq` filter 170x slower than the whole fused
decode ladder (BENCHMARKS.md "filter-heavy graphs").  Reformulated as a
one-hot MXU matmul the same table lookup is EXACT (each one-hot row
has a single nonzero product, so the f32/bf16 sum is one exact integer
product) and ~14x faster (0.52 ms/frame measured).  Off-TPU the gather
wins, so the helper dispatches on backend.

Used by every 256/1024-entry per-channel table filter (eq, lut/lutyuv/
lutrgb, curves, fade's alpha LUTs, monochrome, hue's brightness LUTs).
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def apply_lut(x: jnp.ndarray, lut) -> jnp.ndarray:
    """Return lut[x] exactly.  `x`: integer array (u8/u16/i32 indices,
    all in range); `lut`: 1-D table (numpy or jnp), <= 8192 entries for
    the MXU path (noise's 5120-entry grain table is the largest user)."""
    tab = lut if hasattr(lut, "shape") else np.asarray(lut)
    n = tab.shape[0]
    if jax.default_backend() == "tpu" and n <= 8192 and tab.ndim == 1:
        # integer tables up to 2^24 are exact in f32; u8-range tables
        # (<= 256, needing 8 mantissa bits) ride bf16 at 2x MXU rate
        if isinstance(tab, np.ndarray) and \
                np.issubdtype(tab.dtype, np.integer) and \
                0 <= int(tab.min()) and int(tab.max()) <= 255:
            acc_dt = jnp.bfloat16
        else:
            acc_dt = jnp.float32
        oh = jax.nn.one_hot(x.astype(jnp.int32), n, dtype=acc_dt)
        out = jnp.einsum("...k,k->...", oh,
                         jnp.asarray(tab).astype(acc_dt))
        dt = tab.dtype if isinstance(tab, np.ndarray) else tab.dtype
        return out.astype(dt)
    return jnp.take(jnp.asarray(tab), x.astype(jnp.int32))
