"""eq filter — brightness/contrast/saturation/gamma on planar YUV.

Rebuilds ffmpeg's vf_eq.c (the upstream filter GMAT-style transcode
ladders pair with scale/crop): per-plane 256-entry LUTs with vf_eq.c's
exact math (create_lut, vf_eq.c:37-60) —
    v = contrast * (i/255 - 0.5) + 0.5 + brightness
    v <= 0 -> 0;  else v = v*(1-gw) + v^(1/gamma)*gw;  v >= 1 -> 255
    else floor(256*v)                       (the C uint8 truncation)
Parameter plumbing follows vf_eq.c:95-135: luma gets contrast/brightness
and gamma*gamma_g; chroma planes get contrast=saturation and gammas
sqrt(gamma_b/gamma_g) (U) / sqrt(gamma_r/gamma_g) (V).

TPU-first: the LUT applies as one 256-gather per plane (jnp.take), which
XLA fuses with neighboring ops — no per-pixel host loop.
"""
from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from ..core.frame import FrameBatch


def _clipf(v, lo, hi):
    return min(max(float(v), lo), hi)


def _lut(contrast: float, brightness: float, gamma: float,
         gamma_weight: float) -> np.ndarray:
    i = np.arange(256, dtype=np.float64) / 255.0
    v = contrast * (i - 0.5) + 0.5 + brightness
    out = np.zeros(256, np.float64)
    pos = v > 0.0
    vp = v[pos]
    g = 1.0 / gamma
    vv = vp * (1.0 - gamma_weight) + np.power(vp, g) * gamma_weight
    out[pos] = np.where(vv >= 1.0, 255.0, np.floor(256.0 * vv))
    return np.clip(out, 0, 255).astype(np.uint8)


def _identity(contrast: float, brightness: float, gamma: float) -> bool:
    # vf_eq check_values: the plane is skipped entirely when nothing acts
    return contrast == 1.0 and brightness == 0.0 and gamma == 1.0


def eq(fb: FrameBatch, contrast: float = 1.0, brightness: float = 0.0,
       saturation: float = 1.0, gamma: float = 1.0, gamma_r: float = 1.0,
       gamma_g: float = 1.0, gamma_b: float = 1.0,
       gamma_weight: float = 1.0) -> FrameBatch:
    """Apply vf_eq adjustments; clips match the AVOption ranges
    (contrast [-1000,1000], brightness [-1,1], saturation [0,3],
    gammas [0.1,10], gamma_weight [0,1])."""
    fmt = fb.fmt
    if not fmt.is_yuv or fmt.bits != 8:
        raise ValueError("eq operates on 8-bit planar YUV (vf_eq.c "
                         "pixel_fmts_eq); convert first")
    contrast = _clipf(contrast, -1000.0, 1000.0)
    brightness = _clipf(brightness, -1.0, 1.0)
    saturation = _clipf(saturation, 0.0, 3.0)
    gamma = _clipf(gamma, 0.1, 10.0)
    gamma_r = _clipf(gamma_r, 0.1, 10.0)
    gamma_g = _clipf(gamma_g, 0.1, 10.0)
    gamma_b = _clipf(gamma_b, 0.1, 10.0)
    gamma_weight = _clipf(gamma_weight, 0.0, 1.0)

    # vf_eq.c:113-135 per-plane parameterization
    params = {
        "y": (contrast, brightness, gamma * gamma_g),
        "u": (saturation, 0.0, math.sqrt(gamma_b / gamma_g)),
        "v": (saturation, 0.0, math.sqrt(gamma_r / gamma_g)),
    }
    planes = {}
    for name, arr in fb.planes.items():
        c, b, g = params.get(name, (1.0, 0.0, 1.0))
        if _identity(c, b, g):
            planes[name] = arr
            continue
        lut = jnp.asarray(_lut(c, b, g, gamma_weight))
        planes[name] = jnp.take(lut, arr)
    return fb.with_planes(planes)


# ---- lut / lutyuv / lutrgb --------------------------------------------------

def apply_luts(fb: FrameBatch, luts) -> FrameBatch:
    """Apply per-component lookup tables (vf_lut.c's draw path as one
    gather per plane — the TPU analog of its per-slice pixel loops).

    `luts` maps plane name -> numpy table: shape (size,) for
    single-channel planes, (C, size) for packed planes (C = channel
    count).  Identity tables are skipped entirely so untouched planes
    alias the input arrays (vf_lut applies them anyway; skipping is
    observationally identical and lets XLA drop the op)."""
    planes = dict(fb.planes)
    for name, tab in luts.items():
        arr = fb.planes[name]
        tab = np.asarray(tab)
        if tab.ndim == 1:
            if np.array_equal(tab, np.arange(tab.size, dtype=tab.dtype)):
                continue
            planes[name] = jnp.take(jnp.asarray(tab), arr)
        else:
            ident = np.arange(tab.shape[1], dtype=tab.dtype)
            chans = []
            for c in range(tab.shape[0]):
                ch = arr[..., c]
                if np.array_equal(tab[c], ident):
                    chans.append(ch)
                else:
                    chans.append(jnp.take(jnp.asarray(tab[c]), ch))
            planes[name] = jnp.stack(chans, axis=-1)
    return fb.with_planes(planes)
