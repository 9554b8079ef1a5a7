"""Smoothing filters: gaussian and median blur.

TPU rebuild of smooth_nvcv (libavfilter/vf_smooth_nvcv.c:88-103 — options
type/kw/kh/border_type/sigmaX/sigmaY backed by cvcudaGaussian /
cvcudaMedianBlur).

Gaussian is separable and linear, so it rides the same two-matmul machinery
as resize (banded operator matrices on the MXU with border handling baked
into the rows).  Median uses jax.lax reductions over the stacked window —
pure VPU work that XLA fuses; windows are static shapes.
"""
from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core import formats as F
from ..core.frame import FrameBatch

BORDERS = ("constant", "replicate", "reflect", "wrap", "reflect101")


def gaussian_kernel1d(ksize: int, sigma: float = 0.0) -> np.ndarray:
    """OpenCV getGaussianKernel semantics: sigma<=0 derives it from ksize."""
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    x = np.arange(ksize, dtype=np.float64) - (ksize - 1) / 2.0
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return (k / k.sum()).astype(np.float32)


def _border_index(i: np.ndarray, n: int, border: str) -> np.ndarray:
    if border == "replicate":
        return np.clip(i, 0, n - 1)
    if border == "reflect":        # fedcba|abcdefgh|hgfedcb
        i = np.abs(i + 0.5) - 0.5
        period = 2 * n
        i = np.mod(i, period)
        return np.where(i >= n, period - 1 - i, i).astype(int)
    if border == "reflect101":     # gfedcb|abcdefgh|gfedcba
        if n == 1:
            return np.zeros_like(i)
        period = 2 * (n - 1)
        i = np.mod(np.abs(i), period)
        return np.where(i >= n, period - i, i).astype(int)
    if border == "wrap":
        return np.mod(i, n)
    raise ValueError(border)


@lru_cache(maxsize=256)
def _gaussian_matrix(n: int, ksize: int, sigma: float, border: str) -> np.ndarray:
    """(n, n) banded operator with border policy baked in."""
    k = gaussian_kernel1d(ksize, sigma).astype(np.float64)
    A = np.zeros((n, n), np.float64)
    half = (ksize - 1) // 2
    for o in range(n):
        idx = np.arange(o - half, o - half + ksize)
        if border == "constant":
            m = (idx >= 0) & (idx < n)
            np.add.at(A[o], idx[m], k[m])
        else:
            np.add.at(A[o], _border_index(idx, n, border), k)
    return A.astype(np.float32)


def gaussian_blur_plane(x: jax.Array, kw: int = 3, kh: int = 3,
                        sigma_x: float = 0.0, sigma_y: float = 0.0,
                        border: str = "reflect101") -> jax.Array:
    """(N,H,W[,C]) float gaussian blur as two banded matmuls."""
    h, w = x.shape[1], x.shape[2]
    Ah = jnp.asarray(_gaussian_matrix(h, kh, float(sigma_y), border))
    Aw = jnp.asarray(_gaussian_matrix(w, kw, float(sigma_x), border))
    from .resize import PRECISION
    xf = x.astype(jnp.float32)
    ein = partial(jnp.einsum, preferred_element_type=jnp.float32,
                  precision=PRECISION)
    if x.ndim == 3:
        y = ein("oh,nhw->now", Ah, xf)
        return ein("now,pw->nop", y, Aw)
    y = ein("oh,nhwc->nowc", Ah, xf)
    return ein("nowc,pw->nopc", y, Aw)


def median_blur_plane(x: jax.Array, kw: int = 3, kh: int = 3) -> jax.Array:
    """(N,H,W[,C]) median over a kh x kw window (replicate border,
    matching CV-CUDA MedianBlur)."""
    half_h, half_w = (kh - 1) // 2, (kw - 1) // 2
    pad = [(0, 0), (half_h, kh - 1 - half_h), (half_w, kw - 1 - half_w)]
    if x.ndim == 4:
        pad.append((0, 0))
    xp = jnp.pad(x, pad, mode="edge")
    h, w = x.shape[1], x.shape[2]
    wins = [xp[:, dy:dy + h, dx:dx + w] for dy in range(kh) for dx in range(kw)]
    stack = jnp.stack(wins, axis=-1)
    k = kh * kw
    srt = jnp.sort(stack, axis=-1)
    if k % 2:
        return srt[..., k // 2]
    return (srt[..., k // 2 - 1].astype(jnp.float32) +
            srt[..., k // 2].astype(jnp.float32)) / 2.0


def smooth(fb: FrameBatch, type: str = "gaussian", kw: int = 3, kh: int = 3,
           border_type: str = "constant", sigmaX: float = 0.0,
           sigmaY: float = 0.0) -> FrameBatch:
    """Filter-level entry matching smooth_nvcv option names."""
    fmt = fb.fmt
    planes = {}
    for p in fmt.planes:
        x = fb.planes[p.name]
        if type == "gaussian":
            y = gaussian_blur_plane(x, kw, kh, sigmaX, sigmaY, border_type)
        elif type == "median":
            y = median_blur_plane(x, kw, kh)
        else:
            raise ValueError(f"smooth type {type!r} (gaussian|median)")
        if not fmt.is_float:
            y = jnp.clip(jnp.round(y.astype(jnp.float32)), 0, F.max_value(fmt))
        planes[p.name] = y.astype(fmt.planes[0].dtype)
    return fb.with_planes(planes)
