"""Smoothing filters: gaussian and median blur.

TPU rebuild of smooth_nvcv (libavfilter/vf_smooth_nvcv.c:88-103 — options
type/kw/kh/border_type/sigmaX/sigmaY backed by cvcudaGaussian /
cvcudaMedianBlur).

Gaussian is separable: two shifted-add 1-D convolutions (exact f32, VPU
work that XLA fuses; O(K·N), unlike a banded-matmul form which would be
O(N^2) at 1080p).  Median uses sorted reductions over the stacked window;
all windows are static shapes.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from ..core import formats as F
from ..core.frame import FrameBatch

BORDERS = ("constant", "replicate", "reflect", "wrap", "reflect101")


# OpenCV getGaussianKernel's fixed small-kernel table (used when
# sigma<=0 and ksize<=7): binomial coefficients, not the formula
_CV_FIXED = {
    1: np.array([1.0]),
    3: np.array([0.25, 0.5, 0.25]),
    5: np.array([0.0625, 0.25, 0.375, 0.25, 0.0625]),
    7: np.array([0.03125, 0.109375, 0.21875, 0.28125,
                 0.21875, 0.109375, 0.03125]),
}


def gaussian_kernel1d(ksize: int, sigma: float = 0.0) -> np.ndarray:
    """OpenCV getGaussianKernel semantics: sigma<=0 uses the fixed
    binomial table for ksize<=7, else derives sigma from ksize."""
    if sigma <= 0 and ksize in _CV_FIXED:
        return _CV_FIXED[ksize].astype(np.float32)
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    x = np.arange(ksize, dtype=np.float64) - (ksize - 1) / 2.0
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return (k / k.sum()).astype(np.float32)


def _pad_mode(border: str):
    if border not in BORDERS:
        raise ValueError(f"border_type must be one of {BORDERS}, "
                         f"got {border!r}")
    return {"constant": "constant", "replicate": "edge",
            "reflect": "symmetric", "reflect101": "reflect",
            "wrap": "wrap"}[border]


def _conv1d_axis(x: jax.Array, k: np.ndarray, axis: int, border: str):
    """Separable 1-D convolution as K shifted adds (exact f32, VPU-bound;
    the banded-matmul form would be O(H^2) at 1080p)."""
    ksize = len(k)
    half = (ksize - 1) // 2
    pad = [(0, 0)] * x.ndim
    pad[axis] = (half, ksize - 1 - half)
    xp = jnp.pad(x, pad, mode=_pad_mode(border))
    n = x.shape[axis]
    out = None
    for i in range(ksize):
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(i, i + n)
        term = xp[tuple(sl)] * float(k[i])
        out = term if out is None else out + term
    return out


def smooth_matrix(n: int, ksize: int, sigma: float = 0.0,
                  border: str = "reflect101") -> np.ndarray:
    """Dense (n, n) matrix form of the 1-D gaussian: G @ x ==
    _conv1d_axis(x, kernel, border) exactly (built from the padded
    identity, so border handling is bit-identical).  Used to precompose
    smoothing into the fused-ladder resample matrices
    (A' = G @ A — zero runtime cost; pallas_kernels._apply_post)."""
    k = gaussian_kernel1d(ksize, float(sigma)).astype(np.float32)
    half = (ksize - 1) // 2
    eye = np.eye(n, dtype=np.float32)
    pad = ((half, ksize - 1 - half), (0, 0))
    P = np.pad(eye, pad, mode=_pad_mode(border))
    G = np.zeros((n, n), np.float32)
    for i in range(ksize):
        G += float(k[i]) * P[i:i + n]
    return G


def gaussian_blur_plane(x: jax.Array, kw: int = 3, kh: int = 3,
                        sigma_x: float = 0.0, sigma_y: float = 0.0,
                        border: str = "reflect101") -> jax.Array:
    """(N,H,W[,C]) float gaussian blur, separable shifted-add conv."""
    kx = gaussian_kernel1d(kw, float(sigma_x))
    ky = gaussian_kernel1d(kh, float(sigma_y))
    xf = x.astype(jnp.float32)
    y = _conv1d_axis(xf, ky, 1, border)
    return _conv1d_axis(y, kx, 2, border)


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
    if kw < 1 or kh < 1 or kw % 2 == 0 or kh % 2 == 0:
        # OpenCV/CV-CUDA reject even sizes; an even anchor would shift
        # the whole image half a pixel silently
        raise ValueError(f"smooth kernel sizes must be odd and >= 1, "
                         f"got {kw}x{kh}")
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
            y = jnp.clip(jnp.round(y.astype(jnp.float32)), 0,
                         F.clip_value(fmt))
        planes[p.name] = y.astype(fmt.planes[0].dtype)
    return fb.with_planes(planes)
