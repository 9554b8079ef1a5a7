"""Resize — TPU rebuild of GMAT's scaling paths.

Replaces:
  * libgpuscale's CV-CUDA Resize submit (libswscale/cuda/swscale_cuda.c:
    273-479, interp map :69-74 SWS_BILINEAR/BICUBIC/AREA)
  * metrans texture-sampling kernels (NvCodec/Resize.cu:15-82,
    Resize_bicubic.cu:132-160)

TPU-first design: every supported resampler (bilinear / bicubic / area /
nearest / lanczos) is a *linear operator*, so a 2-D resize is two matrix
products per plane:   out = A_h @ img @ A_w^T.
That turns the texture-unit gather of the GPU into MXU systolic-array work,
which is where a TPU is fastest, and XLA fuses the surrounding conversion
arithmetic into the same pass.  Interpolation matrices are built once per
(n_in, n_out, method) at trace time and baked into the program as
constants.

Coordinate convention: half-pixel centers with edge clamp,
  src = (dst + 0.5) * n_in/n_out - 0.5
matching CUDA tex2D normalized sampling (Resize.cu) and CV-CUDA/OpenCV.
"""
from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core import formats as F
from ..core.frame import FrameBatch

METHODS = ("nearest", "bilinear", "bicubic", "area", "lanczos3")

# Matmul precision for resample products.  HIGHEST keeps f32 accuracy (the
# MXU runs 6 bf16 passes); "default" single-pass bf16 is ~1 u8-LSB noisier
# and ~3-6x faster — bench mode sets gmat_tpu.ops.resize.PRECISION = "default".
PRECISION = "highest"


def _cubic_weight(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Keys cubic kernel, a=-0.75 (OpenCV/CV-CUDA INTER_CUBIC)."""
    x = np.abs(x)
    w = np.where(
        x <= 1.0,
        ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0,
        np.where(x < 2.0, ((a * x - 5.0 * a) * x + 8.0 * a) * x - 4.0 * a, 0.0),
    )
    return w


def _lanczos_weight(x: np.ndarray, taps: int = 3) -> np.ndarray:
    x = np.asarray(x, np.float64)
    w = np.sinc(x) * np.sinc(x / taps)
    return np.where(np.abs(x) < taps, w, 0.0)


@lru_cache(maxsize=512)
def resample_matrix(n_in: int, n_out: int, method: str = "bilinear",
                    antialias: bool = False) -> np.ndarray:
    """(n_out, n_in) float32 row-normalized interpolation matrix."""
    if method not in METHODS:
        raise ValueError(f"unknown resize method {method!r}; known {METHODS}")
    A = np.zeros((n_out, n_in), np.float64)
    scale = n_in / n_out

    if method == "area" and n_in > n_out:
        # exact fractional box coverage (OpenCV INTER_AREA downscale)
        for o in range(n_out):
            lo, hi = o * scale, (o + 1) * scale
            i0, i1 = int(np.floor(lo)), int(np.ceil(hi))
            for i in range(i0, min(i1, n_in)):
                cov = min(hi, i + 1) - max(lo, i)
                if cov > 0:
                    A[o, i] = cov
        A /= A.sum(axis=1, keepdims=True)
        return A.astype(np.float32)

    src = (np.arange(n_out) + 0.5) * scale - 0.5
    if method == "nearest":
        idx = np.clip(np.floor(src + 0.5).astype(int), 0, n_in - 1)
        A[np.arange(n_out), idx] = 1.0
        return A.astype(np.float32)

    if method in ("bilinear", "area"):
        support, weight_fn = 1.0, lambda x: np.maximum(0.0, 1.0 - np.abs(x))
    elif method == "bicubic":
        support, weight_fn = 2.0, _cubic_weight
    else:  # lanczos3
        support, weight_fn = 3.0, _lanczos_weight

    # antialias widens the kernel by the scale factor when downscaling
    fscale = max(scale, 1.0) if (antialias and n_in > n_out) else 1.0
    sup = support * fscale
    for o in range(n_out):
        c = src[o]
        i0 = int(np.floor(c - sup)) + 1
        i1 = int(np.floor(c + sup)) + 1
        idx = np.arange(i0, i1)
        w = weight_fn((idx - c) / fscale)
        idx = np.clip(idx, 0, n_in - 1)  # edge clamp
        s = w.sum()
        if s != 0:
            w = w / s
        np.add.at(A[o], idx, w)
    return A.astype(np.float32)


# tap counts for the gather (windowed) path; other methods use matmuls
_TAPS = {"nearest": 1, "bilinear": 2, "bicubic": 4}


@lru_cache(maxsize=512)
def _window_taps(n_in: int, n_out: int, method: str):
    """Decompose a resample matrix into (start_idx[n_out], w[n_out, T])
    windows of T consecutive input samples.  Exactly equivalent to the
    dense matrix (edge-clipped weights are accumulated identically)."""
    T = _TAPS[method]
    A = resample_matrix(n_in, n_out, method)
    idx = np.zeros(n_out, np.int32)
    wts = np.zeros((n_out, T), np.float32)
    for o in range(n_out):
        nz = np.nonzero(A[o])[0]
        s = int(min(nz[0], max(n_in - T, 0)))
        idx[o] = s
        span = A[o, s:s + T]
        wts[o, :len(span)] = span
    return idx, wts


def _gather_resize(x: jax.Array, out_h: int, out_w: int, method: str):
    """Windowed-tap resize: reads only the input rows/cols each output
    needs (the TPU analog of tex2D sampling, metrans Resize.cu:15-80).
    For a 1080p -> 224 ladder this touches ~40% of rows instead of doing
    dense 1.8 GFLOP matmuls — memory-proportional and exact f32."""
    n_in_h, n_in_w = x.shape[1], x.shape[2]
    ridx, rw = _window_taps(n_in_h, out_h, method)
    cidx, cw = _window_taps(n_in_w, out_w, method)
    T = rw.shape[1]
    # rows: accumulate T shifted row-gathers (u8 gathered, converted fused)
    acc = None
    for k in range(T):
        g = jnp.take(x, jnp.asarray(np.minimum(ridx + k, n_in_h - 1)),
                     axis=1).astype(jnp.float32)
        wk = jnp.asarray(rw[:, k])
        wk = wk[None, :, None] if x.ndim == 3 else wk[None, :, None, None]
        acc = g * wk if acc is None else acc + g * wk
    # cols
    out = None
    for k in range(T):
        g = jnp.take(acc, jnp.asarray(np.minimum(cidx + k, n_in_w - 1)),
                     axis=2)
        wk = jnp.asarray(cw[:, k])
        wk = wk[None, None, :] if x.ndim == 3 else wk[None, None, :, None]
        out = g * wk if out is None else out + g * wk
    return out


def resize_plane(x: jax.Array, out_h: int, out_w: int,
                 method: str = "bilinear", antialias: bool = False,
                 dtype=jnp.float32) -> jax.Array:
    """Resize (N, H, W) or (N, H, W, C).

    nearest/bilinear/bicubic use the windowed-gather path (exact f32,
    memory-proportional); area/lanczos/antialias use two MXU matmuls with
    the module PRECISION setting.
    """
    n_in_h, n_in_w = x.shape[1], x.shape[2]
    if (n_in_h, n_in_w) == (out_h, out_w):
        return x.astype(dtype)
    if method in _TAPS and not antialias:
        return _gather_resize(x, out_h, out_w, method).astype(dtype)
    Ah = jnp.asarray(resample_matrix(n_in_h, out_h, method, antialias))
    Aw = jnp.asarray(resample_matrix(n_in_w, out_w, method, antialias))
    xf = x.astype(jnp.float32)
    ein = partial(jnp.einsum, preferred_element_type=jnp.float32,
                  precision=PRECISION)
    if x.ndim == 3:
        y = ein("oh,nhw->now", Ah, xf)
        y = ein("now,pw->nop", y, Aw)
    else:
        y = ein("oh,nhwc->nowc", Ah, xf)
        y = ein("nowc,pw->nopc", y, Aw)
    return y.astype(dtype)


def _quant_dtype(fmt: F.PixelFormat):
    return fmt.planes[0].dtype


def resize(fb: FrameBatch, out_w: int, out_h: int, method: str = "bilinear",
           antialias: bool = False) -> FrameBatch:
    """Resize a FrameBatch in its own format (chroma planes scale at their
    subsampled resolution, like the per-plane VarShape path in
    swscale_cuda.c:372-476)."""
    fmt = fb.fmt
    planes = {}
    for p in fmt.planes:
        ph, pw = out_h >> p.sub_h, out_w >> p.sub_w
        y = resize_plane(fb.planes[p.name], ph, pw, method, antialias)
        if not fmt.is_float:
            y = jnp.clip(jnp.round(y), 0, F.clip_value(fmt))
        planes[p.name] = y.astype(_quant_dtype(fmt))
    return fb.with_planes(planes, width=out_w, height=out_h)
