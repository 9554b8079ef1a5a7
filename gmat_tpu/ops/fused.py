"""Fused preprocess ladder — the hot path of the rebuild.

The reference executes decode->CSC->scale->crop as separate per-frame CUDA
kernel launches (format_cuda kernel, CV-CUDA resize, CustomCrop...).  Here
the whole ladder is one jitted XLA program over a *batch* of frames, and —
because color conversion and resampling are both linear — we reorder them:

    crop (slice)  ->  resize each YUV plane at its native subsampled
    resolution straight to the output size (one matmul pair per plane,
    chroma upsample fused into the interpolation matrix)  ->  3x3 color
    matrix + offsets at OUTPUT resolution  ->  pack/normalize.

For a 1080p -> 224x224 ladder this does the CSC on 224x224 pixels instead
of 1920x1080 (~40x less CSC work than the reference's ordering) and never
materializes a full-resolution RGB frame in HBM.

`exact=True` keeps the reference ordering (CSC at source resolution, then
resize) for oracle comparison.

Reference parity: this is the TPU analog of the pipelines in
doc/FFMPEG-GPU_User_Guide.md:16-26 (scale_npp + format_cuda chains) and
FrameExtractor's fused Nv12ToBgrFloatPlanar output (FrameExtractor.h:217-227).
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..core import formats as F
from ..core.color import yuv2rgb_matrix, yuv_offsets
from ..core.frame import FrameBatch
from . import csc
from .geometry import crop as crop_op, flip as flip_op
from .resize import resize as resize_op, resize_plane
from .smooth import smooth as smooth_op


def _apply_smooth(fb: FrameBatch, smooth) -> FrameBatch:
    """(kw, kh, sigmaX, sigmaY, border) gaussian at the current res."""
    kw_s, kh_s, sx, sy, border = smooth
    return smooth_op(fb, "gaussian", int(kw_s), int(kh_s), str(border),
                     float(sx), float(sy))


def preprocess(fb: FrameBatch, out_w: int, out_h: int,
               out_format: str = "rgbpf32", *,
               method: str = "bilinear",
               crop_box: Optional[Tuple[int, int, int, int]] = None,
               flip_code: Optional[int] = None,
               smooth: Optional[Tuple] = None,
               norm: Optional[float] = None,
               shift: Optional[Sequence[float]] = None,
               exact: bool = False) -> FrameBatch:
    """YUV FrameBatch -> cropped/smoothed/flipped/resized RGB batch.

    Op order: crop -> resize -> gaussian smooth (output res) -> flip —
    the same composition the Pallas ladder folds into its matrices
    (smooth=(kw, kh, sigmaX, sigmaY, border))."""
    if crop_box is not None:
        # crop_box is (x, y, w, h) — the Pallas ladder's convention —
        # while geometry.crop's signature is (w, h, x, y); reorder so
        # the XLA fallback crops the SAME region the kernel would
        bx, by, bw, bh = crop_box
        fb = crop_op(fb, bw, bh, bx, by)
    if fb.fmt.is_rgb:
        out = resize_op(fb, out_w, out_h, method)
        if smooth is not None:
            out = _apply_smooth(out, smooth)
        if flip_code is not None:
            out = flip_op(out, flip_code)
        kw = ({"norm": norm, "shift": shift}
              if F.get(out_format).is_rgb else {})
        return csc.convert(out, out_format, **kw)

    if exact:
        rgb = csc.yuv_to_rgb(fb, out_format, norm=norm, shift=shift)
        out = resize_op(rgb, out_w, out_h, method)
        if smooth is not None:
            out = _apply_smooth(out, smooth)
        if flip_code is not None:
            out = flip_op(out, flip_code)
        return out

    # ---- fast path: per-plane resize first, CSC at output size ----------
    bits = csc._offset_bits(fb.fmt)
    low, mid = yuv_offsets(bits)
    maxv = float((1 << bits) - 1)
    y = resize_plane(fb.planes["y"], out_h, out_w, method) - low
    if "u" in fb.planes:
        u = resize_plane(fb.planes["u"], out_h, out_w, method) - mid
        v = resize_plane(fb.planes["v"], out_h, out_w, method) - mid
    else:                      # gray8: neutral chroma, like the exact path
        u = v = jnp.zeros_like(y)
    m = yuv2rgb_matrix(fb.colorspace)
    r = jnp.clip(m[0, 0] * y + m[0, 1] * u + m[0, 2] * v, 0.0, maxv)
    g = jnp.clip(m[1, 0] * y + m[1, 1] * u + m[1, 2] * v, 0.0, maxv)
    b = jnp.clip(m[2, 0] * y + m[2, 1] * u + m[2, 2] * v, 0.0, maxv)
    out_fmt = F.get(out_format)
    rgb = csc._pack_rgb(r, g, b, out_fmt, maxv, False, norm, shift)
    out = FrameBatch({"rgb": rgb}, out_format, out_w, out_h, fb.colorspace)
    if smooth is not None:
        out = _apply_smooth(out, smooth)
    if flip_code is not None:
        out = flip_op(out, flip_code)
    return out


_PALLAS_METHODS = ("bilinear", "nearest", "bicubic", "area", "lanczos3")


def _pallas_eligible(fb: FrameBatch, method: str, kw: dict,
                     force: bool = False) -> bool:
    if kw:
        return False
    if (fb.format not in ("yuv420p", "nv12", "yuv420p10", "yuv444p")
            or method not in _PALLAS_METHODS):
        return False
    if force:       # use_pallas="interpret": run the kernel anywhere
        return True
    try:
        # default backend decides; callers lowering for a non-default
        # device set (e.g. a forced-CPU mesh) pass use_pallas="never"
        return jax.default_backend() == "tpu"
    except RuntimeError:
        return False


def _fusable_crop(fb: FrameBatch, crop_box) -> bool:
    """Crop boxes the Pallas builders fold into the matrices: 4:2:0
    formats, integer even coords inside the frame."""
    if crop_box is None:
        return True
    if fb.format not in ("yuv420p", "nv12", "yuv420p10"):
        return False
    try:
        c = tuple(int(x) for x in crop_box)
    except (TypeError, ValueError):
        return False
    if any(float(a) != float(b) for a, b in zip(c, crop_box)):
        return False
    cx, cy, cw_b, ch_b = c
    return (cx >= 0 and cy >= 0 and cw_b > 0 and ch_b > 0
            and not ((cx | cy | cw_b | ch_b) & 1)
            and cx + cw_b <= fb.width and cy + ch_b <= fb.height)


def _fusable_smooth(smooth) -> bool:
    """Gaussians the ladder folds: odd taps, sum-preserving border."""
    if smooth is None:
        return True
    kw_s, kh_s = int(smooth[0]), int(smooth[1])
    return (kw_s >= 1 and kh_s >= 1 and bool(kw_s & 1) and bool(kh_s & 1)
            and smooth[4] != "constant")


def preprocess_nchw(fb: FrameBatch, out_w: int, out_h: int, *,
                    method: str = "bilinear",
                    norm: Optional[float] = None,
                    shift: Sequence[float] = (0.0, 0.0, 0.0),
                    crop_box=None, flip_code: Optional[int] = None,
                    smooth: Optional[Tuple] = None,
                    use_pallas: str = "auto",
                    **kw) -> jax.Array:
    """Model-input convenience: fused ladder straight to NCHW fp32 (the
    format_cuda=rgbpf32le -> tensorrt handoff, vf_format_cuda.c:198-206).

    norm defaults to the input's full scale (255 for 8-bit, 1023 for
    yuv420p10) so the output is [0,1] for any depth; pass it explicitly
    for format_cuda-style (x-shift)/norm handoffs.

    On a TPU the bilinear yuv420 path dispatches to the Pallas int8-MXU
    kernel (~1.5x the XLA path, <=1.1 u8-LSB vs exact); pass
    use_pallas="never" to force the XLA path, "bf16" for the bf16
    kernel, or "interpret" to run the Pallas kernel in interpret mode on
    any backend (CPU meshes — the multichip dryrun validates the real
    kernel this way).  crop_box / smooth=(kw, kh, sigmaX, sigmaY, border) /
    flip_code ride the kernel's interpolation matrices at zero cost
    (BASELINE config #2's single-pass chain); ineligible combinations
    (odd crops, constant-border smooth, non-420 crops) fall back to the
    separate-op XLA path automatically.
    """
    if norm is None:
        norm = (255.0 if fb.fmt.is_float
                else float((1 << csc._offset_bits(fb.fmt)) - 1))
    fusable = (_fusable_crop(fb, crop_box) and _fusable_smooth(smooth)
               and flip_code in (None, -1, 0, 1))
    interp = use_pallas == "interpret"
    if (use_pallas != "never" and fusable
            and _pallas_eligible(fb, method, kw, force=interp)):
        from .pallas_kernels import (fused_ladder, fused_ladder_i8,
                                     fused_ladder_u16)
        cb = (tuple(int(x) for x in crop_box)
              if crop_box is not None else None)
        sm = tuple(smooth) if smooth is not None else None
        if fb.format == "yuv420p10":
            # 10-bit lane rides the bf16 kernel (ScaleP016/P016ToBgr*
            # analog); norm semantics identical to the XLA path
            return fused_ladder_u16(fb.planes["y"], fb.planes["u"],
                                    fb.planes["v"], out_h, out_w, 10,
                                    fb.colorspace, method, norm,
                                    tuple(shift), crop_box=cb,
                                    smooth=sm, flip=flip_code,
                                    interpret=interp)
        if fb.format == "yuv444p":
            # 4:4:4 chroma resampling is a real downscale (not the 4:2:0
            # near-identity), so int8 tap quantization × CSC gain blows
            # past tolerance — take the bf16 kernel (<=2 u8-LSB)
            k = fused_ladder
        else:
            k = fused_ladder if use_pallas == "bf16" else fused_ladder_i8
        return k(fb.planes["y"], fb.planes["u"], fb.planes["v"],
                 out_h, out_w, fb.colorspace, method, norm, tuple(shift),
                 crop_box=cb, smooth=sm, flip=flip_code, interpret=interp)
    out = preprocess(fb, out_w, out_h, "rgbpf32", method=method, norm=norm,
                     shift=shift, crop_box=crop_box, flip_code=flip_code,
                     smooth=smooth, **kw)
    return csc.to_nchw(out)


# ------------------------------------------------- resolution bucketing
# SURVEY §7 hard part: "dynamic shapes vs XLA recompilation — bucket
# resolutions, pad-and-mask within buckets".  Frames are padded to a
# bucket size (static shapes) and the interpolation taps/weights for the
# *content* region travel as runtime arguments, so one compiled program
# per (bucket, output) serves every content resolution inside it.

BUCKETS = ((640, 360), (960, 540), (1280, 720), (1920, 1080),
           (2560, 1440), (3840, 2160))


def bucket_for(w: int, h: int):
    """Smallest standard bucket covering (w, h); falls back to the next
    multiple of 64."""
    for bw, bh in BUCKETS:
        if w <= bw and h <= bh:
            return bw, bh
    r = lambda x: (x + 63) // 64 * 64
    return r(w), r(h)


@partial(jax.jit, static_argnames=("out_h", "out_w"))
def _bucketed_ladder(y, u, v, ridx_y, rw_y, cidx_y, cw_y,
                     ridx_c, rw_c, cidx_c, cw_c, mat, out_h, out_w):
    """Gather-resize with runtime taps + CSC; shapes depend only on the
    bucket and output size."""
    def rs(x, ridx, rw, cidx, cw):
        acc = None
        for k in range(2):
            g = jnp.take(x, jnp.clip(ridx + k, 0, x.shape[1] - 1),
                         axis=1).astype(jnp.float32)
            t = g * rw[:, k][None, :, None]
            acc = t if acc is None else acc + t
        out = None
        for k in range(2):
            g = jnp.take(acc, jnp.clip(cidx + k, 0, x.shape[2] - 1), axis=2)
            t = g * cw[:, k][None, None, :]
            out = t if out is None else out + t
        return out

    yy = rs(y, ridx_y, rw_y, cidx_y, cw_y) - 16.0
    uu = rs(u, ridx_c, rw_c, cidx_c, cw_c) - 128.0
    vv = rs(v, ridx_c, rw_c, cidx_c, cw_c) - 128.0
    r = jnp.clip(mat[0, 0] * yy + mat[0, 1] * uu + mat[0, 2] * vv, 0., 255.)
    g = jnp.clip(mat[1, 0] * yy + mat[1, 1] * uu + mat[1, 2] * vv, 0., 255.)
    b = jnp.clip(mat[2, 0] * yy + mat[2, 1] * uu + mat[2, 2] * vv, 0., 255.)
    return jnp.stack([r, g, b], 1) * (1.0 / 255.0)


def preprocess_nchw_bucketed(fb: FrameBatch, content_w: int, content_h: int,
                             out_w: int, out_h: int) -> jax.Array:
    """Fused ladder over a bucket-padded YUV batch.

    `fb` holds frames padded to a bucket (edge padding); only the
    (content_w, content_h) region contributes.  Different content sizes
    inside the same bucket reuse ONE compiled program (taps are runtime
    args).  8-bit only.
    """
    from .resize import _window_taps

    ry, wy = _window_taps(content_h, out_h, "bilinear")
    cy, wwy = _window_taps(content_w, out_w, "bilinear")
    rc, wc = _window_taps(content_h // 2, out_h, "bilinear")
    cc, wwc = _window_taps(content_w // 2, out_w, "bilinear")
    mat = jnp.asarray(yuv2rgb_matrix(fb.colorspace))
    return _bucketed_ladder(
        fb.planes["y"], fb.planes["u"], fb.planes["v"],
        jnp.asarray(ry), jnp.asarray(wy), jnp.asarray(cy), jnp.asarray(wwy),
        jnp.asarray(rc), jnp.asarray(wc), jnp.asarray(cc), jnp.asarray(wwc),
        mat, out_h, out_w)
