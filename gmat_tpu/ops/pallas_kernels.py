"""Pallas TPU kernels for the hot fused preprocess ladder.

The XLA paths for the 1080p -> 224x224 CSC+resize ladder are bound by HBM
intermediates (the separable resize's (224, W) f32 tensor round-trips to
HBM between the row and column stages, ~110 MB per 64-frame batch).  This
kernel does the whole ladder per frame inside VMEM:

    u8 planes --DMA--> VMEM -> bf16 row matmul (MXU, K-chunked) ->
    bf16 col matmul (MXU) -> 3x3 CSC + normalize (VPU) -> f32 out

One HBM read of the input planes, one HBM write of the output, everything
else stays on-chip.  The resample matrices ride along as bf16 operands
(weights exact to ~0.4%, <=1 u8-LSB effect; u8 pixel values are exact in
bf16).

Replaces the kernel-launch pipeline of the reference
(format_cuda_kernel.cu nv12_to_rgbpf32 + CV-CUDA resize) with a single
fused pass.
"""
from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.color import yuv2rgb_matrix, yuv_offsets
from .resize import resample_matrix


def _validate_crop_box(crop_box, w, h):
    """Normalize a (x, y, w, h) crop to ints and validate: positive even
    dims inside the frame, non-negative origin (a negative origin would
    silently wrap to the opposite edge via Python slicing)."""
    cx, cy, cwb, chb = (int(c) for c in crop_box)
    if cx < 0 or cy < 0 or cwb <= 0 or chb <= 0:
        raise ValueError(f"crop box {crop_box} must have non-negative "
                         "origin and positive size")
    if (cx | cy | cwb | chb) & 1:
        raise ValueError("4:2:0 crop box must be even")
    if cx + cwb > w or cy + chb > h:
        raise ValueError("crop box outside the frame")
    return (cx, cy, cwb, chb)


def _validate_smooth(smooth):
    """Normalize a (kw, kh, sigmaX, sigmaY, border) gaussian spec for the
    fused ladder.  Only sum-preserving borders fuse: a 'constant' border
    scales the affine CSC offsets at the edges (G rows sum < 1), which
    the pre-CSC matrix composition cannot express."""
    kw_s, kh_s, sx, sy, border = smooth
    kw_s, kh_s = int(kw_s), int(kh_s)
    if kw_s < 1 or kh_s < 1 or not (kw_s & 1) or not (kh_s & 1):
        raise ValueError(f"gaussian kernel sizes must be odd and >=1, "
                         f"got {kw_s}x{kh_s}")
    if border == "constant":
        raise ValueError("constant-border smooth cannot fuse into the "
                         "ladder matrices (edge rows break the CSC "
                         "offsets); use the separate smooth op")
    return (kw_s, kh_s, float(sx), float(sy), str(border))


def _validate_flip(flip):
    if flip is not None and flip not in (0, 1, -1):
        # silently ignoring an unknown code (e.g. OpenCV's 'any positive
        # = horizontal' habit) would return an un-flipped image AND bake
        # the bogus value into the build cache key
        raise ValueError(f"flip must be 0 (vertical), 1 (horizontal) or "
                         f"-1 (both), got {flip!r}")
    return flip


def _apply_post(ahy, ahc, awy, awc, out_h, out_w, smooth, flip):
    """Fold output-resolution gaussian smoothing and flip into the four
    resample matrices (VERDICT r2 #5; reference chain
    doc/FFMPEG-GPU_User_Guide.md:19 runs crop/rotate/flip/smooth as
    separate CV-CUDA launches).  Both are linear in the samples, so
    out = Flip(G_h @ (A_h X A_w^T) @ G_w^T) collapses to a one-time
    numpy precomposition — zero added work per frame.

    ahy/ahc are (out_h, in) row matrices; awy/awc are the TRANSPOSED
    (in, out_w) column matrices the kernels consume.
    """
    if smooth is not None:
        from .smooth import smooth_matrix
        kw_s, kh_s, sx, sy, border = smooth
        if kh_s > 1:
            gh = smooth_matrix(out_h, kh_s, sy, border)
            ahy = gh @ ahy
            ahc = gh @ ahc
        if kw_s > 1:
            gw = smooth_matrix(out_w, kw_s, sx, border)
            awy = awy @ gw.T
            awc = awc @ gw.T
    if flip in (0, -1):      # vertical: reverse output rows
        ahy = ahy[::-1]
        ahc = ahc[::-1]
    if flip in (1, -1):      # horizontal: reverse output columns
        awy = awy[:, ::-1]
        awc = awc[:, ::-1]
    return (np.ascontiguousarray(ahy, np.float32),
            np.ascontiguousarray(ahc, np.float32),
            np.ascontiguousarray(awy, np.float32),
            np.ascontiguousarray(awc, np.float32))


def _cropped_matrix(n_in_full: int, crop_off: int, crop_len: int,
                    n_out: int, method: str) -> np.ndarray:
    """Resample matrix that reads only [crop_off, crop_off+crop_len) of a
    full-length axis — crop fused into the interpolation weights, so the
    kernel never materializes a cropped copy."""
    A = resample_matrix(crop_len, n_out, method)
    if crop_off == 0 and crop_len == n_in_full:
        return A
    full = np.zeros((n_out, n_in_full), np.float32)
    full[:, crop_off:crop_off + crop_len] = A
    return full


def _ladder_kernel(y_ref, u_ref, v_ref, ahy_ref, awy_ref, ahc_ref, awc_ref,
                   out_ref, *, mat, low, mid, norm, shift, k_chunks):
    """One frame: planes -> (3, out_h, out_w) normalized RGB."""

    def rowcol(x_ref, ah_ref, aw_ref):
        h_in = ah_ref.shape[1]
        w_in = x_ref.shape[1]
        chunk = h_in // k_chunks
        acc = jnp.zeros((ah_ref.shape[0], w_in), jnp.float32)
        for c in range(k_chunks):
            # Mosaic lacks a direct u8->bf16/f32 cast; hop via int32
            xc = x_ref[c * chunk:(c + 1) * chunk, :].astype(
                jnp.int32).astype(jnp.bfloat16)
            acc = acc + jax.lax.dot_general(
                ah_ref[:, c * chunk:(c + 1) * chunk], xc,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        rem = h_in - k_chunks * chunk
        if rem:
            xc = x_ref[k_chunks * chunk:, :].astype(
                jnp.int32).astype(jnp.bfloat16)
            acc = acc + jax.lax.dot_general(
                ah_ref[:, k_chunks * chunk:], xc,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        return jax.lax.dot_general(
            acc.astype(jnp.bfloat16), aw_ref[...],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    yy = rowcol(y_ref, ahy_ref, awy_ref) - low
    uu = rowcol(u_ref, ahc_ref, awc_ref) - mid
    vv = rowcol(v_ref, ahc_ref, awc_ref) - mid
    maxv = 2.0 * mid - 1.0
    r = jnp.clip(mat[0, 0] * yy + mat[0, 1] * uu + mat[0, 2] * vv, 0., maxv)
    g = jnp.clip(mat[1, 0] * yy + mat[1, 1] * uu + mat[1, 2] * vv, 0., maxv)
    b = jnp.clip(mat[2, 0] * yy + mat[2, 1] * uu + mat[2, 2] * vv, 0., maxv)
    out_ref[0, :, :] = (r - shift[0]) * (1.0 / norm)
    out_ref[1, :, :] = (g - shift[1]) * (1.0 / norm)
    out_ref[2, :, :] = (b - shift[2]) * (1.0 / norm)


@lru_cache(maxsize=64)
def _build_ladder(n, h, w, ch, cw, out_h, out_w, colorspace, method,
                  norm, shift, interpret, bits=8, crop=None,
                  smooth=None, flip=None):
    """Compile-time closure for a fixed shape set.

    bits > 8 builds the 10/12/16-bit variant: same kernel, u16 inputs
    (lsb-aligned samples, the decode16/"yuv420p10" layout) and the
    offsets/clip range of that depth — the ScaleP016/P016ToBgr* lane of
    the reference (NvCodec/Resize.cu:77-82, ColorSpace.cu:219-293).
    Samples wider than 8 bits round to bf16 on the MXU feed (<=2 LSB at
    10 bits, ~0.5 u8-LSB at output scale).

    crop=(x, y, w, h) embeds the crop window in the interpolation
    matrices (zero cost), like the int8 builder."""
    mat = yuv2rgb_matrix(colorspace)
    low, mid = yuv_offsets(bits)
    # keep numpy here; convert inside fn so per-trace constants are fresh
    # (caching jnp arrays created inside a jit trace leaks tracers)
    if crop:
        cx, cy, cw_box, ch_box = crop
        ahy_np = _cropped_matrix(h, cy, ch_box, out_h, method)
        # chroma window scales per axis from the actual plane shapes
        # (4:2:0 halves both, 4:4:4 neither, 4:2:2 width only)
        ahc_np = _cropped_matrix(ch, cy * ch // h, ch_box * ch // h,
                                 out_h, method)
        awy_np = _cropped_matrix(w, cx, cw_box, out_w, method).T
        awc_np = _cropped_matrix(cw, cx * cw // w, cw_box * cw // w,
                                 out_w, method).T
    else:
        ahy_np = resample_matrix(h, out_h, method)
        awy_np = resample_matrix(w, out_w, method).T
        ahc_np = resample_matrix(ch, out_h, method)
        awc_np = resample_matrix(cw, out_w, method).T
    if smooth is not None or flip is not None:
        ahy_np, ahc_np, awy_np, awc_np = _apply_post(
            ahy_np, ahc_np, awy_np, awc_np, out_h, out_w, smooth, flip)

    kernel = partial(_ladder_kernel, mat=mat, low=float(low), mid=float(mid),
                     norm=float(norm), shift=shift,
                     k_chunks=max(1, h // 512))

    grid_spec = pl.GridSpec(
        grid=(n,),
        in_specs=[
            pl.BlockSpec((None, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, ch, cw), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, ch, cw), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((out_h, h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, out_w), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((out_h, ch), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cw, out_w), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, 3, out_h, out_w),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, 3, out_h, out_w), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * (out_h * h * w + out_h * w * out_w
                           + 2 * (out_h * ch * cw + out_h * cw * out_w)),
            bytes_accessed=n * (h * w + 2 * ch * cw
                                + 3 * out_h * out_w * 4),
            transcendentals=0),
        interpret=interpret,
    )

    def fn(y, u, v):
        ahy = jnp.asarray(ahy_np, jnp.bfloat16)
        awy = jnp.asarray(awy_np, jnp.bfloat16)
        ahc = jnp.asarray(ahc_np, jnp.bfloat16)
        awc = jnp.asarray(awc_np, jnp.bfloat16)
        return call(y, u, v, ahy, awy, ahc, awc)

    # jit so eager callers don't re-trace the pallas_call every frame batch
    return jax.jit(fn)


def fused_ladder(y: jax.Array, u: jax.Array, v: jax.Array,
                 out_h: int, out_w: int, colorspace: str = "bt709",
                 method: str = "bilinear", norm: float = 255.0,
                 shift=(0.0, 0.0, 0.0), interpret: bool = False,
                 crop_box=None, smooth=None, flip=None) -> jax.Array:
    """Batched YUV420 planes -> (N, 3, out_h, out_w) f32 in one Pallas pass.

    y: (N, H, W) uint8; u, v: (N, H/2, W/2) uint8.
    crop_box=(x, y, w, h): fused crop via the interpolation matrices
    (even coords for 4:2:0), like the int8 kernel.
    smooth=(kw, kh, sigmaX, sigmaY, border): output-res gaussian folded
    into the matrices (sum-preserving borders only); flip in {0, 1, -1}:
    output flip folded likewise — both zero-cost (_apply_post).
    """
    n, h, w = y.shape
    ch, cw = u.shape[1], u.shape[2]
    if crop_box is not None:
        crop_box = _validate_crop_box(crop_box, w, h)
    flip = _validate_flip(flip)
    if smooth is not None:
        smooth = _validate_smooth(smooth)
    fn = _build_ladder(n, h, w, ch, cw, out_h, out_w, colorspace, method,
                       float(norm), tuple(float(s) for s in shift),
                       bool(interpret), crop=crop_box, smooth=smooth,
                       flip=flip)
    return fn(y, u, v)


def fused_ladder_u16(y: jax.Array, u: jax.Array, v: jax.Array,
                     out_h: int, out_w: int, bits: int = 10,
                     colorspace: str = "bt709", method: str = "bilinear",
                     norm: float = 0.0, shift=(0.0, 0.0, 0.0),
                     interpret: bool = False, crop_box=None,
                     smooth=None, flip=None) -> jax.Array:
    """High-bit-depth fused ladder: u16 YUV420 planes (lsb-aligned
    `bits`-bit samples) -> (N, 3, out_h, out_w) f32 in one Pallas pass.

    The 10/16-bit lane of the reference (ScaleP016, P016ToBgr*,
    NvCodec/Resize.cu:77-82 / ColorSpace.cu:219-293), fused like the
    8-bit kernel.  norm=0 defaults to full scale ((1<<bits)-1) so the
    output lands in [0,1] like the 8-bit path's norm=255.
    crop_box=(x, y, w, h): fused crop (even coords for 4:2:0).
    """
    n, h, w = y.shape
    ch, cw = u.shape[1], u.shape[2]
    if not norm:
        norm = float((1 << bits) - 1)
    if crop_box is not None:
        crop_box = _validate_crop_box(crop_box, w, h)
    flip = _validate_flip(flip)
    if smooth is not None:
        smooth = _validate_smooth(smooth)
    fn = _build_ladder(n, h, w, ch, cw, out_h, out_w, colorspace, method,
                       float(norm), tuple(float(s) for s in shift),
                       bool(interpret), bits=int(bits), crop=crop_box,
                       smooth=smooth, flip=flip)
    return fn(y, u, v)


# ---------------------------------------------------------- NV12 variant
# Wire-format NV12 input (N, H*3/2, W): Y plane stacked on interleaved UV.
# The deinterleave costs nothing — the chroma *column* interpolation
# matrices are built against the interleaved layout (U reads even columns,
# V odd), so the same two matmuls resample and deinterleave at once.


def _ladder_nv12_kernel(yuv_ref, ahy_ref, awy_ref, ahc_ref, awu_ref,
                        awv_ref, out_ref, *, mat, low, mid, norm, shift,
                        k_chunks, h):
    def rowcol(rows, ah_ref, aw_ref, nchunks):
        h_in = ah_ref.shape[1]
        chunk = max(h_in // nchunks, 1)
        acc = jnp.zeros((ah_ref.shape[0], rows.shape[1]), jnp.float32)
        done = 0
        while done < h_in:
            c = min(chunk, h_in - done)
            xc = rows[done:done + c, :].astype(jnp.int32).astype(jnp.bfloat16)
            acc = acc + jax.lax.dot_general(
                ah_ref[:, done:done + c], xc, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            done += c
        return jax.lax.dot_general(
            acc.astype(jnp.bfloat16), aw_ref[...],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    y_rows = yuv_ref[:h, :]       # (None, ...) BlockSpec squeezes batch dim
    uv_rows = yuv_ref[h:, :]
    yy = rowcol(y_rows, ahy_ref, awy_ref, k_chunks) - low
    # one row-stage result shared by U and V; the column matrices split them
    hc = ahc_ref.shape[1]
    chunk = max(hc // max(k_chunks // 2, 1), 1)
    acc = jnp.zeros((ahc_ref.shape[0], uv_rows.shape[1]), jnp.float32)
    done = 0
    while done < hc:
        c = min(chunk, hc - done)
        xc = uv_rows[done:done + c, :].astype(jnp.int32).astype(jnp.bfloat16)
        acc = acc + jax.lax.dot_general(
            ahc_ref[:, done:done + c], xc, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        done += c
    acc16 = acc.astype(jnp.bfloat16)
    uu = jax.lax.dot_general(acc16, awu_ref[...], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) - mid
    vv = jax.lax.dot_general(acc16, awv_ref[...], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) - mid
    maxv = 2.0 * mid - 1.0
    r = jnp.clip(mat[0, 0] * yy + mat[0, 1] * uu + mat[0, 2] * vv, 0., maxv)
    g = jnp.clip(mat[1, 0] * yy + mat[1, 1] * uu + mat[1, 2] * vv, 0., maxv)
    b = jnp.clip(mat[2, 0] * yy + mat[2, 1] * uu + mat[2, 2] * vv, 0., maxv)
    out_ref[0, :, :] = (r - shift[0]) * (1.0 / norm)
    out_ref[1, :, :] = (g - shift[1]) * (1.0 / norm)
    out_ref[2, :, :] = (b - shift[2]) * (1.0 / norm)


@lru_cache(maxsize=64)
def _build_ladder_nv12(n, h, w, out_h, out_w, colorspace, method, norm,
                       shift, interpret):
    mat = yuv2rgb_matrix(colorspace)
    low, mid = yuv_offsets(8)
    ahy_np = resample_matrix(h, out_h, method)
    awy_np = resample_matrix(w, out_w, method).T
    ahc_np = resample_matrix(h // 2, out_h, method)
    # interleaved-aware chroma column matrices: (W, out_w), U hits even
    # input columns, V odd
    awc = resample_matrix(w // 2, out_w, method)          # (out_w, W/2)
    awu_np = np.zeros((w, out_w), np.float32)
    awv_np = np.zeros((w, out_w), np.float32)
    awu_np[0::2, :] = awc.T
    awv_np[1::2, :] = awc.T

    kernel = partial(_ladder_nv12_kernel, mat=mat, low=float(low),
                     mid=float(mid), norm=float(norm), shift=shift,
                     k_chunks=max(1, h // 512), h=h)
    grid_spec = pl.GridSpec(
        grid=(n,),
        in_specs=[
            pl.BlockSpec((None, h * 3 // 2, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((out_h, h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, out_w), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((out_h, h // 2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, out_w), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, out_w), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, 3, out_h, out_w),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, 3, out_h, out_w), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )

    def fn(yuv):
        ahy = jnp.asarray(ahy_np, jnp.bfloat16)
        awy = jnp.asarray(awy_np, jnp.bfloat16)
        ahc = jnp.asarray(ahc_np, jnp.bfloat16)
        awu = jnp.asarray(awu_np, jnp.bfloat16)
        awv = jnp.asarray(awv_np, jnp.bfloat16)
        return call(yuv, ahy, awy, ahc, awu, awv)

    return jax.jit(fn)


def fused_ladder_nv12(yuv: jax.Array, out_h: int, out_w: int,
                      colorspace: str = "bt709", method: str = "bilinear",
                      norm: float = 255.0, shift=(0.0, 0.0, 0.0),
                      interpret: bool = False) -> jax.Array:
    """Wire-format NV12 (N, H*3/2, W) u8 -> (N, 3, out_h, out_w) f32;
    the UV deinterleave rides the chroma column matmul for free."""
    n, h32, w = yuv.shape
    if h32 % 3 or w % 2 or (h32 * 2 // 3) % 2:
        raise ValueError(f"not an NV12 wire shape: ({h32}, {w}) "
                         "(rows must be H*3/2 with even H, width even)")
    h = h32 * 2 // 3
    fn = _build_ladder_nv12(n, h, w, out_h, out_w, colorspace, method,
                            float(norm), tuple(float(s) for s in shift),
                            bool(interpret))
    return fn(yuv)


# ------------------------------------------------------ int8-MXU variant
# The row matmul (the big contraction) runs on the int8 MXU path (~2x bf16
# throughput on v5e) with the u8->centered-int8 conversion done as a
# single XOR+bitcast instead of float converts:
#     x' = bitcast(x ^ 0x80, i8) == x - 128      (exact)
#     t  = round(A*127)_i8 @ x'                  (i32 accum, exact)
#     plane = (t/127) @ Aw_bf16 + 128 * rowsum(A_q)/127
# Weight quantization to 1/127 steps costs <=1 u8-LSB for bilinear taps.


def _ladder_kernel_i8(y_ref, u_ref, v_ref, ahy_ref, awy_ref, ahc_ref,
                      awc_ref, offy_ref, offc_ref, out_ref,
                      *, mat, low, mid, norm, shift,
                      inv_sy=1.0 / 127.0, inv_sc=1.0 / 127.0):
    def rowcol(x_ref, ah_i8, aw_bf, off_ref, inv_s):
        x8 = pltpu.bitcast(x_ref[...] ^ jnp.uint8(0x80), jnp.int8)
        t = jax.lax.dot_general(ah_i8[...], x8, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        tb = (t.astype(jnp.float32) * inv_s).astype(jnp.bfloat16)
        o = jax.lax.dot_general(tb, aw_bf[...], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return o + off_ref[...]

    yy = rowcol(y_ref, ahy_ref, awy_ref, offy_ref, inv_sy) - low
    uu = rowcol(u_ref, ahc_ref, awc_ref, offc_ref, inv_sc) - mid
    vv = rowcol(v_ref, ahc_ref, awc_ref, offc_ref, inv_sc) - mid
    maxv = 2.0 * mid - 1.0
    r = jnp.clip(mat[0, 0] * yy + mat[0, 1] * uu + mat[0, 2] * vv, 0., maxv)
    g = jnp.clip(mat[1, 0] * yy + mat[1, 1] * uu + mat[1, 2] * vv, 0., maxv)
    b = jnp.clip(mat[2, 0] * yy + mat[2, 1] * uu + mat[2, 2] * vv, 0., maxv)
    out_ref[0, :, :] = (r - shift[0]) * (1.0 / norm)
    out_ref[1, :, :] = (g - shift[1]) * (1.0 / norm)
    out_ref[2, :, :] = (b - shift[2]) * (1.0 / norm)


def _quant_rows(A):
    """Quantize a resample matrix to int8 with a per-matrix scale so
    methods with taps beyond +-1 (bicubic overshoot, lanczos lobes) stay
    exact-ish: q = round(A*s), s = 127/max(1, max|A|)."""
    s = 127.0 / max(1.0, float(np.abs(A).max()))
    q = np.clip(np.round(A * s), -127, 127).astype(np.int8)
    return q, s


def _i8_quant_error_lsb(A) -> float:
    """Worst-case u8-LSB error of int8 weight quantization for one row of
    the resample matrix (drives the i8-vs-bf16 kernel dispatch: wide
    antialiased taps accumulate too much 1/127-step error for int8)."""
    q, s = _quant_rows(A)
    return float(np.abs(q.astype(np.float32) / s - A).sum(axis=1).max()) * 255.0


@lru_cache(maxsize=256)
def _rung_i8_ok(h: int, ch: int, oh: int, method: str) -> bool:
    """fused_rungs auto gate: measured quantization error of the actual
    row matrices (luma h->oh, chroma ch->oh//2) — no method shortcut."""
    return (_i8_quant_error_lsb(resample_matrix(h, oh, method)) <= 2.0
            and _i8_quant_error_lsb(
                resample_matrix(ch, oh // 2, method)) <= 2.0)


@lru_cache(maxsize=256)
def _i8_ok_composed(h, w, ch, cw, out_h, out_w, method, crop, smooth,
                    flip) -> bool:
    """Dispatch gate on the ACTUAL (crop/smooth/flip-composed) row
    matrices the int8 builder would quantize.  A fused gaussian spreads
    row weights, so the bilinear shortcut only holds without smooth."""
    if method in ("bilinear", "nearest") and smooth is None:
        return True
    ahy, ahc, _, _ = _i8_matrices(h, w, ch, cw, out_h, out_w, method,
                                  crop, smooth, flip)
    return max(_i8_quant_error_lsb(ahy), _i8_quant_error_lsb(ahc)) <= 2.0


@lru_cache(maxsize=64)
def _i8_matrices(h, w, ch, cw, out_h, out_w, method, crop, smooth, flip):
    """The four (possibly crop/smooth/flip-composed) resample matrices
    the int8 ladder will actually quantize — shared by the builder and
    the dispatch gate (cached: both would otherwise rebuild the same
    per-row python-loop matrices per geometry)."""
    if crop:
        cx, cy, cw_box, ch_box = crop
        ahy = _cropped_matrix(h, cy, ch_box, out_h, method)
        ahc = _cropped_matrix(ch, cy * ch // h, ch_box * ch // h,
                              out_h, method)
        awy = _cropped_matrix(w, cx, cw_box, out_w, method).T
        awc = _cropped_matrix(cw, cx * cw // w, cw_box * cw // w,
                              out_w, method).T
    else:
        ahy = resample_matrix(h, out_h, method)
        ahc = resample_matrix(ch, out_h, method)
        awy = resample_matrix(w, out_w, method).T
        awc = resample_matrix(cw, out_w, method).T
    if smooth is not None or flip is not None:
        ahy, ahc, awy, awc = _apply_post(ahy, ahc, awy, awc, out_h, out_w,
                                         smooth, flip)
    return ahy, ahc, awy, awc


@lru_cache(maxsize=64)
def _build_ladder_i8(n, h, w, ch, cw, out_h, out_w, colorspace, method,
                     norm, shift, interpret, crop=None, smooth=None,
                     flip=None):
    mat = yuv2rgb_matrix(colorspace)
    low, mid = yuv_offsets(8)
    ahy, ahc, awy_np, awc_np = _i8_matrices(
        h, w, ch, cw, out_h, out_w, method, crop, smooth, flip)
    ahy_q, sy = _quant_rows(ahy)
    ahc_q, sc = _quant_rows(ahc)
    # broadcast row offsets: plane = t/s @ Aw + 128 * rowsum(A_q)/s
    offy = (128.0 * ahy_q.astype(np.float32).sum(1) / sy)[:, None]
    offc = (128.0 * ahc_q.astype(np.float32).sum(1) / sc)[:, None]

    kernel = partial(_ladder_kernel_i8, mat=mat, low=float(low),
                     mid=float(mid), norm=float(norm), shift=shift,
                     inv_sy=1.0 / sy, inv_sc=1.0 / sc)
    grid_spec = pl.GridSpec(
        grid=(n,),
        in_specs=[
            pl.BlockSpec((None, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, ch, cw), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, ch, cw), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((out_h, h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, out_w), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((out_h, ch), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cw, out_w), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((out_h, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((out_h, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, 3, out_h, out_w),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    call = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, 3, out_h, out_w), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )

    def fn(y, u, v):
        return call(y, u, v,
                    jnp.asarray(ahy_q), jnp.asarray(awy_np, jnp.bfloat16),
                    jnp.asarray(ahc_q), jnp.asarray(awc_np, jnp.bfloat16),
                    jnp.asarray(offy, jnp.float32),
                    jnp.asarray(offc, jnp.float32))

    return jax.jit(fn)


# --------------------------------------------------- NV12 int8 variant
# Wire-format NV12 input on the int8 MXU path: the luma and (shared) UV
# row contractions run in int8, the interleave-aware chroma column
# matrices split U/V like the bf16 NV12 kernel.


def _ladder_nv12_kernel_i8(yuv_ref, ahy_ref, awy_ref, ahc_ref, awu_ref,
                           awv_ref, offy_ref, offc_ref, out_ref,
                           *, mat, low, mid, norm, shift, h,
                           inv_sy, inv_sc):
    x8 = pltpu.bitcast(yuv_ref[...] ^ jnp.uint8(0x80), jnp.int8)

    def row(ah_i8, rows):
        return jax.lax.dot_general(ah_i8[...], rows,
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)

    def col(t, aw_bf, inv_s):
        tb = (t.astype(jnp.float32) * inv_s).astype(jnp.bfloat16)
        return jax.lax.dot_general(tb, aw_bf[...], (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    ty = row(ahy_ref, x8[:h, :])
    yy = col(ty, awy_ref, inv_sy) + offy_ref[...] - low
    tc = row(ahc_ref, x8[h:, :])          # one row stage shared by U and V
    uu = col(tc, awu_ref, inv_sc) + offc_ref[...] - mid
    vv = col(tc, awv_ref, inv_sc) + offc_ref[...] - mid
    maxv = 2.0 * mid - 1.0
    r = jnp.clip(mat[0, 0] * yy + mat[0, 1] * uu + mat[0, 2] * vv, 0., maxv)
    g = jnp.clip(mat[1, 0] * yy + mat[1, 1] * uu + mat[1, 2] * vv, 0., maxv)
    b = jnp.clip(mat[2, 0] * yy + mat[2, 1] * uu + mat[2, 2] * vv, 0., maxv)
    out_ref[0, :, :] = (r - shift[0]) * (1.0 / norm)
    out_ref[1, :, :] = (g - shift[1]) * (1.0 / norm)
    out_ref[2, :, :] = (b - shift[2]) * (1.0 / norm)


@lru_cache(maxsize=32)
def _build_ladder_nv12_i8(n, h, w, out_h, out_w, colorspace, method, norm,
                          shift, interpret):
    mat = yuv2rgb_matrix(colorspace)
    low, mid = yuv_offsets(8)
    ahy_q, sy = _quant_rows(resample_matrix(h, out_h, method))
    ahc_q, sc = _quant_rows(resample_matrix(h // 2, out_h, method))
    offy = (128.0 * ahy_q.astype(np.float32).sum(1) / sy)[:, None]
    offc = (128.0 * ahc_q.astype(np.float32).sum(1) / sc)[:, None]
    awy_np = resample_matrix(w, out_w, method).T
    awc = resample_matrix(w // 2, out_w, method)      # (out_w, W/2)
    awu_np = np.zeros((w, out_w), np.float32)
    awv_np = np.zeros((w, out_w), np.float32)
    awu_np[0::2, :] = awc.T                           # U = even columns
    awv_np[1::2, :] = awc.T                           # V = odd columns

    kernel = partial(_ladder_nv12_kernel_i8, mat=mat, low=float(low),
                     mid=float(mid), norm=float(norm), shift=shift, h=h,
                     inv_sy=1.0 / sy, inv_sc=1.0 / sc)
    grid_spec = pl.GridSpec(
        grid=(n,),
        in_specs=[
            pl.BlockSpec((None, h * 3 // 2, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((out_h, h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, out_w), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((out_h, h // 2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, out_w), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, out_w), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((out_h, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((out_h, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, 3, out_h, out_w),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    call = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, 3, out_h, out_w), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )

    def fn(yuv):
        return call(yuv,
                    jnp.asarray(ahy_q), jnp.asarray(awy_np, jnp.bfloat16),
                    jnp.asarray(ahc_q), jnp.asarray(awu_np, jnp.bfloat16),
                    jnp.asarray(awv_np, jnp.bfloat16),
                    jnp.asarray(offy, jnp.float32),
                    jnp.asarray(offc, jnp.float32))

    return jax.jit(fn)


def fused_ladder_nv12_i8(yuv: jax.Array, out_h: int, out_w: int,
                         colorspace: str = "bt709",
                         method: str = "bilinear", norm: float = 255.0,
                         shift=(0.0, 0.0, 0.0), interpret: bool = False):
    """Wire-format NV12 (N, H*3/2, W) u8 -> (N, 3, out_h, out_w) f32 on
    the int8 MXU path; the UV deinterleave rides the chroma column
    matmuls for free (fused_ladder_nv12's layout trick at int8 speed)."""
    if method not in ("bilinear", "nearest"):
        return fused_ladder_nv12(yuv, out_h, out_w, colorspace, method,
                                 norm, shift, interpret)
    n, h32, w = yuv.shape
    if h32 % 3 or w % 2 or (h32 * 2 // 3) % 2:
        raise ValueError(f"not an NV12 wire shape: ({h32}, {w}) "
                         "(rows must be H*3/2 with even H, width even)")
    h = h32 * 2 // 3
    fn = _build_ladder_nv12_i8(n, h, w, out_h, out_w, colorspace, method,
                               float(norm),
                               tuple(float(s) for s in shift),
                               bool(interpret))
    return fn(yuv)


# ------------------------------------------------ P010 wire-format lane
# P010 as hardware decoders emit it: u16 luma plane stacked on u16
# interleaved UV rows, samples in the HIGH bits (<<6 for 10-bit).  Like
# fused_ladder_nv12, the deinterleave rides the chroma column matmuls
# (U = even columns, V = odd); the msb alignment folds into the
# normalization scale (x>>6 == x * 2^-6 exactly on integers, and the
# bf16 MXU feed rounds identically either way).


def _ladder_p010_kernel(yuv_ref, ahy_ref, awy_ref, ahc_ref, awu_ref,
                        awv_ref, out_ref, *, mat, low, mid, norm, shift, h):
    def row(ah_bf, rows):
        xb = rows.astype(jnp.int32).astype(jnp.bfloat16)
        return jax.lax.dot_general(ah_bf[...], xb, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    def col(t, aw_bf):
        return jax.lax.dot_general(t.astype(jnp.bfloat16), aw_bf[...],
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    inv64 = 1.0 / 64.0                    # msb (<<6) -> 10-bit scale
    yy = col(row(ahy_ref, yuv_ref[:h, :]), awy_ref) * inv64 - low
    tc = row(ahc_ref, yuv_ref[h:, :])     # one row stage shared by U and V
    uu = col(tc, awu_ref) * inv64 - mid
    vv = col(tc, awv_ref) * inv64 - mid
    maxv = 2.0 * mid - 1.0
    r = jnp.clip(mat[0, 0] * yy + mat[0, 1] * uu + mat[0, 2] * vv, 0., maxv)
    g = jnp.clip(mat[1, 0] * yy + mat[1, 1] * uu + mat[1, 2] * vv, 0., maxv)
    b = jnp.clip(mat[2, 0] * yy + mat[2, 1] * uu + mat[2, 2] * vv, 0., maxv)
    out_ref[0, :, :] = (r - shift[0]) * (1.0 / norm)
    out_ref[1, :, :] = (g - shift[1]) * (1.0 / norm)
    out_ref[2, :, :] = (b - shift[2]) * (1.0 / norm)


@lru_cache(maxsize=32)
def _build_ladder_p010(n, h, w, out_h, out_w, colorspace, method, norm,
                       shift, interpret):
    mat = yuv2rgb_matrix(colorspace)
    low, mid = yuv_offsets(10)
    ahy_np = resample_matrix(h, out_h, method)
    ahc_np = resample_matrix(h // 2, out_h, method)
    awy_np = resample_matrix(w, out_w, method).T
    awc = resample_matrix(w // 2, out_w, method)      # (out_w, W/2)
    awu_np = np.zeros((w, out_w), np.float32)
    awv_np = np.zeros((w, out_w), np.float32)
    awu_np[0::2, :] = awc.T                           # U = even columns
    awv_np[1::2, :] = awc.T                           # V = odd columns

    kernel = partial(_ladder_p010_kernel, mat=mat, low=float(low),
                     mid=float(mid), norm=float(norm), shift=shift, h=h)
    grid_spec = pl.GridSpec(
        grid=(n,),
        in_specs=[
            pl.BlockSpec((None, h * 3 // 2, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((out_h, h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, out_w), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((out_h, h // 2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, out_w), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, out_w), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, 3, out_h, out_w),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    call = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, 3, out_h, out_w), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )

    def fn(yuv):
        return call(yuv,
                    jnp.asarray(ahy_np, jnp.bfloat16),
                    jnp.asarray(awy_np, jnp.bfloat16),
                    jnp.asarray(ahc_np, jnp.bfloat16),
                    jnp.asarray(awu_np, jnp.bfloat16),
                    jnp.asarray(awv_np, jnp.bfloat16))

    return jax.jit(fn)


def fused_ladder_p010(yuv: jax.Array, out_h: int, out_w: int,
                      colorspace: str = "bt709", method: str = "bilinear",
                      norm: float = 0.0, shift=(0.0, 0.0, 0.0),
                      interpret: bool = False) -> jax.Array:
    """P010 wire format (N, H*3/2, W) u16 (msb-aligned samples, UV rows
    interleaved) -> (N, 3, out_h, out_w) f32 in one Pallas pass — the
    layout hardware decoders emit (NvDecLite 10-bit surfaces,
    NvDecLite.cpp:177-242; ColorSpace.cu P016ToBgr*).  norm=0 defaults
    to 1023 (unit-range output)."""
    n, h32, w = yuv.shape
    if h32 % 3 or w % 2 or (h32 * 2 // 3) % 2:
        raise ValueError(f"not a P010 wire shape: ({h32}, {w}) "
                         "(rows must be H*3/2 with even H, width even)")
    h = h32 * 2 // 3
    if not norm:
        norm = 1023.0
    fn = _build_ladder_p010(n, h, w, out_h, out_w, colorspace, method,
                            float(norm), tuple(float(s) for s in shift),
                            bool(interpret))
    return fn(yuv)


# ----------------------------------------------- multi-rung ABR kernel
# The ABR ladder's device work (AppMeTrans: ScaleNv12 once per rung per
# frame, Resize.cu:77 / RoundQueue consumers) as ONE fused pass: the
# source planes are DMA'd into VMEM once and every rung's YUV planes are
# resampled and written from there.  yuv->yuv, per-plane, bf16 matmuls
# (u8 samples exact in bf16; only taps round), round-to-u8 outputs.


def _rungs_kernel(y_ref, u_ref, v_ref, *refs, n_rungs):
    """refs = [ahy_0, awy_0, ahc_0, awc_0, ...rung1..., y0_out, u0_out,
    v0_out, y1_out, ...].  bf16 weights (u8 samples are exact in bf16;
    only the taps round — <=1 u8-LSB on the rounded outputs)."""
    w_refs = refs[:4 * n_rungs]
    o_refs = refs[4 * n_rungs:]

    # lift the u8 planes to bf16 once, shared by every rung
    # (Mosaic lacks a direct u8->bf16 cast; hop via int32)
    yb = y_ref[...].astype(jnp.int32).astype(jnp.bfloat16)
    ub = u_ref[...].astype(jnp.int32).astype(jnp.bfloat16)
    vb = v_ref[...].astype(jnp.int32).astype(jnp.bfloat16)

    def plane(xb, ah_bf, aw_bf):
        t = jax.lax.dot_general(ah_bf[...], xb, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o = jax.lax.dot_general(t.astype(jnp.bfloat16), aw_bf[...],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o = jnp.clip(jnp.round(o), 0.0, 255.0)
        # f32 -> u8 store via the i32 hop (Mosaic has no direct cast)
        return o.astype(jnp.int32).astype(jnp.uint8)

    for r in range(n_rungs):
        ahy, awy, ahc, awc = w_refs[4 * r:4 * r + 4]
        yo, uo, vo = o_refs[3 * r:3 * r + 3]
        yo[...] = plane(yb, ahy, awy)
        uo[...] = plane(ub, ahc, awc)
        vo[...] = plane(vb, ahc, awc)


def _rungs_kernel_i8(y_ref, u_ref, v_ref, *refs, n_rungs, inv_scales):
    """int8 row-stage variant: refs = [ahy_q, awy, ahc_q, awc, offy, offc]
    per rung, then outputs.  The row matmuls (~half the kernel's FLOPs)
    ride the int8 MXU path (2x bf16 throughput on v5e) with the exact
    xor-128 bitcast input; off = 128*rowsum(Ah_q)/s re-adds the mean
    after the column matmul (Aw's columns sum to 1)."""
    w_refs = refs[:6 * n_rungs]
    o_refs = refs[6 * n_rungs:]

    y8 = pltpu.bitcast(y_ref[...] ^ jnp.uint8(0x80), jnp.int8)
    u8 = pltpu.bitcast(u_ref[...] ^ jnp.uint8(0x80), jnp.int8)
    v8 = pltpu.bitcast(v_ref[...] ^ jnp.uint8(0x80), jnp.int8)

    def plane(x8, ah_i8, aw_bf, off, inv_s):
        t = jax.lax.dot_general(ah_i8[...], x8, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        tb = (t.astype(jnp.float32) * inv_s).astype(jnp.bfloat16)
        o = jax.lax.dot_general(tb, aw_bf[...], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o = jnp.clip(jnp.round(o + off[...]), 0.0, 255.0)
        return o.astype(jnp.int32).astype(jnp.uint8)

    for r in range(n_rungs):
        ahy, awy, ahc, awc, offy, offc = w_refs[6 * r:6 * r + 6]
        yo, uo, vo = o_refs[3 * r:3 * r + 3]
        inv_sy, inv_sc = inv_scales[r]
        yo[...] = plane(y8, ahy, awy, offy, inv_sy)
        uo[...] = plane(u8, ahc, awc, offc, inv_sc)
        vo[...] = plane(v8, ahc, awc, offc, inv_sc)


def _rungs_kernel_i8_chunked(y_ref, u_ref, v_ref, *refs, n_rungs,
                             kw_chunks, inv_scales):
    """W-chunked int8 rungs (4K+ sources): per grid step one column
    chunk of the source is loaded and every rung accumulates its partial
    column contribution (out = sum_k (Ah @ X[:,k]) @ Aw[k,:]) into f32
    scratch; the last chunk rounds and stores u8 (same scheme as
    _ladder_kernel_i8_chunked)."""
    w_refs = refs[:6 * n_rungs]
    o_refs = refs[6 * n_rungs:9 * n_rungs]
    s_refs = refs[9 * n_rungs:]
    k = pl.program_id(1)

    y8 = pltpu.bitcast(y_ref[...] ^ jnp.uint8(0x80), jnp.int8)
    u8 = pltpu.bitcast(u_ref[...] ^ jnp.uint8(0x80), jnp.int8)
    v8 = pltpu.bitcast(v_ref[...] ^ jnp.uint8(0x80), jnp.int8)

    def partial_rowcol(x8, ah_i8, aw_bf, inv_s):
        t = jax.lax.dot_general(ah_i8[...], x8, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        tb = (t.astype(jnp.float32) * inv_s).astype(jnp.bfloat16)
        return jax.lax.dot_general(tb, aw_bf[...], (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    for r in range(n_rungs):
        ahy, awy, ahc, awc, offy, offc = w_refs[6 * r:6 * r + 6]
        yo, uo, vo = o_refs[3 * r:3 * r + 3]
        ay, au, av = s_refs[3 * r:3 * r + 3]
        inv_sy, inv_sc = inv_scales[r]
        py = partial_rowcol(y8, ahy, awy, inv_sy)
        pu = partial_rowcol(u8, ahc, awc, inv_sc)
        pv = partial_rowcol(v8, ahc, awc, inv_sc)

        @pl.when(k == 0)
        def _init(ay=ay, au=au, av=av, py=py, pu=pu, pv=pv):
            ay[...] = py
            au[...] = pu
            av[...] = pv

        @pl.when(k > 0)
        def _accum(ay=ay, au=au, av=av, py=py, pu=pu, pv=pv):
            ay[...] = ay[...] + py
            au[...] = au[...] + pu
            av[...] = av[...] + pv

        @pl.when(k == kw_chunks - 1)
        def _store(ay=ay, au=au, av=av, yo=yo, uo=uo, vo=vo,
                   offy=offy, offc=offc):
            def q(acc, off):
                o = jnp.clip(jnp.round(acc[...] + off[...]), 0.0, 255.0)
                return o.astype(jnp.int32).astype(jnp.uint8)
            yo[...] = q(ay, offy)
            uo[...] = q(au, offc)
            vo[...] = q(av, offc)


@lru_cache(maxsize=16)
def _build_rungs_i8_chunked(n, h, w, ch, cw, sizes, method, interpret,
                            kw_chunks):
    wc, cwc = w // kw_chunks, cw // kw_chunks
    in_specs = [
        pl.BlockSpec((None, h, wc), lambda i, k: (i, 0, k),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((None, ch, cwc), lambda i, k: (i, 0, k),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((None, ch, cwc), lambda i, k: (i, 0, k),
                     memory_space=pltpu.VMEM),
    ]
    out_specs, out_shapes, scratch = [], [], []
    consts, inv_scales = [], []
    for (ow, oh) in sizes:
        ahy_q, sy = _quant_rows(resample_matrix(h, oh, method))
        ahc_q, sc = _quant_rows(resample_matrix(ch, oh // 2, method))
        offy = (128.0 * ahy_q.astype(np.float32).sum(1) / sy)[:, None]
        offc = (128.0 * ahc_q.astype(np.float32).sum(1) / sc)[:, None]
        inv_scales.append((1.0 / sy, 1.0 / sc))
        awy = resample_matrix(w, ow, method).T
        awc = resample_matrix(cw, ow // 2, method).T
        consts += [(ahy_q, None), (awy, jnp.bfloat16),
                   (ahc_q, None), (awc, jnp.bfloat16),
                   (offy, jnp.float32), (offc, jnp.float32)]
        in_specs += [
            pl.BlockSpec(ahy_q.shape, lambda i, k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wc, ow), lambda i, k: (k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(ahc_q.shape, lambda i, k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cwc, ow // 2), lambda i, k: (k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(offy.shape, lambda i, k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(offc.shape, lambda i, k: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        for shp in ((oh, ow), (oh // 2, ow // 2), (oh // 2, ow // 2)):
            out_shapes.append(jax.ShapeDtypeStruct((n, *shp), jnp.uint8))
            out_specs.append(pl.BlockSpec((None, *shp),
                                          lambda i, k: (i, 0, 0),
                                          memory_space=pltpu.VMEM))
            scratch.append(pltpu.VMEM(shp, jnp.float32))

    kernel = partial(_rungs_kernel_i8_chunked, n_rungs=len(sizes),
                     kw_chunks=kw_chunks, inv_scales=tuple(inv_scales))
    call = pl.pallas_call(
        kernel,
        grid_spec=pl.GridSpec(grid=(n, kw_chunks), in_specs=in_specs,
                              out_specs=out_specs,
                              scratch_shapes=scratch),
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )

    def fn(y, u, v):
        args = [jnp.asarray(a) if dt is None else jnp.asarray(a, dt)
                for a, dt in consts]
        outs = call(y, u, v, *args)
        return [tuple(outs[3 * r:3 * r + 3]) for r in range(len(sizes))]

    return jax.jit(fn)


def _pick_rungs_chunks(h, w, ch, cw, sizes,
                       budget_bytes=100 * 1024 * 1024):
    """Smallest lane-aligned chunk count whose per-step working set
    (input chunk + all rung weights + f32 accumulators + outputs) fits
    VMEM; 0 = not chunkable."""
    weights = acc = outs = 0
    for ow, oh in sizes:
        weights += oh * h + ch * (oh // 2)            # i8 row matrices
        acc += (oh * ow + 2 * (oh // 2) * (ow // 2)) * 4
        outs += oh * ow + 2 * (oh // 2) * (ow // 2)
    for k in range(1, 17):
        # k=1 = whole-frame blocks: no chunk boundary, so no lane
        # alignment needed (same exemption as _pick_w_chunks)
        if k > 1 and (w % (k * 128) or cw % (k * 128)):
            continue
        wc, cwc = w // k, cw // k
        inp = (h * wc + 2 * ch * cwc) * 2             # double-buffered u8
        wts = weights
        inter = 0
        for ow, oh in sizes:
            wts += (wc * ow + cwc * (ow // 2)) * 2    # bf16 col chunks
            inter = max(inter, oh * wc * 6)           # t i32 + bf16 copy
        # inp already counts both buffers — doubling it again overstated
        # input VMEM 2x and pushed workable ladders to the fallback
        if inp + wts + acc + outs + inter <= budget_bytes:
            return k
    return 0


def fused_rungs_fits(h: int, w: int, sizes) -> bool:
    """Can fused_rungs handle this geometry on-chip (whole-frame or
    W-chunked)?  metrans uses this to pick fused vs per-rung resizes."""
    ch, cw = h // 2, w // 2
    return (rungs_fit_vmem(h, w, sizes)
            or _pick_rungs_chunks(h, w, ch, cw, tuple(
                (int(ow), int(oh)) for ow, oh in sizes)) >= 1)


@lru_cache(maxsize=32)
def _build_rungs(n, h, w, ch, cw, sizes, method, interpret, quant="bf16"):
    """Shared scaffolding for both rung kernels; quant picks the row
    stage: "i8" = int8 MXU rows (per-rung [ahy_q, awy, ahc_q, awc, offy,
    offc] consts), "bf16" = bf16 rows ([ahy, awy, ahc, awc])."""
    i8 = quant == "i8"
    in_specs = [
        pl.BlockSpec((None, h, w), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((None, ch, cw), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((None, ch, cw), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_specs, out_shapes = [], []
    # cache NUMPY weights and convert inside fn: jnp arrays created here
    # would be tracers when the (lru_cached) builder first runs under an
    # outer jit trace, and dead tracers poison every later call
    # (CLAUDE.md convention; perf.py jits fused_rungs, metrans is eager)
    consts, inv_scales = [], []
    for (ow, oh) in sizes:
        ahy = resample_matrix(h, oh, method)
        ahc = resample_matrix(ch, oh // 2, method)
        awy = resample_matrix(w, ow, method).T
        awc = resample_matrix(cw, ow // 2, method).T
        if i8:
            ahy_q, sy = _quant_rows(ahy)
            ahc_q, sc = _quant_rows(ahc)
            offy = (128.0 * ahy_q.astype(np.float32).sum(1) / sy)[:, None]
            offc = (128.0 * ahc_q.astype(np.float32).sum(1) / sc)[:, None]
            inv_scales.append((1.0 / sy, 1.0 / sc))
            consts += [(ahy_q, None), (awy, jnp.bfloat16),
                       (ahc_q, None), (awc, jnp.bfloat16),
                       (offy, jnp.float32), (offc, jnp.float32)]
        else:
            consts += [(a, jnp.bfloat16) for a in (ahy, awy, ahc, awc)]
        for shp in ((oh, ow), (oh // 2, ow // 2), (oh // 2, ow // 2)):
            out_shapes.append(jax.ShapeDtypeStruct((n, *shp), jnp.uint8))
            out_specs.append(pl.BlockSpec((None, *shp),
                                          lambda i: (i, 0, 0),
                                          memory_space=pltpu.VMEM))
        for a, _dt in consts[-(6 if i8 else 4):]:
            in_specs.append(pl.BlockSpec(a.shape, lambda i: (0, 0),
                                         memory_space=pltpu.VMEM))

    if i8:
        kernel = partial(_rungs_kernel_i8, n_rungs=len(sizes),
                         inv_scales=tuple(inv_scales))
    else:
        kernel = partial(_rungs_kernel, n_rungs=len(sizes))
    call = pl.pallas_call(
        kernel,
        grid_spec=pl.GridSpec(grid=(n,), in_specs=in_specs,
                              out_specs=out_specs),
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )

    def fn(y, u, v):
        args = [jnp.asarray(a) if dt is None else jnp.asarray(a, dt)
                for a, dt in consts]
        outs = call(y, u, v, *args)
        return [tuple(outs[3 * r:3 * r + 3]) for r in range(len(sizes))]

    return jax.jit(fn)


def rungs_fit_vmem(h: int, w: int, sizes,
                   budget_bytes: int = 70 * 1024 * 1024) -> bool:
    """Conservative VMEM estimate for fused_rungs: whole-frame input
    blocks (double-buffered) + their bf16 lift + all rung weights +
    the largest row-stage intermediate + u8 outputs.  4K sources with a
    3-rung ladder blow the budget — callers fall back to per-rung
    resizes (metrans does this automatically)."""
    ch, cw = h // 2, w // 2
    inp = (h * w + 2 * ch * cw) * 2            # u8 blocks, double-buffered
    acts = (h * w + 2 * ch * cw) * 2           # bf16 lift of the planes
    weights = inter = outs = 0
    for ow, oh in sizes:
        weights += (oh * h + w * ow + (oh // 2) * ch
                    + cw * (ow // 2)) * 2      # bf16
        inter = max(inter, oh * w * 6)         # t f32 + bf16 copy
        outs += (oh * ow + 2 * (oh // 2) * (ow // 2)) * 2
    return inp + acts + weights + inter + outs <= budget_bytes


def fused_rungs(y: jax.Array, u: jax.Array, v: jax.Array, sizes,
                method: str = "bilinear", interpret: bool = False,
                quant: str = "auto"):
    """One fused pass: YUV420 batch -> every ABR rung's YUV420 planes.

    sizes: sequence of (out_w, out_h), all even.  Returns a list of
    (y, u, v) u8 tuples, one per rung.  The source planes are read from
    HBM once for all rungs (the reference re-reads them per rung:
    AppMeTrans EncodeVideoProc -> ScaleNv12, Resize.cu:77).

    quant: "auto" rides the int8 MXU for the row matmuls when the tap
    quantization holds tolerance (2x MXU throughput; this kernel is
    MXU-bound unlike the 224-ladder — measured 1.32x); "i8"/"bf16"
    force a path.  int8 rows hold <=3 u8-LSB on pure noise / <=2
    typical (1/127 tap steps — the precision class of the reference's
    texture-unit bilinear, 9-bit fixed-point fractions); bf16 <=1.
    """
    if method not in ("bilinear", "nearest"):
        raise ValueError(f"fused_rungs: method must be bilinear|nearest, "
                         f"got {method!r}")
    if quant not in ("auto", "i8", "bf16"):
        raise ValueError(f"fused_rungs: quant must be auto|i8|bf16, "
                         f"got {quant!r}")
    sizes = tuple((int(ow), int(oh)) for ow, oh in sizes)
    for ow, oh in sizes:
        if (ow | oh) & 1:
            raise ValueError(f"rung size {ow}x{oh} must be even (4:2:0)")
    n, h, w = y.shape
    ch, cw = u.shape[1], u.shape[2]
    if not rungs_fit_vmem(h, w, sizes):
        # 4K+ sources: column-chunked accumulation keeps the ladder
        # fused (int8 path only — the bf16 kernel has no chunked form).
        # auto runs the SAME tap-quantization gate as the whole-frame
        # path: oversize frames must not silently skip the tolerance
        # check they document.
        use_i8 = quant == "i8" or (
            quant == "auto" and all(_rung_i8_ok(h, ch, oh, method)
                                    for _ow, oh in sizes))
        kc = _pick_rungs_chunks(h, w, ch, cw, sizes) if use_i8 else 0
        if kc >= 1:   # k=1 = whole frame fits the (larger) i8 budget
            fn = _build_rungs_i8_chunked(n, h, w, ch, cw, sizes, method,
                                         bool(interpret), kc)
            return fn(y, u, v)
        raise ValueError(f"fused_rungs: {w}x{h} with {len(sizes)} rungs "
                         "exceeds the VMEM budget; resize per rung "
                         "instead (ops.resize.resize)")
    if quant == "auto":
        # int8 only while tap quantization holds tolerance on the
        # matrices that are actually quantized: the ROW matrices, luma
        # (h -> oh) and chroma (ch -> oh//2); columns stay bf16.  The
        # check runs on the real matrices (no method short-circuit), so
        # widening the method whitelist above cannot silently push a
        # wide-tap method past tolerance; lru-cached per geometry so the
        # per-batch hot path never recomputes the numpy bound.
        quant = ("i8" if all(_rung_i8_ok(h, ch, oh, method)
                             for _ow, oh in sizes) else "bf16")
    fn = _build_rungs(n, h, w, ch, cw, sizes, method, bool(interpret),
                      quant)
    return fn(y, u, v)


# ------------------------------------------------- W-chunked i8 variant
# >4K frames don't fit VMEM whole (an 8K luma plane is 33 MB); the frame
# is split into column chunks and the ladder becomes
#     out = sum_k (Ah @ X[:, k]) @ Aw[k, :]
# with f32 accumulators in VMEM scratch — interpolation windows straddling
# a chunk boundary fall out naturally because the chunks partition Aw's
# rows.  The row-stage +128 offset correction is applied once in the
# epilogue (per-chunk Aw column sums are partial; only the total sums to 1).
# Replaces the reference's size-agnostic texture path (Resize.cu:15-80 —
# NVDEC handles 8K) for beyond-VMEM inputs.


def _ladder_kernel_i8_chunked(y_ref, u_ref, v_ref, ahy_ref, awy_ref,
                              ahc_ref, awc_ref, offy_ref, offc_ref, out_ref,
                              acc_y, acc_u, acc_v,
                              *, mat, low, mid, norm, shift, kw_chunks,
                              inv_sy=1.0 / 127.0, inv_sc=1.0 / 127.0):
    k = pl.program_id(1)

    def partial_rowcol(x_ref, ah_i8, aw_bf, inv_s):
        x8 = pltpu.bitcast(x_ref[...] ^ jnp.uint8(0x80), jnp.int8)
        t = jax.lax.dot_general(ah_i8[...], x8, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        tb = (t.astype(jnp.float32) * inv_s).astype(jnp.bfloat16)
        return jax.lax.dot_general(tb, aw_bf[...], (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    py = partial_rowcol(y_ref, ahy_ref, awy_ref, inv_sy)
    pu = partial_rowcol(u_ref, ahc_ref, awc_ref, inv_sc)
    pv = partial_rowcol(v_ref, ahc_ref, awc_ref, inv_sc)

    @pl.when(k == 0)
    def _init():
        acc_y[...] = py
        acc_u[...] = pu
        acc_v[...] = pv

    @pl.when(k > 0)
    def _accum():
        acc_y[...] = acc_y[...] + py
        acc_u[...] = acc_u[...] + pu
        acc_v[...] = acc_v[...] + pv

    @pl.when(k == kw_chunks - 1)
    def _epilogue():
        yy = acc_y[...] + offy_ref[...] - low
        uu = acc_u[...] + offc_ref[...] - mid
        vv = acc_v[...] + offc_ref[...] - mid
        maxv = 2.0 * mid - 1.0
        r = jnp.clip(mat[0, 0] * yy + mat[0, 1] * uu + mat[0, 2] * vv,
                     0., maxv)
        g = jnp.clip(mat[1, 0] * yy + mat[1, 1] * uu + mat[1, 2] * vv,
                     0., maxv)
        b = jnp.clip(mat[2, 0] * yy + mat[2, 1] * uu + mat[2, 2] * vv,
                     0., maxv)
        out_ref[0, :, :] = (r - shift[0]) * (1.0 / norm)
        out_ref[1, :, :] = (g - shift[1]) * (1.0 / norm)
        out_ref[2, :, :] = (b - shift[2]) * (1.0 / norm)


@lru_cache(maxsize=32)
def _build_ladder_i8_chunked(n, h, w, ch, cw, out_h, out_w, colorspace,
                             method, norm, shift, interpret, kw_chunks,
                             crop=None, smooth=None, flip=None):
    mat = yuv2rgb_matrix(colorspace)
    low, mid = yuv_offsets(8)
    # crop/smooth/flip compose into the same full-width matrices the
    # chunks slice: crop zeros live outside their chunk, output-side
    # smoothing/flips touch only the un-chunked output axes, and the
    # epilogue's offset correction is applied once (colsum still 1)
    ahy, ahc, awy_np, awc_np = _i8_matrices(
        h, w, ch, cw, out_h, out_w, method, crop, smooth, flip)
    ahy_q, sy = _quant_rows(ahy)
    ahc_q, sc = _quant_rows(ahc)
    offy = (128.0 * ahy_q.astype(np.float32).sum(1) / sy)[:, None]
    offc = (128.0 * ahc_q.astype(np.float32).sum(1) / sc)[:, None]
    wc, cwc = w // kw_chunks, cw // kw_chunks

    kernel = partial(_ladder_kernel_i8_chunked, mat=mat, low=float(low),
                     mid=float(mid), norm=float(norm), shift=shift,
                     kw_chunks=kw_chunks, inv_sy=1.0 / sy, inv_sc=1.0 / sc)
    grid_spec = pl.GridSpec(
        grid=(n, kw_chunks),
        in_specs=[
            pl.BlockSpec((None, h, wc), lambda i, k: (i, 0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, ch, cwc), lambda i, k: (i, 0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, ch, cwc), lambda i, k: (i, 0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((out_h, h), lambda i, k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wc, out_w), lambda i, k: (k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((out_h, ch), lambda i, k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cwc, out_w), lambda i, k: (k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((out_h, 1), lambda i, k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((out_h, 1), lambda i, k: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, 3, out_h, out_w),
                               lambda i, k: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((out_h, out_w), jnp.float32)
                        for _ in range(3)],
    )
    call = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, 3, out_h, out_w), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )

    def fn(y, u, v):
        return call(y, u, v,
                    jnp.asarray(ahy_q), jnp.asarray(awy_np, jnp.bfloat16),
                    jnp.asarray(ahc_q), jnp.asarray(awc_np, jnp.bfloat16),
                    jnp.asarray(offy, jnp.float32),
                    jnp.asarray(offc, jnp.float32))

    return jax.jit(fn)


def _pick_w_chunks(h, w, ch, cw, budget_bytes=24 * 1024 * 1024) -> int:
    """Smallest chunk count whose per-step input fits the VMEM budget and
    whose luma/chroma chunk widths stay lane-aligned (multiples of 128)."""
    per_frame = h * w + 2 * ch * cw
    if per_frame <= budget_bytes:
        return 1        # whole-frame blocks need no alignment constraint
    for k in range(2, 65):
        if (w % (k * 128) == 0 and cw % (k * 128) == 0
                and per_frame // k <= budget_bytes):
            return k
    return 0            # no lane-aligned chunking: caller falls back


def fused_ladder_i8(y: jax.Array, u: jax.Array, v: jax.Array,
                    out_h: int, out_w: int, colorspace: str = "bt709",
                    method: str = "bilinear", norm: float = 255.0,
                    shift=(0.0, 0.0, 0.0), interpret: bool = False,
                    crop_box=None, smooth=None, flip=None):
    """int8-MXU fused ladder (bilinear/nearest only; weights quantized to
    1/127 steps, <=1 u8-LSB vs the bf16 kernel).

    crop_box=(x, y, w, h) crops the source for free: the interpolation
    matrices simply stop reading outside the box (even coords for 4:2:0).
    smooth=(kw, kh, sigmaX, sigmaY, border) / flip in {0, 1, -1} fold
    into the matrices the same way (quant-gated: a wide fused gaussian
    that int8 can't hold falls back to the bf16 kernel).
    Frames beyond ~4K are processed in column chunks (same math, f32
    VMEM accumulators), so 8K inputs run on-chip too.
    """
    if method not in ("bilinear", "nearest", "bicubic", "area", "lanczos3"):
        raise ValueError(f"int8 ladder: unknown method {method!r}")
    n, h, w = y.shape
    ch, cw = u.shape[1], u.shape[2]
    if crop_box is not None:
        # normalize/validate BEFORE the dispatch gate uses the box dims
        # (float CLI geometry would reach resample_matrix otherwise)
        crop_box = _validate_crop_box(crop_box, w, h)
    flip = _validate_flip(flip)
    if smooth is not None:
        smooth = _validate_smooth(smooth)
    kw_chunks = _pick_w_chunks(h, w, ch, cw)
    fusions = crop_box is not None or smooth is not None or flip is not None
    # the quantization gate judges the matrices actually quantized —
    # crop windows, fused gaussians and flips included (_i8_matrices)
    if kw_chunks == 0 or not _i8_ok_composed(h, w, ch, cw, out_h, out_w,
                                             method, crop_box, smooth,
                                             flip):
        # int8 can't hold (wide antialiased taps / fused gaussian) or the
        # frame exceeds VMEM with no lane-aligned chunking
        if fusions and kw_chunks == 1:
            # tap quantization can't hold: the bf16 kernel carries the
            # fused crop/smooth/flip instead
            return fused_ladder(y, u, v, out_h, out_w, colorspace,
                                method, norm, shift, interpret,
                                crop_box=crop_box, smooth=smooth,
                                flip=flip)
        if kw_chunks != 1:
            # >VMEM frame where int8 can't carry it (no lane-aligned
            # chunking, or the chunked gate failed with fusions — the
            # bf16 kernel has no chunked form): take the exact XLA path,
            # fused ops included, as preprocess_nchw documents
            from ..core.frame import FrameBatch
            from . import fused as _fused
            fb = FrameBatch({"y": y, "u": u, "v": v}, "yuv420p",
                            w, h, colorspace)
            return _fused.preprocess_nchw(
                fb, out_w, out_h, method=method, norm=float(norm),
                shift=tuple(shift), crop_box=crop_box, flip_code=flip,
                smooth=smooth, use_pallas="never")
        return fused_ladder(y, u, v, out_h, out_w, colorspace, method,
                            norm, shift, interpret)
    if kw_chunks > 1:
        fn = _build_ladder_i8_chunked(
            n, h, w, ch, cw, out_h, out_w, colorspace, method, float(norm),
            tuple(float(s) for s in shift), bool(interpret), kw_chunks,
            crop_box, smooth, flip)
        return fn(y, u, v)
    fn = _build_ladder_i8(n, h, w, ch, cw, out_h, out_w, colorspace, method,
                          float(norm), tuple(float(s) for s in shift),
                          bool(interpret), crop_box, smooth, flip)
    return fn(y, u, v)
