"""hqdn3d — the classic high-quality 3D (spatio-temporal) denoiser.

Rebuilds `/root/reference/ffmpeg-gpu/libavfilter/vf_hqdn3d.c`:
  - precalc_coefs (vf_hqdn3d.c:176-191): per-strength int16 LUT over
    quantized pixel differences, gamma = log(.25)/log(1-dist25/255-1e-5),
    C = simil^gamma * 256 * f, lrint'd; ct[0] doubles as the
    spatial-enable flag (vf_hqdn3d.c:191,147).
  - lowpass (vf_hqdn3d.c:50-55): cur + coef[(prev-cur) >> (8-LUT_BITS)],
    LUT_BITS = 8 at depth 16 else 4.
  - denoise_spatial (vf_hqdn3d.c:80-121): horizontal IIR (pixel_ant),
    vertical IIR (line_ant, uint16-truncated between rows), then the
    temporal IIR against the previous *filtered* frame (frame_ant,
    uint16 state) — all in a 16-bit working scale: LOAD lifts samples by
    (16-depth) with a half-LSB bias, STORE shifts back down.
  - denoise_temporal (vf_hqdn3d.c:57-77) when spatial strength is 0.

TPU-first mapping: the row/column recurrences are `lax.scan`s carrying
whole (N,H)- or (N,W)-vectors, so every scan step is one vectorized
lowpass over a full line instead of the reference's per-pixel loop; the
temporal IIR scans over the batch axis with the cross-batch frame state
held by the stream filter.  The first-row / first-column special cases
(row 0 double-lowpasses its first pixel; later rows seed pixel_ant with
the RAW first sample) are reproduced with per-index selects inside the
scans.  int32 math with explicit uint16 masking mirrors the reference's
uint32/uint16 type flow exactly.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.frame import FrameBatch


def precalc_coefs(dist25: float, depth: int) -> np.ndarray:
    """int32 coefficient table, size 512<<LUT_BITS, offset 256<<LUT_BITS."""
    lut_bits = 8 if depth == 16 else 4
    n = 256 << lut_bits
    ct = np.zeros(2 * n, np.int32)
    gamma = math.log(0.25) / math.log(1.0 - min(dist25, 252.0) / 255.0
                                      - 0.00001)
    i = np.arange(-n, n, dtype=np.float64)
    f = ((i * (1 << (9 - lut_bits))) + (1 << (8 - lut_bits)) - 1) / 512.0
    simil = np.maximum(0.0, 1.0 - np.abs(f) / 255.0)
    c = np.power(simil, gamma) * 256.0 * f
    ct[:] = np.rint(c).astype(np.int64)     # lrint (ties even, irrelevant)
    ct[0] = 1 if dist25 else 0              # vf_hqdn3d.c:191
    return ct


def _lowpass(prev, cur, coef, shift, offset):
    d = (prev - cur) >> shift               # arithmetic, like C int >>
    return cur + jnp.take(coef, d + offset)


def _denoise_plane(arr, spatial_ct, temporal_ct, frame_state, depth):
    """One plane (N, H, W) -> (filtered, new_frame_state).

    frame_state: (H, W) int32 uint16-range array or None (first call:
    initialized from the first frame's LOADed samples like
    denoise_depth, vf_hqdn3d.c:133-145)."""
    lut_bits = 8 if depth == 16 else 4
    shift = 8 - lut_bits
    offset = 256 << lut_bits
    sp = jnp.asarray(spatial_ct)
    tp = jnp.asarray(temporal_ct)
    n, h, w = arr.shape
    loaded = (arr.astype(jnp.int32) << (16 - depth)) \
        + (((1 << (16 - depth)) - 1) >> 1)
    if frame_state is None:
        frame_state = loaded[0]
    spatial_on = bool(spatial_ct[0])

    if spatial_on:
        # horizontal IIR over x: carry pixel_ant (N, H); row 0 lowpasses
        # its first sample against itself, rows >=1 keep it raw
        is_row0 = (jnp.arange(h) == 0)[None, :]

        def hstep(carry, xs):
            col, xi = xs                    # col (N, H)
            lp = _lowpass(carry, col, sp, shift, offset)
            out = jnp.where(xi == 0, jnp.where(is_row0, lp, col), lp)
            return out, out

        cols = jnp.moveaxis(loaded, 2, 0)   # (W, N, H)
        _, hh = jax.lax.scan(hstep, loaded[:, :, 0],
                             (cols, jnp.arange(w)))
        hh = jnp.moveaxis(hh, 0, 2)         # (N, H, W) horizontal result

        # vertical IIR over y: carry line_ant (N, W), uint16-truncated
        def vstep(carry, ys):
            row, yi = ys                    # row (N, W) untruncated h
            v = jnp.where(yi == 0, row,
                          _lowpass(carry, row, sp, shift, offset))
            return v & 0xFFFF, v

        rows = jnp.moveaxis(hh, 1, 0)       # (H, N, W)
        _, vv = jax.lax.scan(vstep, rows[0] & 0xFFFF,
                             (rows, jnp.arange(h)))
        vv = jnp.moveaxis(vv, 0, 1)         # (N, H, W)
    else:
        vv = loaded                         # denoise_temporal path

    # temporal IIR over the batch: carry frame_ant (H, W) uint16
    def tstep(carry, frame):
        t = _lowpass(carry, frame, tp, shift, offset)
        return t & 0xFFFF, t

    new_state, tt = jax.lax.scan(tstep, frame_state & 0xFFFF, vv)
    out = (tt >> (16 - depth)).astype(arr.dtype)
    return out, new_state


class HQDN3D:
    """Stateful per-stream denoiser; one instance per FilterGraph.

    Strength defaults follow init() (vf_hqdn3d.c:196-211): unset values
    derive from the ratios of 4:3:6:4.5."""

    def __init__(self, luma_spatial: float = 0.0,
                 chroma_spatial: float = 0.0,
                 luma_tmp: float = 0.0, chroma_tmp: float = 0.0):
        ls = float(luma_spatial) or 4.0
        cs = float(chroma_spatial) or 3.0 * ls / 4.0
        lt = float(luma_tmp) or 6.0 * ls / 4.0
        ct = float(chroma_tmp) or lt * cs / ls
        for v, nm in ((ls, "luma_spatial"), (cs, "chroma_spatial"),
                      (lt, "luma_tmp"), (ct, "chroma_tmp")):
            if not 0.0 <= v <= 255.0:
                raise ValueError(f"hqdn3d {nm}={v} out of [0, 255]")
        self.strengths = (ls, cs, lt, ct)
        self._coefs = {}                    # depth -> 4 tables
        self._state = {}                    # plane name -> (H, W) array

    def _tables(self, depth):
        t = self._coefs.get(depth)
        if t is None:
            t = tuple(precalc_coefs(s, depth) for s in self.strengths)
            self._coefs[depth] = t
        return t

    def reset(self):
        self._state.clear()

    def __call__(self, fb: FrameBatch) -> FrameBatch:
        fmt = fb.fmt
        if fmt.is_rgb or fmt.is_float or fmt.name in ("p010", "p016"):
            raise ValueError("hqdn3d operates on planar YUV/gray "
                             "(vf_hqdn3d.c pix_fmts); convert first")
        depth = fmt.bits
        ls, cs, lt, ct = self._tables(depth)
        planes = {}
        for p in fmt.planes:
            arr = fb.planes[p.name]
            spatial, temporal = (ls, lt) if p.name == "y" else (cs, ct)
            st = self._state.get(p.name)
            if st is not None and st.shape != arr.shape[1:]:
                st = None                   # dimension change: re-seed
            out, st = _denoise_plane(arr, spatial, temporal, st, depth)
            self._state[p.name] = st
            planes[p.name] = out
        return fb.with_planes(planes)
