"""bwdif deinterlacing — TPU rebuild of ffmpeg's vf_bwdif.

Reference math: ffmpeg-gpu/libavfilter/vf_bwdif.c
  * Weston 3-field coefficients coef_lf/coef_hf/coef_sp (:47-49)
  * FILTER_INTRA (:60-67), FILTER1 (:69-80), SPAT_CHECK (:82-89),
    FILTER_LINE (:91-100), FILTER_EDGE (:102-106), FILTER2 (:108-121)
  * per-row dispatch + boundary mirrors in filter_slice (:215-258):
    rows y<4 or y+5>h use filter_edge (spatial check only when
    !(y<2 || y+3>h)); the row-mirror index rules for prefs/mrefs/
    prefs3/mrefs3 are reproduced with static per-height gather maps.
Frame/parity/pts state machine: shared with yadif
(yadif_common.c:27-157) — including the FIELD_END rule that the very
first output field and (send_field mode) the final flushed second
field are spatial-only filter_intra frames (yadif_common.c:47-48,112).

TPU-first formulation: the C walks pixels one at a time per slice
thread; here every tap is a row-gather (jnp.take with a host-built
static index map, reproducing the exact mirror rules) or a clamped
shift, and the whole batch of output fields is ONE fused XLA
elementwise program.  All three row classes (line/edge/intra) are
computed vectorized and selected by a broadcasted row-index mask —
edge rows are a tiny fraction of the plane, and fusing beats a
scalar-row loop on the VPU by orders of magnitude.  int32 math; C's
arithmetic >> on possibly-negative accumulators maps to jnp's
arithmetic shift_right on int32.
"""
from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

# BBC PH-2071 (Weston 3-field) coefficients, vf_bwdif.c:47-49
COEF_LF = (4309, 213)
COEF_HF = (5570, 3801, 1016)
COEF_SP = (5077, 981)


def _rows(h: int):
    return np.arange(h)


def _take_rows(x: jax.Array, idx: np.ndarray) -> jax.Array:
    """Gather whole rows by a static per-height index map (N, H, W)."""
    return jnp.take(x, jnp.asarray(idx), axis=1)


def _vshift(x: jax.Array, dy: int) -> jax.Array:
    """Row shift with edge clamp — used only for taps the C guarantees
    in-bounds for every row class that reads them (see row masks)."""
    idx = np.clip(_rows(x.shape[1]) + dy, 0, x.shape[1] - 1)
    return _take_rows(x, idx)


def bwdif_intra_plane(cur: jax.Array, parity: int) -> jax.Array:
    """filter_intra over a whole plane: spatial-only Weston interpolation
    for every predicted row (vf_bwdif.c:60-67 with the filter_slice
    mirror rules :235-239).  Rows with y%2 == parity are copied."""
    dt = cur.dtype
    clip_max = 65535 if dt == jnp.uint16 else 255
    c = cur.astype(jnp.int32)
    h = c.shape[1]
    r = _rows(h)
    # mirror maps: the C's guards are in BYTES — df = bytes/sample
    # ((depth+7)/8, filter_slice:223), so 16-bit planes mirror one row
    # early at both borders (prefs = (y+df)<h ? refs : -refs, etc.,
    # :235-239).  A quirk of the byte-based guard, reproduced exactly:
    #   prefs  = y+1 if y+df  < h   else y-1
    #   mrefs  = y-1 if y > df-1    else y+1
    #   prefs3 = y+3 if y+3df < h   else y-1   (falls back ONE row up)
    #   mrefs3 = y-3 if y > 3df-1   else y+1   (ONE row down)
    df = 2 if dt == jnp.uint16 else 1
    ip1 = np.where(r + df < h, r + 1, r - 1)
    im1 = np.where(r > df - 1, r - 1, r + 1)
    ip3 = np.where(r + 3 * df < h, r + 3, r - 1)
    im3 = np.where(r > 3 * df - 1, r - 3, r + 1)
    interpol = (COEF_SP[0] * (_take_rows(c, im1) + _take_rows(c, ip1))
                - COEF_SP[1] * (_take_rows(c, im3) + _take_rows(c, ip3))
                ) >> 13
    interpol = jnp.clip(interpol, 0, clip_max)
    rows = jax.lax.broadcasted_iota(jnp.int32, c.shape, 1)
    return jnp.where(rows % 2 == parity, c, interpol).astype(dt)


def bwdif_plane(prev: jax.Array, cur: jax.Array, next_: jax.Array,
                parity: int, tff: int) -> jax.Array:
    """One batched plane (N, H, W): filter_line on interior rows,
    filter_edge on y<4 / y+5>h with the C's spat gating, FILTER2 clamp.
    Rows with y%2 == parity are copied from cur."""
    dt = cur.dtype
    clip_max = 65535 if dt == jnp.uint16 else 255
    p = prev.astype(jnp.int32)
    cc = cur.astype(jnp.int32)
    nx = next_.astype(jnp.int32)
    h = cc.shape[1]
    r = _rows(h)

    # prev2/next2 selection (filter_line_c:146-147): the kernel-arg
    # parity is td->parity ^ td->tff
    kparity = parity ^ tff
    prev2 = p if kparity else cc
    next2 = cc if kparity else nx

    # row-mirror maps shared by line+edge (filter_slice:241-252):
    # prefs/mrefs mirror at the frame border with the C's BYTE-based
    # guards (df = bytes/sample — 16-bit planes mirror one row early);
    # ±2/±3/±4 taps are only read by row classes whose ranges keep them
    # in bounds, so plain clamped shifts are exact there.
    df = 2 if dt == jnp.uint16 else 1
    ip1 = np.where(r + df < h, r + 1, r - 1)
    im1 = np.where(r > df - 1, r - 1, r + 1)

    c_ = _take_rows(cc, im1)
    e_ = _take_rows(cc, ip1)
    d_ = (prev2 + next2) >> 1
    td0 = jnp.abs(prev2 - next2)
    td1 = (jnp.abs(_take_rows(p, im1) - c_)
           + jnp.abs(_take_rows(p, ip1) - e_)) >> 1
    td2 = (jnp.abs(_take_rows(nx, im1) - c_)
           + jnp.abs(_take_rows(nx, ip1) - e_)) >> 1
    diff0 = jnp.maximum(jnp.maximum(td0 >> 1, td1), td2)

    # SPAT_CHECK (:82-89) — ±2 taps, in bounds wherever spat applies
    p2m = _vshift(prev2, -2)
    p2p = _vshift(prev2, 2)
    n2m = _vshift(next2, -2)
    n2p = _vshift(next2, 2)
    b_ = ((p2m + n2m) >> 1) - c_
    f_ = ((p2p + n2p) >> 1) - e_
    dc = d_ - c_
    de = d_ - e_
    mx = jnp.maximum(jnp.maximum(de, dc), jnp.minimum(b_, f_))
    mn = jnp.minimum(jnp.minimum(de, dc), jnp.maximum(b_, f_))
    diff_spat = jnp.maximum(jnp.maximum(diff0, mn), -mx)

    # FILTER_LINE (:91-100) — interior rows only, ±3/±4 in bounds
    c3m = _vshift(cc, -3)
    c3p = _vshift(cc, 3)
    hf = ((COEF_HF[0] * (prev2 + next2)
           - COEF_HF[1] * (p2m + n2m + p2p + n2p)
           + COEF_HF[2] * (_vshift(prev2, -4) + _vshift(next2, -4)
                           + _vshift(prev2, 4) + _vshift(next2, 4))) >> 2)
    interpol_hf = (hf + COEF_LF[0] * (c_ + e_)
                   - COEF_LF[1] * (c3m + c3p)) >> 13
    interpol_sp = (COEF_SP[0] * (c_ + e_) - COEF_SP[1] * (c3m + c3p)) >> 13
    interpol_line = jnp.where(jnp.abs(c_ - e_) > td0,
                              interpol_hf, interpol_sp)
    interpol_edge = (c_ + e_) >> 1

    # row classes (filter_slice:240-252): edge rows y<4 or y+5>h;
    # within edge, spat unless y<2 or y+3>h
    is_edge = (r < 4) | (r + 5 > h)
    has_spat = ~((r < 2) | (r + 3 > h))
    edge_m = jnp.asarray(is_edge)[None, :, None]
    spat_m = jnp.asarray(has_spat)[None, :, None]

    interpol = jnp.where(edge_m, interpol_edge, interpol_line)
    diff = jnp.where(spat_m, diff_spat, diff0)

    # FILTER2 (:108-121): clamp into [d-diff, d+diff], saturate
    interpol = jnp.clip(interpol, d_ - diff, d_ + diff)
    interpol = jnp.clip(interpol, 0, clip_max)
    pred = jnp.where(diff0 == 0, d_, interpol)

    rows = jax.lax.broadcasted_iota(jnp.int32, cc.shape, 1)
    return jnp.where(rows % 2 == parity, cc, pred).astype(dt)


def _apply_frames(fn, plane_dicts, parity, tff):
    """Apply a plane kernel to every plane entry, folding packed (N,H,W,C)
    channels into the batch dim like ops/yadif.yadif_frames."""
    out = {}
    first = plane_dicts[0]
    for name in first:
        args = [d[name] for d in plane_dicts]
        cur = args[min(1, len(args) - 1)]
        if cur.ndim == 4:
            n, h, w, ch = cur.shape

            def fold(x):
                return jnp.transpose(x, (0, 3, 1, 2)).reshape(n * ch, h, w)

            o = fn(*[fold(a) for a in args], parity, tff)
            out[name] = jnp.transpose(o.reshape(n, ch, h, w), (0, 2, 3, 1))
        else:
            out[name] = fn(*args, parity, tff)
    return out


def _intra_frames(cur_planes, parity):
    return _apply_frames(lambda c, par, _tff: bwdif_intra_plane(c, par),
                         [cur_planes], parity, 0)


def _line_frames(prev_planes, cur_planes, next_planes, parity, tff):
    return _apply_frames(bwdif_plane,
                         [prev_planes, cur_planes, next_planes], parity, tff)


@partial(jax.jit, static_argnames=("tff", "send_field", "intra_first",
                                   "intra_last"))
def bwdif_batch(ext_planes, tff: int, send_field: bool,
                intra_first: int = -1, intra_last: int = -1):
    """One jitted pass over an extended frame sequence (same layout as
    ops/yadif.deint_batch): frame 0 is previous context, frame M-1 the
    look-ahead; outputs cover frames 1..M-2.

    intra_first >= 0: that OUTPUT index's FIRST field is spatial-only
    (yadif_common.c:107-112 sets FIELD_END when cur is the cloned first
    frame; bwdif's filter() consumes it, vf_bwdif.c:233).  An INDEX
    rather than a flag because with deint=interlaced FIELD_END persists
    through progressive passthrough frames — it lands on the first
    frame that is actually FILTERED, not output index 0.
    intra_last >= 0: EOF flush in send_field mode — that OUTPUT index's
    SECOND field is spatial-only (BACK_END -> END promotion in
    return_frame, yadif_common.c:47-48).  An index (not "the last")
    because pad_batch may append dead repeats after the real final frame.
    """
    m = next(iter(ext_planes.values())).shape[0]
    prev = {k: v[: m - 2] for k, v in ext_planes.items()}
    cur = {k: v[1: m - 1] for k, v in ext_planes.items()}
    nxt = {k: v[2:] for k, v in ext_planes.items()}
    first = _line_frames(prev, cur, nxt, tff ^ 1, tff)
    if intra_first >= 0:
        j = intra_first
        head = {k: v[1 + j: 2 + j] for k, v in ext_planes.items()}
        ih = _intra_frames(head, tff ^ 1)
        first = {k: jnp.concatenate([v[:j], ih[k], v[j + 1:]])
                 for k, v in first.items()}
    if not send_field:
        return first
    second = _line_frames(prev, cur, nxt, tff, tff)
    if intra_last >= 0:
        tgt = {k: v[intra_last + 1: intra_last + 2]
               for k, v in ext_planes.items()}
        it = _intra_frames(tgt, tff)
        second = {k: jnp.concatenate([v[:intra_last], it[k],
                                      v[intra_last + 1:]])
                  for k, v in second.items()}
    out = {}
    for k in first:
        a, b = first[k], second[k]
        out[k] = jnp.stack([a, b], axis=1).reshape(
            (a.shape[0] * 2,) + a.shape[1:])
    return out
