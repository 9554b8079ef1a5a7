"""bwdif tests.

The oracle below is transcribed INDEPENDENTLY from
ffmpeg-gpu/libavfilter/vf_bwdif.c — scalar per-pixel loops mirroring the
C macros FILTER_INTRA/FILTER1/SPAT_CHECK/FILTER_LINE/FILTER_EDGE/FILTER2
(:60-121) and the filter_slice row dispatch + boundary mirrors
(:215-258), with the yadif_common.c frame state machine (FIELD_END at
stream start and at the flushed second field).  No code is shared with
gmat_tpu/ops/bwdif.py.

Planes in tests keep h >= 4 so no access needs the out-of-plane
clamp (the C reads past a 2-row plane at the intra mrefs3 tap — UB we
deliberately clip instead; see ops/bwdif.py docstring).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from gmat_tpu.core.frame import FrameBatch, from_numpy_yuv420
from gmat_tpu.filters.builtin import FilterError
from gmat_tpu.filters.graph import FilterGraph

CL = (4309, 213)
CH = (5570, 3801, 1016)
CS = (5077, 981)


def _intra_row(cur, y, w, h, clip_max, out):
    # the C's guards are in BYTES (df = bytes/sample, filter_slice:223):
    # 16-bit planes mirror one row early at both borders
    df = 2 if clip_max > 255 else 1
    prefs = 1 if y + df < h else -1
    mrefs = -1 if y > df - 1 else 1
    prefs3 = 3 if y + 3 * df < h else -1
    mrefs3 = -3 if y > 3 * df - 1 else 1
    c = cur.astype(np.int64)
    for x in range(w):
        interpol = (CS[0] * (c[y + mrefs, x] + c[y + prefs, x])
                    - CS[1] * (c[y + mrefs3, x] + c[y + prefs3, x])) >> 13
        out[y, x] = min(max(interpol, 0), clip_max)


def oracle_frame(prev, cur, next_, parity, tff, clip_max, field_end=False):
    """One plane: rows with (y ^ parity) & 1 are predicted, others copied
    (filter_slice:228-257)."""
    h, w = cur.shape
    out = cur.copy()
    p = prev.astype(np.int64)
    cc = cur.astype(np.int64)
    nx = next_.astype(np.int64)
    kpar = parity ^ tff
    prev2 = p if kpar else cc
    next2 = cc if kpar else nx
    for y in range(h):
        if not ((y ^ parity) & 1):
            continue
        if field_end:
            _intra_row(cur, y, w, h, clip_max, out)
            continue
        df = 2 if clip_max > 255 else 1
        prefs = 1 if y + df < h else -1
        mrefs = -1 if y > df - 1 else 1
        is_edge = (y < 4) or (y + 5 > h)
        spat = 0 if ((y < 2) or (y + 3 > h)) else 1
        for x in range(w):
            c = cc[y + mrefs, x]
            d = (prev2[y, x] + next2[y, x]) >> 1
            e = cc[y + prefs, x]
            td0 = abs(prev2[y, x] - next2[y, x])
            td1 = (abs(p[y + mrefs, x] - c) + abs(p[y + prefs, x] - e)) >> 1
            td2 = (abs(nx[y + mrefs, x] - c) + abs(nx[y + prefs, x] - e)) >> 1
            diff = max(td0 >> 1, td1, td2)
            if not diff:
                out[y, x] = d
                continue

            def spat_check(diff):
                b = ((prev2[y - 2, x] + next2[y - 2, x]) >> 1) - c
                f = ((prev2[y + 2, x] + next2[y + 2, x]) >> 1) - e
                dc = d - c
                de = d - e
                mx = max(de, dc, min(b, f))
                mn = min(de, dc, max(b, f))
                return max(diff, mn, -mx)

            if is_edge:
                if spat:
                    diff = spat_check(diff)
                interpol = (c + e) >> 1
            else:
                diff = spat_check(diff)
                if abs(c - e) > td0:
                    interpol = (((CH[0] * (prev2[y, x] + next2[y, x])
                                  - CH[1] * (prev2[y - 2, x] + next2[y - 2, x]
                                             + prev2[y + 2, x]
                                             + next2[y + 2, x])
                                  + CH[2] * (prev2[y - 4, x] + next2[y - 4, x]
                                             + prev2[y + 4, x]
                                             + next2[y + 4, x])) >> 2)
                                + CL[0] * (c + e)
                                - CL[1] * (cc[y - 3, x] + cc[y + 3, x])) >> 13
                else:
                    interpol = (CS[0] * (c + e)
                                - CS[1] * (cc[y - 3, x] + cc[y + 3, x])) >> 13
            if interpol > d + diff:
                interpol = d + diff
            elif interpol < d - diff:
                interpol = d - diff
            out[y, x] = min(max(interpol, 0), clip_max)
    return out


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def test_bwdif_plane_oracle(rng):
    from gmat_tpu.ops.bwdif import bwdif_plane
    h, w = 16, 12
    for dt, clip_max in ((np.uint8, 255), (np.uint16, 65535)):
        prev = rng.integers(0, clip_max + 1, (2, h, w)).astype(dt)
        cur = rng.integers(0, clip_max + 1, (2, h, w)).astype(dt)
        nxt = rng.integers(0, clip_max + 1, (2, h, w)).astype(dt)
        for parity, tff in ((0, 1), (1, 1), (0, 0), (1, 0)):
            got = np.asarray(bwdif_plane(jnp.asarray(prev), jnp.asarray(cur),
                                         jnp.asarray(nxt), parity, tff))
            for i in range(2):
                want = oracle_frame(prev[i], cur[i], nxt[i], parity, tff,
                                    clip_max)
                np.testing.assert_array_equal(
                    got[i], want, err_msg=f"dt={dt} p={parity} tff={tff}")


def test_bwdif_intra_oracle(rng):
    from gmat_tpu.ops.bwdif import bwdif_intra_plane
    h, w = 12, 10
    cur = rng.integers(0, 256, (3, h, w)).astype(np.uint8)
    for parity in (0, 1):
        got = np.asarray(bwdif_intra_plane(jnp.asarray(cur), parity))
        for i in range(3):
            want = cur[i].copy()
            for y in range(h):
                if (y ^ parity) & 1:
                    _intra_row(cur[i], y, w, h, 255, want)
            np.testing.assert_array_equal(got[i], want)


def _frames(rng, n, h=16, w=12):
    return [tuple(rng.integers(0, 256, s).astype(np.uint8)
                  for s in ((h, w), (h // 2, w // 2), (h // 2, w // 2)))
            for _ in range(n)]


def _run_stream(frames, spec, batches, pts=None):
    """Push frames through FilterGraph in the given batch split; collect
    surviving output planes + pts, including flush."""
    g = FilterGraph(spec)
    outs, out_pts = [], []
    i = 0
    for bs in batches:
        chunk = frames[i:i + bs]
        i += bs
        y = np.stack([f[0] for f in chunk])
        u = np.stack([f[1] for f in chunk])
        v = np.stack([f[2] for f in chunk])
        fb = from_numpy_yuv420(y, u, v)
        p = None if pts is None else np.asarray(pts[i - bs:i])
        ofb, keep = g.process(fb, pts=p)
        ys = np.asarray(ofb.planes["y"])
        us = np.asarray(ofb.planes["u"])
        vs = np.asarray(ofb.planes["v"])
        for j in np.nonzero(keep)[0]:
            outs.append((ys[j], us[j], vs[j]))
        if g.out_pts is not None:
            out_pts.extend(np.asarray(g.out_pts)[keep].tolist())
    for ofb, keep, meta in g.flush() or []:
        ys = np.asarray(ofb.planes["y"])
        us = np.asarray(ofb.planes["u"])
        vs = np.asarray(ofb.planes["v"])
        for j in np.nonzero(keep)[0]:
            outs.append((ys[j], us[j], vs[j]))
        if meta.get("pts") is not None:
            out_pts.extend(np.asarray(meta["pts"])[keep].tolist())
    return outs, out_pts


def _oracle_stream(frames, tff, send_field):
    """yadif_common state machine with bwdif kernels: prev of f0 is f0,
    next of f[last] is f[last]; FIELD_END on the first output field and
    on the flushed second field."""
    n = len(frames)
    outs = []
    for i in range(n):
        prev = frames[max(i - 1, 0)]
        cur = frames[i]
        nxt = frames[min(i + 1, n - 1)]
        fields = [(tff ^ 1, i == 0)]
        if send_field:
            fields.append((tff, i == n - 1))
        for parity, fe in fields:
            planes = []
            for pl in range(3):
                planes.append(oracle_frame(prev[pl], cur[pl], nxt[pl],
                                           parity, tff, 255, field_end=fe))
            outs.append(tuple(planes))
    return outs


def test_bwdif_stream_send_field_default(rng):
    frames = _frames(rng, 6)
    pts = np.arange(6) * 100 + 7
    outs, out_pts = _run_stream(frames, "bwdif", [6], pts)
    want = _oracle_stream(frames, tff=1, send_field=True)
    assert len(outs) == 12
    for k, (got, exp) in enumerate(zip(outs, want)):
        for pl in range(3):
            np.testing.assert_array_equal(got[pl], exp[pl],
                                          err_msg=f"out {k} plane {pl}")
    # pts: first field 2*pts, second cur+next (flush: extrapolated)
    exp_pts = []
    for i in range(6):
        exp_pts.append(2 * pts[i])
        exp_pts.append(pts[i] + (pts[i + 1] if i + 1 < 6
                                 else 2 * pts[5] - pts[4]))
    assert out_pts == exp_pts


def test_bwdif_stream_batching_invariant(rng):
    frames = _frames(rng, 7)
    a, _ = _run_stream(frames, "bwdif", [7])
    b, _ = _run_stream(frames, "bwdif", [2, 1, 3, 1])
    assert len(a) == len(b) == 14
    for k, (x, y) in enumerate(zip(a, b)):
        for pl in range(3):
            np.testing.assert_array_equal(x[pl], y[pl],
                                          err_msg=f"out {k} plane {pl}")


def test_bwdif_send_frame_mode(rng):
    frames = _frames(rng, 5)
    outs, _ = _run_stream(frames, "bwdif=send_frame:tff", [5])
    want = _oracle_stream(frames, tff=1, send_field=False)
    assert len(outs) == 5
    for k, (got, exp) in enumerate(zip(outs, want)):
        for pl in range(3):
            np.testing.assert_array_equal(got[pl], exp[pl],
                                          err_msg=f"out {k} plane {pl}")


def test_bwdif_bff_parity(rng):
    frames = _frames(rng, 4)
    outs, _ = _run_stream(frames, "bwdif=mode=send_frame:parity=bff", [4])
    want = _oracle_stream(frames, tff=0, send_field=False)
    for k, (got, exp) in enumerate(zip(outs, want)):
        for pl in range(3):
            np.testing.assert_array_equal(got[pl], exp[pl],
                                          err_msg=f"out {k} plane {pl}")


def test_bwdif_option_gates():
    with pytest.raises(FilterError, match="mode"):
        FilterGraph("bwdif=nonsense")
    with pytest.raises(FilterError, match="parity"):
        FilterGraph("bwdif=parity=sideways")
    g = FilterGraph("bwdif")
    tiny = from_numpy_yuv420(np.zeros((1, 2, 8), np.uint8),
                             np.zeros((1, 1, 4), np.uint8),
                             np.zeros((1, 1, 4), np.uint8))
    with pytest.raises(FilterError, match="3 columns or 4 lines"):
        g.process(tiny)


def test_bwdif_deint_interlaced_passthrough(rng):
    """deint=interlaced + send_frame: progressive frames pass through."""
    frames = _frames(rng, 4)
    g = FilterGraph("bwdif=mode=send_frame:deint=interlaced")
    y = np.stack([f[0] for f in frames])
    u = np.stack([f[1] for f in frames])
    v = np.stack([f[2] for f in frames])
    fb = from_numpy_yuv420(y, u, v)
    ilace = np.array([0, 3, 0, 3])      # bit0 interlaced, bit1 tff
    ofb, keep = g.process(fb, interlaced=ilace)
    got = np.asarray(ofb.planes["y"])[keep]
    # frame 0 is progressive -> unchanged
    np.testing.assert_array_equal(got[0], frames[0][0])
    # FIELD_END persists through the progressive passthrough: the first
    # FILTERED frame (index 1, tff from bit1 -> first field parity 0)
    # is spatial-only filter_intra, not temporally filtered
    want1 = frames[1][0].copy()
    h, w = want1.shape
    for yy in range(h):
        if (yy ^ 0) & 1:
            _intra_row(frames[1][0], yy, w, h, 255, want1)
    np.testing.assert_array_equal(got[1], want1)
    # frame 2 (progressive again) passes through; the last frame stays
    # in the lookahead register until flush
    np.testing.assert_array_equal(got[2], frames[2][0])
