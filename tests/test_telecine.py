"""telecine/detelecine vs literal transcriptions of vf_telecine.c /
vf_detelecine.c."""
from fractions import Fraction

import numpy as np
import pytest

from gmat_tpu.filters.builtin import FilterError
from gmat_tpu.filters.graph import FilterGraph

from .test_filters import from_numpy_yuv420


def av_rescale(a, b, c):
    if a >= 0:
        return (a * b + c // 2) // c
    return -((-a * b + c // 2) // c)


def _weave_np(early, late, ff):
    out = [p.copy() for p in late]
    for o, e in zip(out, early):
        o[ff::2] = e[ff::2]
    return tuple(out)


def oracle_telecine(frames, pts, pattern, ff, src_fps, src_tb):
    """Literal vf_telecine.c filter_frame (:165-249) over (y,u,v)
    triples; returns (frames, out_pts, out_il)."""
    digits = [int(c) for c in pattern]
    ratio = Fraction(2 * len(digits), sum(digits))
    fps_out = Fraction(str(src_fps)) / ratio
    out_tb = src_tb * ratio
    ts_unit = 1 / (fps_out * out_tb)
    pos = 0
    start = None
    occupied = False
    temp = None
    outs, out_pts, out_il = [], [], []
    for fr, p in zip(frames, pts):
        if start is None:
            start = p
        length = digits[pos]
        pos = (pos + 1) % len(digits)
        if not length:
            continue
        if occupied:
            outs.append(_weave_np(temp, fr, ff))
            out_il.append(1 | ((not ff) << 1))
            out_pts.append(start + av_rescale(
                len(outs) - 1, ts_unit.numerator, ts_unit.denominator))
            length -= 1
            occupied = False
        while length >= 2:
            outs.append(fr)
            out_il.append(0)
            out_pts.append(start + av_rescale(
                len(outs) - 1, ts_unit.numerator, ts_unit.denominator))
            length -= 2
        if length >= 1:
            temp = fr
            occupied = True
    return outs, out_pts, out_il


def oracle_detelecine(frames, pts, pattern, ff, src_fps, src_tb,
                      start_frame=0):
    """Literal vf_detelecine.c filter_frame (:195-305) + the
    start_frame init precomputation (:102-118)."""
    digits = [int(c) for c in pattern]
    ratio = Fraction(sum(digits), 2 * len(digits))
    fps_out = Fraction(str(src_fps)) / ratio
    out_tb = src_tb * ratio
    ts_unit = 1 / (fps_out * out_tb)
    pos = 0
    init_len = 0
    if start_frame:
        nfields = 0
        for d in digits:
            nfields += d
            pos += 1
            if nfields >= 2 * start_frame:
                init_len = nfields - 2 * start_frame
                break
    nskip = 0
    start = None
    occupied = False
    temp = None
    outs, out_pts = [], []

    def next_len():
        nonlocal pos
        length = 0
        while not length and pos < len(digits):
            length = digits[pos]
            pos += 1
        if pos >= len(digits):
            pos = 0
        return length

    def emit(f):
        outs.append(f)
        out_pts.append(start + av_rescale(
            len(outs) - 1, ts_unit.numerator, ts_unit.denominator))

    for fr, p in zip(frames, pts):
        if start is None:
            start = p
        if nskip >= 2:
            nskip -= 2
            continue
        if nskip >= 1:
            temp = fr
            occupied = True
            nskip -= 1
            continue
        length = init_len
        init_len = 0
        if not length:
            while not length and pos < len(digits):
                length = digits[pos]
                pos += 1
        # :203 — the reset runs even when len came from init_len
        if pos >= len(digits):
            pos = 0
        if not length:
            continue
        if length == 1 and occupied:
            emit(temp)
            occupied = False
            length = next_len()
        if occupied:
            emit(_weave_np(fr, temp, ff))
            occupied = False
            if length <= 2:
                temp = fr
                occupied = True
            length = length - 3 if length >= 3 else 0
        else:
            if length >= 2:
                emit(fr)
                length -= 2
            elif length == 1:
                emit(fr)
                temp = fr
                occupied = True
                length -= 1
        if length == 1 and occupied:
            length -= 1
            occupied = False
        nskip = length
    return outs, out_pts


@pytest.fixture
def rng():
    return np.random.default_rng(13)


def _frames(rng, n, h=16, w=16):
    return [(rng.integers(0, 256, (h, w)).astype(np.uint8),
             rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8),
             rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8))
            for _ in range(n)]


def _run(frames, spec, src_fps, pts, batches=None):
    g = FilterGraph(spec, src_fps=src_fps)
    outs, out_pts, out_il = [], [], []
    batches = batches or [len(frames)]
    i = 0
    for bs in batches:
        chunk = frames[i:i + bs]
        fb = from_numpy_yuv420(np.stack([f[0] for f in chunk]),
                               np.stack([f[1] for f in chunk]),
                               np.stack([f[2] for f in chunk]))
        ofb, k = g.process(fb, pts=np.asarray(pts[i:i + bs]))
        ys = np.asarray(ofb.planes["y"])
        us = np.asarray(ofb.planes["u"])
        vs = np.asarray(ofb.planes["v"])
        for j in np.nonzero(k)[0]:
            outs.append((ys[j], us[j], vs[j]))
        if g.out_pts is not None:
            out_pts.extend(np.asarray(g.out_pts)[k].tolist())
        i += bs
    return outs, out_pts


@pytest.mark.parametrize("pattern,batches", [
    ("23", None), ("23", [3, 5]), ("2332", None), ("23", [1] * 8),
    ("32", None),
])
def test_telecine_oracle(rng, pattern, batches):
    frames = _frames(rng, 8)
    pts = list(range(8))
    got, got_pts = _run(frames, f"telecine=pattern={pattern}", 24.0,
                        pts, batches=batches)
    want, want_pts, _ = oracle_telecine(frames, pts, pattern, 0, 24.0,
                                        Fraction(1, 24))
    assert got_pts == want_pts
    assert len(got) == len(want)
    for g_, w_ in zip(got, want):
        for gp, wp in zip(g_, w_):
            np.testing.assert_array_equal(gp, wp)


def test_telecine_23_rate_and_pts(rng):
    """24 fps + pattern 23 -> 30 fps: 4 in -> 5 out, pts advance by 1
    in the 1/30 out tb (ts_unit = 1 by construction)."""
    frames = _frames(rng, 8)
    got, got_pts = _run(frames, "telecine", 24.0, list(range(8)))
    assert len(got) == 10
    assert got_pts == list(range(10))
    g = FilterGraph("telecine", src_fps=24.0)
    assert abs(g.fps_mul - 30.0 / 24.0) < 1e-12


@pytest.mark.parametrize("pattern,start_frame,batches", [
    ("23", 0, None), ("23", 0, [3, 5]), ("23", 2, None),
    ("2332", 0, None), ("23", 0, [1] * 8), ("32", 1, None),
])
def test_detelecine_oracle(rng, pattern, start_frame, batches):
    frames = _frames(rng, 8)
    pts = list(range(8))
    got, got_pts = _run(
        frames, f"detelecine=pattern={pattern}:start_frame={start_frame}",
        30.0, pts, batches=batches)
    want, want_pts = oracle_detelecine(frames, pts, pattern, 0, 30.0,
                                       Fraction(1, 30),
                                       start_frame=start_frame)
    assert got_pts == want_pts
    assert len(got) == len(want)
    for g_, w_ in zip(got, want):
        for gp, wp in zip(g_, w_):
            np.testing.assert_array_equal(gp, wp)


def test_telecine_detelecine_roundtrip(rng):
    """telecine=23 then detelecine=23 reproduces the progressive
    source (the canonical 3:2 pulldown inverse)."""
    frames = _frames(rng, 8)
    tele, tele_pts = _run(frames, "telecine", 24.0, list(range(8)))
    g = FilterGraph("detelecine", src_fps=30.0)
    fb = from_numpy_yuv420(np.stack([f[0] for f in tele]),
                           np.stack([f[1] for f in tele]),
                           np.stack([f[2] for f in tele]))
    ofb, k = g.process(fb, pts=np.asarray(tele_pts))
    ys = np.asarray(ofb.planes["y"])[k]
    assert len(ys) >= 7
    for j in range(len(ys)):
        np.testing.assert_array_equal(ys[j], frames[j][0])


def test_telecine_gates():
    for bad in ("telecine=pattern=", "telecine=pattern=2a",
                "telecine=pattern=00", "telecine=first_field=x",
                "detelecine=start_frame=14",
                "detelecine=pattern=23:start_frame=6"):
        with pytest.raises(FilterError):
            FilterGraph(bad)


def test_detelecine_start_frame_phase(rng):
    """start_frame=2 on pattern 23: the init scan ends on the LAST
    digit and the C wraps pattern_pos immediately (:203) even though
    len came from init_len — the output is [as-is f0, weave(f1,f0),
    weave(f2,f1), as-is f3], with no dropped frame."""
    frames = _frames(rng, 4)
    got, _ = _run(frames, "detelecine=pattern=23:start_frame=2", 30.0,
                  [0, 1, 2, 3])
    assert len(got) == 4
    np.testing.assert_array_equal(got[0][0], frames[0][0])
    np.testing.assert_array_equal(
        got[1][0], _weave_np(frames[1], frames[0], 0)[0])
    np.testing.assert_array_equal(
        got[2][0], _weave_np(frames[2], frames[1], 0)[0])
    np.testing.assert_array_equal(got[3][0], frames[3][0])
