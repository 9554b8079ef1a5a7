"""framerate vs a literal transcription of vf_framerate.c."""
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


def oracle(frames, pts_src, src_tb, dest_fps, interp_start=15,
           interp_end=240, scene=8.2, scd=True):
    """Literal activate()/process_work_frame()/blend_frames()
    (vf_framerate.c:120-372) over (y, u, v) numpy triples."""
    import math
    stn, std = src_tb.numerator, src_tb.denominator
    dfn, dfd = dest_fps.numerator, dest_fps.denominator
    dtb = Fraction(math.gcd(stn * dfn, std * dfd), std * dfn)
    step = (1 / dest_fps) / dtb
    assert step.denominator == 1
    step = int(step)

    f0 = f1 = None
    pts0 = pts1 = 0
    delta = 0
    start_pts = None
    n = 0
    prev_mafd = [0.0]
    score = [-1.0]
    outs, out_pts = [], []

    def scene_score(a, b):
        sad = int(np.abs(a[0].astype(np.int64)
                         - b[0].astype(np.int64)).sum())
        h, w = a[0].shape
        mafd = sad * 100.0 / (w * h) / 256.0
        diff = abs(mafd - prev_mafd[0])
        prev_mafd[0] = mafd
        return min(max(min(mafd, diff), 0.0), 100.0)

    def blend(a, b, f2):
        f1f = 128 - f2
        return tuple(((p1.astype(np.int64) * f1f
                       + p2.astype(np.int64) * f2 + 64) >> 7)
                     .astype(np.uint8) for p1, p2 in zip(a, b))

    def work(flush):
        nonlocal f0, f1, n
        while True:
            if f1 is None:
                return
            if f0 is None and not flush:
                return
            wp = start_pts + n * step
            if wp >= pts1 and not flush:
                return
            if f0 is None:
                outs.append(f1)
                out_pts.append(wp)
                f1 = None
                n += 1
                continue
            if flush and wp >= pts1 + delta:
                return
            itp = av_rescale(wp - pts0, 128, delta)
            itp8 = av_rescale(wp - pts0, 256, delta)
            if itp >= 128 or itp8 > interp_end:
                outs.append(f1)
            elif itp <= 0 or itp8 < interp_start:
                outs.append(f0)
            else:
                sc = 0.0
                if scd:
                    if score[0] < 0.0:
                        score[0] = scene_score(f0, f1)
                    sc = score[0]
                if sc < scene:
                    outs.append(blend(f0, f1, itp))
                else:
                    outs.append(f1 if itp > 64 else f0)
            out_pts.append(wp)
            n += 1

    for fr, sp in zip(frames, pts_src):
        r = Fraction(sp) * src_tb / dtb
        pts = av_rescale(r.numerator, 1, r.denominator)
        if f1 is not None and pts == pts1:
            continue
        f0, pts0 = f1, pts1
        f1, pts1 = fr, pts
        delta = pts1 - pts0
        score[0] = -1.0
        if f0 is not None and delta < 0:
            start_pts = pts1
            n = 0
            f0 = None
        if start_pts is None:
            start_pts = pts1
        work(False)
    work(True)
    return outs, out_pts


@pytest.fixture
def rng():
    return np.random.default_rng(9)


def _frames(rng, n, h=16, w=16, smooth=True):
    out = []
    base = rng.integers(40, 200, (h, w)).astype(np.int16)
    for i in range(n):
        if smooth:
            y = np.clip(base + i * 3, 0, 255).astype(np.uint8)
        else:
            y = rng.integers(0, 256, (h, w)).astype(np.uint8)
        u = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
        v = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
        out.append((y, u, v))
    return out


def _run(frames, spec, src_fps, pts, batches=None):
    g = FilterGraph(spec, src_fps=src_fps)
    outs, out_pts = [], []
    batches = batches or [len(frames)]
    i = 0
    for bs in batches:
        chunk = frames[i:i + bs]
        fb = from_numpy_yuv420(np.stack([f[0] for f in chunk]),
                               np.stack([f[1] for f in chunk]),
                               np.stack([f[2] for f in chunk]))
        ofb, keep = g.process(fb, pts=np.asarray(pts[i:i + bs]))
        ys = np.asarray(ofb.planes["y"])
        us = np.asarray(ofb.planes["u"])
        vs = np.asarray(ofb.planes["v"])
        for j in np.nonzero(keep)[0]:
            outs.append((ys[j], us[j], vs[j]))
        if g.out_pts is not None:
            out_pts.extend(np.asarray(g.out_pts)[keep].tolist())
        i += bs
    for ofb, keep, meta in g.flush() or []:
        ys = np.asarray(ofb.planes["y"])
        us = np.asarray(ofb.planes["u"])
        vs = np.asarray(ofb.planes["v"])
        for j in np.nonzero(keep)[0]:
            outs.append((ys[j], us[j], vs[j]))
        out_pts.extend(np.asarray(meta["pts"])[keep].tolist())
    return outs, out_pts


@pytest.mark.parametrize("src_fps,dest,smooth", [
    (25.0, "50", True),          # 2x upconvert, blending
    (30.0, "24", True),          # downconvert
    (25.0, "30000/1001", True),  # NTSC rational
    (25.0, "50", False),         # noisy: scene detection clones
])
def test_framerate_oracle(rng, src_fps, dest, smooth):
    frames = _frames(rng, 8, smooth=smooth)
    pts = list(range(8))
    got, got_pts = _run(frames, f"framerate=fps={dest}", src_fps, pts,
                        batches=[3, 5])
    if "/" in dest:
        dfps = Fraction(*map(int, dest.split("/")))
    else:
        dfps = Fraction(int(dest))
    want, want_pts = oracle(frames, pts,
                            1 / Fraction(str(src_fps)), dfps)
    assert got_pts == want_pts
    assert len(got) == len(want)
    for g_, w_ in zip(got, want):
        for gp, wp in zip(g_, w_):
            np.testing.assert_array_equal(gp, wp)


def test_framerate_interp_window_and_gates(rng):
    frames = _frames(rng, 6)
    got, _ = _run(frames, "framerate=fps=50:interp_start=0:"
                  "interp_end=255:scene=100", 25.0, list(range(6)))
    want, _ = oracle(frames, list(range(6)), Fraction(1, 25),
                     Fraction(50), interp_start=0, interp_end=255,
                     scene=100.0)
    for g_, w_ in zip(got, want):
        np.testing.assert_array_equal(g_[0], w_[0])
    for bad in ["framerate=fps=0", "framerate=interp_start=300",
                "framerate=flags=zzz"]:
        with pytest.raises(FilterError):
            FilterGraph(bad)


def test_framerate_scd_off(rng):
    frames = _frames(rng, 6, smooth=False)
    got, _ = _run(frames, "framerate=fps=50:flags=0", 25.0,
                  list(range(6)))
    want, _ = oracle(frames, list(range(6)), Fraction(1, 25),
                     Fraction(50), scd=False)
    assert len(got) == len(want)
    for g_, w_ in zip(got, want):
        np.testing.assert_array_equal(g_[0], w_[0])
