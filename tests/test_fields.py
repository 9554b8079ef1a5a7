"""separatefields / weave / doubleweave (vf_separatefields.c,
vf_weave.c semantics)."""
import numpy as np
import pytest

from gmat_tpu.filters.builtin import FilterError
from gmat_tpu.filters.graph import FilterGraph

from .test_filters import from_numpy_yuv420


@pytest.fixture
def rng():
    return np.random.default_rng(6)


def _clip(rng, n=4, h=16, w=16):
    y = rng.integers(0, 256, (n, h, w)).astype(np.uint8)
    u = rng.integers(0, 256, (n, h // 2, w // 2)).astype(np.uint8)
    v = rng.integers(0, 256, (n, h // 2, w // 2)).astype(np.uint8)
    return y, u, v


def _run(frames, spec, pts, interlaced=None, batches=None):
    y, u, v = frames
    g = FilterGraph(spec)
    outs, out_pts = [], []
    batches = batches or [len(y)]
    i = 0
    for bs in batches:
        fb = from_numpy_yuv420(y[i:i + bs], u[i:i + bs], v[i:i + bs])
        il = None if interlaced is None else np.asarray(
            interlaced[i:i + bs])
        ofb, keep = g.process(fb, pts=np.asarray(pts[i:i + bs]),
                              interlaced=il)
        ys = np.asarray(ofb.planes["y"])
        for j in np.nonzero(keep)[0]:
            outs.append(ys[j])
        if g.out_pts is not None:
            out_pts.extend(np.asarray(g.out_pts)[keep].tolist())
        i += bs
    for ofb, keep, meta in g.flush() or []:
        ys = np.asarray(ofb.planes["y"])
        for j in np.nonzero(keep)[0]:
            outs.append(ys[j])
        out_pts.extend(np.asarray(meta["pts"])[keep].tolist())
    return outs, out_pts


def test_separatefields_tff(rng):
    frames = _clip(rng, n=3)
    y = frames[0]
    il = np.array([3, 3, 3])            # interlaced + tff
    outs, pts = _run(frames, "separatefields", [10, 20, 30], il,
                     batches=[2, 1])
    assert len(outs) == 6
    # tff: first field = even rows, second = odd rows
    np.testing.assert_array_equal(outs[0], y[0][0::2])
    np.testing.assert_array_equal(outs[1], y[0][1::2])
    np.testing.assert_array_equal(outs[2], y[1][0::2])
    np.testing.assert_array_equal(outs[3], y[1][1::2])
    # pts: first=2*p, second = p + p_next; flushed last extrapolates
    assert pts == [20, 10 + 20, 40, 20 + 30, 60, 30 + 30 + 10]


def test_separatefields_bff_and_odd_height(rng):
    frames = _clip(rng, n=1)
    y = frames[0]
    outs, _ = _run(frames, "separatefields", [0],
                   np.array([1]))       # interlaced, tff=0
    np.testing.assert_array_equal(outs[0], y[0][1::2])   # bottom first
    # (the even-height gate is unreachable through yuv420p inputs —
    # 4:2:0 heights are even by construction)


def test_weave_roundtrip(rng):
    """separatefields -> weave reproduces the source frames."""
    frames = _clip(rng, n=4)
    y = frames[0]
    outs, pts = _run(frames, "separatefields,weave=top",
                     list(range(0, 8, 2)), np.array([3] * 4))
    # weave pairs (first0,second0) -> original frame 0, etc.
    assert len(outs) >= 3
    np.testing.assert_array_equal(outs[0], y[0])
    np.testing.assert_array_equal(outs[1], y[1])
    np.testing.assert_array_equal(outs[2], y[2])


def test_weave_bottom_first(rng):
    frames = _clip(rng, n=2, h=8)
    y = frames[0]
    outs, pts = _run(frames, "weave=bottom", [0, 1])
    assert len(outs) == 1
    got = outs[0]
    # older frame (f0) on field2=top rows (first_field=bottom ->
    # field1=!1=0? the C: field1=!first_field=0 for cur, field2=1...
    # cur (f1) rows at field1=0 (even), prev (f0) at field2=1 (odd)
    np.testing.assert_array_equal(got[1::2], y[0])
    np.testing.assert_array_equal(got[0::2], y[1])


def test_doubleweave_overlap(rng):
    frames = _clip(rng, n=3, h=8)
    y = frames[0]
    outs, pts = _run(frames, "doubleweave", [5, 6, 7])
    assert len(outs) == 2
    assert pts == [5, 6]                # prev pts
    # vf_weave.c:99 weave = !(frame_count_out & 1) with frame_count_out
    # = 0-based index of the frame being processed (avfilter.c
    # decrements before filter_frame).  Output 0 processes frame 1:
    # weave=!(1&1)=0 -> field1=!first_field=1: cur on odd rows
    np.testing.assert_array_equal(outs[0][1::2], y[1])
    np.testing.assert_array_equal(outs[0][0::2], y[0])
    # output 1 processes frame 2: weave=!(2&1)=1 -> field1=0: cur even
    np.testing.assert_array_equal(outs[1][0::2], y[2])
    np.testing.assert_array_equal(outs[1][1::2], y[1])


def test_separatefields_default_bff(rng):
    """AVFrame.top_field_first defaults to 0: an unflagged stream
    separates bottom-field-first (extract_field type = !tff = 1)."""
    frames = _clip(rng, n=1)
    y = frames[0]
    outs, _ = _run(frames, "separatefields", [0])     # interlaced=None
    np.testing.assert_array_equal(outs[0], y[0][1::2])


def test_separatefields_keep_pad_masks(rng):
    """Upstream-dropped and batch-pad frames never reach the filter
    (ffmpeg chain semantics): their fields must not appear."""
    y, u, v = _clip(rng, n=4)
    g = FilterGraph("separatefields")
    fb = from_numpy_yuv420(y, u, v)
    ofb, k = g.process(fb, pts=np.arange(4) * 10,
                       keep=np.array([True, False, True, True]),
                       interlaced=np.array([3] * 4), valid=3)
    ys = np.asarray(ofb.planes["y"])[k]
    # survivors 0,2: first(0) | second(0), first(2); second(2) pends
    assert len(ys) == 3
    np.testing.assert_array_equal(ys[0], y[0][0::2])
    np.testing.assert_array_equal(ys[1], y[0][1::2])
    np.testing.assert_array_equal(ys[2], y[2][0::2])


def test_separatefields_meta_alignment(rng):
    """Each field carries its SOURCE frame's props (the C emits the
    input frame/clone), including the second field carried across a
    batch boundary."""
    y, u, v = _clip(rng, n=3)
    g = FilterGraph("separatefields")
    t_all = []
    for lo, hi in ((0, 2), (2, 3)):
        fb = from_numpy_yuv420(y[lo:hi], u[lo:hi], v[lo:hi])
        _, k = g.process(fb, pts=np.arange(lo, hi) * 10,
                         times=np.arange(lo, hi, dtype=np.float64),
                         interlaced=np.array([3] * (hi - lo)))
        t_all.extend(np.asarray(g.out_times)[k].tolist())
    # first(0) | second(0), first(1) | second(1), first(2)
    assert t_all == [0.0, 0.0, 1.0, 1.0, 2.0]


def test_weave_keep_mask_and_meta(rng):
    """weave pairs only DELIVERED frames; output props come from the
    second frame of each pair (av_frame_copy_props(out, in))."""
    y, u, v = _clip(rng, n=4, h=8)
    g = FilterGraph("weave=top")
    fb = from_numpy_yuv420(y, u, v)
    ofb, k = g.process(fb, pts=np.arange(4),
                       times=np.array([0.0, 1.0, 2.0, 3.0]),
                       keep=np.array([True, False, True, True]))
    ys = np.asarray(ofb.planes["y"])[k]
    assert len(ys) == 1
    # pair is (f0, f2): first_field=top -> cur f2 on odd rows
    np.testing.assert_array_equal(ys[0][0::2], y[0])
    np.testing.assert_array_equal(ys[0][1::2], y[2])
    assert np.asarray(g.out_times)[k].tolist() == [2.0]


def test_weave_meta_second_of_pair(rng):
    y, u, v = _clip(rng, n=4, h=8)
    g = FilterGraph("weave=top")
    fb = from_numpy_yuv420(y, u, v)
    _, k = g.process(fb, pts=np.arange(4),
                     times=np.array([0.0, 1.0, 2.0, 3.0]))
    assert np.asarray(g.out_times)[k].tolist() == [1.0, 3.0]
