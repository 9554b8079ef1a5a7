"""loop vs a literal transcription of f_loop.c (video lane)."""
import numpy as np
import pytest

from gmat_tpu.filters.builtin import FilterError
from gmat_tpu.filters.graph import FilterGraph

from .test_filters import from_numpy_yuv420


def oracle(frames, pts, loop, size, start, step):
    """Literal f_loop.c:322-415 state machine: filter_frame records
    frames with frame_count_out >= start into a size-bounded buffer —
    frame_count_out is POST-increment inside an activate filter
    (ff_inlink_consume_frame -> consume_update, avfilter.c:1390), so
    recording starts at input index max(0, start-1) — pass-through
    with original pts, s->duration = last recorded pts + frame
    duration; push_frame replays clones at pts + duration - start_pts
    with duration advancing and loop decrementing per full cycle, and
    non-recorded frames get pts += duration; EOF truncates size to
    nb_frames and replays what was captured."""
    buf, bpts = [], []
    duration = 0
    start_pts = 0
    outs, out_pts = [], []
    count = 0
    L = loop

    def push_cycles():
        nonlocal duration, L
        duration = bpts[-1] + step
        while L != 0 and buf:
            for f, p in zip(buf, bpts):
                outs.append(f)
                out_pts.append(p + duration - start_pts)
            duration = out_pts[-1] + step
            if L > 0:
                L -= 1

    for f, p in zip(frames, pts):
        count += 1
        rec = count >= start and size > 0 and L != 0
        if rec and len(buf) < size:
            if not buf:
                start_pts = p
            buf.append(f)
            bpts.append(p)
            duration = p + step
            outs.append(f)
            out_pts.append(p)
            if len(buf) == size:
                push_cycles()
        else:
            outs.append(f)
            out_pts.append(p + duration)
    if buf and L != 0 and len(buf) < size:   # EOF: size = nb_frames
        push_cycles()
    return outs, out_pts


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def _frames(rng, n, h=16, w=16):
    return [(rng.integers(0, 256, (h, w)).astype(np.uint8),
             rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8),
             rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8))
            for _ in range(n)]


def _run(frames, spec, pts, batches=None, keep=None, times=None):
    g = FilterGraph(spec)
    outs, out_pts, out_times = [], [], []
    batches = batches or [len(frames)]
    i = 0
    for bs in batches:
        chunk = frames[i:i + bs]
        fb = from_numpy_yuv420(np.stack([f[0] for f in chunk]),
                               np.stack([f[1] for f in chunk]),
                               np.stack([f[2] for f in chunk]))
        kw = {}
        if keep is not None:
            kw["keep"] = np.asarray(keep[i:i + bs])
        if times is not None:
            kw["times"] = np.asarray(times[i:i + bs], np.float64)
        ofb, k = g.process(fb, pts=np.asarray(pts[i:i + bs]), **kw)
        ys = np.asarray(ofb.planes["y"])
        for j in np.nonzero(k)[0]:
            outs.append(ys[j])
        if g.out_pts is not None:
            out_pts.extend(np.asarray(g.out_pts)[k].tolist())
        if g.out_times is not None:
            out_times.extend(np.asarray(g.out_times)[k].tolist())
        i += bs
    for ofb, k, meta in g.flush() or []:
        ys = np.asarray(ofb.planes["y"])
        for j in np.nonzero(k)[0]:
            outs.append(ys[j])
        out_pts.extend(np.asarray(meta["pts"])[k].tolist())
        if meta.get("times") is not None:
            out_times.extend(np.asarray(meta["times"])[k].tolist())
    return outs, out_pts, out_times


@pytest.mark.parametrize("batches", [None, [2, 4], [1, 1, 1, 1, 1, 1]])
def test_loop_oracle_midstream(rng, batches):
    frames = _frames(rng, 6)
    pts = [0, 10, 20, 30, 40, 50]
    got, got_pts, _ = _run(frames, "loop=loop=2:size=2:start=1", pts,
                           batches=batches)
    want, want_pts = oracle([f[0] for f in frames], pts,
                            loop=2, size=2, start=1, step=10)
    assert got_pts == want_pts
    assert len(got) == len(want)
    for g_, w_ in zip(got, want):
        np.testing.assert_array_equal(g_, w_)
    # shape sanity: 6 in + 2 cycles * 2 frames = 10 out; start=1
    # records from index 0 (post-increment frame_count_out gate)
    assert len(got) == 10
    assert got_pts == [0, 10, 20, 30, 40, 50, 80, 90, 100, 110]


def test_loop_eof_truncation(rng):
    """EOF before the buffer fills: size = nb_frames, replay at EOF."""
    frames = _frames(rng, 3)
    pts = [0, 10, 20]
    got, got_pts, _ = _run(frames, "loop=loop=1:size=10", pts)
    want, want_pts = oracle([f[0] for f in frames], pts,
                            loop=1, size=10, start=0, step=10)
    assert got_pts == want_pts == [0, 10, 20, 30, 40, 50]
    for g_, w_ in zip(got, want):
        np.testing.assert_array_equal(g_, w_)


def test_loop_noop_and_gates(rng):
    frames = _frames(rng, 3)
    pts = [0, 10, 20]
    for spec in ("loop=loop=0:size=2", "loop=loop=3:size=0"):
        got, got_pts, _ = _run(frames, spec, pts)
        assert got_pts == pts
        assert len(got) == 3
    for bad in ("loop=loop=-1:size=2", "loop=size=99999",
                "loop=loop=100:size=1000", "loop=start=-1"):
        with pytest.raises(FilterError):
            FilterGraph(bad)


def test_loop_positional(rng):
    frames = _frames(rng, 4)
    got, got_pts, _ = _run(frames, "loop=1:2:0", [0, 1, 2, 3])
    want, want_pts = oracle([f[0] for f in frames], [0, 1, 2, 3],
                            loop=1, size=2, start=0, step=1)
    assert got_pts == want_pts
    for g_, w_ in zip(got, want):
        np.testing.assert_array_equal(g_, w_)


def test_loop_keep_mask_and_times(rng):
    """Dropped frames never reach the filter; clone times follow the
    same duration algebra as pts."""
    frames = _frames(rng, 5)
    pts = [0, 10, 20, 30, 40]
    times = [0.0, 0.4, 0.8, 1.2, 1.6]
    keep = [True, False, True, True, True]
    got, got_pts, got_times = _run(frames, "loop=loop=1:size=2", pts,
                                   keep=keep, times=times)
    kept = [frames[i][0] for i in (0, 2, 3, 4)]
    # inferred frame duration = median pts diff of the COMPACTED
    # stream ([20,10,10] -> 10)
    want, want_pts = oracle(kept, [0, 20, 30, 40],
                            loop=1, size=2, start=0, step=10)
    assert got_pts == want_pts
    for g_, w_ in zip(got, want):
        np.testing.assert_array_equal(g_, w_)
    # times mirror pts/25 here (step_t 0.8 after compaction)
    np.testing.assert_allclose(got_times,
                               [p / 25.0 for p in want_pts], atol=1e-9)


def test_loop_start_offset_vs_activate_count(rng):
    """start=N records from input index N-1: ff_inlink_consume_frame
    increments frame_count_out BEFORE filter_frame sees it."""
    frames = _frames(rng, 4)
    got, got_pts, _ = _run(frames, "loop=loop=1:size=1:start=2",
                           [0, 10, 20, 30])
    # frame index 1 (pts 10) is the looped frame; clone at
    # 10 + (10+step) - 10 = 20, duration advances to 30
    np.testing.assert_array_equal(got[2], frames[1][0])
    assert got_pts == [0, 10, 20, 50, 60]


def test_loop_deferred_step_single_frame_batches(rng):
    """Buffer fills inside a single-frame first batch: the replay is
    deferred until the pts step is known, preserving output order and
    using the real frame duration."""
    frames = _frames(rng, 3)
    got, got_pts, _ = _run(frames, "loop=loop=1:size=1",
                           [0, 10, 20], batches=[1, 1, 1])
    want, want_pts = oracle([f[0] for f in frames], [0, 10, 20],
                            loop=1, size=1, start=0, step=10)
    assert got_pts == want_pts == [0, 10, 30, 40]
    for g_, w_ in zip(got, want):
        np.testing.assert_array_equal(g_, w_)
