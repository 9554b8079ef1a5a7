"""tpad tests (vf_tpad.c semantics on the batch graph)."""
import numpy as np
import pytest

from gmat_tpu.filters.builtin import FilterError, _rgb_to_yuv_ccir
from gmat_tpu.filters.graph import FilterGraph

from .test_filters import from_numpy_yuv420


@pytest.fixture
def rng():
    return np.random.default_rng(3)


def _clip(rng, n=4, h=16, w=16):
    y = rng.integers(0, 256, (n, h, w)).astype(np.uint8)
    u = rng.integers(0, 256, (n, h // 2, w // 2)).astype(np.uint8)
    v = rng.integers(0, 256, (n, h // 2, w // 2)).astype(np.uint8)
    return y, u, v


def _run(frames, spec, pts=None, batches=None):
    y, u, v = frames
    g = FilterGraph(spec)
    outs, out_pts = [], []
    batches = batches or [len(y)]
    i = 0
    for bs in batches:
        fb = from_numpy_yuv420(y[i:i + bs], u[i:i + bs], v[i:i + bs])
        p = None if pts is None else np.asarray(pts[i:i + bs])
        ofb, keep = g.process(fb, pts=p)
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
        if meta.get("pts") is not None:
            out_pts.extend(np.asarray(meta["pts"])[keep].tolist())
    return outs, out_pts


def test_tpad_start_clone_stop_color(rng):
    frames = _clip(rng)
    pts = np.arange(4) * 100
    outs, out_pts = _run(frames, "tpad=start=2:start_mode=clone:"
                         "stop=3:stop_mode=add:color=red", pts)
    assert len(outs) == 4 + 2 + 3
    np.testing.assert_array_equal(outs[0], frames[0][0])   # clones
    np.testing.assert_array_equal(outs[1], frames[0][0])
    np.testing.assert_array_equal(outs[2], frames[0][0])   # real f0
    ycol, _, _ = _rgb_to_yuv_ccir(255, 0, 0)
    assert (outs[6] == ycol).all()                         # red pads
    # pts: pads 0,100; input shifted by 2*100; stop continues
    assert out_pts == [0, 100, 200, 300, 400, 500, 600, 700, 800]


def test_tpad_stop_clone_across_batches(rng):
    frames = _clip(rng, n=5)
    outs, _ = _run(frames, "tpad=stop=2:stop_mode=clone",
                   pts=np.arange(5), batches=[2, 3])
    assert len(outs) == 7
    np.testing.assert_array_equal(outs[5], frames[0][4])
    np.testing.assert_array_equal(outs[6], frames[0][4])


def test_tpad_duration_and_gates(rng):
    from gmat_tpu.filters.builtin import TpadFilter
    f = TpadFilter(start_duration="0.5", src_fps=30.0)
    assert f.pad_start == 15
    f = TpadFilter(stop_duration="500ms", src_fps=30.0)
    assert f.pad_stop == 15
    with pytest.raises(FilterError):
        TpadFilter(stop=-1)
    with pytest.raises(FilterError):
        TpadFilter(start_mode="sideways")


def test_tpad_positional(rng):
    frames = _clip(rng, n=2)
    outs, _ = _run(frames, "tpad=1:1", pts=np.arange(2))
    assert len(outs) == 4
