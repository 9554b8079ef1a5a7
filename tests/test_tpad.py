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


def _meta(n, **over):
    m = {"pts": np.arange(n, dtype=np.int64), "times": None,
         "keys": None, "pos": None, "interlaced": None,
         "keep": np.ones(n, bool), "pad": np.zeros(n, bool)}
    m.update(over)
    return m


def test_tpad_stop_clone_skips_dropped_tail(rng):
    """The C's cache only ever holds frames actually DELIVERED to tpad:
    a last frame dropped upstream (or batch-pad garbage) must not
    become the stop-clone source."""
    from gmat_tpu.filters.builtin import TpadFilter
    import jax.numpy as jnp
    from gmat_tpu.core.frame import FrameBatch
    y, u, v = _clip(rng, n=3)
    fb = FrameBatch({"y": jnp.asarray(y), "u": jnp.asarray(u),
                     "v": jnp.asarray(v)}, "yuv420p", 16, 16, "bt709")
    f = TpadFilter(stop=2, stop_mode="clone")
    f.process_batch(fb, _meta(3, keep=np.array([True, True, False])))
    ofb, meta = f.flush()
    got = np.asarray(ofb.planes["y"])
    np.testing.assert_array_equal(got[0], y[1])       # last KEPT frame
    np.testing.assert_array_equal(got[1], y[1])
    # pad tail via the pad mask too
    f2 = TpadFilter(stop=1, stop_mode="clone")
    f2.process_batch(fb, _meta(3, pad=np.array([False, False, True])))
    ofb2, _ = f2.flush()
    np.testing.assert_array_equal(np.asarray(ofb2.planes["y"])[0], y[1])


def test_tpad_times_shift(rng):
    """start padding shifts the seconds track together with pts
    (pts*tb consistency for downstream t-dependent filters)."""
    from gmat_tpu.filters.builtin import TpadFilter
    import jax.numpy as jnp
    from gmat_tpu.core.frame import FrameBatch
    y, u, v = _clip(rng, n=3)
    fb = FrameBatch({"y": jnp.asarray(y), "u": jnp.asarray(u),
                     "v": jnp.asarray(v)}, "yuv420p", 16, 16, "bt709")
    f = TpadFilter(start=2, start_mode="clone")
    _, meta = f.process_batch(
        fb, _meta(3, times=np.array([0.0, 0.04, 0.08])))
    np.testing.assert_allclose(
        meta["times"], [0.0, 0.04, 0.08, 0.12, 0.16], atol=1e-12)
    np.testing.assert_array_equal(meta["pts"], [0, 1, 2, 3, 4])


def test_tpad_color_depth_and_rgb(rng):
    """ff_draw_color at the format's depth (drawutils.c:159-204):
    10-bit black is y=trunc(16/255*1023+.5)=64, chroma 514 (NOT
    128<<2); packed RGB fills the actual color per channel order."""
    from gmat_tpu.filters.builtin import TpadFilter, FilterError
    import jax.numpy as jnp
    from gmat_tpu.core.frame import FrameBatch
    y10 = rng.integers(0, 1024, (1, 8, 8)).astype(np.uint16)
    c10 = rng.integers(0, 1024, (1, 4, 4)).astype(np.uint16)
    fb = FrameBatch({"y": jnp.asarray(y10), "u": jnp.asarray(c10),
                     "v": jnp.asarray(c10)}, "yuv420p10", 8, 8, "bt709")
    f = TpadFilter(stop=1, stop_mode="add", color="black")
    f.process_batch(fb, _meta(1))
    ofb, _ = f.flush()
    assert int(np.asarray(ofb.planes["y"])[0, 0, 0]) == 64
    assert int(np.asarray(ofb.planes["u"])[0, 0, 0]) == 514
    assert int(np.asarray(ofb.planes["v"])[0, 0, 0]) == 514
    for fmtname, want in (("rgb24", [255, 0, 0]), ("bgr24", [0, 0, 255])):
        arr = rng.integers(0, 256, (1, 8, 8, 3)).astype(np.uint8)
        fbr = FrameBatch({"rgb": jnp.asarray(arr)}, fmtname, 8, 8,
                         "bt709")
        fr = TpadFilter(stop=1, stop_mode="add", color="red")
        fr.process_batch(fbr, _meta(1))
        ofbr, _ = fr.flush()
        np.testing.assert_array_equal(
            np.asarray(ofbr.planes["rgb"])[0, 0, 0], want)
    # float RGB color pads are outside ff_draw's 8-16 bit support
    fbf = FrameBatch({"rgb": jnp.zeros((1, 4, 4, 3), jnp.float32)},
                     "rgbpf32", 4, 4, "bt709")
    ff = TpadFilter(stop=1, stop_mode="add")
    ff.process_batch(fbf, _meta(1))
    with pytest.raises(FilterError, match="8-16"):
        ff.flush()
