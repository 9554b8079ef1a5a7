"""zoompan vs a literal transcription of vf_zoompan.c's geometry and
state machine (the resample itself is ops/resize's bicubic windowed
gather, quantized like the `scale` filter; the C uses swscale BICUBIC,
same divergence envelope as scale)."""
import numpy as np
import pytest

from gmat_tpu.filters.builtin import FilterError
from gmat_tpu.filters.graph import FilterGraph

from .test_filters import from_numpy_yuv420


def _q(x):
    """resize()'s integer quantization: clip(round(f32))."""
    return np.clip(np.round(np.asarray(x)), 0, 255).astype(np.uint8)


@pytest.fixture
def rng():
    return np.random.default_rng(52)


def _clip(rng, n=3, h=48, w=64):
    return (rng.integers(0, 256, (n, h, w)).astype(np.uint8),
            rng.integers(0, 256, (n, h // 2, w // 2)).astype(np.uint8),
            rng.integers(0, 256, (n, h // 2, w // 2)).astype(np.uint8))


def _run(frames, spec, pts=None, src_fps=25.0):
    y, u, v = frames
    g = FilterGraph(spec, src_fps=src_fps)
    fb = from_numpy_yuv420(y, u, v)
    ofb, k = g.process(fb, pts=np.asarray(pts if pts is not None
                                          else np.arange(len(y))))
    return (ofb, np.asarray(k),
            None if g.out_pts is None else np.asarray(g.out_pts))


def test_zoompan_geometry_and_pts(rng):
    """zoom=2 centered crop: output equals resize_plane of the exact
    window; pts are output indices in the 1/fps tb."""
    from gmat_tpu.ops.resize import resize_plane
    frames = _clip(rng)
    y, u, v = frames
    ofb, k, pts = _run(frames, "zoompan=z=2:x=16:y=12:d=2:s=32x24")
    assert ofb.width == 32 and ofb.height == 24
    ys = np.asarray(ofb.planes["y"])[k]
    us = np.asarray(ofb.planes["u"])[k]
    assert len(ys) == 6                      # 3 inputs * d=2
    assert pts.tolist() == list(range(6))
    # w = 64/2 = 32, h = 24; x=16 (even), y=12 (even)
    for i in range(3):
        want_y = _q(resize_plane(
            y[i:i + 1, 12:36, 16:48], 24, 32, "bicubic"))[0]
        np.testing.assert_array_equal(ys[2 * i], want_y)
        np.testing.assert_array_equal(ys[2 * i + 1], want_y)
        want_u = _q(resize_plane(
            u[i:i + 1, 6:18, 8:24], 12, 16, "bicubic"))[0]
        np.testing.assert_array_equal(us[2 * i], want_u)


def test_zoompan_clip_align_and_state(rng):
    """x clips to [0, iw-w]; the crop x aligns DOWN to the chroma
    grid while the x/px vars keep the unaligned value; px/pzoom carry
    the previous input's final values."""
    from gmat_tpu.ops.resize import resize_plane
    frames = _clip(rng)
    y, u, v = frames
    # x=1000 clips to iw-w = 32; zoom clip: z=0.5 -> 1 (whole frame)
    ofb, k, _ = _run(frames, "zoompan=z=2:x=1000:y=px+vsub:d=1:s=32x24")
    ys = np.asarray(ofb.planes["y"])[k]
    # frame 0: y expr = px + vsub = 0 + 2 = 2 -> cy = 2 (aligned)
    want0 = _q(resize_plane(
        y[0:1, 2:26, 32:64], 24, 32, "bicubic"))[0]
    np.testing.assert_array_equal(ys[0], want0)
    # frame 1: px = 32 (carried) -> y = 34 clips to ih-h = 24 -> cy 24
    want1 = _q(resize_plane(
        y[1:2, 24:48, 32:64], 24, 32, "bicubic"))[0]
    np.testing.assert_array_equal(ys[1], want1)


def test_zoompan_odd_window(rng):
    """zoom=3: w=21 h=16 (truncated), chroma window ceil(21/2)=11."""
    from gmat_tpu.ops.resize import resize_plane
    frames = _clip(rng)
    y, u, v = frames
    ofb, k, _ = _run(frames, "zoompan=z=3:x=10:y=8:d=1:s=32x24")
    ys = np.asarray(ofb.planes["y"])[k]
    us = np.asarray(ofb.planes["u"])[k]
    want_y = _q(resize_plane(
        y[0:1, 8:24, 10:31], 24, 32, "bicubic"))[0]
    np.testing.assert_array_equal(ys[0], want_y)
    want_u = _q(resize_plane(
        u[0:1, 4:12, 5:16], 12, 16, "bicubic"))[0]
    np.testing.assert_array_equal(us[0], want_u)


def test_zoompan_duration_expr_and_vars(rng):
    """d is an expression (in var); zoom sees pzoom; at least one
    frame is emitted even for d=0."""
    frames = _clip(rng)
    ofb, k, pts = _run(frames, "zoompan=d=if(eq(in\\,0)\\,3\\,1):"
                       "z=pzoom+0.5:s=32x24")
    assert int(k.sum()) == 3 + 1 + 1
    ofb, k, _ = _run(frames, "zoompan=d=0:s=16x12")
    assert int(k.sum()) == 3                 # one per input


def test_zoompan_gates():
    for bad in ("zoompan=s=zz12", "zoompan=fps=0",
                "zoompan=d=99999:s=16x12"):
        with pytest.raises(FilterError):
            g = FilterGraph(bad)
            import numpy as np
            from tests.test_filters import from_numpy_yuv420
            y = np.zeros((1, 16, 16), np.uint8)
            u = v = np.zeros((1, 8, 8), np.uint8)
            g.process(from_numpy_yuv420(y, u, v), pts=np.arange(1))
