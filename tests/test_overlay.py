"""Dual-input overlay vs scalar oracle + stream/CLI behavior."""
import numpy as np
import pytest

import jax.numpy as jnp

from gmat_tpu.core.frame import from_numpy_yuv420
from gmat_tpu.filters.builtin import OverlayFilter, FilterError
from gmat_tpu.filters.graph import FilterGraph
from gmat_tpu.ops import overlay as ov

from . import oracle


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def yuv(rng, n, h, w):
    return {"y": rng.integers(0, 256, (n, h, w)).astype(np.uint8),
            "u": rng.integers(0, 256, (n, h // 2, w // 2)).astype(np.uint8),
            "v": rng.integers(0, 256, (n, h // 2, w // 2)).astype(np.uint8)}


@pytest.mark.parametrize("x,y", [(4, 2), (5, 3), (-4, -2), (14, 9), (20, 16)])
def test_overlay_yuv_matches_oracle(rng, x, y):
    """Even/odd/negative/overhanging/fully-off positions, with alpha."""
    main = yuv(rng, 2, 16, 20)
    over = yuv(rng, 2, 8, 12)
    alpha = rng.integers(0, 256, (2, 8, 12)).astype(np.uint8)
    got = ov.overlay_yuv420({k: jnp.asarray(v) for k, v in main.items()},
                            {k: jnp.asarray(v) for k, v in over.items()},
                            jnp.asarray(alpha),
                            jnp.full(2, x, jnp.int32),
                            jnp.full(2, y, jnp.int32))
    for i in range(2):
        want = oracle.overlay_yuv420({k: v[i] for k, v in main.items()},
                                     {k: v[i] for k, v in over.items()},
                                     x, y, alpha[i])
        for k in ("y", "u", "v"):
            # +/-1: XLA may contract a*o+(1-a)*m into an FMA, which can
            # cross a floor() boundary vs the scalar float32 oracle (the
            # same fuzz exists between the CUDA kernel and CPU float math)
            diff = np.abs(np.asarray(got[k])[i].astype(int) -
                          want[k].astype(int))
            assert diff.max() <= 1, f"plane {k} pos {x},{y}: {diff.max()}"


def test_overlay_opaque_and_rgb(rng):
    main = yuv(rng, 1, 16, 20)
    over = yuv(rng, 1, 8, 12)
    got = ov.overlay_yuv420({k: jnp.asarray(v) for k, v in main.items()},
                            {k: jnp.asarray(v) for k, v in over.items()},
                            None, jnp.asarray([6]), jnp.asarray([4]))
    # opaque: overlay region replaced exactly
    np.testing.assert_array_equal(np.asarray(got["y"])[0, 4:12, 6:18],
                                  over["y"][0])
    rgb_m = rng.integers(0, 256, (1, 10, 10, 3)).astype(np.uint8)
    rgb_o = rng.integers(0, 256, (1, 4, 4, 3)).astype(np.uint8)
    out = ov.overlay_rgb(jnp.asarray(rgb_m), jnp.asarray(rgb_o), None,
                         jnp.asarray([2]), jnp.asarray([3]))
    np.testing.assert_array_equal(np.asarray(out)[0, 3:7, 2:6], rgb_o[0])


def _write_y4m(path, frames, fps=(30, 1)):
    from gmat_tpu.av.rawvideo import Y4MWriter
    w = Y4MWriter(path, frames[0]["y"].shape[1], frames[0]["y"].shape[0], fps)
    for f in frames:
        w.write(f["y"], f["u"], f["v"])
    w.close()


def _mkclip(path, n, h, w, fill):
    frames = [{"y": np.full((h, w), fill + i, np.uint8),
               "u": np.full((h // 2, w // 2), 64, np.uint8),
               "v": np.full((h // 2, w // 2), 192, np.uint8)}
              for i in range(n)]
    _write_y4m(path, frames)
    return frames


def test_overlay_video_stream(rng, tmp_path):
    """Watermark-video-on-video through the filter graph."""
    over_p = str(tmp_path / "over.y4m")
    _mkclip(over_p, 6, 8, 8, fill=200)
    g = FilterGraph(f"overlay=video={over_p}:x=4:y=2")
    main = yuv(rng, 6, 16, 16)
    fb = from_numpy_yuv420(main["y"], main["u"], main["v"])
    out, keep = g.process(fb, pts=np.arange(6, dtype=np.int64))
    assert keep.all()
    oy = np.asarray(out.planes["y"])
    for i in range(6):
        # overlay frame i has constant luma 200+i at rows 2:10, cols 4:12
        np.testing.assert_array_equal(oy[i, 2:10, 4:12],
                                      np.full((8, 8), 200 + i))
        np.testing.assert_array_equal(oy[i, :2, :], main["y"][i, :2, :])
    # chroma at (x/2, y/2)
    ou = np.asarray(out.planes["u"])
    np.testing.assert_array_equal(ou[0, 1:5, 2:6], np.full((4, 4), 64))


def test_overlay_eof_actions(rng, tmp_path):
    over_p = str(tmp_path / "short.y4m")
    _mkclip(over_p, 2, 8, 8, fill=100)
    main = yuv(rng, 5, 16, 16)
    fb = from_numpy_yuv420(main["y"], main["u"], main["v"])

    g = FilterGraph(f"overlay=video={over_p}:x=0:y=0:eof_action=repeat")
    out, keep = g.process(fb, pts=np.arange(5, dtype=np.int64))
    oy = np.asarray(out.planes["y"])
    assert keep.all()
    np.testing.assert_array_equal(oy[4, :8, :8], np.full((8, 8), 101))

    g = FilterGraph(f"overlay=video={over_p}:x=0:y=0:eof_action=pass")
    out, keep = g.process(fb, pts=np.arange(5, dtype=np.int64))
    oy = np.asarray(out.planes["y"])
    assert keep.all()
    np.testing.assert_array_equal(oy[3], main["y"][3])   # untouched

    g = FilterGraph(f"overlay=video={over_p}:shortest=1")
    out, keep = g.process(fb, pts=np.arange(5, dtype=np.int64))
    assert keep.tolist() == [True, True, False, False, False]
    # stream stays ended on the next batch
    out, keep = g.process(fb, pts=np.arange(5, dtype=np.int64))
    assert out.batch == 0 and keep.size == 0


def test_overlay_expr_positions(rng, tmp_path):
    over_p = str(tmp_path / "o.y4m")
    _mkclip(over_p, 4, 4, 4, fill=250)
    g = FilterGraph(f"overlay=video={over_p}:x=n*2:y=main_h-overlay_h")
    main = yuv(rng, 4, 16, 16)
    fb = from_numpy_yuv420(main["y"], main["u"], main["v"])
    out, _ = g.process(fb, pts=np.arange(4, dtype=np.int64))
    oy = np.asarray(out.planes["y"])
    for i in range(4):
        x = (2 * i) & ~1
        np.testing.assert_array_equal(oy[i, 12:16, x:x + 4],
                                      np.full((4, 4), 250 + i))


def test_overlay_still_rgb_and_errors(rng, tmp_path):
    with pytest.raises(FilterError):
        OverlayFilter()
    with pytest.raises(FilterError):
        OverlayFilter(path="a", video="b")
    with pytest.raises(FilterError):
        OverlayFilter(video="x", eof_action="bogus")


def test_overlay_n_counts_kept_frames_only(rng, tmp_path):
    """The expression var n counts frames that reach the filter (ffmpeg
    inlink frame_count): a fully-masked batch must not advance it."""
    over_p = str(tmp_path / "n.y4m")
    _mkclip(over_p, 12, 4, 4, fill=240)
    g = FilterGraph(f"overlay=video={over_p}:x=n*4:y=0")
    main = yuv(rng, 3, 16, 16)
    fb = from_numpy_yuv420(main["y"], main["u"], main["v"])
    # batch 1: fully masked (e.g. an upstream drop) -> n unchanged
    _, _ = g.process(fb, pts=np.arange(3, dtype=np.int64),
                     keep=np.zeros(3, bool))
    # batch 2: kept; first frame must render at x = 0*4 = 0, not 3*4
    out, keep = g.process(fb, pts=np.arange(3, dtype=np.int64))
    assert keep.all()
    oy = np.asarray(out.planes["y"])
    np.testing.assert_array_equal(oy[0, 0:4, 0:4], np.full((4, 4), 240))
    # frame 1: n=1 -> x=4, second overlay frame (fill 241)
    np.testing.assert_array_equal(oy[1, 0:4, 4:8], np.full((4, 4), 241))


def test_overlay_png_alpha_watermark(rng, tmp_path):
    """PNG watermark with a real alpha channel: transparent half leaves
    the main frame untouched, opaque half replaces it."""
    from .test_av import _write_rgba_png
    oh, ow = 8, 16
    rgba = np.zeros((oh, ow, 4), np.uint8)
    rgba[:, : ow // 2] = [200, 40, 40, 255]    # opaque red-ish
    rgba[:, ow // 2:] = [0, 255, 0, 0]         # fully transparent
    p = str(tmp_path / "wm.png")
    _write_rgba_png(p, rgba)
    g = FilterGraph(f"format=rgb24,overlay=path={p}:x=4:y=4")
    main = yuv(rng, 2, 24, 32)
    fb = from_numpy_yuv420(main["y"], main["u"], main["v"])
    out, _ = g.process(fb, pts=np.arange(2, dtype=np.int64))
    rgb = np.asarray(out.planes["rgb"])
    base = np.asarray(FilterGraph("format=rgb24").process(
        from_numpy_yuv420(main["y"], main["u"], main["v"]))[0].planes["rgb"])
    # opaque half: red-ish watermark (PNG went through a 4:2:0 round
    # trip, so allow conversion loss)
    assert abs(float(rgb[0, 4:12, 4:12, 0].mean()) - 200) < 12
    assert abs(float(rgb[0, 4:12, 4:12, 1].mean()) - 40) < 12
    # transparent half: untouched main pixels
    np.testing.assert_array_equal(rgb[0, 4:12, 12:20], base[0, 4:12, 12:20])
