"""pad + eq filters (upstream vf_pad/vf_eq analogs, round 4)."""
import numpy as np
import pytest

from gmat_tpu.core.frame import FrameBatch, from_numpy_yuv420
from gmat_tpu.filters.graph import FilterGraph
from gmat_tpu.ops import enhance, geometry


def _yuv(rng, n=1, h=16, w=24):
    return from_numpy_yuv420(
        rng.integers(0, 256, (n, h, w)).astype(np.uint8),
        rng.integers(0, 256, (n, h // 2, w // 2)).astype(np.uint8),
        rng.integers(0, 256, (n, h // 2, w // 2)).astype(np.uint8))


# ---- eq ---------------------------------------------------------------------

def _eq_lut_oracle(c, b, g, gw):
    """Independent port of vf_eq.c create_lut (vf_eq.c:37-60)."""
    out = []
    for i in range(256):
        v = c * (i / 255.0 - 0.5) + 0.5 + b
        if v <= 0.0:
            out.append(0)
        else:
            v = v * (1.0 - gw) + (v ** (1.0 / g)) * gw
            out.append(255 if v >= 1.0 else int(256.0 * v))
    return np.array(out, np.uint8)


def test_eq_identity_is_exact_passthrough(rng):
    fb = _yuv(rng)
    out = enhance.eq(fb)
    for k in fb.planes:
        np.testing.assert_array_equal(np.asarray(out.planes[k]),
                                      np.asarray(fb.planes[k]))


def test_eq_matches_vf_eq_lut(rng):
    fb = _yuv(rng)
    out = enhance.eq(fb, contrast=1.5, brightness=0.1, saturation=2.0,
                     gamma=1.8, gamma_weight=0.7)
    luty = _eq_lut_oracle(1.5, 0.1, 1.8, 0.7)
    lutc = _eq_lut_oracle(2.0, 0.0, 1.0, 0.7)
    np.testing.assert_array_equal(
        np.asarray(out.planes["y"]), luty[np.asarray(fb.planes["y"])])
    np.testing.assert_array_equal(
        np.asarray(out.planes["u"]), lutc[np.asarray(fb.planes["u"])])
    np.testing.assert_array_equal(
        np.asarray(out.planes["v"]), lutc[np.asarray(fb.planes["v"])])


def test_eq_saturation_leaves_luma(rng):
    fb = _yuv(rng)
    out = enhance.eq(fb, saturation=0.5)
    np.testing.assert_array_equal(np.asarray(out.planes["y"]),
                                  np.asarray(fb.planes["y"]))
    assert not np.array_equal(np.asarray(out.planes["u"]),
                              np.asarray(fb.planes["u"]))


def test_eq_per_channel_gamma_plumbing(rng):
    """gamma_r/g/b reach the planes per vf_eq.c:113-115."""
    fb = _yuv(rng)
    out = enhance.eq(fb, gamma_b=2.0)           # U gamma = sqrt(2/1)
    lutu = _eq_lut_oracle(1.0, 0.0, 2.0 ** 0.5, 1.0)
    np.testing.assert_array_equal(
        np.asarray(out.planes["u"]), lutu[np.asarray(fb.planes["u"])])
    np.testing.assert_array_equal(np.asarray(out.planes["v"]),
                                  np.asarray(fb.planes["v"]))


def test_eq_rejects_nonyuv(rng):
    rgb = FrameBatch({"rgb": np.zeros((1, 8, 8, 3), np.uint8)},
                     "rgb24", 8, 8, "bt709")
    with pytest.raises(ValueError):
        enhance.eq(rgb, contrast=2.0)


# ---- pad --------------------------------------------------------------------

def test_pad_black_yuv_fill_and_placement(rng):
    fb = _yuv(rng, h=16, w=24)
    out = geometry.pad(fb, 32, 24, 4, 4)
    assert (out.width, out.height) == (32, 24)
    y = np.asarray(out.planes["y"])
    u = np.asarray(out.planes["u"])
    assert y[0, 0, 0] == 16 and u[0, 0, 0] == 128     # studio black
    np.testing.assert_array_equal(y[:, 4:20, 4:28],
                                  np.asarray(fb.planes["y"]))
    np.testing.assert_array_equal(u[:, 2:10, 2:14],
                                  np.asarray(fb.planes["u"]))


def test_pad_color_and_rgb(rng):
    img = rng.integers(0, 256, (1, 8, 12, 3)).astype(np.uint8)
    fb = FrameBatch({"rgb": img}, "rgb24", 12, 8, "bt709")
    out = geometry.pad(fb, 20, 10, 4, 1, color="#ff8000")
    a = np.asarray(out.planes["rgb"])
    assert tuple(a[0, 0, 0]) == (255, 128, 0)
    np.testing.assert_array_equal(a[:, 1:9, 4:16], img)


def test_pad_validation(rng):
    fb = _yuv(rng, h=16, w=24)
    with pytest.raises(ValueError):
        geometry.pad(fb, 16, 16)                 # smaller than input
    with pytest.raises(ValueError):
        geometry.pad(fb, 32, 24, 3, 4)           # odd x on 4:2:0
    with pytest.raises(ValueError):
        geometry.pad(fb, 32, 24, 20, 0)          # frame sticks out
    with pytest.raises(ValueError):
        geometry.parse_color("nosuchcolor")


def test_pad_graph_expressions(rng):
    """pad=iw+8:ih+8:(ow-iw)/2:(oh-ih)/2 centers via av_expr."""
    fb = _yuv(rng, h=16, w=24)
    g = FilterGraph("pad=iw+8:ih+8:(ow-iw)/2:(oh-ih)/2:gray")
    out, keep = g.process(fb)
    assert (out.width, out.height) == (32, 24)
    y = np.asarray(out.planes["y"])
    np.testing.assert_array_equal(y[:, 4:20, 4:28],
                                  np.asarray(fb.planes["y"]))
    # gray fill: Y = mat@(128,128,128)+16 = 0.859*128+16 ~ 126
    assert 120 <= y[0, 0, 0] <= 130


# ---- trim / setpts ----------------------------------------------------------

def test_trim_by_seconds_and_frames(rng):
    fb = _yuv(rng, n=10)
    g = FilterGraph("trim=start=0.1:end=0.3")
    out, keep = g.process(fb, pts=np.arange(10) * 100,
                          times=np.arange(10) / 10.0)
    assert list(np.nonzero(keep)[0]) == [1, 2]      # t in [0.1, 0.3)
    g2 = FilterGraph("trim=start_frame=4:end_frame=7")
    out2, keep2 = g2.process(fb, pts=np.arange(10) * 100,
                             times=np.arange(10) / 10.0)
    assert list(np.nonzero(keep2)[0]) == [4, 5, 6]


def test_trim_or_within_gates(rng):
    """f_trim.c: OR across configured start bounds (pts OR frame)."""
    fb = _yuv(rng, n=6)
    g = FilterGraph("trim=start_pts=400:start_frame=5")
    out, keep = g.process(fb, pts=np.arange(6) * 100,
                          times=np.arange(6) / 10.0)
    assert list(np.nonzero(keep)[0]) == [4, 5]      # pts gate opens at 4


def test_trim_counts_only_alive_frames(rng):
    """frames dropped upstream are invisible to trim's frame counter
    (ffmpeg chain semantics)."""
    fb = _yuv(rng, n=8)
    g = FilterGraph("select=mod(n\\,2),trim=start_frame=1:end_frame=3")
    out, keep = g.process(fb, pts=np.arange(8) * 100,
                          times=np.arange(8) / 10.0)
    # select keeps odd n: 1,3,5,7 -> trim keeps its frames 1,2 -> 3,5
    assert list(np.nonzero(keep)[0]) == [3, 5]


def test_setpts_rebase_and_scale(rng):
    fb = _yuv(rng, n=4)
    g = FilterGraph("setpts=PTS-STARTPTS")
    g.process(fb, pts=np.array([500, 600, 700, 800]),
              times=np.arange(4) / 30.0)
    assert list(g.out_pts) == [0, 100, 200, 300]
    g2 = FilterGraph("setpts=0.5*(PTS-STARTPTS)")
    g2.process(fb, pts=np.array([500, 600, 700, 800]),
               times=np.arange(4) / 30.0)
    assert list(g2.out_pts) == [0, 50, 100, 150]


def test_setpts_n_var_and_prev(rng):
    fb = _yuv(rng, n=3)
    g = FilterGraph("setpts=N*42")
    g.process(fb, pts=np.array([7, 9, 11]), times=np.arange(3) / 30.0)
    assert list(g.out_pts) == [0, 42, 84]
    g2 = FilterGraph("setpts=PREV_OUTPTS+100")
    g2.process(fb, pts=np.array([7, 9, 11]), times=np.arange(3) / 30.0)
    assert list(g2.out_pts) == [107, 207, 307]


def test_trim_setpts_chain(rng):
    """the canonical clip extraction: trim + rebase."""
    fb = _yuv(rng, n=10)
    g = FilterGraph("trim=start=0.2:end=0.5,setpts=PTS-STARTPTS")
    out, keep = g.process(fb, pts=np.arange(10) * 100,
                          times=np.arange(10) / 10.0)
    kept = np.nonzero(keep)[0]
    assert list(kept) == [2, 3, 4]
    assert list(g.out_pts[kept]) == [0, 100, 200]
