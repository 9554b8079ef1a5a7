"""delogo vs a literal per-pixel transcription of vf_delogo.c."""
import numpy as np
import pytest

from gmat_tpu.filters.graph import FilterGraph
from gmat_tpu.filters.builtin import FilterError

from .test_filters import from_numpy_yuv420   # shared helper


def apply_delogo_oracle(src, w, h, sar, logo_x, logo_y, logo_w, logo_h,
                        band, show):
    """Literal apply_delogo (vf_delogo.c:80-195): per-pixel uint64
    loops."""
    dst = src.copy()
    sar_num, sar_den = sar
    xclipl = max(-logo_x, 0)
    xclipr = max(logo_x + logo_w - w, 0)
    yclipt = max(-logo_y, 0)
    yclipb = max(logo_y + logo_h - h, 0)
    x1 = logo_x + xclipl
    x2 = logo_x + logo_w - xclipr - 1
    y1 = logo_y + yclipt
    y2 = logo_y + logo_h - yclipb - 1
    s = src.astype(np.uint64)
    for y in range(y1 + 1, y2):
        left = int(s[y, x1] + s[y - 1, x1] + s[y + 1, x1])
        right = int(s[y, x2] + s[y - 1, x2] + s[y + 1, x2])
        for x in range(x1 + 1, x2):
            if show and (y == y1 + 1 or y == y2 - 1
                         or x == x1 + 1 or x == x2 - 1):
                dst[y, x] = 0
                continue
            wl = (x2 - x) * (y - y1) * (y2 - y) * sar_den
            wr = (x - x1) * (y - y1) * (y2 - y) * sar_den
            wt = (x - x1) * (x2 - x) * (y2 - y) * sar_num
            wb = (x - x1) * (x2 - x) * (y - y1) * sar_num
            top = int(s[y1, x] + s[y1, x - 1] + s[y1, x + 1])
            bot = int(s[y2, x] + s[y2, x - 1] + s[y2, x + 1])
            interp = (left * wl + right * wr + top * wt + bot * wb)
            weight = (wl + wr + wt + wb) * 3
            interp = (interp + (weight >> 1)) // weight
            if (logo_y + band <= y < logo_y + logo_h - band
                    and logo_x + band <= x < logo_x + logo_w - band):
                dst[y, x] = interp
            else:
                dist = 0
                if x < logo_x + band:
                    dist = max(dist, logo_x - x + band)
                elif x >= logo_x + logo_w - band:
                    dist = max(dist, x - (logo_x + logo_w - 1 - band))
                if y < logo_y + band:
                    dist = max(dist, logo_y - y + band)
                elif y >= logo_y + logo_h - band:
                    dist = max(dist, y - (logo_y + logo_h - 1 - band))
                dst[y, x] = (int(src[y, x]) * dist
                             + interp * (band - dist)) // band
    return dst


def oracle_frame(y, u, v, lx, ly, lw, lh, show=False):
    """filter_frame geometry (vf_delogo.c:310-366) on a yuv420 triple."""
    H, W = y.shape
    band = 1
    if lx + (band - 1) <= 0:
        lx = 1 + band
    if ly + (band - 1) <= 0:
        ly = 1 + band
    if lx + lw - (band * 2 - 2) > W:
        lw = W - lx - (band * 2 - 2)
    if ly + lh - (band * 2 - 2) > H:
        lh = H - ly - (band * 2 - 2)
    lw += band * 2
    lh += band * 2
    lx -= band
    ly -= band
    oy = apply_delogo_oracle(y, W, H, (1, 1), lx, ly, lw, lh, band, show)
    ou = apply_delogo_oracle(
        u, W // 2, H // 2, (1, 1), lx >> 1, ly >> 1,
        (lw + (lx & 1) + 1) >> 1, (lh + (ly & 1) + 1) >> 1,
        band >> 1, show)
    ov = apply_delogo_oracle(
        v, W // 2, H // 2, (1, 1), lx >> 1, ly >> 1,
        (lw + (lx & 1) + 1) >> 1, (lh + (ly & 1) + 1) >> 1,
        band >> 1, show)
    return oy, ou, ov


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _batch(rng, n=2, h=48, w=64):
    y = rng.integers(0, 256, (n, h, w)).astype(np.uint8)
    u = rng.integers(0, 256, (n, h // 2, w // 2)).astype(np.uint8)
    v = rng.integers(0, 256, (n, h // 2, w // 2)).astype(np.uint8)
    return y, u, v


@pytest.mark.parametrize("lx,ly,lw,lh", [
    (10, 8, 20, 12),          # interior
    (11, 9, 21, 13),          # odd offsets: chroma lost-bit injection
    (1, 1, 20, 12),           # band-expanded region touches top-left
    (43, 35, 20, 12),         # band-expanded region ends exactly at w,h
])
def test_delogo_oracle(rng, lx, ly, lw, lh):
    y, u, v = _batch(rng)
    g = FilterGraph(f"delogo=x={lx}:y={ly}:w={lw}:h={lh}")
    fb = from_numpy_yuv420(y, u, v)
    out, _ = g.process(fb)
    gy = np.asarray(out.planes["y"])
    gu = np.asarray(out.planes["u"])
    gv = np.asarray(out.planes["v"])
    for i in range(len(y)):
        wy, wu, wv = oracle_frame(y[i], u[i], v[i], lx, ly, lw, lh)
        np.testing.assert_array_equal(gy[i], wy)
        np.testing.assert_array_equal(gu[i], wu)
        np.testing.assert_array_equal(gv[i], wv)


def test_delogo_show_ring(rng):
    y, u, v = _batch(rng, n=1)
    g = FilterGraph("delogo=x=10:y=8:w=20:h=12:show=1")
    out, _ = g.process(from_numpy_yuv420(y, u, v))
    gy = np.asarray(out.planes["y"])[0]
    wy, _, _ = oracle_frame(y[0], u[0], v[0], 10, 8, 20, 12, show=True)
    np.testing.assert_array_equal(gy, wy)
    # the band-expanded region starts at (ly-1, lx-1); its inner ring
    # (first interior row y1+1 = 8) is blacked
    assert (gy[8, 11:29] == 0).all()
    assert (gy == 0).sum() > 30


def test_delogo_option_gates(rng):
    with pytest.raises(FilterError, match="was not set"):
        FilterGraph("delogo=x=4:y=4:w=10")
    y, u, v = _batch(rng, n=1, h=16, w=16)
    # config_props rejects boxes whose band-expanded region leaves the
    # frame (vf_delogo.c:279-289) — BEFORE filter_frame's auto-clamp
    for bad in ("delogo=x=4:y=4:w=200:h=10",     # overflows right
                "delogo=x=0:y=4:w=8:h=8",        # x-1 < 0 after expand
                "delogo=x=400:y=4:w=10:h=10"):
        g = FilterGraph(bad)
        with pytest.raises(FilterError, match="outside"):
            g.process(from_numpy_yuv420(y, u, v))
    # exactly fitting passes (x-1 >= 0, x-1 + w+2 <= W)
    g = FilterGraph("delogo=x=1:y=1:w=13:h=13")
    g.process(from_numpy_yuv420(y, u, v))


def test_delogo_expressions():
    g = FilterGraph("delogo=x=2*5:y=4+4:w=20:h=12")
    assert g is not None
