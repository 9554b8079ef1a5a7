"""lut3d filter — vf_lut3d.c analog (cube/3dl parse + 5 interp modes)."""
import numpy as np
import pytest

import jax
from gmat_tpu.core.frame import FrameBatch
from gmat_tpu.filters import lut3d as l3
from gmat_tpu.filters.graph import FilterGraph

import jax.numpy as jnp


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _rgb_fb(rng, n=1, h=8, w=12, fmt="rgb24"):
    c = 4 if fmt in ("rgba", "bgra") else 3
    a = rng.integers(0, 256, (n, h, w, c)).astype(np.uint8)
    return FrameBatch({"rgb": jnp.asarray(a)}, fmt, w, h), a


def _oracle(px, lut, scale, mode):
    """Independent per-pixel float32 reimplementation of the C kernel."""
    S = lut.shape[0]
    lm = np.float32(S - 1)
    out = np.empty(3, np.float32)
    s = np.empty(3, np.float32)
    for ci in range(3):
        v = np.float32(px[ci]) * (np.float32(1.0) / np.float32(255.0))
        s[ci] = np.clip(v * (np.float32(scale[ci]) * lm), 0, lm)
    if mode == "nearest":
        i = [int(s[c] + 0.5) for c in range(3)]
        return lut[i[0], i[1], i[2]]
    p = [int(s[c]) for c in range(3)]
    nx = [min(p[c] + 1, S - 1) for c in range(3)]
    d = np.array([s[c] - p[c] for c in range(3)], np.float32)
    C = lambda a, b, c_: lut[a, b, c_].astype(np.float32)
    c000, c111 = C(p[0], p[1], p[2]), C(nx[0], nx[1], nx[2])
    dr, dg, db = d
    if mode == "trilinear":
        lerp = lambda a, b, f: a + (b - a) * f
        c00 = lerp(c000, C(nx[0], p[1], p[2]), dr)
        c10 = lerp(C(p[0], nx[1], p[2]), C(nx[0], nx[1], p[2]), dr)
        c01 = lerp(C(p[0], p[1], nx[2]), C(nx[0], p[1], nx[2]), dr)
        c11 = lerp(C(p[0], nx[1], nx[2]), c111, dr)
        return lerp(lerp(c00, c10, dg), lerp(c01, c11, dg), db)
    if mode == "tetrahedral":
        if dr > dg:
            if dg > db:
                return ((1-dr)*c000 + (dr-dg)*C(nx[0],p[1],p[2])
                        + (dg-db)*C(nx[0],nx[1],p[2]) + db*c111)
            if dr > db:
                return ((1-dr)*c000 + (dr-db)*C(nx[0],p[1],p[2])
                        + (db-dg)*C(nx[0],p[1],nx[2]) + dg*c111)
            return ((1-db)*c000 + (db-dr)*C(p[0],p[1],nx[2])
                    + (dr-dg)*C(nx[0],p[1],nx[2]) + dg*c111)
        if db > dg:
            return ((1-db)*c000 + (db-dg)*C(p[0],p[1],nx[2])
                    + (dg-dr)*C(p[0],nx[1],nx[2]) + dr*c111)
        if db > dr:
            return ((1-dg)*c000 + (dg-db)*C(p[0],nx[1],p[2])
                    + (db-dr)*C(p[0],nx[1],nx[2]) + dr*c111)
        return ((1-dg)*c000 + (dg-dr)*C(p[0],nx[1],p[2])
                + (dr-db)*C(nx[0],nx[1],p[2]) + db*c111)
    raise AssertionError(mode)


CUBE = """# comment
TITLE "test look"
LUT_3D_SIZE 2
DOMAIN_MIN 0.0 0.0 0.0
0.0 0.0 0.0
1.0 0.1 0.2
0.3 1.0 0.0
1.0 1.0 0.25
0.0 0.0 1.0
1.0 0.5 1.0
0.5 1.0 1.0
1.0 1.0 1.0
DOMAIN_MAX 1.0 1.0 1.0
"""


def test_parse_cube_red_fastest():
    lut, scale = l3.parse_cube(CUBE)
    assert lut.shape == (2, 2, 2, 3)
    # line 2 (r=1,g=0,b=0) -> lut[1,0,0]
    np.testing.assert_allclose(lut[1, 0, 0], [1.0, 0.1, 0.2])
    # line 4 (r=1,g=1,b=0) -> lut[1,1,0]
    np.testing.assert_allclose(lut[1, 1, 0], [1.0, 1.0, 0.25])
    np.testing.assert_allclose(scale, [1, 1, 1])


def test_cube_domain_scale():
    # DOMAIN_* interleaved with the data (the C try_again loop) counts...
    txt = CUBE.replace("0.3 1.0 0.0", "DOMAIN_MAX 2.0 1.0 1.0\n0.3 1.0 0.0")
    _, scale = l3.parse_cube(txt)
    np.testing.assert_allclose(scale, [0.5, 1, 1])
    # ...but DOMAIN_* BEFORE LUT_3D_SIZE or AFTER the last entry is
    # ignored, exactly like parse_cube's scan/break structure
    txt2 = "DOMAIN_MAX 2.0 2.0 2.0\n" + CUBE + "\nDOMAIN_MAX 4.0 4.0 4.0"
    _, scale2 = l3.parse_cube(txt2)
    np.testing.assert_allclose(scale2, [1, 1, 1])


def test_parse_3dl():
    size = 17
    lines = ["0 1 2 3"]                 # ramp header (skipped)
    for k in range(size ** 3):
        lines.append(f"{k % 4096} {(k * 7) % 4096} 4095")
    lut, scale = l3.parse_3dl("\n".join(lines))
    assert lut.shape == (17, 17, 17, 3)
    np.testing.assert_allclose(lut[0, 0, 1], [1 / 4096, 7 / 4096,
                                              4095 / 4096], rtol=1e-6)


@pytest.mark.parametrize("mode", ["nearest", "trilinear", "tetrahedral"])
def test_lut3d_oracle(rng, mode, tmp_path):
    lut = rng.random((5, 5, 5, 3)).astype(np.float32)
    scale = np.ones(3, np.float32)
    fb, src = _rgb_fb(rng, h=6, w=9)
    out = l3.apply_lut3d(fb, lut, scale, mode)
    o = np.asarray(out.planes["rgb"])
    for yy in range(6):
        for xx in range(9):
            vec = _oracle(src[0, yy, xx], lut, scale, mode)
            exp = np.clip((vec * np.float32(255.0)).astype(np.int32),
                          0, 255).astype(np.uint8)
            np.testing.assert_array_equal(o[0, yy, xx], exp)


def test_lut3d_identity_close(rng):
    fb, src = _rgb_fb(rng)
    out = FilterGraph("lut3d").process(fb)[0]     # identity LUT
    diff = np.abs(np.asarray(out.planes["rgb"]).astype(int) -
                  src.astype(int))
    assert diff.max() <= 1                        # float roundtrip only


def test_lut3d_modes_agree_on_lattice(rng):
    """All five interpolators are exact at lattice points."""
    lut = rng.random((2, 2, 2, 3)).astype(np.float32)
    a = np.zeros((1, 2, 2, 3), np.uint8)
    a[0, 0, 1] = 255
    a[0, 1, 0] = [255, 0, 255]
    a[0, 1, 1] = [0, 255, 0]
    fb = FrameBatch({"rgb": jnp.asarray(a)}, "rgb24", 2, 2)
    outs = [np.asarray(l3.apply_lut3d(fb, lut, np.ones(3, np.float32),
                                      m).planes["rgb"])
            for m in l3.INTERP_MODES]
    for o in outs[1:]:
        np.testing.assert_array_equal(o, outs[0])


def test_lut3d_cube_file_and_alpha(rng, tmp_path):
    p = tmp_path / "look.cube"
    p.write_text(CUBE)
    fb, src = _rgb_fb(rng, fmt="rgba")
    g = FilterGraph(f"lut3d=file={p}:interp=trilinear")
    out, _ = g.process(fb)
    o = np.asarray(out.planes["rgb"])
    np.testing.assert_array_equal(o[..., 3], src[..., 3])  # alpha kept
    assert not np.array_equal(o[..., :3], src[..., :3])
    # white maps to lut[1,1,1] = (1,1,1) -> 255
    white = FrameBatch({"rgb": jnp.full((1, 2, 2, 4), 255, jnp.uint8)},
                       "rgba", 2, 2)
    ow = np.asarray(g.process(white)[0].planes["rgb"])
    assert np.all(ow[..., :3] == 255)


def test_lut3d_yuv_rejected(rng):
    from gmat_tpu.core.frame import from_numpy_yuv420
    fb = from_numpy_yuv420(
        rng.integers(0, 256, (1, 8, 12)).astype(np.uint8),
        rng.integers(0, 256, (1, 4, 6)).astype(np.uint8),
        rng.integers(0, 256, (1, 4, 6)).astype(np.uint8))
    with pytest.raises(ValueError, match="RGB"):
        FilterGraph("lut3d").process(fb)


def test_parser_malformed_headers_raise_luterror():
    """Fuzz regressions: malformed size/domain headers must raise
    LutError, never bare ValueError/IndexError."""
    for bad in ("LUT_3D_SIZE A\n0 0 0", "LUT_3D_SIZE\n", "LUT_3D_SIZE +",
                "LUT_3D_SIZE 2\nDOMAIN_MIN 0 0\n" + "0 0 0\n" * 8,
                "LUT_3D_SIZE 2\nDOMAIN_MAX x y z\n" + "0 0 0\n" * 8,
                "LUT_3D_SIZE 999999"):
        with pytest.raises(l3.LutError):
            l3.parse_cube(bad)


# ---- lut1d ------------------------------------------------------------------

CUBE1D = """TITLE "curve"
LUT_1D_SIZE 4
LUT_1D_INPUT_RANGE 0.0 1.0
0.0 0.0 0.1
0.2 0.3 0.4
0.6 0.5 0.7
1.0 1.0 0.9
"""


def _oracle_1d(v, col, scale_c, mode, S):
    # the 1D kernel's exact f32 sequence: one precombined constant
    # (scale/factor)*(S-1), single multiply, NO position clip
    sc = (np.float32(scale_c) / np.float32(255.0)) * np.float32(S - 1)
    s = np.float32(v) * sc
    prev = int(s)
    nxt = min(prev + 1, S - 1)
    d = np.float32(s - prev)
    p, n = col[prev], col[nxt]
    if mode == "nearest":
        return col[int(s + 0.5)]
    if mode == "linear":
        return p + (n - p) * d
    if mode == "cosine":
        m = (np.float32(1.0) - np.float32(np.cos(d * np.float32(np.pi)))) \
            * np.float32(0.5)
        return p + (n - p) * m
    y0, y3 = col[max(prev - 1, 0)], col[min(nxt + 1, S - 1)]
    if mode == "cubic":
        mu2 = d * d
        a0 = y3 - n - y0 + p
        a1 = y0 - p - a0
        a2 = n - y0
        return a0 * d * mu2 + a1 * mu2 + a2 * d + p
    c0 = p
    c1 = np.float32(0.5) * (n - y0)
    c2 = y0 - np.float32(2.5) * p + np.float32(2.0) * n \
        - np.float32(0.5) * y3
    c3 = np.float32(0.5) * (y3 - y0) + np.float32(1.5) * (p - n)
    return ((c3 * d + c2) * d + c1) * d + c0


@pytest.mark.parametrize("mode", list(l3.INTERP_1D_MODES))
def test_lut1d_oracle(rng, mode):
    lut, scale = l3.parse_cube_1d(CUBE1D)
    assert lut.shape == (4, 3)
    fb, src = _rgb_fb(rng, h=4, w=6)
    out = l3.apply_lut1d(fb, lut, scale, mode)
    o = np.asarray(out.planes["rgb"])
    for yy in range(4):
        for xx in range(6):
            for ci in range(3):
                vec = _oracle_1d(src[0, yy, xx, ci], lut[:, ci],
                                 scale[ci], mode, 4)
                exp = np.uint8(min(max(int(np.float32(vec)
                                           * np.float32(255.0)), 0), 255))
                assert o[0, yy, xx, ci] == exp, (mode, yy, xx, ci)


def test_lut1d_identity_and_graph(rng):
    fb, src = _rgb_fb(rng)
    out, _ = FilterGraph("lut1d").process(fb)
    diff = np.abs(np.asarray(out.planes["rgb"]).astype(int) - src.astype(int))
    assert diff.max() <= 1
    # file through the graph; input range scales positions
    import tempfile, os
    p = os.path.join(tempfile.gettempdir(), "curve1d.cube")
    open(p, "w").write(CUBE1D)
    out2, _ = FilterGraph(f"lut1d=file={p}:interp=spline").process(fb)
    assert not np.array_equal(np.asarray(out2.planes["rgb"]), src)


# ---- curves (vf_curves.c) ---------------------------------------------------

def test_curves_spline_properties():
    from gmat_tpu.filters.builtin import (_curves_spline_graph,
                                          _curves_parse_points)
    pts = _curves_parse_points("0/0 0.5/0.7 1/1", 256)
    g = _curves_spline_graph(pts, 8)
    # interpolates the control points (within the truncation LSB)
    assert abs(int(g[0]) - 0) <= 1
    assert abs(int(g[127]) - int(0.7 * 255)) <= 2
    assert abs(int(g[255]) - 255) <= 1
    assert g.min() >= 0 and g.max() <= 255
    # identity points give (near-)identity
    gi = _curves_spline_graph(_curves_parse_points("0/0 1/1", 256), 8)
    assert np.abs(gi - np.arange(256)).max() <= 1
    # no points -> exact identity; one point -> constant
    np.testing.assert_array_equal(
        _curves_spline_graph([], 8), np.arange(256))
    assert np.all(_curves_spline_graph([(0.3, 0.5)], 8) == 127)
    # left/right padding is constant
    gp = _curves_spline_graph(_curves_parse_points("0.25/0.5 0.75/0.5",
                                                   256), 8)
    assert np.all(gp[:63] == 127) and np.all(gp[200:] == 127)


def test_curves_validation():
    from gmat_tpu.filters.builtin import _curves_parse_points
    with pytest.raises(ValueError, match="outside"):
        _curves_parse_points("0/0 1.5/1", 256)
    with pytest.raises(ValueError, match="increasing"):
        _curves_parse_points("0.5/0 0.5/1", 256)
    with pytest.raises(ValueError, match="bad point"):
        _curves_parse_points("0.5", 256)


def test_curves_filter_presets_and_master(rng):
    from gmat_tpu.filters.builtin import FILTERS
    fb, src = _rgb_fb(rng, h=8, w=12)
    # darker preset lowers the mean of all channels
    out, _ = FilterGraph("curves=preset=darker").process(fb)
    o = np.asarray(out.planes["rgb"])
    assert o.astype(float).mean() < src.astype(float).mean()
    # negative master inverts (within spline truncation)
    neg = FILTERS["curves"](m="0/1 1/0")(fb)
    on = np.asarray(neg.planes["rgb"]).astype(int)
    assert np.abs(on - (255 - src.astype(int))).max() <= 1
    # per-channel points touch only that channel
    redx = FILTERS["curves"](r="0/1 1/0")(fb)
    orx = np.asarray(redx.planes["rgb"])
    np.testing.assert_array_equal(orx[..., 1:], src[..., 1:])
    assert np.abs(orx[..., 0].astype(int)
                  - (255 - src[..., 0].astype(int))).max() <= 1
    # unknown preset rejected
    with pytest.raises(ValueError, match="preset"):
        FilterGraph("curves=preset=bogus").process(fb)


def test_curves_vintage_16bit(rng):
    from gmat_tpu.filters.builtin import FILTERS
    a = rng.integers(0, 65536, (1, 6, 8, 3)).astype(np.uint16)
    fb = FrameBatch({"rgb": jnp.asarray(a)}, "rgb48", 8, 6)
    out = FILTERS["curves"](preset="vintage")(fb)
    o = np.asarray(out.planes["rgb"])
    assert o.dtype == np.uint16 and not np.array_equal(o, a)


def test_cube_malformed_data_line_rejected():
    """Short or junk data lines after LUT_3D_SIZE error out like
    av_sscanf != 3 (review r4) — silent skipping would shift entries."""
    with pytest.raises(l3.LutError, match="data line"):
        l3.parse_cube("LUT_3D_SIZE 2\n0.1 0.2\n" + "0 0 0\n" * 8)
    with pytest.raises(l3.LutError, match="data line"):
        l3.parse_cube("LUT_3D_SIZE 2\nGARBAGE_KEYWORD\n" + "0 0 0\n" * 8)
    with pytest.raises(l3.LutError, match="data line"):
        l3.parse_cube_1d("LUT_1D_SIZE 4\n0.2 0.3\n" + "0 0 0\n" * 4)


def test_curves_validates_at_build_time(rng):
    with pytest.raises(ValueError, match="bad point"):
        FilterGraph("curves=master=0/x")
    with pytest.raises(ValueError, match="increasing"):
        FilterGraph("curves=master=0.5/0 0.4/1".replace(" ", "\\ "))
