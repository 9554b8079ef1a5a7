"""blend/tblend vs a literal per-pixel transcription of
blend_modes.c + vf_blend_init.h."""
import numpy as np
import pytest

from gmat_tpu.ops.blend import MODE_NAMES, blend_plane
from gmat_tpu.filters.builtin import FilterError
from gmat_tpu.filters.graph import FilterGraph

from .test_filters import from_numpy_yuv420

F = np.float32


def c_div(a, b):
    """C integer division truncates toward zero."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _cosf(x):
    import ctypes
    import ctypes.util
    libm = ctypes.CDLL(ctypes.util.find_library("m") or "libm.so.6")
    libm.cosf.restype = ctypes.c_float
    libm.cosf.argtypes = [ctypes.c_float]
    return F(libm.cosf(float(x)))


def w32(x):
    """C int products/shifts wrap int32 at depth 16 (signed-overflow UB
    that gcc on x86 wraps — verified against a gcc-compiled
    transcription of the blend_modes.c macros)."""
    return (x + 2**31) % 2**32 - 2**31


def oracle_pixel(mode, A, B, maxv, depth):
    """blend_modes.c:120-154 single-pixel EXPR in C int arithmetic."""
    HALF = 1 << (depth - 1)
    MDIV = F(0.125) * F(1 << depth)

    def MUL(x, a, b):
        return x * c_div(w32(a * b), maxv)

    def SCR(x, a, b):
        return maxv - x * c_div(w32((maxv - a) * (maxv - b)), maxv)

    def BURN(a, b):
        return a if a == 0 else max(0, maxv - c_div(w32((maxv - b)
                                                        << depth), a))

    def DODGE(a, b):
        return a if a == maxv else min(maxv, c_div(w32(b << depth),
                                                   maxv - a))

    def CLIP(x):
        return min(max(int(x), 0), maxv)

    if mode == "addition":
        return min(maxv, A + B)
    if mode == "grainmerge":
        return CLIP(A + B - HALF)
    if mode == "average":
        return c_div(A + B, 2)
    if mode == "subtract":
        return max(0, A - B)
    if mode == "multiply":
        return MUL(1, A, B)
    if mode == "multiply128":
        return CLIP(F((A - HALF) * B) / MDIV + F(HALF))
    if mode == "negation":
        return maxv - abs(maxv - A - B)
    if mode == "extremity":
        return abs(maxv - A - B)
    if mode == "difference":
        return abs(A - B)
    if mode == "grainextract":
        return CLIP(HALF + A - B)
    if mode == "screen":
        return SCR(1, A, B)
    if mode == "overlay":
        return MUL(2, A, B) if A < HALF else SCR(2, A, B)
    if mode == "hardlight":
        return MUL(2, B, A) if B < HALF else SCR(2, B, A)
    if mode == "hardmix":
        return 0 if A < maxv - B else maxv
    if mode == "heat":
        return 0 if A == 0 else maxv - min(c_div(w32((maxv - B) ** 2), A),
                                           maxv)
    if mode == "freeze":
        return 0 if B == 0 else maxv - min(c_div(w32((maxv - A) ** 2), B),
                                           maxv)
    if mode == "darken":
        return min(A, B)
    if mode == "lighten":
        return max(A, B)
    if mode == "divide":
        return CLIP(maxv if B == 0 else c_div(w32(maxv * A), B))
    if mode == "dodge":
        return DODGE(A, B)
    if mode == "burn":
        return BURN(A, B)
    if mode == "softlight":
        return CLIP(c_div(w32(A * A), maxv)
                    + 2 * c_div(w32(B * c_div(w32(A * (maxv - A)),
                                              maxv)), maxv))
    if mode == "exclusion":
        # C precedence: 2 * A * B / MAX = ((2*A)*B)/MAX
        return A + B - c_div(w32(2 * A * B), maxv)
    if mode == "pinlight":
        return min(A, 2 * B) if B < HALF else max(A, 2 * (B - HALF))
    if mode == "phoenix":
        return min(A, B) - max(A, B) + maxv
    if mode == "reflect":
        return B if B == maxv else min(maxv, c_div(w32(A * A), maxv - B))
    if mode == "glow":
        return A if A == maxv else min(maxv, c_div(w32(B * B), maxv - A))
    if mode == "and":
        return A & B
    if mode == "or":
        return A | B
    if mode == "xor":
        return A ^ B
    if mode == "vividlight":
        return BURN(2 * A, B) if A < HALF \
            else DODGE(2 * (A - HALF), B)
    if mode == "linearlight":
        return CLIP(B + 2 * A - maxv if B < HALF
                    else B + 2 * (A - HALF))
    if mode == "softdifference":
        if A > B:
            return CLIP(0 if B == maxv
                        else c_div(w32((A - B) * maxv), maxv - B))
        return CLIP(0 if B == 0 else c_div(w32((B - A) * maxv), B))
    if mode == "geometric":
        return int(np.round(np.sqrt(F(A * B))))
    if mode == "harmonic":
        return 0 if A == 0 and B == 0 else c_div(2 * A * B, A + B)
    if mode == "bleach":
        return (maxv - B) + (maxv - A) - maxv
    if mode == "stain":
        return 2 * maxv - A - B
    if mode == "interpolate":
        # lrintf of an all-float32 expression; cosf is glibc's (the
        # argument A*M_PI/MAX is a double narrowed at the call)
        return int(np.round(F(maxv)
                            * (F(2.0) - _cosf(F(A * np.pi / maxv))
                               - _cosf(F(B * np.pi / maxv)))
                            * F(0.25)))
    if mode == "hardoverlay":
        if A == maxv:
            return maxv
        return min(maxv,
                   c_div(w32(maxv * B), 2 * maxv - 2 * A) * (A > HALF)
                   + c_div(w32(2 * A * B), maxv) * (A <= HALF))
    raise AssertionError(mode)


def oracle_plane(top, bottom, mode, opacity, depth):
    """param->blend: EXPR then dst = top + (EXPR-top)*opacity with a
    truncating (wrapping) PIXEL store (blend_modes.c:91-117)."""
    mode = MODE_NAMES.get(mode, mode)   # addition128/difference128
    maxv = (1 << depth) - 1
    out = np.empty_like(top)
    it = top.astype(np.int64)
    ib = bottom.astype(np.int64)
    for y in range(top.shape[0]):
        for x in range(top.shape[1]):
            e = oracle_pixel(mode, int(it[y, x]), int(ib[y, x]),
                             maxv, depth)
            v = F(it[y, x]) + F(e - it[y, x]) * F(opacity)
            out[y, x] = np.int64(np.trunc(np.float64(v)))
    return out


@pytest.fixture
def ab():
    rng = np.random.default_rng(61)
    return (rng.integers(0, 256, (9, 11)).astype(np.uint8),
            rng.integers(0, 256, (9, 11)).astype(np.uint8))


@pytest.mark.parametrize("mode", sorted(set(MODE_NAMES) - {"normal"}))
def test_blend_modes_8bit(ab, mode):
    A, B = ab
    got = blend_plane(A, B, mode, 1.0, 8)
    want = oracle_plane(A, B, mode, 1.0, 8)
    np.testing.assert_array_equal(got, want, err_msg=mode)


@pytest.mark.parametrize("mode", ["multiply", "burn", "vividlight",
                                  "harmonic", "geometric",
                                  "hardoverlay", "softdifference"])
def test_blend_modes_16bit_and_opacity(ab, mode):
    A8, B8 = ab
    A = (A8.astype(np.uint16) << 8) | 7
    B = (B8.astype(np.uint16) << 8) | 3
    got = blend_plane(A, B, mode, 1.0, 16)
    want = oracle_plane(A, B, mode, 1.0, 16)
    np.testing.assert_array_equal(got, want, err_msg=mode)
    got = blend_plane(A8, B8, mode, 0.7, 8)
    want = oracle_plane(A8, B8, mode, 0.7, 8)
    np.testing.assert_array_equal(got, want, err_msg=f"{mode}@0.7")


def test_blend_normal_and_copy(ab):
    A, B = ab
    np.testing.assert_array_equal(blend_plane(A, B, "normal", 1.0, 8),
                                  A)
    np.testing.assert_array_equal(blend_plane(A, B, "normal", 0.0, 8),
                                  B)
    np.testing.assert_array_equal(blend_plane(A, B, "multiply", 0.0,
                                              8), A)
    got = blend_plane(A, B, "normal", 0.3, 8)
    want = np.trunc(A.astype(F) * F(0.3)
                    + B.astype(F) * (F(1.0) - F(0.3))).astype(np.uint8)
    np.testing.assert_array_equal(got, want)


def test_blend_float_modes(ab):
    A8, B8 = ab
    A = (A8.astype(F) / F(255.0))
    B = (B8.astype(F) / F(255.0))
    # the C's generic store applies the opacity mix even at op=1:
    # dst = top + (EXPR - top) * opacity, all float32
    got = blend_plane(A, B, "multiply", 1.0, 32)
    want = (A + (A * B - A) * F(1.0)).astype(F)
    np.testing.assert_array_equal(got, want)
    # bitwise xor on float bit patterns (through the same mix)
    got = blend_plane(A, B, "xor", 1.0, 32)
    x = (A.view(np.int32) ^ B.view(np.int32)).view(F)
    want = (A + (x - A) * F(1.0)).astype(F)
    np.testing.assert_array_equal(got, want)


def test_tblend_stream(ab):
    rng = np.random.default_rng(62)
    y = rng.integers(0, 256, (5, 16, 16)).astype(np.uint8)
    u = rng.integers(0, 256, (5, 8, 8)).astype(np.uint8)
    v = rng.integers(0, 256, (5, 8, 8)).astype(np.uint8)
    g = FilterGraph("tblend=all_mode=difference")
    outs, out_pts = [], []
    for lo, hi in ((0, 2), (2, 5)):
        fb = from_numpy_yuv420(y[lo:hi], u[lo:hi], v[lo:hi])
        ofb, k = g.process(fb, pts=np.arange(lo, hi))
        ys = np.asarray(ofb.planes["y"])
        for j in np.nonzero(k)[0]:
            outs.append(ys[j])
        out_pts.extend(np.asarray(g.out_pts)[k].tolist())
    assert len(outs) == 4                 # first frame primes only
    assert out_pts == [1, 2, 3, 4]
    for i in range(4):
        want = oracle_plane(y[i + 1], y[i], "difference", 1.0, 8)
        np.testing.assert_array_equal(outs[i], want)


def test_blend_dual_and_expr(tmp_path, ab):
    rng = np.random.default_rng(63)
    W, H = 16, 12
    bot = [(rng.integers(0, 256, (H, W)).astype(np.uint8),
            np.full((H // 2, W // 2), 100, np.uint8),
            np.full((H // 2, W // 2), 200, np.uint8))
           for _ in range(2)]
    second = str(tmp_path / "bot.y4m")
    with open(second, "wb") as f:
        f.write(f"YUV4MPEG2 W{W} H{H} F25:1 Ip A1:1 C420jpeg\n"
                .encode())
        for (yy, uu, vv) in bot:
            f.write(b"FRAME\n")
            f.write(yy.tobytes())
            f.write(uu.tobytes())
            f.write(vv.tobytes())
    y = rng.integers(0, 256, (4, H, W)).astype(np.uint8)
    u = np.full((4, H // 2, W // 2), 128, np.uint8)
    v = np.full((4, H // 2, W // 2), 128, np.uint8)
    g = FilterGraph(f"blend=all_mode=lighten:video={second}")
    ofb, k = g.process(from_numpy_yuv420(y, u, v), pts=np.arange(4))
    ys = np.asarray(ofb.planes["y"])[k]
    np.testing.assert_array_equal(ys[0], np.maximum(y[0], bot[0][0]))
    np.testing.assert_array_equal(ys[1], np.maximum(y[1], bot[1][0]))
    # bottom EOF -> framesync repeats the LAST bottom frame
    np.testing.assert_array_equal(ys[3], np.maximum(y[3], bot[1][0]))
    # per-pixel expression (no opacity stage)
    g2 = FilterGraph(f"blend=c0_expr=(A+B)/2:video={second}")
    ofb, k = g2.process(from_numpy_yuv420(y, u, v), pts=np.arange(4))
    ys = np.asarray(ofb.planes["y"])[k]
    want = np.trunc((y[0].astype(np.float64)
                     + bot[0][0].astype(np.float64)) / 2.0) \
        .astype(np.uint8)
    np.testing.assert_array_equal(ys[0], want)


def test_blend_gates():
    for bad in ("blend=all_mode=zz:video=x.mp4",
                "blend=all_mode=multiply",
                "tblend=c0_opacity=2",
                "tblend=bogus=1"):
        with pytest.raises(FilterError):
            FilterGraph(bad)
