"""CSC kernels vs the independent numpy oracle."""
import numpy as np
import pytest

from gmat_tpu.core.frame import FrameBatch, from_numpy_rgb, from_numpy_yuv420
from gmat_tpu.core.frame import unpack_nv12, pack_nv12
from gmat_tpu.ops import csc

import jax.numpy as jnp

from . import oracle


def random_yuv420(rng, n=2, h=64, w=96, bits=8):
    dt = np.uint8 if bits == 8 else np.uint16
    hi = (1 << bits) - 1
    y = rng.integers(0, hi + 1, (n, h, w)).astype(dt)
    u = rng.integers(0, hi + 1, (n, h // 2, w // 2)).astype(dt)
    v = rng.integers(0, hi + 1, (n, h // 2, w // 2)).astype(dt)
    return y, u, v


@pytest.mark.parametrize("cspace", ["bt709", "bt601", "fcc", "smpte240m"])
def test_yuv420_to_rgb24_exact(rng, cspace):
    y, u, v = random_yuv420(rng)
    fb = from_numpy_yuv420(y, u, v, colorspace=cspace)
    out = csc.yuv_to_rgb(fb, "rgb24", exact=True)
    got = np.asarray(out.planes["rgb"])
    for i in range(y.shape[0]):
        want = oracle.yuv420_to_rgb24(y[i], u[i], v[i], cspace)
        # float assoc differences can flip a truncation by 1 code value
        assert np.abs(got[i].astype(int) - want.astype(int)).max() <= 1


def test_yuv420_to_rgb24_round_close_to_exact(rng):
    y, u, v = random_yuv420(rng)
    fb = from_numpy_yuv420(y, u, v)
    got = np.asarray(csc.yuv_to_rgb(fb, "rgb24").planes["rgb"])
    want = oracle.yuv420_to_rgb24(y[0], u[0], v[0], "bt709")
    assert np.abs(got[0].astype(int) - want.astype(int)).max() <= 1


def test_rgb24_to_yuv420_exact(rng):
    rgb = rng.integers(0, 256, (2, 64, 96, 3)).astype(np.uint8)
    fb = from_numpy_rgb(rgb)
    out = csc.rgb_to_yuv(fb, "yuv420p", exact=True)
    for i in range(2):
        wy, wu, wv = oracle.rgb24_to_yuv420(rgb[i], "bt709")
        assert np.abs(np.asarray(out.planes["y"][i], int) - wy.astype(int)).max() <= 1
        assert np.abs(np.asarray(out.planes["u"][i], int) - wu.astype(int)).max() <= 1
        assert np.abs(np.asarray(out.planes["v"][i], int) - wv.astype(int)).max() <= 1


def test_roundtrip_rgb_yuv_rgb(rng):
    # smooth content round-trips within a few code values
    xx = np.linspace(40, 200, 96)[None, :]
    yy = np.linspace(30, 220, 64)[:, None]
    rgb = np.stack([xx + 0 * yy, 0 * xx + yy, (xx + yy) / 2], -1)
    rgb = np.broadcast_to(rgb[None], (1, 64, 96, 3)).astype(np.uint8)
    fb = from_numpy_rgb(rgb.copy())
    back = csc.yuv_to_rgb(csc.rgb_to_yuv(fb, "yuv420p"), "rgb24")
    diff = np.abs(np.asarray(back.planes["rgb"], int) - rgb.astype(int))
    assert diff.max() <= 8  # chroma subsample + quantization


def test_nv12_pack_unpack_roundtrip(rng):
    data = rng.integers(0, 256, (3, 48 * 3 // 2, 64)).astype(np.uint8)
    fb = unpack_nv12(jnp.asarray(data), 48, 64)
    fb.validate()
    rt = np.asarray(pack_nv12(fb))
    np.testing.assert_array_equal(rt, data)


def test_rgba_alpha_and_order(rng):
    y, u, v = random_yuv420(rng, n=1)
    fb = from_numpy_yuv420(y, u, v)
    rgba = np.asarray(csc.yuv_to_rgb(fb, "rgba").planes["rgb"])
    bgra = np.asarray(csc.yuv_to_rgb(fb, "bgra").planes["rgb"])
    assert rgba.shape[-1] == 4 and (rgba[..., 3] == 255).all()
    np.testing.assert_array_equal(rgba[..., 0], bgra[..., 2])
    np.testing.assert_array_equal(rgba[..., 1], bgra[..., 1])


def test_rgba64_shift(rng):
    y, u, v = random_yuv420(rng, n=1)
    fb = from_numpy_yuv420(y, u, v)
    r8 = np.asarray(csc.yuv_to_rgb(fb, "rgb24", exact=True).planes["rgb"])
    r16 = np.asarray(csc.yuv_to_rgb(fb, "rgba64", exact=True).planes["rgb"])
    np.testing.assert_array_equal(r16[..., :3], r8.astype(np.uint16) << 8)


def test_float_norm_shift(rng):
    y, u, v = random_yuv420(rng, n=1)
    fb = from_numpy_yuv420(y, u, v)
    ref = np.asarray(csc.yuv_to_rgb(fb, "rgb24", exact=True).planes["rgb"])
    # canonical float range is [0, 1]
    raw = np.asarray(csc.yuv_to_rgb(fb, "rgbpf32", exact=True).planes["rgb"])
    np.testing.assert_allclose(raw, ref.astype(np.float32) / 255.0,
                               atol=0.005)
    # norm=1.0 reproduces libgpuscale's 0..255-valued RGBF32
    lgs = np.asarray(csc.yuv_to_rgb(fb, "rgbpf32", exact=True,
                                    norm=1.0).planes["rgb"])
    np.testing.assert_allclose(lgs, ref.astype(np.float32), atol=1)
    normed = np.asarray(csc.yuv_to_rgb(
        fb, "rgbpf32", exact=True, norm=255.0,
        shift=(127.5, 127.5, 127.5)).planes["rgb"])
    np.testing.assert_allclose(
        normed, (ref.astype(np.float32) - 127.5) / 255.0, atol=0.005)


def test_float_rgb_roundtrip(rng):
    # regression: rgbpf32 -> yuv420p and -> rgb24 must invert cleanly
    y = np.full((1, 16, 16), 128, np.uint8)
    u = np.full((1, 8, 8), 128, np.uint8)
    v = np.full((1, 8, 8), 128, np.uint8)
    fb = from_numpy_yuv420(y, u, v)
    f = csc.yuv_to_rgb(fb, "rgbpf32")
    back = csc.rgb_to_yuv(f, "yuv420p")
    assert abs(int(np.asarray(back.planes["y"])[0, 0, 0]) - 128) <= 1
    r24 = csc.rgb_to_rgb(f, "rgb24")
    assert abs(int(np.asarray(r24.planes["rgb"])[0, 0, 0, 0]) - 130) <= 1


def test_yuv420p10_alignment(rng):
    # regression: lsb-aligned 10-bit must shift by 2, p010 realigns by 6
    y = np.full((1, 16, 16), 128, np.uint8)
    u = np.full((1, 8, 8), 128, np.uint8)
    fb = from_numpy_yuv420(y, u, u.copy())
    p10 = csc.yuv_to_yuv(fb, "yuv420p10")
    assert int(np.asarray(p10.planes["y"])[0, 0, 0]) == 512
    rgb = csc.yuv_to_rgb(p10, "rgb24")
    assert abs(int(np.asarray(rgb.planes["rgb"])[0, 0, 0, 0]) - 130) <= 1
    pp = csc.yuv_to_yuv(csc.yuv_to_yuv(fb, "p010"), "yuv420p10")
    assert int(np.asarray(pp.planes["y"])[0, 0, 0]) == 512


def test_yuv_depth_conversions(rng):
    y, u, v = random_yuv420(rng)
    fb = from_numpy_yuv420(y, u, v)
    p16 = csc.yuv_to_yuv(fb, "p016")
    np.testing.assert_array_equal(
        np.asarray(p16.planes["y"]), y.astype(np.uint16) << 8)
    back = csc.yuv_to_yuv(p16, "yuv420p")
    np.testing.assert_array_equal(np.asarray(back.planes["y"]), y)


def test_yuv420_to_444_and_back(rng):
    y, u, v = random_yuv420(rng, n=1)
    fb = from_numpy_yuv420(y, u, v)
    f444 = csc.yuv_to_yuv(fb, "yuv444p")
    assert f444.planes["u"].shape == f444.planes["y"].shape
    back = csc.yuv_to_yuv(f444, "yuv420p")
    np.testing.assert_array_equal(np.asarray(back.planes["u"]), u)


def test_convert_dispatcher(rng):
    y, u, v = random_yuv420(rng, n=1)
    fb = from_numpy_yuv420(y, u, v)
    assert csc.convert(fb, "bgr24").format == "bgr24"
    assert csc.convert(fb, "yuv420p").format == "yuv420p"
    rgb = csc.convert(fb, "rgb24")
    assert csc.convert(rgb, "rgbpf32").format == "rgbpf32"
    assert csc.convert(rgb, "yuv420p").format == "yuv420p"


def test_nchw_helpers(rng):
    rgb = rng.integers(0, 256, (2, 16, 24, 3)).astype(np.uint8)
    fb = from_numpy_rgb(rgb)
    x = csc.to_nchw(fb)
    assert x.shape == (2, 3, 16, 24) and x.dtype == jnp.float32
    back = csc.from_nchw(x, "rgbpf32")
    assert back.planes["rgb"].shape == (2, 16, 24, 3)


def test_gray8_paths(rng):
    from gmat_tpu.core.frame import FrameBatch
    y = rng.integers(16, 236, (1, 16, 16)).astype(np.uint8)
    g = FrameBatch({"y": jnp.asarray(y)}, "gray8", 16, 16)
    rgb = csc.convert(g, "rgb24")
    arr = np.asarray(rgb.planes["rgb"])
    # neutral chroma -> R == G == B
    np.testing.assert_array_equal(arr[..., 0], arr[..., 1])
    np.testing.assert_array_equal(arr[..., 1], arr[..., 2])
    # gray -> yuv420 -> gray round trip
    yuv = csc.convert(g, "yuv420p")
    assert yuv.planes["u"].shape == (1, 8, 8)
    assert int(np.asarray(yuv.planes["u"])[0, 0, 0]) == 128
    back = csc.convert(yuv, "gray8")
    np.testing.assert_array_equal(np.asarray(back.planes["y"]), y)


def test_rgb_to_gray8_roundtrip(rng):
    """rgb24 -> gray8 (luma only, no chroma planes) and back."""
    rgb = rng.integers(0, 256, (2, 16, 16, 3)).astype(np.uint8)
    fb = from_numpy_rgb(rgb)
    g = csc.convert(fb, "gray8")
    assert set(g.planes) == {"y"} and g.format == "gray8"
    # luma matches the full rgb->yuv conversion's Y plane
    full = csc.convert(fb, "yuv444p")
    np.testing.assert_array_equal(np.asarray(g.planes["y"]),
                                  np.asarray(full.planes["y"]))
    back = csc.convert(g, "rgb24")
    arr = np.asarray(back.planes["rgb"])
    np.testing.assert_array_equal(arr[..., 0], arr[..., 1])


def test_yuv444_high_depth_formats(rng):
    """yuv444p10/yuv444p16 (user-guide yuv<->yuv list,
    FFMPEG-GPU_User_Guide.md): depth/chroma conversions + RGB both ways."""
    y = rng.integers(0, 65536, (1, 16, 32)).astype(np.uint16)
    u = rng.integers(0, 65536, (1, 16, 32)).astype(np.uint16)
    v = rng.integers(0, 65536, (1, 16, 32)).astype(np.uint16)
    fb16 = FrameBatch({"y": jnp.asarray(y), "u": jnp.asarray(u),
                       "v": jnp.asarray(v)}, "yuv444p16", 32, 16, "bt709")

    # 16 -> 10 is a shift (msb preserved)
    fb10 = csc.convert(fb16, "yuv444p10")
    assert fb10.planes["y"].dtype == jnp.uint16
    assert np.array_equal(np.asarray(fb10.planes["y"]),
                          (y >> 6).astype(np.uint16))

    # 444p16 -> 420p10: chroma downsample + depth shift
    p420 = csc.convert(fb16, "yuv420p10")
    assert p420.planes["u"].shape == (1, 8, 16)
    assert int(np.asarray(p420.planes["y"]).max()) <= 1023

    # RGB both ways at 10-bit 4:4:4
    rgb = csc.yuv_to_rgb(fb10, "rgb24")
    assert np.asarray(rgb.planes["rgb"]).shape == (1, 16, 32, 3)
    back = csc.rgb_to_yuv(rgb, "yuv444p10")
    assert back.planes["y"].dtype == jnp.uint16
    assert int(np.asarray(back.planes["y"]).max()) <= 1023


def test_conversion_matrix_totality():
    """Every (src, dst) pair across the user guide's format inventory
    converts without error and lands with the target format's dtype and
    plane shapes (doc/FFMPEG-GPU_User_Guide.md:47-67: yuv<->yuv any pair,
    yuv<->rgb incl. rgb48/rgba64 at 10-bit, rgb<->rgb)."""
    from gmat_tpu.core import formats as F

    rng = np.random.default_rng(7)

    def make(fmt, h=8, w=8, n=1):
        f = F.FORMATS[fmt]
        planes = {}
        for p in f.planes:
            sh = (n,) + f.plane_shape(p.name, h, w)
            if np.dtype(p.dtype).kind == "u":
                planes[p.name] = rng.integers(
                    0, 1 << f.bits, sh).astype(p.dtype)
            else:
                planes[p.name] = rng.random(sh, dtype=np.float32)
        return FrameBatch(planes, fmt, w, h, "bt709")

    yuvs = ["nv12", "p010", "p016", "yuv420p", "yuv420p10", "yuv420p16",
            "yuv444p", "yuv444p10", "yuv444p16"]
    rgbs = ["rgb24", "bgr24", "rgba", "bgra", "rgba64", "bgra64",
            "rgb48", "bgr48", "rgbpf32", "rgbapf32", "bgrpf32"]
    pairs = [(a, b) for a in yuvs for b in yuvs if a != b]
    pairs += [(a, b) for a in yuvs for b in rgbs]
    pairs += [(b, a) for a in yuvs for b in rgbs]
    pairs += [(a, b) for a in rgbs for b in rgbs if a != b]

    for src, dst in pairs:
        out = csc.convert(make(src), dst)
        f = F.FORMATS[dst]
        assert out.format == dst, (src, dst)
        for p in f.planes:
            got = out.planes[p.name]
            assert got.dtype == np.dtype(p.dtype), (src, dst, p.name)
            assert got.shape[1:] == f.plane_shape(p.name, 8, 8), \
                (src, dst, p.name)


def test_rgb48_matches_rgba64_channels():
    """rgb48 is rgba64 minus alpha (the guide's 10-bit pair:
    p010/yuv420p10 <-> rgb48/rgba64)."""
    rng = np.random.default_rng(3)
    fb = FrameBatch(
        {"y": (rng.integers(0, 1024, (2, 8, 8)) << 6).astype(np.uint16),
         "u": (rng.integers(0, 1024, (2, 4, 4)) << 6).astype(np.uint16),
         "v": (rng.integers(0, 1024, (2, 4, 4)) << 6).astype(np.uint16)},
        "p010", 8, 8, "bt709")
    r48 = np.asarray(csc.convert(fb, "rgb48").planes["rgb"])
    r64 = np.asarray(csc.convert(fb, "rgba64").planes["rgb"])
    assert np.array_equal(r48, r64[..., :3])
    # in-gamut round trip (4:4:4 so no chroma subsample loss): rgb48 ->
    # yuv444p10 -> rgb48 holds to a couple of 10-bit steps
    src = FrameBatch(
        {"rgb": (rng.integers(0, 1024, (2, 8, 8, 3)) << 6).astype(np.uint16)},
        "rgb48", 8, 8, "bt709")
    rt = csc.convert(csc.convert(src, "yuv444p10"), "rgb48")
    d = np.abs(rt.planes["rgb"].astype(int) - src.planes["rgb"].astype(int))
    assert d.max() <= (3 << 6)


def test_rgb_to_p010_writes_clean_msb_alignment():
    """rgb->p010 quantizes at 10-bit and shifts <<6: low bits are clean
    and the value equals the lsb-aligned 10-bit conversion shifted."""
    rng = np.random.default_rng(5)
    rgb = FrameBatch({"rgb": rng.integers(0, 256, (1, 8, 8, 3))
                      .astype(np.uint8)}, "rgb24", 8, 8, "bt709")
    p = csc.convert(rgb, "p010")
    q10 = csc.convert(rgb, "yuv420p10")
    for k in ("y", "u", "v"):
        vp = np.asarray(p.planes[k]).astype(np.uint32)
        assert (vp & 63).max() == 0, f"{k} has dirty low bits"
        np.testing.assert_array_equal(
            vp >> 6, np.asarray(q10.planes[k]).astype(np.uint32))


def test_yuv422p_conversions():
    """4:2:2 (camera/JPEG chroma layout): per-axis chroma resampling.
    Reference analog: libswscale's yuv422p support in the scaled path
    (swscale_cuda.c:372-476 handles any planar layout per-plane)."""
    from gmat_tpu.core.frame import from_numpy_yuv420, from_numpy_rgb
    rng = np.random.default_rng(3)
    n, h, w = 2, 16, 24
    y = rng.integers(16, 235, (n, h, w), np.uint8)
    u = rng.integers(16, 240, (n, h, w // 2), np.uint8)
    v = rng.integers(16, 240, (n, h, w // 2), np.uint8)
    fb = from_numpy_yuv420(y, u, v, fmt="yuv422p")
    # 422->rgb == horizontally-nearest-upsampled 444->rgb, exactly
    rgb = csc.yuv_to_rgb(fb, "rgb24")
    fb444 = from_numpy_yuv420(y, np.repeat(u, 2, 2), np.repeat(v, 2, 2),
                              fmt="yuv444p")
    np.testing.assert_array_equal(np.asarray(rgb.planes["rgb"]),
                                  np.asarray(csc.yuv_to_rgb(fb444, "rgb24")
                                             .planes["rgb"]))
    # relayouts: 422->444 repeats, 444->422 pair-means, 420<->422 shapes
    f444 = csc.yuv_to_yuv(fb, "yuv444p")
    np.testing.assert_array_equal(np.asarray(f444.planes["u"]),
                                  np.repeat(u, 2, 2))
    f422b = csc.yuv_to_yuv(f444, "yuv422p")
    want = np.round(np.repeat(u, 2, 2).astype(np.float64)
                    .reshape(n, h, w // 2, 2).mean(-1))
    np.testing.assert_array_equal(
        np.asarray(f422b.planes["u"]).astype(float), want)
    f420 = csc.yuv_to_yuv(fb, "yuv420p")
    assert f420.planes["u"].shape == (n, h // 2, w // 2)
    assert csc.yuv_to_yuv(f420, "yuv422p").planes["u"].shape == (n, h, w // 2)
    # rgb->yuv422p->rgb: exact (<=2 codes) on constant-chroma content
    rgbc = np.tile(rng.integers(30, 220, (n, 1, 1, 3)),
                   (1, h, w, 1)).astype(np.uint8)
    f = csc.rgb_to_yuv(from_numpy_rgb(rgbc), "yuv422p")
    assert f.planes["u"].shape == (n, h, w // 2)
    b = csc.yuv_to_rgb(f, "rgb24")
    assert np.abs(np.asarray(b.planes["rgb"]).astype(int)
                  - rgbc.astype(int)).max() <= 2
    # subsampling loss ordering on noise content: 444 < 422 < 420
    noise = rng.integers(30, 220, (n, h, w, 3)).astype(np.uint8)
    errs = []
    for fmt in ("yuv444p", "yuv422p", "yuv420p"):
        rt = csc.yuv_to_rgb(csc.rgb_to_yuv(from_numpy_rgb(noise), fmt),
                            "rgb24")
        errs.append(np.abs(np.asarray(rt.planes["rgb"]).astype(int)
                           - noise.astype(int)).mean())
    assert errs[0] < errs[1] < errs[2], errs
