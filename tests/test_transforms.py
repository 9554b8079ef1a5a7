"""Resize / crop / flip / rotate / smooth / fused ladder tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gmat_tpu.core.frame import from_numpy_rgb, from_numpy_yuv420
from gmat_tpu.ops import csc, fused, geometry, resize, smooth

from . import oracle


def test_resample_matrix_rows_sum_to_one():
    for m in ("bilinear", "bicubic", "area", "lanczos3"):
        A = resize.resample_matrix(97, 33, m)
        np.testing.assert_allclose(A.sum(1), 1.0, atol=1e-5)
        A = resize.resample_matrix(33, 97, m)
        np.testing.assert_allclose(A.sum(1), 1.0, atol=1e-5)


def test_bilinear_matches_oracle(rng):
    img = rng.uniform(0, 255, (1, 48, 72)).astype(np.float32)
    got = np.asarray(resize.resize_plane(jnp.asarray(img), 20, 36))
    want = oracle.bilinear_resize(img[0], 20, 36)
    np.testing.assert_allclose(got[0], want, atol=1e-3)
    got = np.asarray(resize.resize_plane(jnp.asarray(img), 96, 144))
    want = oracle.bilinear_resize(img[0], 96, 144)
    np.testing.assert_allclose(got[0], want, atol=1e-3)


def test_nearest_identity_and_constant(rng):
    img = rng.uniform(0, 255, (1, 32, 32)).astype(np.float32)
    same = np.asarray(resize.resize_plane(jnp.asarray(img), 32, 32, "nearest"))
    np.testing.assert_allclose(same[0], img[0])
    const = np.full((1, 40, 40), 7.0, np.float32)
    for m in ("bilinear", "bicubic", "area", "lanczos3"):
        out = np.asarray(resize.resize_plane(jnp.asarray(const), 17, 23, m))
        np.testing.assert_allclose(out, 7.0, atol=1e-4)


def test_area_downscale_is_box_average():
    img = np.arange(16, dtype=np.float32).reshape(1, 4, 4)
    out = np.asarray(resize.resize_plane(jnp.asarray(img), 2, 2, "area"))
    want = img[0].reshape(2, 2, 2, 2).mean(axis=(1, 3))
    np.testing.assert_allclose(out[0], want, atol=1e-5)


def test_resize_framebatch_yuv(rng):
    y = rng.integers(0, 256, (2, 64, 96)).astype(np.uint8)
    u = rng.integers(0, 256, (2, 32, 48)).astype(np.uint8)
    v = rng.integers(0, 256, (2, 32, 48)).astype(np.uint8)
    fb = from_numpy_yuv420(y, u, v)
    out = resize.resize(fb, 48, 32)
    assert out.planes["y"].shape == (2, 32, 48)
    assert out.planes["u"].shape == (2, 16, 24)
    assert out.planes["y"].dtype == np.uint8


def test_crop_center_default(rng):
    rgb = rng.integers(0, 256, (1, 64, 96, 3)).astype(np.uint8)
    fb = from_numpy_rgb(rgb)
    out = geometry.crop(fb, 32, 16)
    np.testing.assert_array_equal(
        np.asarray(out.planes["rgb"]), rgb[:, 24:40, 32:64])
    out2 = geometry.crop(fb, 10, 10, 0, 0)
    np.testing.assert_array_equal(np.asarray(out2.planes["rgb"]),
                                  rgb[:, :10, :10])
    with pytest.raises(ValueError):
        geometry.crop(fb, 200, 10, 0, 0)


def test_crop_yuv_even(rng):
    y = rng.integers(0, 256, (1, 64, 96)).astype(np.uint8)
    u = rng.integers(0, 256, (1, 32, 48)).astype(np.uint8)
    fb = from_numpy_yuv420(y, u, u.copy())
    out = geometry.crop(fb, 32, 32, 4, 8)
    np.testing.assert_array_equal(np.asarray(out.planes["y"]),
                                  y[:, 8:40, 4:36])
    np.testing.assert_array_equal(np.asarray(out.planes["u"]),
                                  u[:, 4:20, 2:18])
    with pytest.raises(ValueError):
        geometry.crop(fb, 31, 32, 4, 8)


def test_flip_codes(rng):
    rgb = rng.integers(0, 256, (1, 8, 12, 3)).astype(np.uint8)
    fb = from_numpy_rgb(rgb)
    np.testing.assert_array_equal(
        np.asarray(geometry.flip(fb, 0).planes["rgb"]), rgb[:, ::-1])
    np.testing.assert_array_equal(
        np.asarray(geometry.flip(fb, 1).planes["rgb"]), rgb[:, :, ::-1])
    np.testing.assert_array_equal(
        np.asarray(geometry.flip(fb, -1).planes["rgb"]), rgb[:, ::-1, ::-1])


def test_rotate_90_about_center(rng):
    n = 33  # odd square: 90-degree rotation about center is exact
    img = rng.integers(0, 256, (1, n, n, 3)).astype(np.uint8)
    fb = from_numpy_rgb(img)
    out = geometry.rotate(fb, 90.0, center=True)
    got = np.asarray(out.planes["rgb"])
    want = np.rot90(img[0], k=1, axes=(0, 1))  # CCW
    assert np.abs(got[0].astype(int) - want.astype(int)).max() <= 1


def test_rotate_zero_identity(rng):
    img = rng.integers(0, 256, (1, 16, 24, 3)).astype(np.uint8)
    fb = from_numpy_rgb(img)
    out = geometry.rotate(fb, 0.0)
    np.testing.assert_array_equal(np.asarray(out.planes["rgb"]), img)


def test_rotate_yuv_fills_neutral_chroma(rng):
    """Out-of-frame corners after a YUV rotate must be black (u=v=128),
    not green (u=v=0)."""
    y = rng.integers(16, 236, (1, 16, 16)).astype(np.uint8)
    u = np.full((1, 8, 8), 90, np.uint8)
    v = np.full((1, 8, 8), 190, np.uint8)
    fb = from_numpy_yuv420(y, u, v)
    out = geometry.rotate(fb, 45.0, center=True)
    # the corner pixel is uncovered by the rotated frame
    assert int(np.asarray(out.planes["y"])[0, 0, 0]) == 0
    assert int(np.asarray(out.planes["u"])[0, 0, 0]) == 128
    assert int(np.asarray(out.planes["v"])[0, 0, 0]) == 128


def test_gaussian_constant_preserved():
    img = jnp.full((1, 32, 40), 9.0, jnp.float32)
    out = np.asarray(smooth.gaussian_blur_plane(img, 5, 5))
    np.testing.assert_allclose(out, 9.0, atol=1e-4)


def test_gaussian_matches_separate_numpy(rng):
    img = rng.uniform(0, 255, (1, 24, 24)).astype(np.float32)
    k = smooth.gaussian_kernel1d(3)
    # replicate border, manual separable conv
    pad = np.pad(img[0], 1, mode="edge")
    tmp = sum(k[i] * pad[i:i + 24, 1:25] for i in range(3))
    want = sum(k[i] * np.pad(tmp, ((0, 0), (1, 1)), "edge")[:, i:i + 24]
               for i in range(3))
    got = np.asarray(smooth.gaussian_blur_plane(
        jnp.asarray(img), 3, 3, border="replicate"))[0]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_median_blur(rng):
    img = rng.integers(0, 256, (1, 16, 16)).astype(np.uint8)
    got = np.asarray(smooth.median_blur_plane(jnp.asarray(img), 3, 3))
    pad = np.pad(img[0], 1, mode="edge")
    want = np.zeros((16, 16))
    for i in range(16):
        for j in range(16):
            want[i, j] = np.median(pad[i:i + 3, j:j + 3])
    np.testing.assert_allclose(got[0], want)


def test_smooth_framebatch(rng):
    rgb = rng.integers(0, 256, (2, 16, 16, 3)).astype(np.uint8)
    fb = from_numpy_rgb(rgb)
    out = smooth.smooth(fb, "gaussian", kw=3, kh=3, border_type="reflect101")
    assert out.planes["rgb"].dtype == np.uint8
    out = smooth.smooth(fb, "median", kw=3, kh=3)
    assert out.planes["rgb"].shape == rgb.shape


def test_fused_fast_vs_exact(rng):
    # smooth content: fast (resize-then-CSC) should track exact closely
    h, w = 72, 96
    yy = np.outer(np.linspace(30, 220, h), np.ones(w)).astype(np.uint8)
    uu = np.outer(np.ones(h // 2), np.linspace(60, 200, w // 2)).astype(np.uint8)
    vv = np.outer(np.linspace(70, 180, h // 2), np.ones(w // 2)).astype(np.uint8)
    fb = from_numpy_yuv420(yy[None], uu[None], vv[None])
    fast = np.asarray(fused.preprocess(fb, 32, 24, "rgb24").planes["rgb"])
    exact = np.asarray(
        fused.preprocess(fb, 32, 24, "rgb24", exact=True).planes["rgb"])
    assert np.abs(fast.astype(int) - exact.astype(int)).max() <= 4


def test_fused_nchw_jit(rng):
    y = rng.integers(0, 256, (2, 64, 96)).astype(np.uint8)
    u = rng.integers(0, 256, (2, 32, 48)).astype(np.uint8)
    v = rng.integers(0, 256, (2, 32, 48)).astype(np.uint8)
    fb = from_numpy_yuv420(y, u, v)
    f = jax.jit(lambda fb: fused.preprocess_nchw(fb, 32, 32))
    out = f(fb)
    assert out.shape == (2, 3, 32, 32) and out.dtype == jnp.float32
    assert 0.0 <= float(out.min()) and float(out.max()) <= 1.0


def test_fused_crop_flip(rng):
    y = rng.integers(0, 256, (1, 64, 96)).astype(np.uint8)
    u = rng.integers(0, 256, (1, 32, 48)).astype(np.uint8)
    v = rng.integers(0, 256, (1, 32, 48)).astype(np.uint8)
    fb = from_numpy_yuv420(y, u, v)
    out = fused.preprocess(fb, 16, 16, "rgb24", crop_box=(32, 32, 8, 10),
                           flip_code=1)
    assert out.planes["rgb"].shape == (1, 16, 16, 3)


def test_bucketed_ladder_no_recompile(rng):
    """Different content sizes in one bucket share a compiled program and
    match the direct (unpadded) ladder."""
    from gmat_tpu.ops.fused import (_bucketed_ladder, bucket_for,
                                    preprocess_nchw_bucketed)
    assert bucket_for(1918, 1078) == (1920, 1080)
    assert bucket_for(4000, 2100) == (4032, 2112)

    bw, bh = 128, 96
    before = _bucketed_ladder._cache_size()
    outs = []
    for (cw, ch) in ((128, 96), (120, 88), (100, 64)):
        y = rng.integers(0, 256, (2, ch, cw)).astype(np.uint8)
        u = rng.integers(0, 256, (2, ch // 2, cw // 2)).astype(np.uint8)
        v = rng.integers(0, 256, (2, ch // 2, cw // 2)).astype(np.uint8)
        yp = np.pad(y, ((0, 0), (0, bh - ch), (0, bw - cw)), mode="edge")
        up = np.pad(u, ((0, 0), (0, bh // 2 - ch // 2), (0, bw // 2 - cw // 2)),
                    mode="edge")
        vp = np.pad(v, ((0, 0), (0, bh // 2 - ch // 2), (0, bw // 2 - cw // 2)),
                    mode="edge")
        fbp = from_numpy_yuv420(yp, up, vp)
        got = np.asarray(preprocess_nchw_bucketed(fbp, cw, ch, 32, 32))
        want = np.asarray(fused.preprocess_nchw(
            from_numpy_yuv420(y, u, v), 32, 32, use_pallas="never"))
        np.testing.assert_allclose(got, want, atol=2e-2)
        outs.append(got)
    # one compiled program served all three content sizes
    assert _bucketed_ladder._cache_size() == before + 1


def test_psnr_ssim(rng):
    from gmat_tpu.ops.metrics import psnr, ssim
    a = rng.integers(0, 256, (2, 64, 64)).astype(np.uint8)
    same = np.asarray(psnr(jnp.asarray(a), jnp.asarray(a)))
    assert (same > 80).all()
    noisy = np.clip(a.astype(int) + rng.normal(0, 5, a.shape), 0, 255
                    ).astype(np.uint8)
    p = np.asarray(psnr(jnp.asarray(a), jnp.asarray(noisy)))
    assert (25 < p).all() and (p < 45).all()
    s_same = np.asarray(ssim(jnp.asarray(a), jnp.asarray(a)))
    np.testing.assert_allclose(s_same, 1.0, atol=1e-4)
    s_noisy = np.asarray(ssim(jnp.asarray(a), jnp.asarray(noisy)))
    assert (s_noisy < 0.999).all() and (s_noisy > 0.5).all()


def test_rotate_cubic_and_errors(rng):
    img = rng.integers(0, 256, (1, 33, 33, 3)).astype(np.uint8)
    fb = from_numpy_rgb(img)
    out = geometry.rotate(fb, 90.0, interp="cubic", center=True)
    want = np.rot90(img[0], k=1, axes=(0, 1))
    got = np.asarray(out.planes["rgb"])[0]
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1
    # arbitrary angle, cubic is smooth and in-range
    out2 = geometry.rotate(fb, 13.0, interp="cubic", center=True)
    assert np.asarray(out2.planes["rgb"]).dtype == np.uint8
    with pytest.raises(ValueError):
        geometry.rotate(fb, 10.0, interp="nosuch")


def test_bt2020_16bit_path(rng):
    """BT.2020 uses the 10-in-16-bit studio constants (reference
    get_constants, yuv2rgb_cuda.cu:808-812)."""
    from .oracle import yuv420_to_rgb24
    hi = (1 << 16) - 1
    y = rng.integers(0, hi, (1, 16, 16)).astype(np.uint16)
    u = rng.integers(0, hi, (1, 8, 8)).astype(np.uint16)
    v = rng.integers(0, hi, (1, 8, 8)).astype(np.uint16)
    from gmat_tpu.core.frame import FrameBatch
    fb = FrameBatch({"y": jnp.asarray(y), "u": jnp.asarray(u),
                     "v": jnp.asarray(v)}, "p016", 16, 16, "bt2020")
    got = np.asarray(csc.yuv_to_rgb(fb, "rgb24", exact=True).planes["rgb"])
    want = yuv420_to_rgb24(y[0], u[0], v[0], "bt2020", bits=16)
    # oracle outputs 16-bit codes; ours shifts to 8-bit (>>8)
    assert np.abs(got[0].astype(int) - (want >> 8).astype(int)).max() <= 1


def test_resize_10bit_overshoot_clips_at_depth():
    """bicubic overshoot on a 10-bit edge must clip at 1023, not the
    u16 container (values >1023 wrap when shifted into p010)."""
    from gmat_tpu.core.frame import FrameBatch
    from gmat_tpu.ops.resize import resize
    y = np.zeros((1, 16, 32), np.uint16)
    y[:, :, 16:] = 1023
    u = np.full((1, 8, 16), 512, np.uint16)
    v = np.full((1, 8, 16), 512, np.uint16)
    fb = FrameBatch({"y": y, "u": u, "v": v}, "yuv420p10", 32, 16, "bt709")
    out = resize(fb, 64, 32, "bicubic")
    assert int(np.asarray(out.planes["y"]).max()) <= 1023


def test_ops_review_fixes_422_and_float():
    """Round-3 ops review: gray8->yuv422p chroma geometry, gray->gray
    depth path, odd-y crop on 4:2:2, 4:2:2 rotate chroma alignment,
    float RGB reorder losslessness, smooth validation."""
    import numpy as np
    import jax.numpy as jnp
    import pytest as _p
    from gmat_tpu.core.frame import FrameBatch, from_numpy_yuv420
    from gmat_tpu.ops import csc, geometry, smooth

    h, w = 32, 48
    y = np.tile(np.linspace(0, 255, w, dtype=np.uint8), (h, 1))[None]
    g8 = FrameBatch({"y": jnp.asarray(y)}, "gray8", w, h)
    out = csc.yuv_to_yuv(g8, "yuv422p")
    assert out.planes["u"].shape == (1, h, w // 2)      # sub_h = 0
    # gray -> gray depth-only path must not crash
    assert csc.yuv_to_yuv(g8, "gray8").planes["y"].shape == (1, h, w)

    # odd y/h crops are legal on 4:2:2 (width stays even-aligned)
    u = np.full((1, h, w // 2), 100, np.uint8)
    v = np.full((1, h, w // 2), 150, np.uint8)
    fb422 = FrameBatch({"y": jnp.asarray(y), "u": jnp.asarray(u),
                        "v": jnp.asarray(v)}, "yuv422p", w, h)
    c = geometry.crop(fb422, 16, 7, 0, 1)
    assert c.planes["y"].shape == (1, 7, 16)
    assert c.planes["u"].shape == (1, 7, 8)
    with _p.raises(ValueError):
        geometry.crop(fb422, 15, 8, 1, 0)               # odd x/w still bad

    # 4:2:2 rotate: chroma tracks luma (a left/right split stays a
    # top/bottom split after 90 deg for BOTH planes)
    y2 = np.zeros((1, 32, 32), np.uint8)
    y2[:, :, :16] = 200
    u2 = np.zeros((1, 32, 16), np.uint8)
    u2[:, :, :8] = 200
    fb = FrameBatch({"y": jnp.asarray(y2), "u": jnp.asarray(u2),
                     "v": jnp.asarray(u2)}, "yuv422p", 32, 32)
    r = geometry.rotate(fb, 90, center=True)
    ry, ru = np.asarray(r.planes["y"]), np.asarray(r.planes["u"])
    assert ry[0, 24, 16] > 150 and ry[0, 8, 16] < 50
    assert ru[0, 24, 8] > 150 and ru[0, 8, 8] < 50

    # float RGB reorder is lossless (no 1/255 grid snapping)
    rgbf = np.random.default_rng(0).random((1, 8, 8, 3), np.float32)
    fbf = FrameBatch({"rgb": jnp.asarray(rgbf)}, "rgbpf32", 8, 8)
    back = csc.convert(fbf, "bgrpf32")
    np.testing.assert_array_equal(np.asarray(back.planes["rgb"]),
                                  rgbf[..., ::-1])

    # smooth validation: even kernels and bogus borders raise
    with _p.raises(ValueError):
        smooth.smooth(g8, "gaussian", kw=4, kh=4)
    with _p.raises(ValueError):
        smooth.smooth(g8, "gaussian", border_type="bogus")


def _np_bilinear(img, sy, sx, fill=0.0):
    """Independent numpy bilinear sampler, clamp-to-edge taps; the whole
    sample becomes `fill` when the CENTER coordinate is out of frame
    (the rotate sampler's policy)."""
    h, w = img.shape
    valid = (sy >= -1e-4) & (sy <= h - 1 + 1e-4) & \
            (sx >= -1e-4) & (sx <= w - 1 + 1e-4)
    sy = np.clip(sy, 0.0, h - 1.0)
    sx = np.clip(sx, 0.0, w - 1.0)
    x0 = np.floor(sx).astype(int)
    y0 = np.floor(sy).astype(int)
    fx = sx - x0
    fy = sy - y0
    x1 = np.minimum(x0 + 1, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    out = (img[y0, x0] * (1 - fy) * (1 - fx) + img[y0, x1] * (1 - fy) * fx +
           img[y1, x0] * fy * (1 - fx) + img[y1, x1] * fy * fx)
    return np.where(valid, out, fill)


def test_rotate_area_matches_supersampled_oracle(rng):
    """interp=area (NVCV_INTERP_AREA, vf_rotate_nvcv.c:129-132): the dst
    pixel's source preimage is box-averaged — oracle: 3x3 supersample of
    the pixel footprint with bilinear taps, computed independently."""
    h, w = 24, 32
    img = rng.integers(0, 256, (1, h, w, 3)).astype(np.uint8)
    fb = from_numpy_rgb(img)
    angle = 30.0
    out = geometry.rotate(fb, angle, interp="area", center=True)
    got = np.asarray(out.planes["rgb"])[0].astype(np.float64)

    a = np.radians(angle)
    ca, sa = np.cos(a), np.sin(a)
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    shx = cx - (ca * cx + sa * cy)
    shy = cy - (-sa * cx + ca * cy)
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    want = np.zeros((h, w, 3))
    for dy in (-1 / 3, 0.0, 1 / 3):
        for dx in (-1 / 3, 0.0, 1 / 3):
            xs_ = (xs + dx) - shx
            ys_ = (ys + dy) - shy
            sx = ca * xs_ - sa * ys_
            sy = sa * xs_ + ca * ys_
            for c in range(3):
                want[..., c] += _np_bilinear(
                    img[0, :, :, c].astype(np.float64), sy, sx)
    want = np.clip(np.round(want / 9.0), 0, 255)
    assert np.abs(got - want).max() <= 1.0


def test_rotate_area_smooths_vs_bilinear(rng):
    """area averages a 9-tap footprint, so on noise it must differ from
    plain bilinear (i.e. it's not silently aliased to linear) while
    agreeing on a constant image."""
    h, w = 16, 16
    noise = rng.integers(0, 256, (1, h, w, 3)).astype(np.uint8)
    fb = from_numpy_rgb(noise)
    a = np.asarray(geometry.rotate(fb, 10.0, interp="area",
                                   center=True).planes["rgb"]).astype(int)
    b = np.asarray(geometry.rotate(fb, 10.0, interp="linear",
                                   center=True).planes["rgb"]).astype(int)
    assert np.abs(a - b).max() > 2
    flat = from_numpy_rgb(np.full((1, h, w, 3), 200, np.uint8))
    af = np.asarray(geometry.rotate(flat, 10.0, interp="area",
                                    center=True).planes["rgb"])
    bf = np.asarray(geometry.rotate(flat, 10.0, interp="linear",
                                    center=True).planes["rgb"])
    # interior window: every supersample tap stays in frame there
    d = np.abs(af.astype(int) - bf.astype(int))[0, 5:11, 5:11]
    assert d.max() <= 1
