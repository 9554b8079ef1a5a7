"""Direct comparison against REAL libswscale (ctypes, sws_getContext +
sws_scale) — the library the reference's libgpuscale must match
(libswscale/cuda/swscale_cuda.c).

Tolerances: swscale's integer yuv2rgb tables + dithering deviate up to
~6-8 code values from exact float math; our kernels match the analytic
float math (tests/oracle.py) exactly, so vs swscale we assert
max <= 8 and mean <= 2.  SWS_BILINEAR (2) — SWS_POINT engages a
lower-precision swscale path.
"""
import ctypes

import numpy as np
import pytest

import jax.numpy as jnp

from gmat_tpu.core.frame import FrameBatch
from gmat_tpu.ops import csc
from gmat_tpu.ops.resize import resize

SWS_BILINEAR = 2

# AVPixelFormat values (libavutil/pixfmt.h, stable ABI)
AV_PIX_FMT_YUV420P = 0
AV_PIX_FMT_RGB24 = 2
AV_PIX_FMT_YUV420P10LE = 62

# colorspace table indices for sws_setColorspaceDetails
SWS_CS_ITU709 = 1
SWS_CS_FCC = 4
SWS_CS_ITU601 = 5
SWS_CS_SMPTE240M = 7
SWS_CS_BT2020 = 9


@pytest.fixture(scope="module")
def sws():
    try:
        lib = ctypes.CDLL("libswscale.so.6")
    except OSError:
        pytest.skip("libswscale.so.6 not available")
    lib.sws_getContext.restype = ctypes.c_void_p
    lib.sws_getContext.argtypes = [ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                   ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                   ctypes.c_int, ctypes.c_void_p,
                                   ctypes.c_void_p, ctypes.c_void_p]
    lib.sws_scale.restype = ctypes.c_int
    lib.sws_scale.argtypes = [ctypes.c_void_p,
                              ctypes.POINTER(ctypes.c_void_p),
                              ctypes.POINTER(ctypes.c_int), ctypes.c_int,
                              ctypes.c_int,
                              ctypes.POINTER(ctypes.c_void_p),
                              ctypes.POINTER(ctypes.c_int)]
    lib.sws_freeContext.argtypes = [ctypes.c_void_p]
    lib.sws_getCoefficients.restype = ctypes.POINTER(ctypes.c_int)
    lib.sws_setColorspaceDetails.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int]
    return lib


def _sws_run(lib, src_planes, src_strides, sw, sh, sfmt,
             dst_planes, dst_strides, dw, dh, dfmt, cs_idx=None):
    ctx = lib.sws_getContext(sw, sh, sfmt, dw, dh, dfmt, SWS_BILINEAR,
                             None, None, None)
    assert ctx, "sws_getContext failed"
    if cs_idx is not None:
        coeffs = lib.sws_getCoefficients(cs_idx)
        # limited-range in/out, neutral brightness/contrast/saturation
        lib.sws_setColorspaceDetails(ctx, coeffs, 0, coeffs, 0,
                                     0, 1 << 16, 1 << 16)
    n = max(len(src_planes), len(dst_planes), 4)
    sp = (ctypes.c_void_p * n)(*(p.ctypes.data for p in src_planes))
    ss = (ctypes.c_int * n)(*src_strides)
    dp = (ctypes.c_void_p * n)(*(p.ctypes.data for p in dst_planes))
    ds = (ctypes.c_int * n)(*dst_strides)
    r = lib.sws_scale(ctx, sp, ss, 0, sh, dp, ds)
    lib.sws_freeContext(ctx)
    assert r == dh, r


def _smooth_yuv(w, h, seed=0):
    """Smooth content: chroma-siting differences on noise are meaningless."""
    rng = np.random.default_rng(seed)
    gy = np.add.outer(np.linspace(30, 220, h), np.linspace(0, 20, w))
    y = (gy + rng.normal(0, 1.5, (h, w))).clip(16, 235).astype(np.uint8)
    u = np.tile(np.linspace(60, 190, w // 2), (h // 2, 1)).astype(np.uint8)
    v = np.tile(np.linspace(180, 70, w // 2)[:, None].T,
                (h // 2, 1)).astype(np.uint8)
    return y, u, v


@pytest.mark.parametrize("cs,cs_idx", [("bt601", SWS_CS_ITU601),
                                       ("bt709", SWS_CS_ITU709),
                                       ("fcc", SWS_CS_FCC),
                                       ("smpte240m", SWS_CS_SMPTE240M),
                                       ("bt2020", SWS_CS_BT2020)])
def test_yuv420_to_rgb24_vs_real_swscale(sws, cs, cs_idx):
    w, h = 128, 96
    y, u, v = _smooth_yuv(w, h)
    rgb_sws = np.zeros((h, w, 3), np.uint8)
    _sws_run(sws, [y, u, v], [w, w // 2, w // 2, 0], w, h,
             AV_PIX_FMT_YUV420P, [rgb_sws], [w * 3, 0, 0, 0], w, h,
             AV_PIX_FMT_RGB24, cs_idx)

    fb = FrameBatch({"y": jnp.asarray(y[None]), "u": jnp.asarray(u[None]),
                     "v": jnp.asarray(v[None])}, "yuv420p", w, h, cs)
    ours = np.asarray(csc.yuv_to_rgb(fb, "rgb24").planes["rgb"][0])

    diff = np.abs(ours.astype(int) - rgb_sws.astype(int))
    assert diff.max() <= 8, diff.max()
    assert diff.mean() <= 2.0, diff.mean()


def test_yuv420_scale_vs_real_swscale(sws):
    """yuv->yuv scaled path (per-plane) vs swscale bilinear."""
    w, h, dw, dh = 128, 96, 64, 48
    y, u, v = _smooth_yuv(w, h)
    oy = np.zeros((dh, dw), np.uint8)
    ou = np.zeros((dh // 2, dw // 2), np.uint8)
    ov = np.zeros((dh // 2, dw // 2), np.uint8)
    _sws_run(sws, [y, u, v], [w, w // 2, w // 2, 0], w, h,
             AV_PIX_FMT_YUV420P, [oy, ou, ov],
             [dw, dw // 2, dw // 2, 0], dw, dh, AV_PIX_FMT_YUV420P)

    fb = FrameBatch({"y": jnp.asarray(y[None]), "u": jnp.asarray(u[None]),
                     "v": jnp.asarray(v[None])}, "yuv420p", w, h, "bt709")
    out = resize(fb, dw, dh, "bilinear")
    my = np.asarray(out.planes["y"][0])
    # downscale phase conventions differ slightly (swscale filters with
    # its own phase); smooth content keeps the bound tight
    dy = np.abs(my.astype(int) - oy.astype(int))
    assert dy.max() <= 8 and dy.mean() <= 2.0, (dy.max(), dy.mean())


def test_yuv420p10_to_rgb_vs_real_swscale(sws):
    """10-bit input lane vs swscale (yuv420p10le -> rgb24)."""
    w, h = 128, 96
    y8, u8, v8 = _smooth_yuv(w, h)
    y = (y8.astype(np.uint16) << 2)
    u = (u8.astype(np.uint16) << 2)
    v = (v8.astype(np.uint16) << 2)
    rgb_sws = np.zeros((h, w, 3), np.uint8)
    _sws_run(sws, [y, u, v], [w * 2, w, w, 0], w, h,
             AV_PIX_FMT_YUV420P10LE, [rgb_sws], [w * 3, 0, 0, 0], w, h,
             AV_PIX_FMT_RGB24, SWS_CS_ITU709)

    fb = FrameBatch({"y": jnp.asarray(y[None]), "u": jnp.asarray(u[None]),
                     "v": jnp.asarray(v[None])}, "yuv420p10", w, h, "bt709")
    ours = np.asarray(csc.yuv_to_rgb(fb, "rgb24").planes["rgb"][0])
    diff = np.abs(ours.astype(int) - rgb_sws.astype(int))
    assert diff.max() <= 8, diff.max()
    assert diff.mean() <= 2.0, diff.mean()


@pytest.mark.parametrize("cs,cs_idx", [("bt601", SWS_CS_ITU601),
                                       ("bt709", SWS_CS_ITU709),
                                       ("bt2020", SWS_CS_BT2020)])
def test_rgb24_to_yuv420_vs_real_swscale(sws, cs, cs_idx):
    """Reverse direction (rgb2yuv_cuda analog) vs real swscale."""
    w, h = 128, 96
    rng = np.random.default_rng(1)
    base = np.add.outer(np.linspace(20, 230, h), np.linspace(0, 25, w))
    rgb = np.stack([
        (base + rng.normal(0, 1.5, (h, w))).clip(0, 255),
        (base[::-1] + rng.normal(0, 1.5, (h, w))).clip(0, 255),
        np.tile(np.linspace(40, 210, w), (h, 1)),
    ], axis=-1).astype(np.uint8)
    oy = np.zeros((h, w), np.uint8)
    ou = np.zeros((h // 2, w // 2), np.uint8)
    ov = np.zeros((h // 2, w // 2), np.uint8)
    _sws_run(sws, [np.ascontiguousarray(rgb)], [w * 3, 0, 0, 0], w, h,
             AV_PIX_FMT_RGB24, [oy, ou, ov], [w, w // 2, w // 2, 0],
             w, h, AV_PIX_FMT_YUV420P, cs_idx)

    fb = FrameBatch({"rgb": jnp.asarray(rgb[None])}, "rgb24", w, h, cs)
    out = csc.rgb_to_yuv(fb, "yuv420p")
    dy = np.abs(np.asarray(out.planes["y"][0]).astype(int) - oy.astype(int))
    du = np.abs(np.asarray(out.planes["u"][0]).astype(int) - ou.astype(int))
    dv = np.abs(np.asarray(out.planes["v"][0]).astype(int) - ov.astype(int))
    assert dy.max() <= 8 and dy.mean() <= 2.0, (dy.max(), dy.mean())
    # chroma siting differs (we average the 2x2 block; swscale filters);
    # smooth content keeps it within the same tolerance
    assert du.max() <= 8 and du.mean() <= 2.0, (du.max(), du.mean())
    assert dv.max() <= 8 and dv.mean() <= 2.0, (dv.max(), dv.mean())
