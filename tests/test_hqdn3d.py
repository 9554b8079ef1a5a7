"""hqdn3d — vf_hqdn3d.c analog (coef LUTs + 3 chained IIRs)."""
import numpy as np
import pytest

import jax.numpy as jnp
from gmat_tpu.core.frame import FrameBatch, from_numpy_yuv420
from gmat_tpu.filters.graph import FilterGraph
from gmat_tpu.ops import hqdn3d as hq


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def _load(v, depth):
    return (int(v) << (16 - depth)) + (((1 << (16 - depth)) - 1) >> 1)


def _oracle_stream(frames, spatial_ct, temporal_ct, depth=8):
    """Direct per-pixel port of denoise_spatial/temporal + frame_ant
    handling (vf_hqdn3d.c:57-145), C type flow included."""
    lut_bits = 8 if depth == 16 else 4
    sh = 8 - lut_bits
    off = 256 << lut_bits

    def lowpass(prev, cur):
        ct = spatial_ct
        return cur + int(ct[((prev - cur) >> sh) + off])

    def lowpass_t(prev, cur):
        return cur + int(temporal_ct[((prev - cur) >> sh) + off])

    h, w = frames[0].shape
    frame_ant = None
    outs = []
    spatial_on = spatial_ct[0] != 0
    line_ant = np.zeros(w, np.int64)
    for fr in frames:
        if frame_ant is None:
            frame_ant = np.array([[_load(fr[y, x], depth)
                                   for x in range(w)] for y in range(h)],
                                 np.int64)
        out = np.zeros((h, w), np.int64)
        if spatial_on:
            pixel_ant = _load(fr[0, 0], depth)
            for x in range(w):
                pixel_ant = lowpass(pixel_ant, _load(fr[0, x], depth))
                line_ant[x] = tmp = pixel_ant & 0xFFFF
                tmp = lowpass_t(frame_ant[0, x], pixel_ant)
                frame_ant[0, x] = tmp & 0xFFFF
                out[0, x] = tmp >> (16 - depth)
            for y in range(1, h):
                pixel_ant = _load(fr[y, 0], depth)
                for x in range(w):
                    tmp = lowpass(int(line_ant[x]), pixel_ant)
                    line_ant[x] = tmp & 0xFFFF
                    if x + 1 < w:
                        pixel_ant = lowpass(pixel_ant,
                                            _load(fr[y, x + 1], depth))
                    tmp = lowpass_t(frame_ant[y, x], tmp)
                    frame_ant[y, x] = tmp & 0xFFFF
                    out[y, x] = tmp >> (16 - depth)
        else:
            for y in range(h):
                for x in range(w):
                    tmp = lowpass_t(frame_ant[y, x], _load(fr[y, x], depth))
                    frame_ant[y, x] = tmp & 0xFFFF
                    out[y, x] = tmp >> (16 - depth)
        outs.append(out)
    return outs


def test_hqdn3d_luma_stream_oracle(rng):
    depth = 8
    core = hq.HQDN3D(4.0, 3.0, 6.0, 4.5)
    ls, cs, lt, ct = core._tables(depth)
    frames = [rng.integers(0, 256, (6, 8)).astype(np.uint8)
              for _ in range(3)]
    exp = _oracle_stream(frames, ls, lt, depth)
    got = []
    for fr in frames:        # batch-1 streaming exercises state carry
        fb = FrameBatch({"y": jnp.asarray(fr[None])}, "gray8", 8, 6)
        got.append(np.asarray(core(fb).planes["y"])[0].astype(np.int64))
    for g, e in zip(got, exp):
        np.testing.assert_array_equal(g, e)


def test_hqdn3d_batch_equals_streaming(rng):
    frames = rng.integers(0, 256, (4, 6, 8)).astype(np.uint8)
    c1 = hq.HQDN3D()
    fb = FrameBatch({"y": jnp.asarray(frames)}, "gray8", 8, 6)
    batch_out = np.asarray(c1(fb).planes["y"])
    c2 = hq.HQDN3D()
    for i in range(4):
        f1 = FrameBatch({"y": jnp.asarray(frames[i:i + 1])}, "gray8", 8, 6)
        np.testing.assert_array_equal(np.asarray(c2(f1).planes["y"])[0],
                                      batch_out[i])


def test_hqdn3d_temporal_only(rng):
    depth = 8
    core = hq.HQDN3D(0.0001, 0.0001, 6.0, 4.5)
    # dist25 ~ 0 makes gamma huge -> spatial coefs ~0 but ct[0]=1 keeps
    # spatial ON; true temporal-only needs strength exactly 0 which the
    # option defaulting replaces... exercise via precalc directly
    ls = hq.precalc_coefs(0.0, depth)
    assert ls[0] == 0
    lt = hq.precalc_coefs(6.0, depth)
    frames = [rng.integers(0, 256, (4, 6)).astype(np.uint8)
              for _ in range(2)]
    exp = _oracle_stream(frames, ls, lt, depth)
    out0, st = hq._denoise_plane(jnp.asarray(frames[0][None]), ls, lt,
                                 None, depth)
    out1, _ = hq._denoise_plane(jnp.asarray(frames[1][None]), ls, lt,
                                st, depth)
    np.testing.assert_array_equal(np.asarray(out0)[0], exp[0])
    np.testing.assert_array_equal(np.asarray(out1)[0], exp[1])


def test_hqdn3d_yuv_chain_and_select(rng):
    fb = from_numpy_yuv420(rng.integers(0, 256, (6, 8, 12)).astype(np.uint8),
                           rng.integers(0, 256, (6, 4, 6)).astype(np.uint8),
                           rng.integers(0, 256, (6, 4, 6)).astype(np.uint8))
    # dropped frames must not advance temporal state: even-n survivors
    # through hqdn3d == filtering the survivor subsequence directly
    g = FilterGraph("select=not(mod(n\\,2)),hqdn3d")
    out, keep = g.process(fb, pts=np.arange(6))
    idx = np.nonzero(keep)[0]
    core = hq.HQDN3D()
    sub = from_numpy_yuv420(*[np.asarray(fb.planes[k])[idx]
                              for k in ("y", "u", "v")])
    ref = core(sub)
    np.testing.assert_array_equal(np.asarray(out.planes["y"])[idx],
                                  np.asarray(ref.planes["y"]))
    np.testing.assert_array_equal(np.asarray(out.planes["u"])[idx],
                                  np.asarray(ref.planes["u"]))


def test_hqdn3d_10bit_smoke(rng):
    y = rng.integers(0, 1024, (2, 8, 8)).astype(np.uint16)
    u = rng.integers(0, 1024, (2, 4, 4)).astype(np.uint16)
    v = rng.integers(0, 1024, (2, 4, 4)).astype(np.uint16)
    fb = FrameBatch({"y": jnp.asarray(y), "u": jnp.asarray(u),
                     "v": jnp.asarray(v)}, "yuv420p10", 8, 8)
    out, _ = FilterGraph("hqdn3d=2:2:4:4").process(fb, pts=np.arange(2))
    yo = np.asarray(out.planes["y"])
    assert yo.max() < 1024 and yo.dtype == np.uint16
    # denoised stream has no larger variance than the input
    assert np.var(yo.astype(float)) <= np.var(y.astype(float)) * 1.05
