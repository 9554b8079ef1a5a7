"""Pallas fused-ladder kernel vs the jnp reference path (interpret mode)."""
import numpy as np
import pytest

import jax.numpy as jnp

from gmat_tpu.core.frame import FrameBatch
from gmat_tpu.ops import fused
from gmat_tpu.ops.pallas_kernels import fused_ladder


def _data(rng, n=2, h=64, w=128):
    y = rng.integers(0, 256, (n, h, w)).astype(np.uint8)
    u = rng.integers(0, 256, (n, h // 2, w // 2)).astype(np.uint8)
    v = rng.integers(0, 256, (n, h // 2, w // 2)).astype(np.uint8)
    return y, u, v


def test_fused_ladder_matches_jnp(rng):
    y, u, v = _data(rng)
    got = np.asarray(fused_ladder(jnp.asarray(y), jnp.asarray(u),
                                  jnp.asarray(v), 32, 32, interpret=True))
    fb = FrameBatch({"y": jnp.asarray(y), "u": jnp.asarray(u),
                     "v": jnp.asarray(v)}, "yuv420p", y.shape[2],
                    y.shape[1], "bt709")
    want = np.asarray(fused.preprocess_nchw(fb, 32, 32))
    assert got.shape == want.shape == (2, 3, 32, 32)
    # bf16 weights: allow ~1.5 u8-LSB
    assert (np.abs(got - want) * 255).max() <= 2.0


def test_fused_ladder_colorspace_and_shift(rng):
    y, u, v = _data(rng, n=1)
    got = np.asarray(fused_ladder(
        jnp.asarray(y), jnp.asarray(u), jnp.asarray(v), 32, 32,
        colorspace="bt601", norm=255.0, shift=(127.5, 127.5, 127.5),
        interpret=True))
    fb = FrameBatch({"y": jnp.asarray(y), "u": jnp.asarray(u),
                     "v": jnp.asarray(v)}, "yuv420p", y.shape[2],
                    y.shape[1], "bt601")
    want = np.asarray(fused.preprocess_nchw(fb, 32, 32,
                                            shift=(127.5, 127.5, 127.5)))
    assert (np.abs(got - want) * 255).max() <= 2.0
    assert got.min() < 0 < got.max()      # centered by shift


def test_fused_ladder_u16_matches_xla(rng):
    """10-bit lane (ScaleP016/P016ToBgr* analog): Pallas u16 kernel vs the
    exact XLA path on lsb-aligned 10-bit planes."""
    from gmat_tpu.ops.pallas_kernels import fused_ladder_u16
    n, h, w = 2, 64, 128
    y = rng.integers(0, 1024, (n, h, w)).astype(np.uint16)
    u = rng.integers(0, 1024, (n, h // 2, w // 2)).astype(np.uint16)
    v = rng.integers(0, 1024, (n, h // 2, w // 2)).astype(np.uint16)
    got = np.asarray(fused_ladder_u16(jnp.asarray(y), jnp.asarray(u),
                                      jnp.asarray(v), 32, 32, bits=10,
                                      interpret=True))
    fb = FrameBatch({"y": jnp.asarray(y), "u": jnp.asarray(u),
                     "v": jnp.asarray(v)}, "yuv420p10", w, h, "bt709")
    want = np.asarray(fused.preprocess_nchw(fb, 32, 32, norm=1023.0,
                                            use_pallas="never"))
    assert got.shape == want.shape == (n, 3, 32, 32)
    # bf16 MXU feed rounds 10-bit samples to <=2 of 1023 (~0.5 u8-LSB);
    # weights add ~1.5 u8-LSB like the 8-bit bf16 kernel
    assert (np.abs(got - want) * 255).max() <= 2.0


def test_preprocess_nchw_dispatches_u16(rng, monkeypatch):
    """preprocess_nchw routes yuv420p10 to the u16 kernel when Pallas is
    eligible, with XLA-identical norm semantics."""
    from gmat_tpu.ops import fused as fused_mod
    n, h, w = 1, 32, 64
    y = rng.integers(0, 1024, (n, h, w)).astype(np.uint16)
    u = rng.integers(0, 1024, (n, h // 2, w // 2)).astype(np.uint16)
    v = rng.integers(0, 1024, (n, h // 2, w // 2)).astype(np.uint16)
    fb = FrameBatch({"y": jnp.asarray(y), "u": jnp.asarray(u),
                     "v": jnp.asarray(v)}, "yuv420p10", w, h, "bt709")
    monkeypatch.setattr(fused_mod, "_pallas_eligible",
                        lambda *a, **k: True)
    import gmat_tpu.ops.pallas_kernels as pk
    orig = pk.fused_ladder_u16
    # interpret mode: no TPU on CI
    monkeypatch.setattr(pk, "fused_ladder_u16",
                        lambda *a, **k: orig(*a, **{**k, "interpret": True}))
    got = np.asarray(fused_mod.preprocess_nchw(fb, 16, 16, norm=1023.0))
    want = np.asarray(fused_mod.preprocess_nchw(fb, 16, 16, norm=1023.0,
                                                use_pallas="never"))
    assert (np.abs(got - want) * 255).max() <= 2.0


def test_fused_ladder_nv12_matches_planar(rng):
    from gmat_tpu.core.frame import pack_nv12
    from gmat_tpu.ops.pallas_kernels import fused_ladder_nv12
    y, u, v = _data(rng)
    fb = FrameBatch({"y": jnp.asarray(y), "u": jnp.asarray(u),
                     "v": jnp.asarray(v)}, "yuv420p", y.shape[2],
                    y.shape[1], "bt709")
    nv12 = pack_nv12(fb)
    got = np.asarray(fused_ladder_nv12(nv12, 32, 32, interpret=True))
    want = np.asarray(fused_ladder(jnp.asarray(y), jnp.asarray(u),
                                   jnp.asarray(v), 32, 32, interpret=True))
    assert (np.abs(got - want) * 255).max() <= 1.0


def test_fused_ladder_i8_matches_bf16(rng):
    from gmat_tpu.ops.pallas_kernels import fused_ladder_i8
    y, u, v = _data(rng)
    got = np.asarray(fused_ladder_i8(jnp.asarray(y), jnp.asarray(u),
                                     jnp.asarray(v), 32, 32, interpret=True))
    want = np.asarray(fused_ladder(jnp.asarray(y), jnp.asarray(u),
                                   jnp.asarray(v), 32, 32, interpret=True))
    # 1/127 weight quantization x CSC gain: ~2.5 LSB worst case on noise
    assert (np.abs(got - want) * 255).max() <= 3.0


def test_fused_ladder_i8_crop(rng):
    from gmat_tpu.ops.pallas_kernels import fused_ladder_i8
    y, u, v = _data(rng, n=1, h=64, w=128)
    crop = (16, 8, 64, 48)
    got = np.asarray(fused_ladder_i8(jnp.asarray(y), jnp.asarray(u),
                                     jnp.asarray(v), 24, 32, crop_box=crop,
                                     interpret=True))
    # reference: slice then run without crop
    cx, cy, cw, ch = crop
    ys = y[:, cy:cy + ch, cx:cx + cw]
    us = u[:, cy // 2:(cy + ch) // 2, cx // 2:(cx + cw) // 2]
    vs = v[:, cy // 2:(cy + ch) // 2, cx // 2:(cx + cw) // 2]
    want = np.asarray(fused_ladder_i8(jnp.asarray(ys), jnp.asarray(us),
                                      jnp.asarray(vs), 24, 32,
                                      interpret=True))
    assert (np.abs(got - want) * 255).max() <= 1.0
    with pytest.raises(ValueError):
        fused_ladder_i8(jnp.asarray(y), jnp.asarray(u), jnp.asarray(v),
                        24, 32, crop_box=(1, 0, 64, 48), interpret=True)


def test_chunked_ladder_matches_unchunked(rng):
    """W-chunked i8 ladder (>4K path) == unchunked i8 math on small dims."""
    from gmat_tpu.ops.pallas_kernels import (_build_ladder_i8,
                                             _build_ladder_i8_chunked)
    n, h, w = 2, 64, 512
    y, u, v = _data(rng, n=n, h=h, w=w)
    args = (jnp.asarray(y), jnp.asarray(u), jnp.asarray(v))
    un = _build_ladder_i8(n, h, w, h // 2, w // 2, 32, 32, "bt709",
                          "bilinear", 255.0, (0.0, 0.0, 0.0), True, None)
    ch2 = _build_ladder_i8_chunked(n, h, w, h // 2, w // 2, 32, 32, "bt709",
                                   "bilinear", 255.0, (0.0, 0.0, 0.0),
                                   True, 2)
    got_un = np.asarray(un(*args))
    got_c2 = np.asarray(ch2(*args))
    # identical quantized math; only f32-vs-bf16 partial summation differs
    assert (np.abs(got_c2 - got_un) * 255).max() <= 1.0


def test_chunk_count_selection():
    from gmat_tpu.ops.pallas_kernels import _pick_w_chunks
    # 1080p / 4K fit whole
    assert _pick_w_chunks(1080, 1920, 540, 960) == 1
    assert _pick_w_chunks(2160, 3840, 1080, 1920) == 1
    # 8K chunks into 2 lane-aligned columns (3840 / 1920 wide)
    assert _pick_w_chunks(4320, 7680, 2160, 3840) == 2
    # something odd-sized beyond budget still finds an aligned split
    assert _pick_w_chunks(4320, 6144, 2160, 3072) in (2, 3)


def test_ladder_8k_interpret(rng):
    """Full 8K frame through the public entry point (chunked path)."""
    from gmat_tpu.ops.pallas_kernels import fused_ladder_i8
    h, w = 4320, 7680
    yy = np.linspace(20, 230, w, dtype=np.float32)
    y = np.tile(yy, (h, 1)).astype(np.uint8)[None]
    u = np.full((1, h // 2, w // 2), 90, np.uint8)
    v = np.full((1, h // 2, w // 2), 170, np.uint8)
    got = np.asarray(fused_ladder_i8(jnp.asarray(y), jnp.asarray(u),
                                     jnp.asarray(v), 64, 64,
                                     interpret=True))
    fb = FrameBatch({"y": jnp.asarray(y), "u": jnp.asarray(u),
                     "v": jnp.asarray(v)}, "yuv420p", w, h, "bt709")
    want = np.asarray(fused.preprocess_nchw(fb, 64, 64, use_pallas="never"))
    assert got.shape == (1, 3, 64, 64)
    assert (np.abs(got - want) * 255).max() <= 2.0


@pytest.mark.parametrize("method", ["bicubic", "area", "lanczos3"])
def test_i8_ladder_extended_methods(rng, method):
    """int8 ladder with per-matrix quantization scale handles methods with
    taps beyond +-1 (bicubic overshoot, lanczos lobes) — parity with the
    XLA path (M5's Resize_bicubic.cu analog)."""
    from gmat_tpu.ops.pallas_kernels import fused_ladder_i8
    y, u, v = _data(rng, n=2, h=96, w=160)
    got = np.asarray(fused_ladder_i8(jnp.asarray(y), jnp.asarray(u),
                                     jnp.asarray(v), 32, 48,
                                     method=method, interpret=True))
    fb = FrameBatch({"y": jnp.asarray(y), "u": jnp.asarray(u),
                     "v": jnp.asarray(v)}, "yuv420p", y.shape[2],
                    y.shape[1], "bt709")
    want = np.asarray(fused.preprocess_nchw(fb, 48, 32, method=method,
                                            use_pallas="never"))
    assert got.shape == want.shape
    # methods with wide fractional tap sets route to the bf16 kernel when
    # the int8 bound exceeds 2 LSB; bf16 weights carry ~0.4% relative
    # error per tap, so allow ~4.5 LSB worst-case on noise
    assert (np.abs(got - want) * 255).max() <= 4.5, method


def test_fused_ladder_nv12_i8(rng):
    """int8 NV12 wire-format ladder == planar int8 ladder."""
    from gmat_tpu.core.frame import pack_nv12
    from gmat_tpu.ops.pallas_kernels import (fused_ladder_i8,
                                             fused_ladder_nv12_i8)
    y, u, v = _data(rng)
    fb = FrameBatch({"y": jnp.asarray(y), "u": jnp.asarray(u),
                     "v": jnp.asarray(v)}, "yuv420p", y.shape[2],
                    y.shape[1], "bt709")
    nv12 = pack_nv12(fb)
    got = np.asarray(fused_ladder_nv12_i8(nv12, 32, 32, interpret=True))
    want = np.asarray(fused_ladder_i8(jnp.asarray(y), jnp.asarray(u),
                                      jnp.asarray(v), 32, 32,
                                      interpret=True))
    assert (np.abs(got - want) * 255).max() <= 1.0


def test_8k_extended_method_falls_back_to_xla(rng):
    """>VMEM frame + a method int8 can't hold: exact XLA path, right shape."""
    from gmat_tpu.ops.pallas_kernels import fused_ladder_i8, _i8_ok_composed
    h, w = 4320, 7680
    assert not _i8_ok_composed(h, w, h // 2, w // 2, 64, 64, "lanczos3",
                               None, None, None)
    y = jnp.asarray(np.full((1, h, w), 128, np.uint8))
    u = jnp.asarray(np.full((1, h // 2, w // 2), 90, np.uint8))
    v = jnp.asarray(np.full((1, h // 2, w // 2), 170, np.uint8))
    out = np.asarray(fused_ladder_i8(y, u, v, 64, 64, method="lanczos3"))
    assert out.shape == (1, 3, 64, 64)
    assert np.isfinite(out).all()


def test_unchunkable_over_vmem_falls_back(rng):
    """Frames over the VMEM budget with no lane-aligned split must take
    the exact XLA path, not raise."""
    from gmat_tpu.ops.pallas_kernels import _pick_w_chunks, fused_ladder_i8
    assert _pick_w_chunks(3240, 5760, 1620, 2880) == 0   # 2880 % 256 != 0
    y = jnp.asarray(np.full((1, 3240, 5760), 100, np.uint8))
    u = jnp.asarray(np.full((1, 1620, 2880), 90, np.uint8))
    v = jnp.asarray(np.full((1, 1620, 2880), 170, np.uint8))
    out = np.asarray(fused_ladder_i8(y, u, v, 32, 32))
    assert out.shape == (1, 3, 32, 32) and np.isfinite(out).all()
    # fused smooth/flip on an unchunkable frame must ALSO fall back to
    # the XLA path (carrying the ops), not raise — preprocess_nchw
    # documents the automatic fallback
    out2 = np.asarray(fused_ladder_i8(
        y, u, v, 32, 32, smooth=(3, 3, 0.0, 0.0, "replicate"), flip=1))
    assert out2.shape == (1, 3, 32, 32) and np.isfinite(out2).all()
    np.testing.assert_allclose(out2[:, :, :, ::-1], out, atol=2.5 / 255)


def test_i8_gate_uses_crop_window_dims(rng):
    """crop + wide-tap upscale: the gate must judge the crop-window
    matrices (which quantize fine), not the full-frame downscale."""
    from gmat_tpu.ops.pallas_kernels import fused_ladder_i8
    y, u, v = _data(rng, n=1, h=512, w=640)
    # full-frame 512->224 lanczos3 would be rejected; 128->224 upscale is OK
    out = np.asarray(fused_ladder_i8(
        jnp.asarray(y), jnp.asarray(u), jnp.asarray(v), 224, 224,
        method="bilinear", crop_box=(0, 0, 128, 128), interpret=True))
    assert out.shape == (1, 3, 224, 224)


@pytest.mark.parametrize("quant,bound", [("i8", 3), ("bf16", 1)])
def test_fused_rungs_matches_resize_plane(rng, quant, bound):
    """Multi-rung ABR kernel: one pass -> every rung's YUV planes,
    bounded vs the exact per-plane resize (AppMeTrans ScaleNv12-per-rung
    collapsed into one source read).  The default int8 row path holds
    <=3 u8-LSB on pure noise (1/127 tap steps — the same precision class
    as the reference's texture-unit bilinear, which interpolates with
    9-bit fixed-point fractions); bf16 holds <=1."""
    from gmat_tpu.ops.pallas_kernels import fused_rungs
    from gmat_tpu.ops.resize import resize_plane

    n, h, w = 2, 64, 128
    y, u, v = _data(rng, n, h, w)
    sizes = [(96, 48), (64, 32), (32, 16)]
    outs = fused_rungs(jnp.asarray(y), jnp.asarray(u), jnp.asarray(v),
                       sizes, interpret=True, quant=quant)
    assert len(outs) == 3
    for (ow, oh), (yy, uu, vv) in zip(sizes, outs):
        assert yy.shape == (n, oh, ow) and yy.dtype == jnp.uint8
        assert uu.shape == (n, oh // 2, ow // 2)
        for got, src, (th, tw) in ((yy, y, (oh, ow)),
                                   (uu, u, (oh // 2, ow // 2)),
                                   (vv, v, (oh // 2, ow // 2))):
            ref = np.clip(np.round(np.asarray(resize_plane(
                jnp.asarray(src), th, tw, "bilinear"))), 0, 255)
            d = np.abs(np.asarray(got).astype(int) - ref.astype(int)).max()
            assert d <= bound, (quant, d)


def test_fused_rungs_validation(rng):
    from gmat_tpu.ops.pallas_kernels import fused_rungs
    y, u, v = _data(rng, 1, 32, 64)
    with pytest.raises(ValueError, match="even"):
        fused_rungs(jnp.asarray(y), jnp.asarray(u), jnp.asarray(v),
                    [(33, 16)], interpret=True)
    with pytest.raises(ValueError, match="method"):
        fused_rungs(jnp.asarray(y), jnp.asarray(u), jnp.asarray(v),
                    [(32, 16)], method="lanczos3", interpret=True)


def test_fused_ladder_p010_matches_u16(rng):
    """P010 wire format (msb-aligned u16, interleaved UV) == the planar
    lsb-aligned u16 ladder on the same samples."""
    from gmat_tpu.ops.pallas_kernels import fused_ladder_p010, fused_ladder_u16
    n, h, w = 2, 64, 128
    y = rng.integers(0, 1024, (n, h, w)).astype(np.uint16)
    u = rng.integers(0, 1024, (n, h // 2, w // 2)).astype(np.uint16)
    v = rng.integers(0, 1024, (n, h // 2, w // 2)).astype(np.uint16)
    # wire: y<<6 stacked on interleaved (u<<6, v<<6) rows
    wire = np.zeros((n, h * 3 // 2, w), np.uint16)
    wire[:, :h] = y << 6
    wire[:, h:, 0::2] = u << 6
    wire[:, h:, 1::2] = v << 6
    got = np.asarray(fused_ladder_p010(jnp.asarray(wire), 32, 32,
                                       interpret=True))
    want = np.asarray(fused_ladder_u16(jnp.asarray(y), jnp.asarray(u),
                                       jnp.asarray(v), 32, 32, bits=10,
                                       interpret=True))
    # both paths round samples to bf16 (in different scales): <=1 u8-LSB
    assert (np.abs(got - want) * 255).max() <= 1.0


def test_preprocess_nchw_444_dispatch(rng, monkeypatch):
    """yuv444p batches ride the bf16 Pallas kernel (the i8 tap
    quantization doesn't hold tolerance on real chroma downscales)."""
    from gmat_tpu.ops import fused as fused_mod
    import gmat_tpu.ops.pallas_kernels as pk
    n, h, w = 1, 32, 64
    y = rng.integers(0, 256, (n, h, w)).astype(np.uint8)
    u = rng.integers(0, 256, (n, h, w)).astype(np.uint8)
    v = rng.integers(0, 256, (n, h, w)).astype(np.uint8)
    fb = FrameBatch({"y": jnp.asarray(y), "u": jnp.asarray(u),
                     "v": jnp.asarray(v)}, "yuv444p", w, h, "bt709")
    monkeypatch.setattr(fused_mod, "_pallas_eligible", lambda *a, **k: True)
    called = {}
    orig = pk.fused_ladder

    def spy(*a, **k):
        called["bf16"] = True
        return orig(*a, **{**k, "interpret": True})
    monkeypatch.setattr(pk, "fused_ladder", spy)
    got = np.asarray(fused_mod.preprocess_nchw(fb, 16, 16))
    want = np.asarray(fused_mod.preprocess_nchw(fb, 16, 16,
                                                use_pallas="never"))
    assert called.get("bf16")
    assert (np.abs(got - want) * 255).max() <= 2.0


def test_fused_rungs_jit_then_eager(rng):
    """The lru_cached builder must keep NUMPY consts: a first call under
    an outer jit would otherwise cache tracers that poison later eager
    calls with the same cache key (UnexpectedTracerError)."""
    import jax
    from gmat_tpu.ops.pallas_kernels import fused_rungs
    y, u, v = _data(rng, 1, 32, 64)
    sizes = ((32, 16),)
    f = jax.jit(lambda a, b, c: fused_rungs(a, b, c, sizes,
                                            interpret=True)[0][0])
    first = np.asarray(f(jnp.asarray(y), jnp.asarray(u), jnp.asarray(v)))
    outs = fused_rungs(jnp.asarray(y), jnp.asarray(u), jnp.asarray(v),
                       sizes, interpret=True)
    np.testing.assert_array_equal(np.asarray(outs[0][0]), first)


def test_fused_rungs_chunked_matches_unchunked(rng):
    """W-chunked rungs (4K+ path) == the whole-frame i8 kernel."""
    from gmat_tpu.ops.pallas_kernels import (_build_rungs_i8_chunked,
                                             fused_rungs)
    n, h, w = 2, 64, 512
    y, u, v = _data(rng, n=n, h=h, w=w)
    sizes = ((256, 32), (128, 16))
    un = fused_rungs(jnp.asarray(y), jnp.asarray(u), jnp.asarray(v),
                     sizes, quant="i8", interpret=True)
    fn = _build_rungs_i8_chunked(n, h, w, h // 2, w // 2, sizes,
                                 "bilinear", True, 2)
    chk = fn(jnp.asarray(y), jnp.asarray(u), jnp.asarray(v))
    for r in range(len(sizes)):
        for p in range(3):
            np.testing.assert_array_equal(np.asarray(un[r][p]),
                                          np.asarray(chk[r][p]))


def test_fused_rungs_fits_geometry():
    from gmat_tpu.ops.pallas_kernels import fused_rungs_fits
    rungs = ((1920, 1080), (1280, 720), (960, 540))
    assert fused_rungs_fits(1080, 1920, ((1280, 720), (960, 540)))
    assert fused_rungs_fits(2160, 3840, rungs)      # 4K via k=3 chunks


def test_fused_ladder_bf16_crop(rng):
    """The bf16 kernel carries the fused crop too (the int8 path falls
    back to it for wide-tap methods + crop)."""
    from gmat_tpu.ops.pallas_kernels import fused_ladder, fused_ladder_i8
    y, u, v = _data(rng, n=1, h=64, w=128)
    crop = (16, 8, 64, 48)
    got = np.asarray(fused_ladder(jnp.asarray(y), jnp.asarray(u),
                                  jnp.asarray(v), 24, 32, crop_box=crop,
                                  interpret=True))
    cx, cy, cw, ch = crop
    ys = y[:, cy:cy + ch, cx:cx + cw]
    us = u[:, cy // 2:(cy + ch) // 2, cx // 2:(cx + cw) // 2]
    vs = v[:, cy // 2:(cy + ch) // 2, cx // 2:(cx + cw) // 2]
    want = np.asarray(fused_ladder(jnp.asarray(ys), jnp.asarray(us),
                                   jnp.asarray(vs), 24, 32, interpret=True))
    assert (np.abs(got - want) * 255).max() <= 1.0
    # i8 dispatcher routes bicubic+crop here instead of raising
    out = np.asarray(fused_ladder_i8(jnp.asarray(y), jnp.asarray(u),
                                     jnp.asarray(v), 24, 32,
                                     method="lanczos3", crop_box=crop,
                                     interpret=True))
    assert out.shape == (1, 3, 24, 32)


def test_fused_ladder_u16_crop(rng):
    from gmat_tpu.ops.pallas_kernels import fused_ladder_u16
    n, h, w = 1, 64, 128
    y = rng.integers(0, 1024, (n, h, w)).astype(np.uint16)
    u = rng.integers(0, 1024, (n, h // 2, w // 2)).astype(np.uint16)
    v = rng.integers(0, 1024, (n, h // 2, w // 2)).astype(np.uint16)
    crop = (16, 8, 64, 48)
    got = np.asarray(fused_ladder_u16(jnp.asarray(y), jnp.asarray(u),
                                      jnp.asarray(v), 24, 32, bits=10,
                                      crop_box=crop, interpret=True))
    cx, cy, cw, ch = crop
    ys = y[:, cy:cy + ch, cx:cx + cw]
    us = u[:, cy // 2:(cy + ch) // 2, cx // 2:(cx + cw) // 2]
    vs = v[:, cy // 2:(cy + ch) // 2, cx // 2:(cx + cw) // 2]
    want = np.asarray(fused_ladder_u16(jnp.asarray(ys), jnp.asarray(us),
                                       jnp.asarray(vs), 24, 32, bits=10,
                                       interpret=True))
    assert (np.abs(got - want) * 255).max() <= 1.0


# ------------------------- flip + gaussian smooth fused into the matrices

def _ingamut(rng, n=2, h=64, w=128):
    """YUV that stays in RGB gamut so clip-order differences vanish."""
    y = rng.integers(60, 180, (n, h, w)).astype(np.uint8)
    u = rng.integers(118, 138, (n, h // 2, w // 2)).astype(np.uint8)
    v = rng.integers(118, 138, (n, h // 2, w // 2)).astype(np.uint8)
    return y, u, v


def test_smooth_matrix_matches_conv():
    from gmat_tpu.ops.smooth import (gaussian_blur_plane, smooth_matrix,
                                     BORDERS)
    rng = np.random.default_rng(7)
    x = rng.uniform(0, 255, (1, 40, 1)).astype(np.float32)
    for border in BORDERS:
        for k, s in ((3, 0.0), (5, 1.3), (7, 0.0), (9, 2.0)):
            g = smooth_matrix(40, k, s, border)
            want = np.asarray(gaussian_blur_plane(
                jnp.asarray(x), 1, k, 0.0, s, border))
            got = (g @ x[0, :, 0])[None, :, None]
            np.testing.assert_allclose(got, want, atol=1e-4)


@pytest.mark.parametrize("code,axis", [(0, 1), (1, 2), (-1, None)])
def test_fused_ladder_flip_exact(rng, code, axis):
    y, u, v = _data(rng)
    base = np.asarray(fused_ladder(jnp.asarray(y), jnp.asarray(u),
                                   jnp.asarray(v), 32, 48, interpret=True))
    got = np.asarray(fused_ladder(jnp.asarray(y), jnp.asarray(u),
                                  jnp.asarray(v), 32, 48, flip=code,
                                  interpret=True))
    want = (np.flip(base, axis + 1) if axis is not None
            else base[:, :, ::-1, ::-1])
    # flip is a pure permutation of the matrix rows/cols: bit-exact
    np.testing.assert_array_equal(got, want)


def test_fused_ladder_smooth_matches_xla(rng):
    y, u, v = _ingamut(rng)
    sm = (5, 3, 1.1, 0.0, "reflect101")
    got = np.asarray(fused_ladder(jnp.asarray(y), jnp.asarray(u),
                                  jnp.asarray(v), 32, 48, smooth=sm,
                                  interpret=True))
    fb = FrameBatch({"y": jnp.asarray(y), "u": jnp.asarray(u),
                     "v": jnp.asarray(v)}, "yuv420p", y.shape[2],
                    y.shape[1], "bt709")
    want = np.asarray(fused.preprocess_nchw(fb, 48, 32, smooth=sm,
                                            use_pallas="never"))
    assert (np.abs(got - want) * 255).max() <= 2.0


def test_fused_ladder_smooth_then_flip_order(rng):
    # composition order is resize -> smooth -> flip (flip of smoothed)
    y, u, v = _ingamut(rng, n=1)
    sm = (3, 3, 0.0, 0.0, "replicate")
    both = np.asarray(fused_ladder(jnp.asarray(y), jnp.asarray(u),
                                   jnp.asarray(v), 32, 32, smooth=sm,
                                   flip=1, interpret=True))
    sm_only = np.asarray(fused_ladder(jnp.asarray(y), jnp.asarray(u),
                                      jnp.asarray(v), 32, 32, smooth=sm,
                                      interpret=True))
    np.testing.assert_array_equal(both, sm_only[:, :, :, ::-1])


def test_fused_ladder_i8_smooth_flip(rng):
    from gmat_tpu.ops.pallas_kernels import fused_ladder_i8
    y, u, v = _ingamut(rng)
    sm = (3, 5, 0.0, 1.2, "reflect")
    got = np.asarray(fused_ladder_i8(jnp.asarray(y), jnp.asarray(u),
                                     jnp.asarray(v), 32, 48, smooth=sm,
                                     flip=-1, interpret=True))
    want = np.asarray(fused_ladder(jnp.asarray(y), jnp.asarray(u),
                                   jnp.asarray(v), 32, 48, smooth=sm,
                                   flip=-1, interpret=True))
    assert (np.abs(got - want) * 255).max() <= 3.0


def test_fused_ladder_u16_smooth_flip(rng):
    from gmat_tpu.ops.pallas_kernels import fused_ladder_u16
    y = rng.integers(240, 720, (1, 64, 96)).astype(np.uint16)
    u = rng.integers(472, 552, (1, 32, 48)).astype(np.uint16)
    v = rng.integers(472, 552, (1, 32, 48)).astype(np.uint16)
    sm = (5, 5, 0.0, 0.0, "replicate")
    got = np.asarray(fused_ladder_u16(jnp.asarray(y), jnp.asarray(u),
                                      jnp.asarray(v), 32, 32, 10,
                                      smooth=sm, flip=0, interpret=True))
    fb = FrameBatch({"y": jnp.asarray(y), "u": jnp.asarray(u),
                     "v": jnp.asarray(v)}, "yuv420p10", 96, 64, "bt709")
    want = np.asarray(fused.preprocess_nchw(fb, 32, 32, smooth=sm,
                                            flip_code=0,
                                            use_pallas="never"))
    assert (np.abs(got - want) * 1023).max() <= 8.0     # bf16 @ 10 bits


def test_fused_smooth_validation(rng):
    y, u, v = _data(rng, n=1)
    with pytest.raises(ValueError, match="constant"):
        fused_ladder(jnp.asarray(y), jnp.asarray(u), jnp.asarray(v),
                     32, 32, smooth=(3, 3, 0.0, 0.0, "constant"),
                     interpret=True)
    with pytest.raises(ValueError, match="odd"):
        fused_ladder(jnp.asarray(y), jnp.asarray(u), jnp.asarray(v),
                     32, 32, smooth=(4, 3, 0.0, 0.0, "replicate"),
                     interpret=True)


def test_preprocess_nchw_fusable_gates():
    from gmat_tpu.core.frame import FrameBatch as FB
    import numpy as _np
    fb = FB({"y": _np.zeros((1, 64, 64), _np.uint8),
             "u": _np.zeros((1, 32, 32), _np.uint8),
             "v": _np.zeros((1, 32, 32), _np.uint8)},
            "yuv420p", 64, 64, "bt709")
    assert fused._fusable_crop(fb, (2, 2, 32, 32))
    assert not fused._fusable_crop(fb, (1, 2, 32, 32))      # odd origin
    assert not fused._fusable_crop(fb, (2, 2, 32, 64))      # out of frame
    assert not fused._fusable_crop(fb, (2.5, 2, 32, 32))    # fractional
    assert fused._fusable_smooth((3, 3, 0.0, 0.0, "replicate"))
    assert not fused._fusable_smooth((3, 3, 0.0, 0.0, "constant"))
    assert not fused._fusable_smooth((2, 3, 0.0, 0.0, "replicate"))


def test_i8_gate_judges_composed_matrices():
    from gmat_tpu.ops.pallas_kernels import _i8_ok_composed
    # bilinear without smooth: shortcut true; flip alone can't change
    # quantization error (pure permutation)
    assert _i8_ok_composed(64, 128, 32, 64, 32, 32, "bilinear",
                           None, None, None)
    assert _i8_ok_composed(64, 128, 32, 64, 32, 32, "bilinear",
                           None, None, -1)
    # a fused gaussian spreads row weights past what 1/127 steps hold
    # (measured 2.008 LSB at 2:1): the gate must measure and say no —
    # fused_ladder_i8 then hands the fused smooth to the bf16 kernel
    assert not _i8_ok_composed(64, 128, 32, 64, 32, 32, "bilinear", None,
                               (3, 3, 0.0, 0.0, "replicate"), None)


def test_chunked_ladder_fused_crop_smooth_flip(rng):
    """>4K W-chunked int8 path carries the fused crop/smooth/flip too:
    crop zeros land inside their chunks, output-side smooth/flip touch
    only un-chunked axes, offsets applied once in the epilogue."""
    from gmat_tpu.ops.pallas_kernels import (_build_ladder_i8,
                                             _build_ladder_i8_chunked)
    y, u, v = _ingamut(rng, n=1, h=64, w=256)
    crop = (32, 8, 192, 48)
    sm = (3, 3, 0.0, 0.0, "replicate")
    args = (1, 64, 256, 32, 128, 24, 32, "bt709", "bilinear", 255.0,
            (0.0, 0.0, 0.0), True)
    want = np.asarray(_build_ladder_i8(*args, crop, sm, -1)(
        jnp.asarray(y), jnp.asarray(u), jnp.asarray(v)))
    got = np.asarray(_build_ladder_i8_chunked(*args, 2, crop, sm, -1)(
        jnp.asarray(y), jnp.asarray(u), jnp.asarray(v)))
    # identical math, different accumulation grouping: tiny f32 drift
    assert (np.abs(got - want) * 255).max() <= 0.51


def test_pallas_review_fixes():
    """Round-3 pallas review: k=1 chunked rungs need no lane alignment,
    crop chroma scales per axis from the actual plane shapes, unknown
    flip codes raise."""
    import numpy as np
    import pytest as _p
    from gmat_tpu.ops import pallas_kernels as pk

    # 1080p (cw=960, 960%128!=0) with a 5-rung ladder: the whole-frame
    # bf16 budget may fail but k=1 chunked must be pickable
    k = pk._pick_rungs_chunks(
        1080, 1920, 540, 960,
        ((1280, 720), (960, 540), (640, 360), (480, 270), (320, 180)))
    assert k >= 1

    # crop chroma window for 4:4:4-shaped planes (ch == h): the chroma
    # matrices must cover the SAME rows as luma, not half of them
    ahy, ahc, awy, awc = pk._i8_matrices(
        64, 64, 64, 64, 32, 32, "bilinear", (0, 16, 32, 32), None, None)
    np.testing.assert_allclose(ahc, ahy)
    np.testing.assert_allclose(awc, awy)
    # and 4:2:0 still halves both axes
    ahy2, ahc2, _, _ = pk._i8_matrices(
        64, 64, 32, 32, 32, 32, "bilinear", (0, 16, 32, 32), None, None)
    assert ahc2.shape == (32, 32) and ahy2.shape == (32, 64)

    with _p.raises(ValueError):
        pk.fused_ladder(np.zeros((1, 32, 32), np.uint8),
                        np.zeros((1, 16, 16), np.uint8),
                        np.zeros((1, 16, 16), np.uint8),
                        16, 16, interpret=True, flip=2)
