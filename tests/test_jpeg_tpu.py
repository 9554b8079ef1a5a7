"""TPU JPEG codec tests: DCT math, self round-trip, and avcodec interop."""
import numpy as np
import pytest

import jax.numpy as jnp

from gmat_tpu.av import jpeg_tpu, toolkit as tk
from gmat_tpu.core.frame import from_numpy_yuv420
from gmat_tpu.ops import dct


def smooth_yuv(rng, n=2, h=64, w=80):
    yy = np.zeros((n, h, w), np.uint8)
    for i in range(n):
        base = np.add.outer(np.linspace(30, 200, h), np.linspace(0, 40, w))
        yy[i] = (base + i * 7 + rng.normal(0, 2, (h, w))).clip(0, 255)
    u = np.full((n, h // 2, w // 2), 110, np.uint8)
    v = np.full((n, h // 2, w // 2), 145, np.uint8)
    return yy, u, v


def test_dct_orthonormal():
    D = dct.dct_matrix()
    np.testing.assert_allclose(D @ D.T, np.eye(8), atol=1e-6)


def test_dct_matches_direct_formula(rng):
    x = rng.uniform(-128, 127, (1, 1, 1, 8, 8)).astype(np.float32)
    got = np.asarray(dct.dct8x8(jnp.asarray(x)))[0, 0, 0]
    # direct DCT-II (T.81 A.3.3)
    want = np.zeros((8, 8))
    for u in range(8):
        for v in range(8):
            cu = 1 / np.sqrt(2) if u == 0 else 1.0
            cv = 1 / np.sqrt(2) if v == 0 else 1.0
            s = sum(x[0, 0, 0, i, j] *
                    np.cos((2 * i + 1) * u * np.pi / 16) *
                    np.cos((2 * j + 1) * v * np.pi / 16)
                    for i in range(8) for j in range(8))
            want[u, v] = 0.25 * cu * cv * s
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_dct_roundtrip(rng):
    x = rng.uniform(-128, 127, (2, 3, 4, 8, 8)).astype(np.float32)
    back = np.asarray(dct.idct8x8(dct.dct8x8(jnp.asarray(x))))
    np.testing.assert_allclose(back, x, atol=1e-3)


def test_blockify_roundtrip(rng):
    x = rng.integers(0, 256, (2, 32, 48)).astype(np.uint8)
    b = dct.blockify(jnp.asarray(x))
    assert b.shape == (2, 4, 6, 8, 8)
    np.testing.assert_array_equal(np.asarray(dct.unblockify(b)), x)


def test_jpeg_self_roundtrip(rng):
    y, u, v = smooth_yuv(rng)
    fb = from_numpy_yuv420(y, u, v)
    datas = jpeg_tpu.encode_batch(fb, quality=95)
    assert all(d[:2] == b"\xff\xd8" and d[-2:] == b"\xff\xd9" for d in datas)
    back = jpeg_tpu.decode_batch(datas)
    assert back.width == 80 and back.height == 64
    dy = np.abs(np.asarray(back.planes["y"]).astype(int) - y.astype(int))
    assert dy.mean() < 3.0, dy.mean()


def test_jpeg_quality_ladder(rng):
    y, u, v = smooth_yuv(rng, n=1)
    fb = from_numpy_yuv420(y, u, v)
    sizes = [len(jpeg_tpu.encode_batch(fb, q)[0]) for q in (30, 70, 95)]
    assert sizes[0] < sizes[1] < sizes[2]


def test_our_jpeg_decodable_by_avcodec(rng):
    """Interop: our encoder's bytes must decode with libavcodec mjpeg."""
    y, u, v = smooth_yuv(rng, n=1)
    fb = from_numpy_yuv420(y, u, v)
    data = jpeg_tpu.encode_batch(fb, quality=92)[0]
    dec = tk.Decoder(tk.CODEC_MJPEG)
    frames = list(dec.decode(data, 0)) + list(dec.decode(None))
    dec.close()
    assert len(frames) == 1
    yd = frames[0][0]
    assert yd.shape == (64, 80)
    assert np.abs(yd.astype(int) - y[0].astype(int)).mean() < 3.0


def test_avcodec_jpeg_decodable_by_us(rng):
    """Interop: libavcodec mjpeg output must decode with our parser."""
    y, u, v = smooth_yuv(rng, n=1, h=64, w=64)
    enc = tk.Encoder("mjpeg", 64, 64, crf=2.0, still_image=True)
    pkts = enc.encode(y[0], u[0], v[0], pts=0) + enc.flush()
    enc.close()
    data = b"".join(p.data for p in pkts)
    back = jpeg_tpu.decode_batch([data])
    dy = np.abs(np.asarray(back.planes["y"])[0].astype(int) - y[0].astype(int))
    assert dy.mean() < 3.0, dy.mean()


def test_odd_dimensions(rng):
    y = rng.integers(0, 256, (1, 50, 70)).astype(np.uint8)
    u = rng.integers(0, 256, (1, 25, 35)).astype(np.uint8)
    v = rng.integers(0, 256, (1, 25, 35)).astype(np.uint8)
    fb = from_numpy_yuv420(y, u, v)
    data = jpeg_tpu.encode_batch(fb, quality=90)[0]
    back = jpeg_tpu.decode_batch([data])
    assert back.planes["y"].shape == (1, 50, 70)
    assert back.planes["u"].shape == (1, 25, 35)


def test_jpeg_gray_and_444(rng):
    from gmat_tpu.core.frame import FrameBatch
    import jax.numpy as jnp
    h, w = 48, 64
    y = (np.add.outer(np.linspace(20, 230, h), np.linspace(0, 20, w))
         ).astype(np.uint8)[None]
    # grayscale
    fb = FrameBatch({"y": jnp.asarray(y)}, "gray8", w, h)
    data = jpeg_tpu.encode_batch(fb, 92)[0]
    back = jpeg_tpu.decode_batch([data])
    assert back.format == "gray8"
    assert np.abs(np.asarray(back.planes["y"])[0].astype(int)
                  - y[0].astype(int)).mean() < 3
    # interop: avcodec can decode our grayscale jpeg
    dec = tk.Decoder(tk.CODEC_MJPEG)
    frames = list(dec.decode(data, 0)) + list(dec.decode(None))
    dec.close()
    assert frames and frames[0][0].shape == (h, w)
    # 4:4:4
    u = np.full((1, h, w), 90, np.uint8)
    v = np.full((1, h, w), 160, np.uint8)
    fb = FrameBatch({"y": jnp.asarray(y), "u": jnp.asarray(u),
                     "v": jnp.asarray(v)}, "yuv444p", w, h)
    data = jpeg_tpu.encode_batch(fb, 92)[0]
    back = jpeg_tpu.decode_batch([data])
    assert back.format == "yuv444p"
    assert np.abs(np.asarray(back.planes["u"])[0].astype(int) - 90).mean() < 3


def test_jpeg_mixed_quality_batch(rng):
    y, u, v = smooth_yuv(rng, n=1)
    from gmat_tpu.core.frame import from_numpy_yuv420
    fb = from_numpy_yuv420(y, u, v)
    d90 = jpeg_tpu.encode_batch(fb, 90)[0]
    d40 = jpeg_tpu.encode_batch(fb, 40)[0]
    back = jpeg_tpu.decode_batch([d90, d40])
    y0 = np.asarray(back.planes["y"])[0].astype(int)
    y1 = np.asarray(back.planes["y"])[1].astype(int)
    # both decode near the original (each with its own tables)
    assert np.abs(y0 - y[0].astype(int)).mean() < 3
    assert np.abs(y1 - y[0].astype(int)).mean() < 6


def test_jpeg_parser_survives_mutations():
    """Truncations and byte flips of a valid JPEG either decode or raise
    a clean error — never crash (parser bounds-checks every segment)."""
    from gmat_tpu.av import jpeg_tpu
    from gmat_tpu.core.frame import from_numpy_yuv420
    rng = np.random.default_rng(0)
    y = rng.integers(0, 256, (1, 32, 48)).astype(np.uint8)
    u = rng.integers(0, 256, (1, 16, 24)).astype(np.uint8)
    v = rng.integers(0, 256, (1, 16, 24)).astype(np.uint8)
    blob = jpeg_tpu.encode_batch(from_numpy_yuv420(y, u, v), 85)[0]
    for frac in (0.02, 0.1, 0.3, 0.7, 0.95):
        cut = blob[: int(len(blob) * frac)]
        try:
            jpeg_tpu.decode_batch([cut])
        except Exception:
            pass
    for seed in range(20):
        r = np.random.default_rng(seed)
        mut = bytearray(blob)
        for _ in range(6):
            mut[r.integers(2, len(mut))] = r.integers(0, 256)
        try:
            jpeg_tpu.decode_batch([bytes(mut)])
        except Exception:
            pass


def test_full_range_survives_sws_decode_path():
    """Grayscale/4:4:4 JPEGs decode through libswscale (no I420 fast
    path); the full JFIF range must not compress to 16..235."""
    from gmat_tpu.av import jpeg
    from gmat_tpu.core.frame import FrameBatch
    y = np.tile(np.linspace(0, 255, 64, dtype=np.uint8), (64, 1))
    fb = FrameBatch({"y": y[None]}, "gray8", 64, 64, "bt709")
    blob = jpeg_tpu.encode_batch(fb, 95)[0]
    yd, _, _ = jpeg.decode_jpeg_bytes(blob)
    assert yd.min() <= 8 and yd.max() >= 247, (yd.min(), yd.max())


def test_420_mcu_boundary_dims():
    """h or w == 1 mod 16: the chroma coefficient grid must cover the
    MCU grid of the 16-padded luma (was an out-of-bounds read leaking
    the NEXT frame's data into the bottom MCU row)."""
    rng = np.random.default_rng(0)
    for (h, w) in ((17, 32), (32, 17), (33, 49)):
        y = np.stack([np.full((h, w), 60, np.uint8),
                      np.full((h, w), 190, np.uint8)])
        u = np.stack([np.full((h // 2, w // 2), 50, np.uint8),
                      np.full((h // 2, w // 2), 200, np.uint8)])
        v = np.stack([np.full((h // 2, w // 2), 120, np.uint8),
                      np.full((h // 2, w // 2), 130, np.uint8)])
        fb = from_numpy_yuv420(y, u, v)
        blobs = jpeg_tpu.encode_batch(fb, 95)
        out = jpeg_tpu.decode_batch(blobs)
        du = np.asarray(out.planes["u"])
        # frame 0's chroma must be frame 0's value everywhere — no
        # cross-frame leak in the final MCU row
        assert abs(int(du[0].astype(int).mean()) - 50) <= 3, (h, w)
        assert abs(int(du[1].astype(int).mean()) - 200) <= 3, (h, w)


def test_jpeg_parallel_workers_match_serial(rng):
    # per-image entropy fan-out (workers>1) must be byte-identical to
    # the serial path, in order (VERDICT r2 #3: nvjpeg-class fan-out)
    yy, u, v = smooth_yuv(rng, n=6, h=48, w=64)
    fb = from_numpy_yuv420(yy, u, v)
    serial = jpeg_tpu.encode_batch(fb, 85, workers=1)
    par = jpeg_tpu.encode_batch(fb, 85, workers=4)
    assert par == serial
    fs = jpeg_tpu.decode_batch(serial, workers=1)
    fp = jpeg_tpu.decode_batch(serial, workers=4)
    for k in ("y", "u", "v"):
        np.testing.assert_array_equal(np.asarray(fs.planes[k]),
                                      np.asarray(fp.planes[k]))


def test_jpeg_parallel_error_propagates(rng):
    yy, u, v = smooth_yuv(rng, n=3, h=48, w=64)
    fb = from_numpy_yuv420(yy, u, v)
    datas = jpeg_tpu.encode_batch(fb, 85)
    bad = [datas[0], b"\xff\xd8garbage", datas[2]]
    with pytest.raises(IOError):
        jpeg_tpu.decode_batch(bad, workers=3)


@pytest.mark.parametrize("subfmt", ["420", "444", "gray"])
def test_jpeg_restart_markers_roundtrip(rng, subfmt):
    """restart_mcus writes DRI+RSTn segments; our decoder's restart lane
    and libavcodec must both reconstruct identical pixels."""
    yy, u, v = smooth_yuv(rng, n=2, h=48, w=80)
    if subfmt == "420":
        fb = from_numpy_yuv420(yy, u, v)
    elif subfmt == "444":
        from gmat_tpu.core.frame import FrameBatch
        u4 = np.repeat(np.repeat(u, 2, 1), 2, 2)
        v4 = np.repeat(np.repeat(v, 2, 1), 2, 2)
        fb = FrameBatch({"y": yy, "u": u4, "v": v4}, "yuv444p",
                        yy.shape[2], yy.shape[1], "bt601")
    else:
        from gmat_tpu.core.frame import FrameBatch
        fb = FrameBatch({"y": yy}, "gray8", yy.shape[2], yy.shape[1],
                        "bt601")
    plain = jpeg_tpu.encode_batch(fb, 88)
    rst = jpeg_tpu.encode_batch(fb, 88, restart_mcus=3)
    assert all(b"\xff\xdd" in d for d in rst)       # DRI present
    assert all(b"\xff\xdd" not in d for d in plain)
    f_plain = jpeg_tpu.decode_batch(plain)
    f_rst = jpeg_tpu.decode_batch(rst)
    for k in f_plain.planes:
        np.testing.assert_array_equal(np.asarray(f_plain.planes[k]),
                                      np.asarray(f_rst.planes[k]))
    # avcodec cross-check on the restart stream
    dec = tk.Decoder(tk.CODEC_MJPEG, width=fb.width, height=fb.height)
    frames = list(dec.decode(rst[0], 0)) + list(dec.decode(None))
    dec.close()
    assert len(frames) == 1


def test_jpeg_segment_parallel_decode(rng):
    """segment_threads fans intra-image decode across restart intervals:
    identical coefficients to the sequential path, both for restart
    streams and (fallback) plain ones."""
    yy, u, v = smooth_yuv(rng, n=2, h=64, w=96)
    fb = from_numpy_yuv420(yy, u, v)
    rst = jpeg_tpu.encode_batch(fb, 88, restart_mcus=2)
    seq = jpeg_tpu.decode_batch(rst)
    par = jpeg_tpu.decode_batch(rst, segment_threads=4)
    for k in seq.planes:
        np.testing.assert_array_equal(np.asarray(seq.planes[k]),
                                      np.asarray(par.planes[k]))
    # plain stream: mt entry falls back to sequential, same result
    plain = jpeg_tpu.encode_batch(fb, 88)
    a = jpeg_tpu.decode_batch(plain)
    b = jpeg_tpu.decode_batch(plain, segment_threads=4)
    for k in a.planes:
        np.testing.assert_array_equal(np.asarray(a.planes[k]),
                                      np.asarray(b.planes[k]))


def test_jpeg_segment_parallel_corrupt_segment_errors(rng):
    yy, u, v = smooth_yuv(rng, n=1, h=64, w=96)
    fb = from_numpy_yuv420(yy, u, v)
    blob = bytearray(jpeg_tpu.encode_batch(fb, 88, restart_mcus=2)[0])
    # truncate the scan hard: every path must error, not crash
    with pytest.raises(IOError):
        jpeg_tpu.decode_batch([bytes(blob[: len(blob) // 2])],
                              segment_threads=4)


def test_malformed_dht_no_crash(rng):
    """A DHT whose code counts exceed the prefix-code space must not
    corrupt memory (the 8-bit LUT build is bounds-checked): clean error
    or tolerant decode, never a crash."""
    yy, u, v = smooth_yuv(rng, n=1, h=32, w=48)
    fb = from_numpy_yuv420(yy, u, v)
    blob = bytearray(jpeg_tpu.encode_batch(fb, 85)[0])
    i = blob.find(b"\xff\xc4")          # first DHT
    assert i > 0
    # counts start at i+5 (marker+len+class byte): declare way too many
    # 1- and 2-bit codes
    blob[i + 5] = 255
    blob[i + 6] = 255
    try:
        jpeg_tpu.decode_batch([bytes(blob)])
    except (IOError, ValueError):
        pass


def test_restart_mcus_range_validated(rng):
    yy, u, v = smooth_yuv(rng, n=1, h=32, w=48)
    fb = from_numpy_yuv420(yy, u, v)
    with pytest.raises(ValueError, match="restart_mcus"):
        jpeg_tpu.encode_batch(fb, 85, restart_mcus=70000)


def test_depth_mismatched_checkpoint_rejected(tmp_path):
    import jax
    from gmat_tpu.filters.infer import InferFilter
    from gmat_tpu.models import denoise
    small = denoise.init_params(jax.random.PRNGKey(0), channels=3, depth=3)
    flat = {}
    for i, layer in enumerate(small["layers"]):
        flat[f"layers.{i}.w"] = np.asarray(layer["w"])
        flat[f"layers.{i}.b"] = np.asarray(layer["b"])
    p = str(tmp_path / "shallow.npz")
    np.savez(p, **flat)
    with pytest.raises(ValueError, match="different depth"):
        InferFilter(model="denoise", weights=p)    # model depth is 5


def test_encode_expand_range():
    # expand_range=True: limited (MPEG) samples scale to JFIF full range
    # inside the jitted coef program (the mjpeg_tpu video-encoder lane)
    from gmat_tpu.av.jpeg import decode_jpeg_bytes
    n, h, w = 1, 32, 48
    for lim, full in ((16, 0), (235, 255), (126, 128)):
        y = np.full((n, h, w), lim, np.uint8)
        u = np.full((n, h // 2, w // 2), 128, np.uint8)
        v = np.full((n, h // 2, w // 2), 128, np.uint8)
        fb = from_numpy_yuv420(y, u, v)
        data = jpeg_tpu.encode_batch(fb, 95, expand_range=True)[0]
        yy, uu, vv = decode_jpeg_bytes(data)
        assert abs(float(np.median(yy)) - ((lim - 16) * 255.0 / 219.0)) < 3
        assert abs(float(np.median(yy)) - full) < 3
        # neutral chroma is a fixed point of the chroma expansion
        assert abs(float(np.median(uu)) - 128) < 3


def test_jpeg_422(rng):
    """4:2:2 lane (nvjpeg envelope: NVJPEG_CSS_422 camera streams):
    self round-trip, PIL interop both directions, restart segments."""
    import io

    from PIL import Image
    n, h, w = 2, 48, 64
    yy, _, _ = smooth_yuv(rng, n=n, h=h, w=w)
    u = np.full((n, h, w // 2), 110, np.uint8)
    v = np.full((n, h, w // 2), 145, np.uint8)
    fb = from_numpy_yuv420(yy, u, v, fmt="yuv422p")
    datas = jpeg_tpu.encode_batch(fb, 92)
    back = jpeg_tpu.decode_batch(datas)
    assert back.format == "yuv422p"
    assert np.abs(np.asarray(back.planes["y"]).astype(int)
                  - yy.astype(int)).mean() < 3
    assert np.abs(np.asarray(back.planes["u"]).astype(int)
                  - u.astype(int)).mean() < 3
    # PIL (libjpeg) decodes our 4:2:2 bytes
    im = Image.open(io.BytesIO(datas[0]))
    im.load()
    assert im.size == (w, h)
    # PIL-encoded 4:2:2 (subsampling=1) decodes with us
    ycc = np.dstack([yy[0], np.full((h, w), 110, np.uint8),
                     np.full((h, w), 145, np.uint8)])
    buf = io.BytesIO()
    Image.fromarray(ycc, "YCbCr").save(buf, "JPEG", quality=92,
                                       subsampling=1)
    ours = jpeg_tpu.decode_batch([buf.getvalue()])
    assert ours.format == "yuv422p"
    assert np.abs(np.asarray(ours.planes["y"])[0].astype(int)
                  - yy[0].astype(int)).mean() < 4
    # restart markers + intra-image parallel segment decode
    rst = jpeg_tpu.encode_batch(fb, 88, restart_mcus=3)
    assert all(b"\xff\xdd" in d for d in rst)
    f1 = jpeg_tpu.decode_batch(rst)
    f2 = jpeg_tpu.decode_batch(rst, segment_threads=4)
    plain = jpeg_tpu.decode_batch(jpeg_tpu.encode_batch(fb, 88))
    for k in f1.planes:
        np.testing.assert_array_equal(np.asarray(f1.planes[k]),
                                      np.asarray(f2.planes[k]))
        np.testing.assert_array_equal(np.asarray(f1.planes[k]),
                                      np.asarray(plain.planes[k]))


def test_progressive_decode(rng):
    """Progressive (SOF2) decode: spectral selection + successive
    approximation scans refine the coefficient array on host, then ride
    the same device dequant+IDCT program.  nvjpeg-envelope parity
    (AppNvjpegDec.cpp:24-67 accepts any libjpeg stream).  Oracle: PIL
    (libjpeg) pixels; plus the sharper invariant that progressive and
    baseline encodes of one image decode bit-exactly the same."""
    import io

    from PIL import Image
    h, w = 64, 80
    yv = (rng.integers(0, 256, (h, w)) * 0.5 +
          np.add.outer(np.linspace(0, 255, h), np.zeros(w)) * 0.5
          ).astype(np.uint8)
    ycc = np.dstack([yv, rng.integers(60, 200, (h, w)).astype(np.uint8),
                     rng.integers(60, 200, (h, w)).astype(np.uint8)])
    for q, sub in ((30, 2), (85, 2), (85, 1), (85, 0), (95, 0)):
        blobs = {}
        for prog in (False, True):
            buf = io.BytesIO()
            Image.fromarray(ycc, "YCbCr").save(
                buf, "JPEG", quality=q, progressive=prog, subsampling=sub)
            blobs[prog] = buf.getvalue()
        assert b"\xff\xc2" in blobs[True][:200]
        fa = jpeg_tpu.decode_batch([blobs[False]])
        fp = jpeg_tpu.decode_batch([blobs[True]])
        for k in fa.planes:
            np.testing.assert_array_equal(np.asarray(fa.planes[k]),
                                          np.asarray(fp.planes[k]))
        # pixel sanity vs PIL's own decode (loose: PIL's output passes
        # through its RGB<->YCbCr fixed-point matrices and an integer
        # IDCT; the sharp check is the bit-exact baseline parity above)
        pil = np.asarray(Image.open(io.BytesIO(blobs[True]))
                         .convert("YCbCr"))
        d = np.abs(np.asarray(fp.planes["y"])[0].astype(int)
                   - pil[..., 0].astype(int))
        assert d.mean() < 2.5, (q, sub, d.mean())
    # grayscale progressive
    buf = io.BytesIO()
    Image.fromarray(yv, "L").save(buf, "JPEG", quality=90, progressive=True)
    fb = jpeg_tpu.decode_batch([buf.getvalue()])
    assert fb.format == "gray8"
    assert np.abs(np.asarray(fb.planes["y"])[0].astype(int)
                  - yv.astype(int)).mean() < 4


def test_progressive_restart_intervals(rng):
    """DRI inside progressive scans: per-interval DC/EOBRUN reset."""
    import io

    from PIL import Image
    h, w = 64, 80
    ycc = np.dstack([rng.integers(0, 256, (h, w)).astype(np.uint8),
                     rng.integers(60, 200, (h, w)).astype(np.uint8),
                     rng.integers(60, 200, (h, w)).astype(np.uint8)])
    bufs = {}
    for rst in (0, 4):
        buf = io.BytesIO()
        kw = {"restart_marker_blocks": rst} if rst else {}
        Image.fromarray(ycc, "YCbCr").save(buf, "JPEG", quality=85,
                                           progressive=True, **kw)
        bufs[rst] = buf.getvalue()
    if b"\xff\xdd" not in bufs[4]:
        import pytest
        pytest.skip("PIL build lacks restart_marker_blocks")
    fa = jpeg_tpu.decode_batch([bufs[0]])
    fb = jpeg_tpu.decode_batch([bufs[4]])
    for k in fa.planes:
        np.testing.assert_array_equal(np.asarray(fa.planes[k]),
                                      np.asarray(fb.planes[k]))


def test_progressive_mutation_fuzz(rng):
    import io

    from PIL import Image
    h, w = 48, 64
    ycc = np.dstack([rng.integers(0, 256, (h, w)).astype(np.uint8),
                     rng.integers(60, 200, (h, w)).astype(np.uint8),
                     rng.integers(60, 200, (h, w)).astype(np.uint8)])
    buf = io.BytesIO()
    Image.fromarray(ycc, "YCbCr").save(buf, "JPEG", quality=85,
                                       progressive=True)
    blob = buf.getvalue()
    for frac in (0.05, 0.3, 0.7, 0.97):
        try:
            jpeg_tpu.decode_batch([blob[: int(len(blob) * frac)]])
        except Exception:
            pass
    for seed in range(25):
        r = np.random.default_rng(seed)
        mut = bytearray(blob)
        for _ in range(8):
            mut[r.integers(2, len(mut))] = r.integers(0, 256)
        try:
            jpeg_tpu.decode_batch([bytes(mut)])
        except Exception:
            pass


def test_jpeg_optimized_huffman(rng):
    """optimize=True: per-image optimal Huffman tables (2-pass, libjpeg
    optimize_coding analog — BEYOND nvjpeg, whose encoder is fixed-table).
    Smaller bytes, bit-identical pixels, decodable by PIL and avcodec,
    composes with restart intervals and the mt-segment decoder."""
    import io

    from PIL import Image
    yy, u, v = smooth_yuv(rng, n=2, h=64, w=96)
    fb = from_numpy_yuv420(yy, u, v)
    plain = jpeg_tpu.encode_batch(fb, 88)
    opt = jpeg_tpu.encode_batch(fb, 88, optimize=True)
    assert sum(map(len, opt)) < sum(map(len, plain))
    fa = jpeg_tpu.decode_batch(plain)
    fo = jpeg_tpu.decode_batch(opt)
    for k in fa.planes:
        np.testing.assert_array_equal(np.asarray(fa.planes[k]),
                                      np.asarray(fo.planes[k]))
    im = Image.open(io.BytesIO(opt[0]))
    im.load()
    assert im.size == (96, 64)
    dec = tk.Decoder(tk.CODEC_MJPEG)
    frames = list(dec.decode(opt[0], 0)) + list(dec.decode(None))
    dec.close()
    assert len(frames) == 1
    # restart + optimize + segment-parallel decode: all bit-exact
    ro = jpeg_tpu.encode_batch(fb, 88, restart_mcus=3, optimize=True)
    f1 = jpeg_tpu.decode_batch(ro)
    f2 = jpeg_tpu.decode_batch(ro, segment_threads=4)
    for k in f1.planes:
        np.testing.assert_array_equal(np.asarray(f1.planes[k]),
                                      np.asarray(f2.planes[k]))
        np.testing.assert_array_equal(np.asarray(f1.planes[k]),
                                      np.asarray(fa.planes[k]))


@pytest.mark.parametrize("fmt", ["yuv420p", "yuv422p", "yuv444p", "gray8"])
def test_progressive_encode_roundtrip(rng, fmt):
    """SOF2 encode: our progressive decoder reconstructs EXACTLY the
    pixels of the baseline encode of the same coefficients (same device
    DCT program, different wire format)."""
    from gmat_tpu.core.frame import FrameBatch
    h, w = 56, 104
    y = (np.add.outer(np.linspace(20, 230, h), np.linspace(0, 25, w))
         + rng.normal(0, 4, (h, w))).clip(0, 255).astype(np.uint8)[None]
    if fmt == "yuv420p":
        planes = {"y": y, "u": np.full((1, h // 2, w // 2), 90, np.uint8),
                  "v": (y[:, ::2, ::2] // 2 + 60)}
    elif fmt == "yuv422p":
        planes = {"y": y, "u": (y[:, :, ::2] // 3 + 70),
                  "v": np.full((1, h, w // 2), 150, np.uint8)}
    elif fmt == "yuv444p":
        planes = {"y": y, "u": (y // 2 + 30), "v": (y // 3 + 90)}
    else:
        planes = {"y": y}
    fb = FrameBatch(planes, fmt, w, h)
    base = jpeg_tpu.encode_batch(fb, quality=87)
    prog = jpeg_tpu.encode_batch(fb, quality=87, progressive=True)
    assert b"\xff\xc2" in prog[0][:700]          # SOF2 marker
    assert len(prog[0]) < len(base[0])           # per-scan optimal tables
    db, dp = jpeg_tpu.decode_batch(base), jpeg_tpu.decode_batch(prog)
    for k in db.planes:
        np.testing.assert_array_equal(np.asarray(db.planes[k]),
                                      np.asarray(dp.planes[k]))


def test_progressive_encode_pil_oracle(rng):
    """libjpeg (PIL) decodes our SOF2 stream to exactly the pixels of
    our baseline stream — cross-decoder bit-exactness."""
    import io
    from PIL import Image
    y, u, v = smooth_yuv(rng, n=1, h=72, w=120)
    fb = from_numpy_yuv420(y, u, v)
    base = jpeg_tpu.encode_batch(fb, quality=90)
    prog = jpeg_tpu.encode_batch(fb, quality=90, progressive=True)
    a = np.asarray(Image.open(io.BytesIO(base[0])).convert("RGB"))
    b = np.asarray(Image.open(io.BytesIO(prog[0])).convert("RGB"))
    np.testing.assert_array_equal(a, b)


def test_progressive_encode_odd_dims(rng):
    # non-MCU-aligned dims: padding blocks get DC-only coverage in
    # non-interleaved AC scans; visible pixels must still match exactly
    y, u, v = smooth_yuv(rng, n=1, h=33, w=49)
    y, u, v = y[:, :33, :49], u[:, :17, :25], v[:, :17, :25]
    fb = from_numpy_yuv420(y, u, v)
    db = jpeg_tpu.decode_batch(jpeg_tpu.encode_batch(fb, quality=85))
    dp = jpeg_tpu.decode_batch(
        jpeg_tpu.encode_batch(fb, quality=85, progressive=True))
    for k in db.planes:
        np.testing.assert_array_equal(np.asarray(db.planes[k]),
                                      np.asarray(dp.planes[k]))


def test_progressive_encode_accepts_restart(rng):
    # progressive + restart now compose (see the dedicated DRI test);
    # the out-of-range DRI check still applies
    y, u, v = smooth_yuv(rng, n=1)
    fb = from_numpy_yuv420(y, u, v)
    with pytest.raises(ValueError):
        jpeg_tpu.encode_batch(fb, progressive=True, restart_mcus=70000)


def test_mjpeg_tpu_decode_stream(rng, tmp_path):
    """decode_stream_tpu: MJPEG track -> device FrameBatches, exactly
    the pixels decode_batch gives for the same packets; pts in order;
    tail batch padded with a correct valid count."""
    y, u, v = smooth_yuv(rng, n=11, h=48, w=64)
    fb = from_numpy_yuv420(y, u, v)
    datas = jpeg_tpu.encode_batch(fb, quality=88)
    path = str(tmp_path / "in.mov")
    mux = tk.Muxer(path, 64, 48, (30, 1),
                   **tk.mux_kwargs_for_encoder("mjpeg"))
    for i, d in enumerate(datas):
        mux.write(tk.Packet(d, i, i, True, False, 0))
    mux.close()

    st = jpeg_tpu.decode_stream_tpu(path, batch=4)
    assert (st.width, st.height) == (64, 48)
    got, ptss = [], []
    for (b, pts, valid) in st:
        assert b.batch == 4 and b.format == "yuv420p"
        arr = np.asarray(b.planes["y"])
        got.extend(arr[i] for i in range(valid))
        ptss.extend(int(p) for p in pts[:valid])
    assert len(got) == 11 and ptss == sorted(ptss)
    ref = np.asarray(jpeg_tpu.decode_batch(datas).planes["y"])
    for i in range(11):
        np.testing.assert_array_equal(got[i], ref[i])


def test_mjpeg_tpu_decode_stream_avcodec_crosscheck(rng, tmp_path):
    # independent decoders (float vs integer IDCT): within 2 LSB
    y, u, v = smooth_yuv(rng, n=4, h=48, w=64)
    fb = from_numpy_yuv420(y, u, v)
    path = str(tmp_path / "in.mov")
    mux = tk.Muxer(path, 64, 48, (30, 1),
                   **tk.mux_kwargs_for_encoder("mjpeg"))
    for i, d in enumerate(jpeg_tpu.encode_batch(fb, quality=90)):
        mux.write(tk.Packet(d, i, i, True, False, 0))
    mux.close()
    ours = []
    for (b, pts, valid) in jpeg_tpu.decode_stream_tpu(path, batch=4):
        ours.extend(np.asarray(b.planes["y"])[i] for i in range(valid))
    dm = tk.Demuxer(path)
    dec = tk.Decoder.from_demuxer(dm)
    sw = []
    for p in dm:
        if p.stream == 0:
            sw.extend(yy for (yy, _, _, _) in dec.decode(p.data, p.pts))
    sw.extend(yy for (yy, _, _, _) in dec.decode(None))
    dm.close(); dec.close()
    assert len(sw) == len(ours) == 4
    for a, b in zip(ours, sw):
        assert np.abs(a.astype(int) - b.astype(int)).max() <= 2


def test_mjpeg_tpu_decode_stream_rejects_other_codecs(rng, tmp_path):
    y, u, v = smooth_yuv(rng, n=3, h=48, w=64)
    enc = tk.Encoder("libx264", 64, 48, fps=(30, 1), crf=30.0,
                     preset="ultrafast")
    path = str(tmp_path / "h264.mp4")
    mux = tk.Muxer(path, 64, 48, (30, 1), tk.CODEC_H264,
                   enc.extradata())
    for i in range(3):
        for p in enc.encode(y[i], u[i], v[i], pts=i):
            mux.write(p)
    for p in enc.flush():
        mux.write(p)
    enc.close(); mux.close()
    with pytest.raises(ValueError):
        jpeg_tpu.decode_stream_tpu(path)


def test_progressive_encode_stress_dense(rng):
    """Noise content at quality 97: dense coefficients exercise ZRL
    chains, long EOB runs (the 0x7FFF cap), and the buffered
    correction-bit flush in AC refinement; PIL (libjpeg) must agree
    with our decoder bit-exactly against the baseline stream."""
    import io
    from PIL import Image
    h, w = 256, 320
    y = rng.integers(0, 256, (h, w)).astype(np.uint8)[None]
    u = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)[None]
    v = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)[None]
    fb = from_numpy_yuv420(y, u, v)
    for q in (97, 30):
        base = jpeg_tpu.encode_batch(fb, quality=q)
        prog = jpeg_tpu.encode_batch(fb, quality=q, progressive=True)
        db, dp = jpeg_tpu.decode_batch(base), jpeg_tpu.decode_batch(prog)
        for k in db.planes:
            np.testing.assert_array_equal(np.asarray(db.planes[k]),
                                          np.asarray(dp.planes[k]))
        a = np.asarray(Image.open(io.BytesIO(base[0])).convert("RGB"))
        b = np.asarray(Image.open(io.BytesIO(prog[0])).convert("RGB"))
        np.testing.assert_array_equal(a, b)
    # flat content: long EOB runs across whole scans
    flat = from_numpy_yuv420(np.full((1, 128, 128), 128, np.uint8),
                             np.full((1, 64, 64), 128, np.uint8),
                             np.full((1, 64, 64), 128, np.uint8))
    pb = jpeg_tpu.encode_batch(flat, quality=90, progressive=True)
    dd = jpeg_tpu.decode_batch(pb)
    assert int(np.asarray(dd.planes["y"]).max()) - \
        int(np.asarray(dd.planes["y"]).min()) == 0


def test_jpeg_exif_insert_and_read(rng):
    """insert_exif splices an APP1 after SOI/APP0; exif_from_jpeg reads
    it back; PIL sees the same Exif; pixels stay bit-identical."""
    import io
    from PIL import Image
    y, u, v = smooth_yuv(rng, n=1)
    fb = from_numpy_yuv420(y, u, v)
    plain = jpeg_tpu.encode_batch(fb, quality=90)[0]
    # minimal valid TIFF-LE header + one IFD with 0 entries
    exif = (b"II*\x00\x08\x00\x00\x00" + b"\x00\x00"
            + b"\x00\x00\x00\x00")
    tagged = jpeg_tpu.insert_exif(plain, exif)
    assert jpeg_tpu.exif_from_jpeg(tagged) == exif
    assert jpeg_tpu.exif_from_jpeg(plain) is None
    a = jpeg_tpu.decode_batch([plain])
    b = jpeg_tpu.decode_batch([tagged])
    for k in a.planes:
        np.testing.assert_array_equal(np.asarray(a.planes[k]),
                                      np.asarray(b.planes[k]))
    pa = np.asarray(Image.open(io.BytesIO(tagged)).convert("RGB"))
    pb = np.asarray(Image.open(io.BytesIO(plain)).convert("RGB"))
    np.testing.assert_array_equal(pa, pb)
    assert Image.open(io.BytesIO(tagged)).info.get("exif") is not None
    with pytest.raises(ValueError):
        jpeg_tpu.insert_exif(plain, b"x" * 70000)


def test_mjpeg_tpu_stream_repeat_iteration_ends(rng, tmp_path):
    # a drained or closed stream must StopIteration, not hang
    y, u, v = smooth_yuv(rng, n=3, h=48, w=64)
    fb = from_numpy_yuv420(y, u, v)
    path = str(tmp_path / "in.mov")
    mux = tk.Muxer(path, 64, 48, (30, 1),
                   **tk.mux_kwargs_for_encoder("mjpeg"))
    for i, d in enumerate(jpeg_tpu.encode_batch(fb, quality=88)):
        mux.write(tk.Packet(d, i, i, True, False, 0))
    mux.close()
    st = jpeg_tpu.decode_stream_tpu(path, batch=3)
    assert len(list(st)) == 1
    assert list(st) == []                     # second pass: clean end
    st2 = jpeg_tpu.decode_stream_tpu(path, batch=3)
    st2.close()
    assert list(st2) == []


def test_insert_exif_long_app0(rng):
    # APP0 longer than the bare JFIF 16 bytes (e.g. embedded thumbnail):
    # the APP1 must land AFTER the whole segment
    import struct as _s
    y, u, v = smooth_yuv(rng, n=1, h=48, w=64)
    plain = jpeg_tpu.encode_batch(from_numpy_yuv420(y, u, v), 90)[0]
    # graft 12 extra bytes into APP0 (grow its declared length)
    app0_len = _s.unpack(">H", plain[4:6])[0]
    longer = (plain[:4] + _s.pack(">H", app0_len + 12)
              + plain[6:4 + app0_len] + bytes(12) + plain[4 + app0_len:])
    exif = b"II*\x00\x08\x00\x00\x00" + bytes(8)
    tagged = jpeg_tpu.insert_exif(longer, exif)
    assert jpeg_tpu.exif_from_jpeg(tagged) == exif
    a = jpeg_tpu.decode_batch([longer])
    b = jpeg_tpu.decode_batch([tagged])
    np.testing.assert_array_equal(np.asarray(a.planes["y"]),
                                  np.asarray(b.planes["y"]))


def _find_marker(b, m):
    i = 2
    while i + 4 <= len(b):
        if b[i] == 0xFF and b[i + 1] == m:
            return i
        if b[i] == 0xFF and b[i + 1] not in (0x01, 0xD8, 0xD9) \
                and not 0xD0 <= b[i + 1] <= 0xD7:
            ln = (b[i + 2] << 8) | b[i + 3]
            i += 2 + ln
        else:
            i += 1
    return -1


def test_jpeg_parser_hardening(rng):
    """Review fixes: Nf=2 rejected (heap-overflow vector), undefined
    Huffman tables rejected (silent-garbage vector), fill bytes before
    markers tolerated (valid files previously rejected)."""
    y, u, v = smooth_yuv(rng, n=1, h=48, w=64)
    blob = jpeg_tpu.encode_batch(from_numpy_yuv420(y, u, v), 85)[0]
    # 1. Nf=2 in the SOF must be rejected cleanly
    sof = _find_marker(blob, 0xC0)
    bad = bytearray(blob)
    bad[sof + 9] = 2
    with pytest.raises(IOError):
        jpeg_tpu.decode_batch([bytes(bad)])
    # also as SOF2 (the progressive geometry is the overflow vector)
    bad[sof + 1] = 0xC2
    with pytest.raises(IOError):
        jpeg_tpu.decode_batch([bytes(bad)])
    # 2. removing every DHT: clean error, not silent garbage
    stripped = bytearray(blob)
    while True:
        d = _find_marker(bytes(stripped), 0xC4)
        if d < 0:
            break
        ln = (stripped[d + 2] << 8) | stripped[d + 3]
        del stripped[d:d + 2 + ln]
    with pytest.raises(IOError):
        jpeg_tpu.decode_batch([bytes(stripped)])
    # 3. a fill byte before a marker is legal padding (B.1.1.2)
    sof = _find_marker(blob, 0xC0)
    padded = blob[:sof] + b"\xff" + blob[sof:]
    out = jpeg_tpu.decode_batch([padded])
    np.testing.assert_array_equal(
        np.asarray(out.planes["y"]),
        np.asarray(jpeg_tpu.decode_batch([blob]).planes["y"]))


@pytest.mark.parametrize("fmt", ["yuv420p", "gray8"])
def test_progressive_encode_with_restart_intervals(rng, fmt):
    """progressive + DRI compose: per-scan RSTn markers (MCU-counted in
    the interleaved DC scan, block-counted in non-interleaved scans),
    bit-exact through our decoder and PIL."""
    import io
    from PIL import Image
    from gmat_tpu.core.frame import FrameBatch
    h, w = 96, 144
    y = (np.add.outer(np.linspace(10, 240, h), np.linspace(0, 25, w))
         + rng.normal(0, 6, (h, w))).clip(0, 255).astype(np.uint8)[None]
    if fmt == "yuv420p":
        planes = {"y": y, "u": (y[:, ::2, ::2] // 2 + 40),
                  "v": np.full((1, h // 2, w // 2), 150, np.uint8)}
    else:
        planes = {"y": y}
    fb = FrameBatch(planes, fmt, w, h)
    base = jpeg_tpu.encode_batch(fb, quality=86)
    pr = jpeg_tpu.encode_batch(fb, quality=86, progressive=True,
                               restart_mcus=4)
    assert b"\xff\xdd" in pr[0][:700]        # DRI present
    assert any(bytes([0xFF, 0xD0 + k]) in pr[0] for k in range(8))
    db, dp = jpeg_tpu.decode_batch(base), jpeg_tpu.decode_batch(pr)
    for k in db.planes:
        np.testing.assert_array_equal(np.asarray(db.planes[k]),
                                      np.asarray(dp.planes[k]))
    a = np.asarray(Image.open(io.BytesIO(base[0])).convert("RGB"))
    b = np.asarray(Image.open(io.BytesIO(pr[0])).convert("RGB"))
    np.testing.assert_array_equal(a, b)


def _patch_sof_sampling(blob: bytes, hv: int) -> bytes:
    """Rewrite the first component's SOF sampling byte (h<<4|v)."""
    mut = bytearray(blob)
    for i in range(2, len(mut) - 1):
        if mut[i] == 0xFF and mut[i + 1] in (0xC0, 0xC2):
            mut[i + 11] = hv
            return bytes(mut)
    raise AssertionError("no SOF marker found")


@pytest.mark.parametrize("progressive", [True, False])
def test_gray_hostile_sof_sampling(rng, progressive):
    """Gray JPEGs declaring >1x1 sampling decode exactly like 1x1:
    sampling factors are layout-irrelevant for single-component frames
    (T.81 A.1.1 — the sole component defines hmax/vmax).  Regression for
    a heap overflow where the progressive decoder sized its MCU buffers
    from the attacker-controlled SOF factors (advisor r3, high)."""
    from gmat_tpu.core.frame import FrameBatch
    for h, w in ((9, 9), (24, 17)):
        y = rng.integers(0, 256, (1, h, w)).astype(np.uint8)
        fb = FrameBatch({"y": jnp.asarray(y)}, "gray8", w, h)
        blob = jpeg_tpu.encode_batch(fb, quality=90,
                                     progressive=progressive)[0]
        ref = np.asarray(jpeg_tpu.decode_batch([blob]).planes["y"])
        for hv in (0x44, 0x21, 0xF4, 0x04):
            got = jpeg_tpu.decode_batch([_patch_sof_sampling(blob, hv)])
            np.testing.assert_array_equal(np.asarray(got.planes["y"]),
                                          ref, err_msg=hex(hv))


def test_encode_overflow_retries_with_larger_buffer(rng, monkeypatch):
    """Content beating the bytes/px heuristic must retry with the
    analytic 4 B/coefficient bound, not raise (advisor r3, low)."""
    from gmat_tpu.core.frame import FrameBatch
    h = w = 192
    planes = {k: jnp.asarray(rng.integers(0, 256, (1, h, w))
                             .astype(np.uint8)) for k in "yuv"}
    fb = FrameBatch(planes, "yuv444p", w, h)
    want = jpeg_tpu.encode_batch(fb, quality=100)
    assert len(want[0]) > (1 << 16)   # exceeds the shrunken first buffer
    monkeypatch.setattr(jpeg_tpu, "_CAP_BPP", 0)
    got = jpeg_tpu.encode_batch(fb, quality=100)
    assert got == want
    prog = jpeg_tpu.encode_batch(fb, quality=100, progressive=True)
    monkeypatch.setattr(jpeg_tpu, "_CAP_BPP", 6)
    assert prog == jpeg_tpu.encode_batch(fb, quality=100,
                                         progressive=True)
