"""Native host runtime round-trip tests (encode -> mux -> demux -> decode)."""
import numpy as np
import pytest

from gmat_tpu.av import toolkit as tk


def synth_frames(n, w, h, seed=0):
    """Smooth moving-gradient frames (encode-friendly, checkable)."""
    frames = []
    for i in range(n):
        yy = ((np.add.outer(np.arange(h), np.arange(w)) * 0.3 + i * 4) % 200
              + 20).astype(np.uint8)
        uu = np.full((h // 2, w // 2), 100 + (i * 3) % 50, np.uint8)
        vv = np.full((h // 2, w // 2), 140 - (i * 2) % 40, np.uint8)
        frames.append((yy, uu, vv))
    return frames


@pytest.fixture(scope="module")
def clip(tmp_path_factory):
    """A 48-frame 320x240 H.264 mp4 generated with our own encoder+muxer."""
    path = str(tmp_path_factory.mktemp("av") / "clip.mp4")
    w, h, n = 320, 240, 48
    frames = synth_frames(n, w, h)
    enc = tk.Encoder("libx264", w, h, fps=(30, 1), gop=12, bf=2,
                     preset="veryfast", crf=18.0)
    pkts = []
    for i, (y, u, v) in enumerate(frames):
        pkts += enc.encode(y, u, v, pts=i)
    pkts += enc.flush()
    mux = tk.Muxer(path, w, h, (30, 1), tk.CODEC_H264, enc.extradata())
    for p in pkts:
        mux.write(p)
    mux.close()
    enc.close()
    return path, frames


def test_encode_produced_packets(clip):
    path, frames = clip
    import os
    assert os.path.getsize(path) > 1000


def test_demux_info(clip):
    path, frames = clip
    with tk.Demuxer(path) as dm:
        assert (dm.width, dm.height) == (320, 240)
        assert dm.codec_name == "h264"
        assert abs(dm.fps - 30.0) < 0.1
        assert dm.nb_frames == 48


def test_demux_packets_have_keyframes(clip):
    path, _ = clip
    with tk.Demuxer(path) as dm:
        pkts = [p for p in dm if p.stream == 0]
    assert len(pkts) == 48
    keys = [p.key for p in pkts]
    assert keys[0] and sum(keys) >= 3  # gop 12 over 48 frames
    # annexb start codes after BSF
    assert pkts[0].data[:4] in (b"\x00\x00\x00\x01", b"\x00\x00\x01\x67")
    # with B-frames some packets must be non-reference (smart-skip targets)
    assert any(p.nonref for p in pkts)
    assert not pkts[0].nonref


def test_decode_roundtrip(clip):
    path, frames = clip
    dm = tk.Demuxer(path)
    dec = tk.Decoder.from_demuxer(dm)
    out = []
    for pkt in dm:
        if pkt.stream != 0:
            continue
        out.extend(dec.decode(pkt.data, pkt.pts))
    out.extend(dec.decode(None))
    assert len(out) == len(frames)
    # presentation order: pts ascending
    pts = [f[3] for f in out]
    assert pts == sorted(pts)
    # content close to original (crf 18)
    y0, u0, v0 = frames[0]
    yd = out[0][0]
    assert np.abs(yd.astype(int) - y0.astype(int)).mean() < 4.0
    dm.close(); dec.close()


def test_seek(clip):
    path, _ = clip
    dm = tk.Demuxer(path)
    dm.seek(1.0)  # frame 30 area -> keyframe at/before
    pkt = dm.read()
    assert pkt is not None and pkt.key
    dm.close()


def test_hevc_and_mjpeg_paths(tmp_path):
    w, h = 160, 128
    frames = synth_frames(6, w, h)
    for name, codec in (("libx265", tk.CODEC_HEVC), ("mjpeg", tk.CODEC_MJPEG)):
        enc = tk.Encoder(name, w, h, fps=(30, 1), crf=20.0,
                         still_image=(name == "mjpeg"),
                         opts="x265-params=log-level=0" if name == "libx265" else "")
        pkts = []
        for i, (y, u, v) in enumerate(frames):
            pkts += enc.encode(y, u, v, pts=i)
        pkts += enc.flush()
        assert pkts, name
        dec = tk.Decoder(codec, extradata=enc.extradata(), width=w, height=h)
        got = []
        for p in pkts:
            got.extend(dec.decode(p.data, p.pts))
        got.extend(dec.decode(None))
        assert len(got) == len(frames), name
        y0 = frames[0][0]
        assert np.abs(got[0][0].astype(int) - y0.astype(int)).mean() < 6.0, name
        enc.close(); dec.close()


def test_still_image_mode_all_keyframes(tmp_path):
    w, h = 160, 128
    frames = synth_frames(4, w, h)
    enc = tk.Encoder("libx264", w, h, still_image=True, crf=18.0)
    pkts = []
    for i, (y, u, v) in enumerate(frames):
        pkts += enc.encode(y, u, v, pts=i)
    pkts += enc.flush()
    assert len(pkts) == 4 and all(p.key for p in pkts)
    enc.close()


def test_10bit_encode_decode_roundtrip():
    w, h = 160, 128
    rng = np.random.default_rng(3)
    y = (np.add.outer(np.linspace(64, 900, h), np.linspace(0, 80, w))
         ).astype(np.uint16)
    u = np.full((h // 2, w // 2), 400, np.uint16)
    v = np.full((h // 2, w // 2), 620, np.uint16)
    enc = tk.Encoder("libx265", w, h, crf=12.0, still_image=True, bits=10,
                     opts="x265-params=log-level=0")
    pkts = enc.encode(y, u, v, pts=0) + enc.flush()
    extra = enc.extradata()
    enc.close()
    assert pkts
    dec = tk.Decoder(tk.CODEC_HEVC, extradata=extra, width=w, height=h)
    frames = []
    for p in pkts:
        frames += list(dec.decode16(p.data, p.pts))
    frames += list(dec.decode16(None))
    dec.close()
    assert len(frames) == 1
    yd = frames[0][0]
    assert yd.dtype == np.uint16 and yd.max() > 255   # true 10-bit content
    assert np.abs(yd.astype(int) - y.astype(int)).mean() < 12.0


def test_encoder_reconfigure(tmp_path):
    w, h = 160, 128
    enc = tk.Encoder("libx264", w, h, fps=(30, 1), bitrate=500_000,
                     preset="ultrafast", gop=30)
    y = np.full((h, w), 100, np.uint8)
    u = np.full((h // 2, w // 2), 110, np.uint8)
    v = np.full((h // 2, w // 2), 140, np.uint8)
    pkts = []
    for i in range(5):
        pkts += enc.encode(y, u, v, pts=i)
    pkts += enc.flush()
    enc.reconfigure(bitrate=100_000)
    pkts2 = []
    for i in range(5, 10):
        pkts2 += enc.encode(y, u, v, pts=i)
    pkts2 += enc.flush()
    assert pkts and pkts2
    assert pkts2[0].key    # reconfigure forces an IDR
    enc.close()


def test_dynamic_resolution_change():
    """M1 parity: NvDecLite handles mid-stream resolution changes
    (NvDecLite.cpp:97-106); our decoder re-probes and emits native dims."""
    def enc_frames(w, h, n, base):
        e = tk.Encoder("libx264", w, h, fps=(30, 1), gop=5, crf=20.0)
        pk = []
        for i in range(n):
            y = np.full((h, w), base + i * 5, np.uint8)
            u = np.full((h // 2, w // 2), 110, np.uint8)
            v = np.full((h // 2, w // 2), 140, np.uint8)
            pk += e.encode(y, u, v, pts=i)
        pk += e.flush()
        data = [p.data for p in pk]
        data[0] = e.extradata() + data[0]   # in-band SPS for the splice
        e.close()
        return data

    d1 = enc_frames(320, 240, 6, 50)
    d2 = enc_frames(160, 120, 6, 150)
    dec = tk.Decoder(tk.CODEC_H264, width=320, height=240)
    out = []
    for d in d1 + d2:
        out += list(dec.decode(d, -1))
    out += list(dec.decode(None))
    dec.close()
    assert len(out) == 12
    shapes = {f[0].shape for f in out}
    assert shapes == {(240, 320), (120, 160)}
    assert out[-1][0].mean() > 140      # second segment's content


def test_mkv_container(tmp_path):
    """Container coverage beyond mp4 (avformat guesses from extension)."""
    w, h = 160, 128
    frames = synth_frames(5, w, h)
    enc = tk.Encoder("libx264", w, h, crf=22.0)
    pkts = []
    for i, (y, u, v) in enumerate(frames):
        pkts += enc.encode(y, u, v, pts=i)
    pkts += enc.flush()
    path = str(tmp_path / "c.mkv")
    mux = tk.Muxer(path, w, h, (30, 1), tk.CODEC_H264, enc.extradata())
    for p in pkts:
        mux.write(p)
    mux.close(); enc.close()
    dm = tk.Demuxer(path)
    assert dm.codec_name == "h264"
    assert sum(1 for p in dm if p.stream == 0) == 5
    dm.close()


def test_roi_encode_improves_region_quality(tmp_path):
    """ROI/QP-map lane (AppNvEnc qpDeltaMap analog): at equal bitrate the
    ROI rect must come back measurably cleaner than the same rect without
    ROI, and the non-ROI area must pay for it."""
    import jax.numpy as jnp
    from gmat_tpu.ops.metrics import psnr

    rng = np.random.default_rng(3)
    w, h = 320, 240
    n = 60
    # detailed content everywhere so rate control has something to trade
    frames = []
    yy, xx = np.mgrid[0:h, 0:w]
    for i in range(n):
        base = (yy * 3 + xx * 5 + i * 7) % 220
        noise = rng.integers(0, 36, (h, w))
        frames.append(np.clip(base + noise, 0, 255).astype(np.uint8))
    u = np.full((h // 2, w // 2), 110, np.uint8)
    v = np.full((h // 2, w // 2), 140, np.uint8)
    t, b, l, r_ = 96, 160, 128, 192   # 64x64 ROI rect

    def run(regions):
        enc = tk.Encoder("libx264", w, h, fps=(30, 1), bitrate=150_000,
                         gop=30, preset="veryfast",
                         opts="maxrate=150000,bufsize=150000")
        pkts = []
        for i, y in enumerate(frames):
            pkts += enc.encode(y, u, v, pts=i, roi=regions)
        pkts += enc.flush()
        extra = enc.extradata()
        enc.close()
        dec = tk.Decoder(tk.CODEC_H264, extra)
        out = []
        for p in pkts:
            out += [f[0] for f in dec.decode(p.data)]
        out += [f[0] for f in dec.decode(None)]
        dec.close()
        return np.stack(out[:n]), sum(len(p.data) for p in pkts)

    plain, bytes_plain = run(None)
    boosted, bytes_boost = run([(t, b, l, r_, -0.6)])
    src = np.stack(frames)

    inside = (slice(None), slice(t, b), slice(l, r_))
    p_roi_plain = float(jnp.mean(psnr(jnp.asarray(src[inside]),
                                      jnp.asarray(plain[inside]))))
    p_roi_boost = float(jnp.mean(psnr(jnp.asarray(src[inside]),
                                      jnp.asarray(boosted[inside]))))
    outside = np.ones((h, w), bool)
    outside[t:b, l:r_] = False
    p_out_plain = float(jnp.mean(psnr(
        jnp.asarray(src[:, outside]), jnp.asarray(plain[:, outside]))))
    p_out_boost = float(jnp.mean(psnr(
        jnp.asarray(src[:, outside]), jnp.asarray(boosted[:, outside]))))
    # ROI rect gains at least 1.5 dB; the rest loses (bits reallocated);
    # VBV holds the stream near the same size
    assert p_roi_boost > p_roi_plain + 1.5, (p_roi_plain, p_roi_boost)
    assert p_out_boost < p_out_plain, (p_out_plain, p_out_boost)
    assert bytes_boost < bytes_plain * 1.35, (bytes_plain, bytes_boost)


def test_decoder_side_crop_and_resize(tmp_path):
    """NvDecLite pCropRect/pResizeDim analog: crop + early downscale on the
    host, before any H2D."""
    w, h = 128, 96
    enc = tk.Encoder("libx264", w, h, fps=(30, 1), gop=10, crf=10.0,
                     preset="veryfast")
    # quadrant luma pattern: TL=50, TR=100, BL=150, BR=200
    y = np.zeros((h, w), np.uint8)
    y[:h // 2, :w // 2] = 50
    y[:h // 2, w // 2:] = 100
    y[h // 2:, :w // 2] = 150
    y[h // 2:, w // 2:] = 200
    u = np.full((h // 2, w // 2), 128, np.uint8)
    v = np.full((h // 2, w // 2), 128, np.uint8)
    pkts = []
    for i in range(5):
        pkts += enc.encode(y, u, v, pts=i)
    pkts += enc.flush()
    extra = enc.extradata()
    enc.close()

    # crop the top-left quadrant, no resize -> 64x48 frames of ~50 luma
    dec = tk.Decoder(tk.CODEC_H264, extra, crop=(0, 0, w // 2, h // 2))
    frames = []
    for p in pkts:
        frames += list(dec.decode(p.data))
    frames += list(dec.decode(None))
    dec.close()
    fy = frames[0][0]
    assert fy.shape == (h // 2, w // 2)
    assert abs(float(fy.mean()) - 50) < 4

    # crop bottom-right + resize to 32x24
    dec = tk.Decoder(tk.CODEC_H264, extra,
                     crop=(w // 2, h // 2, w // 2, h // 2), resize=(32, 24))
    frames = []
    for p in pkts:
        frames += list(dec.decode(p.data))
    frames += list(dec.decode(None))
    dec.close()
    fy = frames[0][0]
    assert fy.shape == (24, 32)
    assert abs(float(fy.mean()) - 200) < 6

    # resize-only early downscale: whole frame to quarter size
    dec = tk.Decoder(tk.CODEC_H264, extra, resize=(w // 2, h // 2))
    frames = []
    for p in pkts:
        frames += list(dec.decode(p.data))
    frames += list(dec.decode(None))
    dec.close()
    fy = frames[0][0]
    assert fy.shape == (h // 2, w // 2)
    # all four quadrants survive at half scale
    assert abs(float(fy[:h // 4, :w // 4].mean()) - 50) < 4
    assert abs(float(fy[h // 4:, w // 4:].mean()) - 200) < 6


def test_decode_stream_resize(tmp_path):
    from gmat_tpu.av.ingest import decode_stream
    from .test_extractor import make_clip
    clip = str(tmp_path / "r.mp4")
    make_clip(clip)
    got = 0
    for fb, pts, valid in decode_stream(clip, batch=16, resize=(160, 90)):
        assert fb.width == 160 and fb.height == 90
        assert fb.planes["y"].shape[1:] == (90, 160)
        got += int(valid)
    assert got == 60


def test_decoder_crop_10bit_and_unsupported(tmp_path):
    """Crop must work on 10-bit planar frames and fail loudly (not
    silently scale the whole frame) when the rect is out of bounds."""
    w, h = 128, 96
    y = np.zeros((h, w), np.uint16)
    y[:h // 2, :w // 2] = 200
    y[h // 2:, w // 2:] = 800
    u = np.full((h // 2, w // 2), 512, np.uint16)
    v = np.full((h // 2, w // 2), 512, np.uint16)
    enc = tk.Encoder("libx265", w, h, crf=8.0, still_image=True, bits=10,
                     opts="x265-params=log-level=0")
    pkts = enc.encode(y, u, v, pts=0) + enc.flush()
    extra = enc.extradata()
    enc.close()
    dec = tk.Decoder(tk.CODEC_HEVC, extra, crop=(0, 0, w // 2, h // 2))
    frames = []
    for p in pkts:
        frames += list(dec.decode16(p.data))
    frames += list(dec.decode16(None))
    dec.close()
    fy = frames[0][0]
    assert fy.shape == (h // 2, w // 2)
    assert abs(float(fy.mean()) - 200) < 20     # top-left quadrant only

    # out-of-bounds crop: loud IOError, not silent whole-frame scale
    dec = tk.Decoder(tk.CODEC_HEVC, extra, crop=(100, 0, 64, 48))
    with pytest.raises(IOError):
        for p in pkts:
            list(dec.decode16(p.data))
        list(dec.decode16(None))
    dec.close()


def test_decoder_resize_10bit(tmp_path):
    """receive16 must honor fixed resize geometry (no silent re-probe)."""
    w, h = 128, 96
    y = (np.add.outer(np.linspace(64, 900, h), np.linspace(0, 80, w))
         ).astype(np.uint16)
    u = np.full((h // 2, w // 2), 400, np.uint16)
    v = np.full((h // 2, w // 2), 620, np.uint16)
    enc = tk.Encoder("libx265", w, h, crf=12.0, still_image=True, bits=10,
                     opts="x265-params=log-level=0")
    pkts = enc.encode(y, u, v, pts=0) + enc.flush()
    extra = enc.extradata()
    enc.close()
    dec = tk.Decoder(tk.CODEC_HEVC, extra, resize=(64, 48))
    frames = []
    for p in pkts:
        frames += list(dec.decode16(p.data))
    frames += list(dec.decode16(None))
    dec.close()
    assert frames and frames[0][0].shape == (48, 64)
    assert frames[0][0].dtype == np.uint16


def _write_rgba_png(path, rgba):
    """Minimal RGBA PNG writer (pure python; test fixture only)."""
    import struct
    import zlib
    h, w = rgba.shape[:2]

    def chunk(typ, data):
        c = typ + data
        return struct.pack(">I", len(data)) + c + \
            struct.pack(">I", zlib.crc32(c) & 0xFFFFFFFF)

    raw = b"".join(b"\x00" + rgba[r].tobytes() for r in range(h))
    png = (b"\x89PNG\r\n\x1a\n" +
           chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0)) +
           chunk(b"IDAT", zlib.compress(raw)) +
           chunk(b"IEND", b""))
    with open(path, "wb") as f:
        f.write(png)


def test_wide_codec_decode_mpeg2():
    """Any-libavcodec decode via raw AVCodecID (the NvDecLite codec-map
    analog: mpeg1/2/4, vc1, vp8/9, av1...)."""
    w, h = 160, 128
    frames = synth_frames(6, w, h)
    enc = tk.Encoder("mpeg2video", w, h, fps=(25, 1), bitrate=800_000)
    pkts = []
    for i, (y, u, v) in enumerate(frames):
        pkts += enc.encode(y, u, v, pts=i)
    pkts += enc.flush()
    enc.close()
    assert pkts
    dec = tk.Decoder(codec_id=tk.codec_id("mpeg2video"), width=w, height=h)
    got = []
    for p in pkts:
        got += list(dec.decode(p.data))
    got += list(dec.decode(None))
    dec.close()
    assert len(got) == len(frames)
    assert np.abs(got[0][0].astype(int) -
                  frames[0][0].astype(int)).mean() < 8.0


def test_decode_alpha_png_and_opaque(tmp_path):
    """decode_alpha: real alpha from PNG; opaque (255) for alpha-less."""
    rng = np.random.default_rng(2)
    w, h = 64, 48
    rgba = rng.integers(0, 256, (h, w, 4)).astype(np.uint8)
    rgba[:, : w // 2, 3] = 255          # left opaque
    rgba[:, w // 2:, 3] = 0             # right transparent
    p = str(tmp_path / "a.png")
    _write_rgba_png(p, rgba)
    dec = tk.Decoder(codec_id=tk.codec_id("png"))
    frames = list(dec.decode_alpha(open(p, "rb").read())) + \
        list(dec.decode_alpha(None))
    dec.close()
    assert len(frames) == 1
    y, u, v, a, _ = frames[0]
    assert a.shape == (h, w)
    assert (a[:, : w // 4] > 250).all() and (a[:, 3 * w // 4:] < 5).all()


def test_beyond_enum_mux_demux_decode_roundtrip(tmp_path):
    """Full pipeline for a codec outside the h264/hevc/mjpeg enum:
    mpeg2video encode -> Muxer(codec_id=...) .ts -> decode_stream."""
    from gmat_tpu.av.ingest import decode_stream
    w, h = 160, 128
    frames = synth_frames(10, w, h)
    enc = tk.Encoder("mpeg2video", w, h, fps=(25, 1), bitrate=1_000_000,
                     gop=5)
    pkts = []
    for i, (y, u, v) in enumerate(frames):
        pkts += enc.encode(y, u, v, pts=i)
    pkts += enc.flush()
    path = str(tmp_path / "m2.ts")
    mux = tk.Muxer(path, w, h, (25, 1),
                   codec_id=tk.codec_id("mpeg2video"),
                   extradata=enc.extradata())
    for p in pkts:
        mux.write(p)
    mux.close()
    enc.close()
    dm = tk.Demuxer(path)
    assert dm.codec_name == "other"
    assert dm.codec_id == tk.codec_id("mpeg2video")
    dm.close()
    got = 0
    for fb, pts, valid in decode_stream(path, batch=8):
        assert fb.width == w and fb.height == h
        got += int(valid)
    assert got == len(frames)


def test_vp9_webm_roundtrip(tmp_path):
    """VP9 end-to-end (the NVDEC codec map includes VP9): libvpx encode ->
    .webm -> demux (raw id) -> decode_stream."""
    from gmat_tpu.av.ingest import decode_stream
    w, h = 160, 128
    frames = synth_frames(8, w, h)
    enc = tk.Encoder("libvpx-vp9", w, h, fps=(30, 1), bitrate=500_000,
                     opts="deadline=realtime,cpu-used=8")
    pkts = []
    for i, (y, u, v) in enumerate(frames):
        pkts += enc.encode(y, u, v, pts=i)
    pkts += enc.flush()
    path = str(tmp_path / "v.webm")
    mux = tk.Muxer(path, w, h, (30, 1), codec_id=tk.codec_id("vp9"))
    for p in pkts:
        mux.write(p)
    mux.close()
    enc.close()
    got = []
    for fb, pts, valid in decode_stream(path, batch=8):
        ys = np.asarray(fb.planes["y"])
        got += [ys[i] for i in range(valid)]
    assert len(got) == len(frames)
    assert np.abs(got[0].astype(int) -
                  frames[0][0].astype(int)).mean() < 6.0


def test_keep_avcc_remux_roundtrip(clip, tmp_path):
    """bKeepAvcc parity (Demuxer.h:58): with keep_avcc the packets stay in
    container format (no annexb start codes), and a stream-copy remux into
    mp4 produces a decodable file with the same frame count (AppMux.cpp
    Remux(): 'We have to keep AVCC format here')."""
    path, frames = clip

    with tk.Demuxer(path) as dm_bsf, tk.Demuxer(path, keep_avcc=True) as dm:
        p_annexb = next(p for p in dm_bsf if p.stream == 0)
        p_avcc = next(p for p in dm if p.stream == 0)
        assert p_annexb.data[:4] in (b"\x00\x00\x00\x01", b"\x00\x00\x01")
        # avcc packets are length-prefixed, not start-code-prefixed
        assert p_avcc.data[:4] not in (b"\x00\x00\x00\x01",)
        assert p_avcc.data[:3] != b"\x00\x00\x01"

    out = str(tmp_path / "remux.mp4")
    with tk.Demuxer(path, keep_avcc=True) as dm:
        tbn, tbd = dm.time_base
        mx = tk.Muxer(out, dm.width, dm.height, (tbd, tbn), tk.CODEC_H264,
                      dm.extradata())
        n_in = 0
        for p in dm:
            if p.stream == 0:
                mx.write(p)
                n_in += 1
        mx.close()

    with tk.Demuxer(out) as dm2:
        dec = tk.Decoder.from_demuxer(dm2)
        n_out = 0
        for p in dm2:
            if p.stream == 0:
                n_out += sum(1 for _ in dec.decode(p.data, p.pts))
        n_out += sum(1 for _ in dec.decode(None))
        dec.close()
    assert n_in == len(frames) and n_out == len(frames)


def test_keep_avcc_direct_decode(clip):
    """A Decoder built from a keep_avcc demuxer decodes the AVCC
    length-prefixed packets directly (the decoder is handed the avcC
    config instead of assuming annexb)."""
    path, frames = clip
    with tk.Demuxer(path, keep_avcc=True) as dm:
        dec = tk.Decoder.from_demuxer(dm)
        n = 0
        for p in dm:
            if p.stream == 0:
                # nonref analysis is undefined on AVCC payloads: must be
                # conservative (never claims skippable)
                assert not p.nonref
                n += sum(1 for _ in dec.decode(p.data, p.pts))
        n += sum(1 for _ in dec.decode(None))
        dec.close()
    assert n == len(frames)


def test_dynamic_resolution_no_transition_rescale():
    """Every frame must come out at ITS OWN native dims — the transition
    frame after a mid-stream SPS change used to be silently sws-rescaled
    into the stale geometry (fixed via gav_dec_peek_dims)."""
    def enc_frames(w, h, n, base):
        e = tk.Encoder("libx264", w, h, fps=(30, 1), gop=5, crf=16.0)
        pk = []
        for i in range(n):
            y = np.full((h, w), base + i * 5, np.uint8)
            u = np.full((h // 2, w // 2), 110, np.uint8)
            v = np.full((h // 2, w // 2), 140, np.uint8)
            pk += e.encode(y, u, v, pts=i)
        pk += e.flush()
        data = [p.data for p in pk]
        data[0] = e.extradata() + data[0]
        e.close()
        return data

    d1 = enc_frames(320, 240, 5, 40)
    d2 = enc_frames(160, 120, 5, 150)
    dec = tk.Decoder(tk.CODEC_H264, width=320, height=240)
    out = []
    for d in d1 + d2:
        out += list(dec.decode(d, -1))
    out += list(dec.decode(None))
    dec.close()
    assert len(out) == 10
    for (y, u, v, _p) in out:
        base = float(np.median(y))
        want = (240, 320) if base < 100 else (120, 160)
        assert y.shape == want, (base, y.shape)
        assert u.shape == (want[0] // 2, want[1] // 2)


def test_decoder_fast_path_odd_width_chroma():
    """Review fix: the I420 fast path must use the ceil chroma stride
    for odd dims — a floor stride shears every chroma row (caller
    buffers follow the documented ceil convention)."""
    import numpy as np
    from gmat_tpu.av import jpeg_tpu
    from gmat_tpu.core.frame import from_numpy_yuv420
    h, w = 75, 99
    rng = np.random.default_rng(2)
    y = rng.integers(16, 236, (1, h, w)).astype(np.uint8)
    u = np.tile(np.arange(49, dtype=np.uint8)[None, None, :] * 5,
                (1, 37, 1))
    v = 255 - u
    blob = jpeg_tpu.encode_batch(from_numpy_yuv420(y, u, v), 95)[0]
    dec = tk.Decoder(tk.CODEC_MJPEG)
    frames = list(dec.decode(blob, 0)) + list(dec.decode(None))
    dec.close()
    yd, ud, vd, _ = frames[0]
    assert ud.shape == (37, 49)    # floor view over ceil-stride buffers
    # independent decoders agree within a few code values EVERYWHERE —
    # a sheared chroma plane diverges by >100 on this gradient
    ours = jpeg_tpu.decode_batch([blob])
    du = np.abs(ud.astype(int)
                - np.asarray(ours.planes["u"])[0].astype(int))
    assert du.max() <= 8, du.max()


def test_decode16_preserves_full_range():
    """Review fix: the 10-bit receive path propagates full-range
    sources (was only fixed for the 8-bit path) — a full-range mjpeg
    ramp must span ~0..1020 after decode16, not compress to 64..940."""
    import numpy as np
    from gmat_tpu.av import jpeg_tpu
    from gmat_tpu.core.frame import FrameBatch
    y = np.tile(np.linspace(0, 255, 64, dtype=np.uint8), (64, 1))
    blob = jpeg_tpu.encode_batch(
        FrameBatch({"y": y[None]}, "gray8", 64, 64, "bt601"), 95)[0]
    dec = tk.Decoder(tk.CODEC_MJPEG, width=64, height=64)
    frames = list(dec.decode16(blob, 0)) + list(dec.decode16(None))
    dec.close()
    y16 = frames[0][0]
    assert y16.dtype == np.uint16
    assert int(y16.min()) <= 32 and int(y16.max()) >= 988, \
        (int(y16.min()), int(y16.max()))


def test_demuxer_start_time_and_media_seek(tmp_path):
    """Review fix: Demuxer.seek targets MEDIA time (start offset
    compensated) and decode_stream's pre-roll filter uses the same
    origin — a pts start offset must not break seeking."""
    import numpy as np
    path = str(tmp_path / "off.mp4")
    enc = tk.Encoder("libx264", 96, 64, fps=(30, 1), gop=10,
                     preset="ultrafast", crf=18.0)
    pkts = []
    for i in range(30):
        y = np.full((64, 96), 20 + 7 * i, np.uint8)
        u = np.full((32, 48), 110, np.uint8)
        v = np.full((32, 48), 140, np.uint8)
        pkts += enc.encode(y, u, v, pts=i)
    pkts += enc.flush()
    mux = tk.Muxer(path, 96, 64, (30, 1), tk.CODEC_H264, enc.extradata())
    for p in pkts:
        mux.write(tk.Packet(p.data, p.pts + 150, p.dts + 150, p.key,
                            False, 0))   # 5-second pts start offset
    mux.close(); enc.close()
    dm = tk.Demuxer(path)
    assert abs(dm.start_time - 5.0) < 0.1
    dm.close()
    from gmat_tpu.av.ingest import decode_stream
    q = decode_stream(path, batch=8, seek=0.5)
    got = []
    for fb, pts, valid in q:
        got.extend(int(np.asarray(fb.planes["y"])[i, 0, 0])
                   for i in range(valid))
    assert got, "seek produced no frames"
    # first emitted frame is at/after MEDIA time 0.5s (frame ~15)
    assert got[0] >= 20 + 7 * 14, got[:3]
    assert len(got) <= 17
