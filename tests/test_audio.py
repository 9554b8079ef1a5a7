"""Audio decode/encode/mux round-trip tests."""
import numpy as np
import pytest

from gmat_tpu.av import toolkit as tk


def sine(rate=48000, channels=2, seconds=1.0, freq=440.0):
    t = np.arange(int(rate * seconds)) / rate
    s = (np.sin(2 * np.pi * freq * t) * 12000).astype(np.int16)
    return np.stack([s] * channels, axis=1)


def test_audio_encode_decode_roundtrip():
    samples = sine()
    enc = tk.AudioEncoder("aac", 48000, 2, 128000)
    pkts = enc.encode(samples)
    pkts += enc.flush()
    assert pkts and sum(len(p.data) for p in pkts) > 1000
    extra = enc.extradata()
    codec_id = enc.codec_id
    enc.close()

    class FakeInfo:
        pass
    info = FakeInfo()
    info.codec_id, info.extradata = codec_id, extra
    dec = tk.AudioDecoder(info)
    out = []
    for p in pkts:
        for (chunk, pts) in dec.decode(p.data, p.pts):
            out.append(chunk)
    for (chunk, pts) in dec.decode(None):
        out.append(chunk)
    dec.close()
    got = np.concatenate(out)
    # AAC adds priming delay; total length within 10%
    assert abs(got.shape[0] - samples.shape[0]) < 0.1 * samples.shape[0]
    # energy should be comparable (lossy)
    assert got.astype(np.float64).std() > samples.std() * 0.5


def test_av_mux_with_audio(tmp_path):
    from .test_extractor import make_clip  # noqa: F401  (reuse video helper)
    w, h, nframes = 160, 128, 30
    venc = tk.Encoder("libx264", w, h, fps=(30, 1), crf=25.0,
                      preset="ultrafast")
    vpkts = []
    for i in range(nframes):
        y = np.full((h, w), 60 + i * 4, np.uint8)
        u = np.full((h // 2, w // 2), 110, np.uint8)
        v = np.full((h // 2, w // 2), 140, np.uint8)
        vpkts += venc.encode(y, u, v, pts=i)
    vpkts += venc.flush()
    aenc = tk.AudioEncoder("aac", 48000, 2)
    apkts = aenc.encode(sine())
    apkts += aenc.flush()

    path = str(tmp_path / "av.mp4")
    mux = tk.AvMuxer(path, w, h, (30, 1), tk.CODEC_H264, venc.extradata(),
                     aenc.codec_id, 48000, 2, aenc.extradata())
    for p in vpkts:
        mux.write_video(p)
    for p in apkts:
        mux.write_audio(p)
    mux.close()
    venc.close(); aenc.close()

    dm = tk.Demuxer(path)
    info = tk.AudioInfo(dm)
    assert info.present and info.sample_rate == 48000 and info.channels == 2
    vid = sum(1 for p in dm if p.stream == 0)
    assert vid == nframes
    dm.close()


def test_demux_decode_audio_from_file(tmp_path):
    # build an A/V file, then demux+decode the audio lane back
    w, h = 160, 128
    venc = tk.Encoder("libx264", w, h, fps=(30, 1), crf=25.0)
    y = np.full((h, w), 100, np.uint8)
    u = np.full((h // 2, w // 2), 110, np.uint8)
    v = np.full((h // 2, w // 2), 140, np.uint8)
    vpkts = []
    for i in range(10):
        vpkts += venc.encode(y, u, v, pts=i)
    vpkts += venc.flush()
    aenc = tk.AudioEncoder("aac", 44100, 1)
    apkts = aenc.encode(sine(44100, 1, 0.5)) + aenc.flush()
    path = str(tmp_path / "a.mp4")
    mux = tk.AvMuxer(path, w, h, (30, 1), tk.CODEC_H264, venc.extradata(),
                     aenc.codec_id, 44100, 1, aenc.extradata())
    for p in vpkts:
        mux.write_video(p)
    for p in apkts:
        mux.write_audio(p)
    mux.close(); venc.close(); aenc.close()

    dm = tk.Demuxer(path)
    info = tk.AudioInfo(dm)
    dec = tk.AudioDecoder(info)
    total = 0
    for pkt in dm:
        if pkt.stream == 1:
            for (chunk, pts) in dec.decode(pkt.data, pkt.pts):
                total += chunk.shape[0]
    for (chunk, pts) in dec.decode(None):
        total += chunk.shape[0]
    assert total > 0.4 * 44100 * 0.5
    dm.close(); dec.close()


def make_av_clip(path, nframes=30, w=160, h=128, gop=0):
    venc = tk.Encoder("libx264", w, h, fps=(30, 1), crf=25.0,
                      preset="ultrafast", gop=gop)
    vpkts = []
    for i in range(nframes):
        y = np.full((h, w), 60 + i * 4 % 150, np.uint8)
        u = np.full((h // 2, w // 2), 110, np.uint8)
        v = np.full((h // 2, w // 2), 140, np.uint8)
        vpkts += venc.encode(y, u, v, pts=i)
    vpkts += venc.flush()
    aenc = tk.AudioEncoder("aac", 48000, 2)
    apkts = aenc.encode(sine(seconds=nframes / 30.0)) + aenc.flush()
    mux = tk.AvMuxer(path, w, h, (30, 1), tk.CODEC_H264, venc.extradata(),
                     aenc.codec_id, 48000, 2, aenc.extradata())
    for p in vpkts:
        mux.write_video(p)
    for p in apkts:
        mux.write_audio(p)
    mux.close(); venc.close(); aenc.close()


def test_metrans_with_audio(tmp_path):
    from gmat_tpu.apps.metrans import Options, Rung, run_session
    clip = str(tmp_path / "av_in.mp4")
    make_av_clip(clip)
    opts = Options(input_file=clip, audio_codec="aac", audio_bitrate=96000,
                   rungs=[Rung(96, 64, out_file=str(tmp_path / "o_#.mp4"))],
                   video_enc_param="codec=h264:preset=p1:constqp=28")
    res = run_session(0, opts, batch=8)
    assert res["frames_out"] == 30
    dm = tk.Demuxer(str(tmp_path / "o_0.mp4"))
    info = tk.AudioInfo(dm)
    assert info.present and info.sample_rate == 48000
    npkts = sum(1 for p in dm if p.stream == 1)
    assert npkts > 10
    dm.close()


def test_cli_with_audio(tmp_path):
    from gmat_tpu.apps.cli import main
    clip = str(tmp_path / "av_in2.mp4")
    make_av_clip(clip)
    out = str(tmp_path / "out_av.mp4")
    rc = main(["-i", clip, "-vf", "scale=96:64", "-o", out,
               "-c:a", "aac", "-crf", "25", "-batch", "8"])
    assert rc == 0
    dm = tk.Demuxer(out)
    assert tk.AudioInfo(dm).present
    dm.close()


def test_atempo_and_resample():
    from gmat_tpu.av.audio_filters import apply_audio_filters, atempo
    s = sine(48000, 2, 1.0)
    fast = atempo(s, 48000, 1.5)
    assert abs(fast.shape[0] - 48000 / 1.5) < 48000 * 0.1
    slow = atempo(s, 48000, 0.7)
    assert abs(slow.shape[0] - 48000 / 0.7) < 48000 * 0.1
    # dominant frequency preserved (pitch unchanged)
    def peak_freq(x):
        n = x.shape[0]
        sp = np.abs(np.fft.rfft(x[:, 0].astype(np.float64)))
        k = np.argmax(sp[5:]) + 5
        return k * 48000.0 / n
    assert abs(peak_freq(fast) - 440) < 80
    out, rate = apply_audio_filters(s, 48000, "atempo=1.25,volume=0.5")
    assert rate == 48000
    assert out.std() < s.std()
    out2, rate2 = apply_audio_filters(s, 48000, "aresample=24000")
    assert rate2 == 24000 and abs(out2.shape[0] - 24000) < 100
    with pytest.raises(ValueError):
        apply_audio_filters(s, 48000, "bogus=1")
    with pytest.raises(ValueError):
        atempo(s, 48000, 3.0)


def test_metrans_audio_filter(tmp_path):
    from gmat_tpu.apps.metrans import Options, Rung, run_session
    clip = str(tmp_path / "afin.mp4")
    make_av_clip(clip)
    opts = Options(input_file=clip, audio_codec="aac",
                   audio_filter_desc="atempo=0.7143",
                   rungs=[Rung(96, 64, out_file=str(tmp_path / "af_#.mp4"))],
                   video_enc_param="codec=h264:preset=p1:constqp=28")
    run_session(0, opts, batch=8)
    dm = tk.Demuxer(str(tmp_path / "af_0.mp4"))
    assert tk.AudioInfo(dm).present
    dm.close()


def test_atempo_stream_equals_oneshot():
    """Chunked AtempoStream must produce exactly the one-shot result."""
    from gmat_tpu.av.audio_filters import AtempoStream, atempo
    rng = np.random.default_rng(5)
    rate = 16000
    t = np.arange(rate * 2) / rate
    sig = (np.sin(2 * np.pi * 440 * t) * 8000 +
           rng.normal(0, 300, len(t))).astype(np.int16)
    x = np.stack([sig, sig // 2], axis=1)
    want = atempo(x, rate, 1.3)
    for chunk in (777, 4096, len(x)):
        st = AtempoStream(rate, 1.3)
        outs = []
        for s in range(0, len(x), chunk):
            o = st.push(x[s:s + chunk])
            if o.size:
                outs.append(o)
        o = st.flush()
        if o.size:
            outs.append(o)
        got = np.concatenate(outs)
        np.testing.assert_array_equal(got, want, err_msg=f"chunk={chunk}")


def test_aresample_stream_matches_oneshot():
    from gmat_tpu.av.audio_filters import AresampleStream, aresample
    rng = np.random.default_rng(6)
    rate, out_rate = 48000, 44100
    x = rng.integers(-2000, 2000, (48000, 2)).astype(np.int16)
    st0 = AresampleStream(rate, out_rate)
    st0._swr_failed = True
    parts = [q for q in (st0.push(x), st0.flush()) if q.size]
    want_len = np.concatenate(parts)
    st = AresampleStream(rate, out_rate)
    st._swr_failed = True      # pin the linear FALLBACK lane
    outs = []
    for s in range(0, len(x), 1000):
        o = st.push(x[s:s + 1000])
        if o.size:
            outs.append(o)
    o = st.flush()
    if o.size:
        outs.append(o)
    got = np.concatenate(outs)
    # ~same output length as the one-shot (different but equivalent
    # uniform grids: k*rate/out vs linspace(0, n-1))
    assert abs(len(got) - len(want_len)) <= 2
    # exact check against direct interpolation on the stream's own grid
    src = np.arange(len(got)) * (rate / out_rate)
    i0 = np.floor(src).astype(int)
    i1 = np.minimum(i0 + 1, len(x) - 1)
    f = (src - i0)[:, None].astype(np.float32)
    want = np.clip(x[i0].astype(np.float32) * (1 - f) +
                   x[i1].astype(np.float32) * f, -32768, 32767).astype(np.int16)
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_audio_filter_stream_chain():
    """Full chunked chain (volume+atempo+aresample) ~ one-shot chain."""
    from gmat_tpu.av.audio_filters import (AudioFilterStream,
                                           apply_audio_filters)
    rng = np.random.default_rng(7)
    rate = 32000
    t = np.arange(rate) / rate
    sig = (np.sin(2 * np.pi * 220 * t) * 9000).astype(np.int16)
    x = np.stack([sig, sig], axis=1)
    desc = "volume=0.5,atempo=0.8,aresample=16000"
    want, wrate = apply_audio_filters(x, rate, desc)
    st = AudioFilterStream(desc, rate)
    assert st.out_rate == wrate == 16000
    outs = []
    for s in range(0, len(x), 3000):
        o = st.push(x[s:s + 3000])
        if o.size:
            outs.append(o)
    o = st.flush()
    if o.size:
        outs.append(o)
    got = np.concatenate(outs)
    assert abs(len(got) - len(want)) <= 4
    # energy within 5% (WSOLA alignment differs at resample boundary)
    e_got = float(np.mean(got.astype(np.float64) ** 2))
    e_want = float(np.mean(want.astype(np.float64) ** 2))
    assert abs(e_got - e_want) / e_want < 0.05


def test_audio_decode_resampled_drains_tail():
    """Decoding at a different rate must drain the resampler's internal
    delay at EOF (the tail was silently truncated otherwise)."""
    samples = sine()
    enc = tk.AudioEncoder("aac", 48000, 2, 128000)
    pkts = enc.encode(samples) + enc.flush()
    extra, codec_id = enc.extradata(), enc.codec_id
    enc.close()

    class FakeInfo:
        pass
    info = FakeInfo()
    info.codec_id, info.extradata = codec_id, extra
    dec = tk.AudioDecoder(info, sample_rate=44100)
    out = []
    for p in pkts:
        out += [c for c, _ in dec.decode(p.data, p.pts)]
    out += [c for c, _ in dec.decode(None)]
    dec.close()
    got = np.concatenate(out)
    want = samples.shape[0] * 44100 / 48000
    assert got.shape[1] == 2
    assert abs(got.shape[0] - want) < 0.1 * want, (got.shape[0], want)


def test_aresample_stream_heavy_downsample():
    """step >= 2 (48k -> 8k): the carry-buffer trim must cap at the
    buffer length or every later chunk misregisters (was 17k-LSB sample
    corruption after the first chunk)."""
    from gmat_tpu.av.audio_filters import AresampleStream
    rng = np.random.default_rng(7)
    rate, out_rate = 48000, 8000
    x = rng.integers(-2000, 2000, (48000, 2)).astype(np.int16)
    st = AresampleStream(rate, out_rate)
    st._swr_failed = True      # pin the linear FALLBACK lane
    outs = []
    for s in range(0, len(x), 1024):
        o = st.push(x[s:s + 1024])
        if o.size:
            outs.append(o)
    o = st.flush()
    if o.size:
        outs.append(o)
    got = np.concatenate(outs)
    assert abs(len(got) - 8000) <= 2
    src = np.arange(len(got)) * (rate / out_rate)
    i0 = np.floor(src).astype(int)
    i1 = np.minimum(i0 + 1, len(x) - 1)
    f = (src - i0)[:, None].astype(np.float32)
    want = np.clip(x[i0].astype(np.float32) * (1 - f) +
                   x[i1].astype(np.float32) * f, -32768, 32767).astype(np.int16)
    np.testing.assert_array_equal(got, want[: len(got)])


# ---- afade (af_afade.c) -----------------------------------------------------

def test_afade_in_tri_oracle():
    from gmat_tpu.av.audio_filters import AfadeStream
    rate = 1000
    blk = np.full((2000, 2), 10000, np.int16)
    st = AfadeStream(rate, type="in", start_sample=500, nb_samples=1000)
    out = st.push(blk)
    # before start: silence... wait, within-window block is gain-ramped;
    # samples 0..499 have index<0 -> gain clipped to 0
    assert np.all(out[:500] == 0)
    # linear ramp across the window (double gain, int16 truncation)
    idx = np.arange(2000) - 500
    g = np.clip(idx / 1000.0, 0, 1)
    exp = (10000.0 * g).astype(np.int16)
    np.testing.assert_array_equal(out[:, 0], exp)
    # past the window in a later block: passthrough (identity object ok)
    out2 = st.push(blk)
    np.testing.assert_array_equal(out2, blk)


def test_afade_out_and_silence_regions():
    from gmat_tpu.av.audio_filters import AfadeStream
    st = AfadeStream(100, type="out", start_time=1.0, duration=0.5)
    a = np.full((80, 1), 1000, np.int16)
    np.testing.assert_array_equal(st.push(a), a)      # cur+n < start
    st.push(np.full((70, 1), 1000, np.int16))         # crosses the window
    tail = st.push(np.full((50, 1), 1000, np.int16))  # past start+range
    assert np.all(tail == 0)


@pytest.mark.parametrize("curve", ["qsin", "hsin", "exp", "log", "par",
                                   "cub", "losi", "sinc", "dese",
                                   "nofade"])
def test_afade_curves_monotone_bounds(curve):
    from gmat_tpu.av.audio_filters import _afade_gain
    g = _afade_gain(curve, np.arange(0, 1001), 1000)
    assert np.all(g >= -1e-12) and np.all(g <= 1 + 1e-12)
    assert abs(g[-1] - 1.0) < 1e-6 or curve == "nofade"
    if curve == "nofade":
        assert np.all(g == 1.0)


def test_afade_chain_and_streaming_equivalence():
    from gmat_tpu.av.audio_filters import (AudioFilterStream,
                                           apply_audio_filters)
    rng = np.random.default_rng(3)
    x = (rng.standard_normal((4000, 2)) * 8000).astype(np.int16)
    desc = "afade=t=in:ss=100:ns=2000:c=qsin,volume=0.5"
    one, _ = apply_audio_filters(x.copy(), 8000, desc)
    st = AudioFilterStream(desc, 8000)
    parts = [st.push(x[i:i + 333].copy()) for i in range(0, 4000, 333)]
    tail = st.flush()
    if tail.size:
        parts.append(tail)
    chunked = np.concatenate([p for p in parts if p.size])
    np.testing.assert_array_equal(one, chunked)


def test_afade_option_parsing_errors():
    from gmat_tpu.av.audio_filters import parse_audio_filters
    chain = parse_audio_filters("afade=in:0:500")
    assert chain[0][1] == {"type": "in", "start_sample": 0,
                           "nb_samples": 500}
    with pytest.raises(ValueError, match="curve"):
        from gmat_tpu.av.audio_filters import AfadeStream
        AfadeStream(100, curve="bogus")
    with pytest.raises(ValueError, match="unknown option"):
        parse_audio_filters("afade=zz=1")


def test_afade_zero_time_options_mean_unset():
    """af_afade config_output uses falsy checks: st=0 / d=0 keep the
    ss/ns values (review r4)."""
    from gmat_tpu.av.audio_filters import AfadeStream
    st = AfadeStream(1000, type="in", start_sample=500, nb_samples=800,
                     start_time=0.0, duration=0.0)
    assert st.start == 500 and st.range == 800


def test_volume_af_volume_parity():
    """af_volume lanes: fixed-point s16 (volume_i=(int)(v*256+0.5),
    (x*vol+128)>>8 clipped), the float default's lrintf rounding, dB
    expression values via av_expr."""
    from gmat_tpu.av.audio_filters import volume, _parse_volume_opts
    import numpy as np
    import pytest
    x = np.array([[-32768, -1], [1, 32767], [100, -100],
                  [1000, -1000]], np.int16)
    # fixed: exact integer math
    got = volume(x, 0, 0.5, precision="fixed")
    vol_i = int(0.5 * 256 + 0.5)
    want = np.clip((x.astype(np.int64) * vol_i + 128) >> 8,
                   -32768, 32767).astype(np.int16)
    np.testing.assert_array_equal(got, want)
    # float (default): rounds half away from trunc — 1 -> 1 at 0.5 gain
    # would truncate to 0; lrintf gives 0.5 -> round-half-even
    got = volume(x, 0, 0.5)
    f32 = np.float32
    want = np.clip(np.rint((x.astype(np.float32) * f32(1 / 32768.0))
                           * f32(0.5) * f32(32768.0)),
                   -32768, 32767).astype(np.int16)
    np.testing.assert_array_equal(got, want)
    # dB values through av_expr
    got_db = volume(x, 0, "-6.0206dB")
    got_lin = volume(x, 0, 10.0 ** (-6.0206 / 20.0))
    np.testing.assert_array_equal(got_db, got_lin)
    # option grammar
    kw = _parse_volume_opts("0.5:precision=fixed")
    assert kw == {"volume": "0.5", "precision": "fixed"}
    kw = _parse_volume_opts("volume=-3dB")
    assert kw == {"volume": "-3dB"}
    for bad in ["0.5:precision=int", "0.5:eval=never", "0.5:nosuch=1"]:
        with pytest.raises(ValueError):
            _parse_volume_opts(bad)


def test_volume_chain_db():
    from gmat_tpu.av.audio_filters import apply_audio_filters, volume
    import numpy as np
    x = (np.arange(-4000, 4000, 8, dtype=np.int16)).reshape(-1, 2)
    y, rate = apply_audio_filters(x, 48000, "volume=-6dB")
    np.testing.assert_array_equal(y, volume(x, 0, "-6dB"))


def test_aresample_swr_primary_lane():
    """The default engine is the REAL libswresample (what af_aresample
    delegates to): chunked == one-shot, length ~ n*out/in, and output
    differs from the linear fallback (a real polyphase kernel)."""
    from gmat_tpu.av.audio_filters import AresampleStream
    rng = np.random.default_rng(8)
    rate, out_rate = 48000, 44100
    x = rng.integers(-9000, 9000, (rate, 2)).astype(np.int16)
    one = AresampleStream(rate, out_rate)
    a = one.push(x); b = one.flush()
    whole = np.concatenate([q for q in (a, b) if q.size])
    assert abs(len(whole) - out_rate) <= 64
    st = AresampleStream(rate, out_rate)
    outs = [st.push(x[i:i + 777]) for i in range(0, len(x), 777)]
    outs.append(st.flush())
    got = np.concatenate([q for q in outs if q.size])
    np.testing.assert_array_equal(got, whole)
    lin = AresampleStream(rate, out_rate)
    lin._swr_failed = True
    la = lin.push(x); lb = lin.flush()
    linear = np.concatenate([q for q in (la, lb) if q.size])
    m = min(len(linear), len(whole))
    assert (whole[:m] != linear[:m]).any()
