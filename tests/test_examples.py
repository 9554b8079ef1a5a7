"""The examples must keep working: they are the M14 sample-parity surface
(metrans/samples/App*.cpp analogs in examples/avtoolkit_demos.py)."""
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))

import avtoolkit_demos as demos  # noqa: E402


@pytest.mark.parametrize("name", list(demos.DEMOS))
def test_avtoolkit_demo(name, tmp_path):
    demos.DEMOS[name](str(tmp_path))


def test_audio_only_mux_roundtrip(tmp_path):
    """Audio-only Muxer/Demuxer forms (reference Muxer.h:51-90 NULL-video
    ctor; Demuxer(path, false, true))."""
    import numpy as np
    from gmat_tpu.av import toolkit as tk

    out = str(tmp_path / "tone.m4a")
    aenc = tk.AudioEncoder("aac", 48000, 2, 96000)
    t = np.arange(48000) / 48000.0
    sig = (np.sin(2 * np.pi * 330 * t) * 9000).astype(np.int16)
    samples = np.stack([sig, sig], 1)
    pkts = aenc.encode(samples) + aenc.flush()
    with tk.AudioMuxer(out, aenc.codec_id, 48000, 2,
                       aenc.extradata()) as am:
        for p in pkts:
            am.write(p)
    aenc.close()

    with tk.Demuxer(out) as dm:
        assert not dm.has_video and dm.has_audio
        assert dm.width == 0
        info = tk.AudioInfo(dm)
        assert info.sample_rate == 48000 and info.channels == 2
        adec = tk.AudioDecoder(info)
        tot = 0
        for p in dm:
            for s, _ in adec.decode(p.data, p.pts):
                tot += len(s)
        for s, _ in adec.decode(None):
            tot += len(s)
        adec.close()
    assert tot >= 40000


def test_audio_only_muxer_rejects_video_write(tmp_path):
    from gmat_tpu.av import toolkit as tk
    from gmat_tpu.av import native

    out = str(tmp_path / "a.m4a")
    aenc = tk.AudioEncoder("aac", 48000, 2)
    am = tk.AudioMuxer(out, aenc.codec_id, 48000, 2, aenc.extradata())
    lib = native.load()
    import ctypes
    buf = (ctypes.c_ubyte * 4)(0, 0, 0, 1)
    assert lib.gav_mux_write_stream(am._h, 0, buf, 4, 0, 0, 1) < 0
    am.close()
    aenc.close()


def test_write_audio_on_video_only_muxer_errors(tmp_path):
    """A video-only AvMuxer (acodec_id=0 falls back to single-stream) must
    reject write_audio with a clean error, not crash in av_rescale_q."""
    from gmat_tpu.av import toolkit as tk

    mx = tk.AvMuxer(str(tmp_path / "v.mp4"), 64, 64, (30, 1),
                    tk.CODEC_H264, b"")
    with pytest.raises(IOError, match="no audio stream"):
        mx.write_audio(tk.Packet(b"\x00\x00\x00\x01\x09", 0, 0, True,
                                 False, 1))
    mx.close()


def test_audio_only_source_clear_video_error(tmp_path):
    """Decoder.from_demuxer on an audio-only source raises a clear error
    (not an obscure decoder-create failure)."""
    import numpy as np
    from gmat_tpu.av import toolkit as tk

    out = str(tmp_path / "a.m4a")
    aenc = tk.AudioEncoder("aac", 48000, 2)
    t = np.arange(24000) / 48000.0
    sig = (np.sin(2 * np.pi * 220 * t) * 9000).astype(np.int16)
    pkts = aenc.encode(np.stack([sig, sig], 1)) + aenc.flush()
    with tk.AudioMuxer(out, aenc.codec_id, 48000, 2,
                       aenc.extradata()) as am:
        for p in pkts:
            am.write(p)
    aenc.close()

    with tk.Demuxer(out) as dm:
        with pytest.raises(ValueError, match="no video stream"):
            tk.Decoder.from_demuxer(dm)

    from gmat_tpu.av.ingest import decode_stream
    with pytest.raises(ValueError, match="no video stream"):
        list(decode_stream(out, batch=4))


def test_decode_stream_bits_validation(tmp_path):
    from gmat_tpu.av.ingest import decode_stream
    with pytest.raises(ValueError, match="bits"):
        decode_stream("x.mp4", bits=12)
    with pytest.raises(ValueError, match="8-bit"):
        decode_stream("x.nv12", bits=10, width=64, height=32)


def test_cli_af_requires_transcode_acodec(tmp_path, capsys):
    from gmat_tpu.apps.cli import main
    assert main(["-i", "x.mp4", "-af", "volume=0.5", "-o",
                 str(tmp_path / "o.mp4")]) == 2
    assert main(["-i", "x.mp4", "-c:a", "copy", "-af", "volume=0.5",
                 "-o", str(tmp_path / "o.mp4")]) == 2


def test_preprocess_nchw_depth_aware_default_norm(tmp_path):
    """Default norm follows the input depth: 10-bit batches land in [0,1]
    without the caller passing norm=1023."""
    import numpy as np
    import jax.numpy as jnp
    from gmat_tpu.core.frame import FrameBatch
    from gmat_tpu.ops import fused

    rng = np.random.default_rng(3)
    y = rng.integers(0, 1024, (1, 32, 64)).astype(np.uint16)
    u = rng.integers(0, 1024, (1, 16, 32)).astype(np.uint16)
    v = rng.integers(0, 1024, (1, 16, 32)).astype(np.uint16)
    fb = FrameBatch({"y": jnp.asarray(y), "u": jnp.asarray(u),
                     "v": jnp.asarray(v)}, "yuv420p10", 64, 32, "bt709")
    x = np.asarray(fused.preprocess_nchw(fb, 16, 16, use_pallas="never"))
    assert 0.0 <= x.min() and x.max() <= 1.0
