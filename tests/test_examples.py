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
    pkts, fs = [], aenc.frame_size or 1024
    for off in range(0, len(samples) - fs + 1, fs):
        pkts += aenc.encode(samples[off:off + fs])
    pkts += aenc.flush()
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
