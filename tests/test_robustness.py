"""Fault injection: truncated containers, corrupted bitstreams, zero-byte
inputs.  The reference's failure story is log-and-continue (`ck()`
checkers, NvCommon.h:27-82; NvDecLite survives dynamic-res changes); ours
is exceptions at the API boundary and graceful degradation inside — these
tests pin both down."""
import os

import numpy as np
import pytest

from gmat_tpu.av import toolkit as tk


def _clip(tmp_path, n=24, w=192, h=128, gop=8):
    path = str(tmp_path / "src.mp4")
    enc = tk.Encoder("libx264", w, h, fps=(30, 1), gop=gop, crf=28.0)
    pkts = []
    base = np.add.outer(np.linspace(16, 200, h), np.linspace(0, 35, w))
    for i in range(n):
        y = ((base + 5 * i) % 200 + 16).astype(np.uint8)
        u = np.full((h // 2, w // 2), 100, np.uint8)
        v = np.full((h // 2, w // 2), 150, np.uint8)
        pkts += enc.encode(y, u, v, pts=i)
    pkts += enc.flush()
    mux = tk.Muxer(path, w, h, (30, 1), tk.CODEC_H264, enc.extradata())
    for p in pkts:
        mux.write(p)
    mux.close()
    enc.close()
    return path


def test_truncated_container_decodes_prefix(tmp_path):
    """A container cut mid-file still demuxes/decodes the intact prefix
    and stops cleanly (no crash, no exception from the read loop)."""
    src = _clip(tmp_path)
    # mp4 written by libavformat places moov at the end (truncation kills
    # the index entirely), so truncate a remuxed .ts instead
    ts = str(tmp_path / "full.ts")
    with tk.Demuxer(src) as dm:
        mx = tk.Muxer(ts, dm.width, dm.height, (30, 1), tk.CODEC_H264,
                      dm.extradata())
        vi = 0
        for p in dm:
            if p.stream == 0:
                p.pts = p.dts = vi
                vi += 1
                mx.write(p)
        mx.close()
    tsdata = open(ts, "rb").read()
    cut_ts = str(tmp_path / "cut.ts")
    open(cut_ts, "wb").write(tsdata[: len(tsdata) * 6 // 10])

    with tk.Demuxer(cut_ts) as dm:
        dec = tk.Decoder.from_demuxer(dm)
        n = 0
        for p in dm:
            if p.stream != 0:
                continue
            n += sum(1 for _ in dec.decode(p.data, p.pts))
        n += sum(1 for _ in dec.decode(None))
        dec.close()
    assert 0 < n < 24        # decoded a prefix, not the whole clip


def test_corrupted_packet_payloads_survive(tmp_path):
    """Bit-flipped slice payloads: the decoder logs/conceals or drops, the
    loop keeps going, and at least the uncorrupted frames come out."""
    src = _clip(tmp_path)
    rng = np.random.default_rng(7)
    with tk.Demuxer(src) as dm:
        dec = tk.Decoder.from_demuxer(dm)
        n = 0
        for i, p in enumerate(dm):
            if p.stream != 0:
                continue
            data = bytearray(p.data)
            if i % 3 == 1 and len(data) > 64:
                # flip bytes inside the payload, past the NAL headers
                for off in rng.integers(48, len(data), 8):
                    data[off] ^= 0xFF
            try:
                n += sum(1 for _ in dec.decode(bytes(data), p.pts))
            except IOError:
                pass      # a send error on mangled data is acceptable
        try:
            n += sum(1 for _ in dec.decode(None))
        except IOError:
            pass
        dec.close()
    assert n >= 8     # the intact packets still decode


def test_zero_and_garbage_inputs(tmp_path):
    empty = str(tmp_path / "empty.mp4")
    open(empty, "wb").close()
    with pytest.raises(IOError):
        tk.Demuxer(empty)
    garbage = str(tmp_path / "g.mp4")
    open(garbage, "wb").write(os.urandom(4096))
    with pytest.raises(IOError):
        tk.Demuxer(garbage)
    with pytest.raises(IOError):
        tk.Demuxer(b"\x00" * 1024)     # memory-buffer form too


def test_extractor_on_truncated_stream(tmp_path):
    """FrameExtractor on a truncated elementary stream: yields what it
    can, close() is clean, stats stay consistent."""
    from gmat_tpu.av.extractor import FrameExtractor
    src = _clip(tmp_path)
    raw = str(tmp_path / "cut.h264")
    with tk.Demuxer(src) as dm:
        buf = b"".join(p.data for p in dm if p.stream == 0)
    open(raw, "wb").write(buf[: len(buf) * 2 // 3])

    fx = FrameExtractor(raw, frame_interval=4)
    frames = list(fx.frames())
    fx.close()
    assert 1 <= len(frames) <= 6


def test_decode_stream_surfaces_worker_errors(tmp_path):
    """PrefetchQueue propagates producer-thread exceptions to the
    consumer instead of hanging (race-safety aux, SURVEY 5.2)."""
    from gmat_tpu.av.ingest import decode_stream
    bad = str(tmp_path / "nope.mp4")
    with pytest.raises(IOError):
        list(decode_stream(bad, batch=4))
