"""Y4M / raw YUV IO and CLI integration tests."""
import os

import numpy as np
import pytest

from gmat_tpu.av.rawvideo import RawYUVReader, Y4MReader, Y4MWriter, write_raw


def frames(n=6, w=64, h=48):
    out = []
    for i in range(n):
        y = np.full((h, w), 20 + i * 10, np.uint8)
        u = np.full((h // 2, w // 2), 100, np.uint8)
        v = np.full((h // 2, w // 2), 150, np.uint8)
        out.append((y, u, v))
    return out


def test_y4m_roundtrip(tmp_path):
    p = str(tmp_path / "t.y4m")
    fr = frames()
    w = Y4MWriter(p, 64, 48, (25, 1))
    for (y, u, v) in fr:
        w.write(y, u, v)
    w.close()
    r = Y4MReader(p)
    assert (r.width, r.height, r.fps) == (64, 48, (25, 1))
    got = list(r.frames())
    r.close()
    assert len(got) == 6
    np.testing.assert_array_equal(got[3][0], fr[3][0])


def test_raw_i420_and_nv12(tmp_path):
    fr = frames()
    for layout in ("i420", "nv12"):
        p = str(tmp_path / f"t.{layout}")
        write_raw(p, fr, layout)
        r = RawYUVReader(p, 64, 48, layout)
        got = list(r.frames())
        r.close()
        assert len(got) == 6
        np.testing.assert_array_equal(got[2][0], fr[2][0])
        np.testing.assert_array_equal(got[2][1], fr[2][1])


def test_cli_y4m_in_out(tmp_path):
    from gmat_tpu.apps.cli import main
    src = str(tmp_path / "in.y4m")
    w = Y4MWriter(src, 64, 48, (30, 1))
    for (y, u, v) in frames():
        w.write(y, u, v)
    w.close()
    out = str(tmp_path / "out.y4m")
    rc = main(["-i", src, "-vf", "scale=32:32", "-o", out, "-batch", "4"])
    assert rc == 0
    r = Y4MReader(out)
    got = list(r.frames())
    r.close()
    assert len(got) == 6 and got[0][0].shape == (32, 32)


def test_cli_raw_nv12_input(tmp_path):
    from gmat_tpu.apps.cli import main
    src = str(tmp_path / "in.nv12")
    write_raw(src, frames(), "nv12")
    out = str(tmp_path / "o.mp4")
    rc = main(["-i", src, "-s", "64x48", "-vf", "null", "-o", out,
               "-crf", "20", "-batch", "4"])
    assert rc == 0 and os.path.getsize(out) > 200


def test_cli_seek(tmp_path):
    from gmat_tpu.apps.cli import main
    from .test_extractor import make_clip
    clip = str(tmp_path / "c.mp4")
    make_clip(clip)   # 60 frames @30fps, gop 12
    out = str(tmp_path / "s.y4m")
    rc = main(["-i", clip, "-ss", "1.0", "-vf", "null", "-o", out,
               "-batch", "8"])
    assert rc == 0
    r = Y4MReader(out)
    got = list(r.frames())
    r.close()
    assert 20 <= len(got) <= 40   # seeked to keyframe at/before 1s


def test_y4m_10bit_roundtrip(tmp_path):
    """C420p10 Y4M files decode as lsb-aligned u16 and flow through
    decode_stream(bits=10) as yuv420p10 batches; an 8-bit default errors
    instead of silently changing dtype."""
    import numpy as np
    import pytest
    from gmat_tpu.av.ingest import decode_stream
    from gmat_tpu.av.rawvideo import Y4MReader

    path = str(tmp_path / "t10.y4m")
    w, h, n = 64, 32, 5
    rng = np.random.default_rng(0)
    frames = []
    with open(path, "wb") as f:
        f.write(b"YUV4MPEG2 W64 H32 F30:1 Ip A1:1 C420p10\n")
        for _ in range(n):
            y = rng.integers(0, 1024, (h, w)).astype("<u2")
            u = rng.integers(0, 1024, (h // 2, w // 2)).astype("<u2")
            v = rng.integers(0, 1024, (h // 2, w // 2)).astype("<u2")
            frames.append((y, u, v))
            f.write(b"FRAME\n" + y.tobytes() + u.tobytes() + v.tobytes())

    rd = Y4MReader(path)
    assert rd.bits == 10
    got = list(rd.frames())
    rd.close()
    assert len(got) == n
    assert np.array_equal(got[0][0], frames[0][0])
    assert got[0][0].dtype == np.uint16

    tot = 0
    for fb, pts, valid in decode_stream(path, batch=4, bits=10):
        assert fb.format == "yuv420p10"
        tot += int(valid)
    assert tot == n

    with pytest.raises(ValueError, match="pass bits=10"):
        decode_stream(path, batch=4)


def test_y4m_16bit_round_trip(tmp_path):
    """C420p16 write -> decode_stream(bits=16) yields yuv420p16 batches
    with the exact written samples (the P016-depth Y4M lane)."""
    import numpy as np
    from gmat_tpu.av.rawvideo import Y4MWriter
    from gmat_tpu.av.ingest import decode_stream

    p = str(tmp_path / "deep.y4m")
    rng = np.random.default_rng(0)
    w, h, n = 64, 32, 5
    frames = [(rng.integers(0, 65536, (h, w)).astype(np.uint16),
               rng.integers(0, 65536, (h // 2, w // 2)).astype(np.uint16),
               rng.integers(0, 65536, (h // 2, w // 2)).astype(np.uint16))
              for _ in range(n)]
    wr = Y4MWriter(p, w, h, bits=16)
    for y, u, v in frames:
        wr.write(y, u, v)
    wr.close()

    got = []
    for fb, pts, valid in decode_stream(p, batch=4, bits=16):
        assert fb.format == "yuv420p16"
        ys = np.asarray(fb.planes["y"])
        for i in range(valid):
            got.append(ys[i])
    assert len(got) == n
    for g, (y, _, _) in zip(got, frames):
        assert g.dtype == np.uint16
        np.testing.assert_array_equal(g, y)


def test_cli_10bit_lane_end_to_end(tmp_path):
    """-bits 10: C420p10 y4m in -> main10 x265 mp4 out, and -o .y4m
    stays 10-bit on disk."""
    import numpy as np
    from gmat_tpu.av.rawvideo import Y4MWriter, Y4MReader
    from gmat_tpu.apps.cli import main

    src = str(tmp_path / "in10.y4m")
    rng = np.random.default_rng(0)
    w, h = 64, 48
    wr = Y4MWriter(src, w, h, bits=10)
    for i in range(6):
        wr.write((rng.integers(0, 1024, (h, w))).astype(np.uint16),
                 np.full((h // 2, w // 2), 512, np.uint16),
                 np.full((h // 2, w // 2), 512, np.uint16))
    wr.close()

    out = str(tmp_path / "out10.y4m")
    rc = main(["-i", src, "-bits", "10", "-vf", "scale=32:24",
               "-o", out, "-batch", "4"])
    assert rc == 0
    rd = Y4MReader(out)
    assert rd.bits == 10 and rd.width == 32
    n = sum(1 for _ in rd.frames())
    rd.close()
    assert n == 6

    mp4 = str(tmp_path / "out10.mp4")
    rc = main(["-i", src, "-bits", "10", "-vf", "null", "-o", mp4,
               "-c:v", "libx265", "-crf", "25", "-batch", "4"])
    assert rc == 0
    from gmat_tpu.av import toolkit as tk
    with tk.Demuxer(mp4) as dm:
        dec = tk.Decoder.from_demuxer(dm)
        n = 0
        for p in dm:
            if p.stream == 0:
                n += sum(1 for _ in dec.decode16(p.data, p.pts))
        n += sum(1 for _ in dec.decode16(None))
        dec.close()
    assert n == 6
