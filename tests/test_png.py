"""PNG writer/reader + the depth-faithful CLI png sink."""
import os

import numpy as np
import pytest

from gmat_tpu.utils.png import read_png, write_png
from struct import error as struct_error


@pytest.mark.parametrize("dtype,chans", [
    (np.uint8, 3), (np.uint16, 3), (np.uint8, 1), (np.uint16, 1),
    (np.uint8, 4)])
def test_png_roundtrip(tmp_path, dtype, chans):
    rng = np.random.default_rng(int(np.dtype(dtype).itemsize * 10 + chans))
    hi = 256 if dtype == np.uint8 else 65536
    shape = (23, 17) if chans == 1 else (23, 17, chans)
    a = rng.integers(0, hi, shape).astype(dtype)
    p = str(tmp_path / "t.png")
    write_png(p, a)
    back = read_png(p)
    np.testing.assert_array_equal(back, a)
    assert back.dtype == dtype


def test_png_readable_by_avcodec(tmp_path, rng):
    # interop: libavcodec's png decoder must accept our files (8 & 16 bit)
    from gmat_tpu.av import toolkit as tk
    for dtype, fmtname in ((np.uint8, "rgb24"), (np.uint16, "rgb48")):
        hi = 256 if dtype == np.uint8 else 65536
        a = rng.integers(0, hi, (32, 48, 3)).astype(dtype)
        p = str(tmp_path / f"av_{dtype.__name__}.png")
        write_png(p, a)
        dm = tk.Demuxer(p)
        dec = tk.Decoder.from_demuxer(dm)
        n = 0
        for pkt in dm:
            if pkt.stream == 0:
                n += sum(1 for _ in dec.decode(pkt.data, pkt.pts))
        n += sum(1 for _ in dec.decode(None))
        dm.close(); dec.close()
        assert n == 1


def test_cli_png_sink_16bit(tmp_path):
    """A 10-bit pipeline through an RGB-domain graph lands as 16-bit PNG
    samples (PARITY gap: 8-bit-only RGB sinks)."""
    from gmat_tpu.av.rawvideo import Y4MWriter
    from gmat_tpu.apps.cli import main
    w, h = 64, 48
    clip = str(tmp_path / "in10.y4m")
    wr = Y4MWriter(clip, w, h, (30, 1), bits=10)
    rng = np.random.default_rng(3)
    for i in range(4):
        wr.write(rng.integers(0, 1024, (h, w)).astype(np.uint16),
                 np.full((h // 2, w // 2), 512, np.uint16),
                 np.full((h // 2, w // 2), 512, np.uint16))
    wr.close()
    out = str(tmp_path / "still_%d.png")
    rc = main(["-i", clip, "-bits", "10", "-o", out, "-frames", "2",
               "-batch", "4"])
    assert rc == 0
    img = read_png(str(tmp_path / "still_0.png"))
    assert img.dtype == np.uint16 and img.shape == (h, w, 3)
    # 10-bit content scaled to 16-bit range: must use more than 8 bits
    assert (img & 0xFF).any()


def test_cli_png_sink_8bit(tmp_path):
    from gmat_tpu.apps.cli import main
    from gmat_tpu.av.rawvideo import Y4MWriter
    w, h = 64, 48
    clip = str(tmp_path / "in8.y4m")
    wr = Y4MWriter(clip, w, h, (30, 1))
    rng = np.random.default_rng(4)
    for i in range(2):
        wr.write(rng.integers(0, 256, (h, w)).astype(np.uint8),
                 np.full((h // 2, w // 2), 128, np.uint8),
                 np.full((h // 2, w // 2), 128, np.uint8))
    wr.close()
    out = str(tmp_path / "s.png")
    rc = main(["-i", clip, "-o", out, "-frames", "1", "-batch", "2"])
    assert rc == 0
    img = read_png(str(tmp_path / "s_0.png"))
    assert img.dtype == np.uint8 and img.shape == (h, w, 3)


def test_png_reader_survives_mutations(rng):
    """Parser robustness parity with the JPEG/HEIF/HEVC parsers: random
    mutations must raise clean errors (or decode), never crash/hang."""
    import zlib
    base = None
    a = rng.integers(0, 256, (24, 20, 3)).astype(np.uint8)
    import io
    buf = io.BytesIO()
    write_png(buf, a)
    base = bytearray(buf.getvalue())
    mrng = np.random.default_rng(5)
    for _ in range(300):
        m = bytearray(base)
        for _ in range(mrng.integers(1, 6)):
            m[mrng.integers(0, len(m))] = mrng.integers(0, 256)
        try:
            read_png(bytes(m))
        except (IOError, zlib.error, ValueError, struct_error, EOFError):
            pass



def test_png_corrupt_ihdr_dims_clean_error(rng):
    import io
    a = rng.integers(0, 256, (24, 20, 3)).astype(np.uint8)
    buf = io.BytesIO()
    write_png(buf, a)
    base = bytearray(buf.getvalue())
    # IHDR payload starts at offset 16: width u32, height u32
    for off in (16, 17, 20, 21):
        m = bytearray(base)
        m[off] ^= 0x40
        with pytest.raises(IOError):
            read_png(bytes(m))


def test_png_filtered_rows_decode_vectorized():
    """Sub/Up unfilters must decode real adaptive-filtered PNGs (the
    vectorized paths); libavcodec's png encoder is the oracle."""
    import numpy as np
    from gmat_tpu.utils.png import read_png
    h, w = 48, 64
    img = (np.add.outer(np.linspace(0, 200, h), np.linspace(0, 55, w))
           [..., None] + np.arange(3) * 10).astype(np.uint8)
    # craft rows with filter types 1 (Sub) and 2 (Up) directly
    import struct, zlib
    raw = b""
    prev = np.zeros((w * 3,), np.uint8)
    for y in range(h):
        row = img[y].reshape(-1)
        if y % 2 == 0:          # Sub
            d = row.astype(np.int16).copy()
            d[3:] -= row[:-3].astype(np.int16)
            raw += b"\x01" + (d & 0xFF).astype(np.uint8).tobytes()
        else:                   # Up
            raw += b"\x02" + ((row.astype(np.int16) - prev) &
                              0xFF).astype(np.uint8).tobytes()
        prev = row
    def chunk(t, p):
        c = struct.pack(">I", len(p)) + t + p
        return c + struct.pack(">I", zlib.crc32(t + p) & 0xFFFFFFFF)
    blob = (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))
    out = read_png(blob)
    np.testing.assert_array_equal(out, img)
    # corrupt IDAT raises IOError, not zlib.error
    bad = blob.replace(b"IDAT", b"IDAT", 1)
    import pytest as _p
    i = blob.find(b"IDAT")
    broken = bytearray(blob)
    broken[i + 8] ^= 0xFF
    with _p.raises(IOError):
        read_png(bytes(broken))
