"""HEIF writer/reader and HEVC parser subset tests."""
import numpy as np
import pytest

from gmat_tpu.av import heif, hevc, toolkit as tk


def synth(h=128, w=160, seed=0):
    rng = np.random.default_rng(seed)
    y = (np.add.outer(np.linspace(30, 220, h), np.linspace(0, 30, w))
         + rng.normal(0, 2, (h, w))).clip(0, 255).astype(np.uint8)
    u = np.full((h // 2, w // 2), 100, np.uint8)
    v = np.full((h // 2, w // 2), 150, np.uint8)
    return y, u, v


@pytest.fixture(scope="module")
def still_annexb():
    y, u, v = synth()
    enc = tk.Encoder("libx265", 160, 128, crf=18.0, still_image=True,
                     opts="x265-params=log-level=0")
    pkts = enc.encode(y, u, v, pts=0) + enc.flush()
    extra = enc.extradata()
    enc.close()
    return extra + b"".join(p.data for p in pkts), (y, u, v)


def test_nal_split_and_types(still_annexb):
    data, _ = still_annexb
    types = [hevc.nal_type(n) for n in hevc.split_annexb(data)]
    assert hevc.NAL_VPS in types
    assert hevc.NAL_SPS in types
    assert hevc.NAL_PPS in types
    assert any(hevc.is_idr(t) for t in types)


def test_sps_parse(still_annexb):
    data, _ = still_annexb
    sps_nal = next(n for n in hevc.split_annexb(data)
                   if hevc.nal_type(n) == hevc.NAL_SPS)
    sps = hevc.parse_sps(sps_nal)
    assert (sps.width, sps.height) == (160, 128)
    assert sps.chroma_format_idc == 1      # 4:2:0
    assert sps.bit_depth_luma == 8
    # 1=Main, 3=Main Still Picture, 4=Rext (x265 signals Main Intra)
    assert sps.general_profile_idc in (1, 2, 3, 4)


def test_hvcc_roundtrip(still_annexb):
    data, _ = still_annexb
    nals = {hevc.nal_type(n): n for n in hevc.split_annexb(data)}
    rec = hevc.build_hvcc(nals[32], nals[33], nals[34])
    back, lsz = hevc.parse_hvcc(rec)
    assert lsz == 4
    assert back == [nals[32], nals[33], nals[34]]


def test_heif_write_read_roundtrip(still_annexb, tmp_path):
    data, (y, u, v) = still_annexb
    w = heif.HeifWriter()
    w.add_image(data)
    path = str(tmp_path / "img.heic")
    w.save(path)
    raw = open(path, "rb").read()
    assert raw[4:8] == b"ftyp" and raw[8:12] == b"heic"
    yd, ud, vd = heif.decode_still(path)
    assert yd.shape == y.shape
    assert np.abs(yd.astype(int) - y.astype(int)).mean() < 3.0


def test_heif_highlevel_encode_decode():
    y, u, v = synth()
    blob = heif.encode_still(y, u, v, crf=16.0)
    yd, ud, vd = heif.decode_still(blob)
    assert np.abs(yd.astype(int) - y.astype(int)).mean() < 3.0
    assert np.abs(ud.astype(int) - u.astype(int)).mean() < 3.0


def test_heif_lossless():
    y, u, v = synth(64, 64)
    blob = heif.encode_still(y, u, v, lossless=True)
    yd, ud, vd = heif.decode_still(blob)
    np.testing.assert_array_equal(yd, y)
    np.testing.assert_array_equal(ud, u)


def test_heif_collection():
    frames = [synth(64, 64, seed=i) for i in range(3)]
    blob = heif.encode_collection(frames, crf=16.0)
    rdr = heif.HeifReader(blob)
    assert len(rdr.items) == 3
    decoded = heif.decode_all(blob)
    assert len(decoded) == 3
    for (yd, _, _), (y, _, _) in zip(decoded, frames):
        assert np.abs(yd.astype(int) - y.astype(int)).mean() < 3.0


def test_heif_reader_bad_input():
    with pytest.raises(IOError):
        heif.HeifReader(b"not a heif file at all" * 10)


def test_heif_sequence_roundtrip(tmp_path):
    frames = [synth(64, 80, seed=i) for i in range(8)]
    blob = heif.encode_sequence(frames, fps=30, crf=18.0)
    assert blob[4:8] == b"ftyp" and blob[8:12] == b"msf1"
    p = tmp_path / "seq.heif"
    p.write_bytes(blob)
    back = heif.decode_sequence(str(p))
    assert len(back) == 8
    for (yd, ud, vd), (y, u, v) in zip(back, frames):
        assert yd.shape == y.shape
        assert np.abs(yd.astype(int) - y.astype(int)).mean() < 4.0


def test_heif_sequence_reader_metadata():
    frames = [synth(64, 80, seed=i) for i in range(4)]
    blob = heif.encode_sequence(frames)
    rdr = heif.HeifSequenceReader(blob)
    assert (rdr.width, rdr.height) == (80, 64)
    assert len(rdr.frames) == 4
    assert rdr.hvcc[:1] == b"\x01"


def test_heif_truncation_fails_cleanly():
    """A HEIF blob cut at any fraction raises a clean error (IOError /
    ValueError / struct.error surface as exceptions, never a crash,
    hang, or silent garbage image)."""
    y, u, v = synth(64, 64)
    blob = heif.encode_still(y, u, v, crf=16.0)
    for frac in (0.05, 0.3, 0.6, 0.9, 0.99):
        cut = blob[: int(len(blob) * frac)]
        try:
            heif.decode_still(cut)
        except Exception:
            continue
        assert False, f"truncation at {frac} decoded without error"


def test_malformed_box_sizes_raise_not_hang():
    """A 64-bit box header with largesize 0 (or a short 32-bit size)
    must raise, not loop forever."""
    crafted = b"\x00\x00\x00\x01meta" + b"\x00" * 8
    with pytest.raises(IOError):
        heif.HeifReader(crafted)
    crafted2 = b"\x00\x00\x00\x04meta" + b"\x00" * 16
    with pytest.raises(IOError):
        heif.HeifReader(crafted2)


def test_decode_all_reuses_decoder():
    frames = [synth(64, 64, seed=i) for i in range(4)]
    blob = heif.encode_collection(frames, crf=16.0)
    decoded = heif.decode_all(blob)
    assert len(decoded) == 4
    for (yd, _, _), (y, _, _) in zip(decoded, frames):
        assert np.abs(yd.astype(int) - y.astype(int)).mean() < 3.0


def test_heif_idat_storage():
    """iloc construction_method=1: payload stored in the meta box's idat
    (some still writers use this instead of mdat)."""
    import struct
    from gmat_tpu.av.heif import _box, _full, _u32

    y, u, v = synth(64, 64)
    blob = heif.encode_still(y, u, v, crf=16.0)
    it = heif.HeifReader(blob).read_image()
    payload, hvcc = it.data, it.hvcc

    pitm = _full(b"pitm", 0, 0, struct.pack(">H", 1))
    iloc_body = bytes([0x44, 0x00]) + struct.pack(">H", 1)
    iloc_body += struct.pack(">H", 1)          # item id
    iloc_body += struct.pack(">H", 1)          # construction_method=idat
    iloc_body += struct.pack(">H", 0)          # data_reference_index
    iloc_body += struct.pack(">H", 1)          # extent count
    iloc_body += struct.pack(">II", 0, len(payload))
    iloc = _full(b"iloc", 1, 0, iloc_body)
    ispe = _full(b"ispe", 0, 0, struct.pack(">II", it.width, it.height))
    ipco = _box(b"ipco", _box(b"hvcC", hvcc) + ispe)
    ipma = _full(b"ipma", 0, 0, struct.pack(">I", 1)
                 + struct.pack(">H", 1) + bytes([2, 0x81, 0x82]))
    iprp = _box(b"iprp", ipco + ipma)
    idat = _box(b"idat", payload)
    meta = _box(b"meta", b"\0\0\0\0" + pitm + iloc + iprp + idat)
    crafted = _box(b"ftyp", b"heic" + _u32(0) + b"heicmif1") + meta

    it2 = heif.HeifReader(crafted).read_image()
    assert it2.data == payload and (it2.width, it2.height) == (64, 64)
    yd, ud, vd = heif.decode_still(crafted)
    assert np.abs(yd.astype(int) - y.astype(int)).mean() < 3.0


def test_heif_parallel_stills_match_serial():
    frames = [synth(64, 64, seed=i) for i in range(4)]
    ser = heif.encode_stills(frames, crf=18.0, workers=1)
    par = heif.encode_stills(frames, crf=18.0, workers=4)
    # x265 is deterministic per session config: parallel == serial bytes
    assert par == ser
    dec_s = heif.decode_stills(ser, workers=1)
    dec_p = heif.decode_stills(ser, workers=4)
    for (a, b) in zip(dec_s, dec_p):
        for pa, pb in zip(a, b):
            np.testing.assert_array_equal(pa, pb)


def test_heif_collection_parallel_matches_serial():
    frames = [synth(64, 64, seed=i) for i in range(4)]
    ser = heif.encode_collection(frames, crf=18.0, workers=1)
    par = heif.encode_collection(frames, crf=18.0, workers=3)
    assert par == ser


def _indexed_frames(n=12, h=64, w=96):
    """Flat-luma frames whose display index is recoverable from Y."""
    out = []
    for i in range(n):
        y = np.full((h, w), 20 + 12 * i, np.uint8)
        u = np.full((h // 2, w // 2), 110, np.uint8)
        v = np.full((h // 2, w // 2), 140, np.uint8)
        out.append((y, u, v))
    return out


def _fidx(y):
    return int(round((float(np.median(y)) - 20) / 12))


def test_heif_sequence_bframes_ctts_roundtrip():
    # VERDICT r2 #4: decode-order samples + ctts -> display order exact
    frames = _indexed_frames(12)
    blob = heif.encode_sequence(frames, fps=30, crf=12.0, gop=12, bf=2)
    rdr = heif.HeifSequenceReader(blob)
    assert len(rdr.frames) == 12
    # B-frames reorder: composition times differ from decode times
    assert rdr.sample_pts != rdr.sample_dts
    assert b"ctts" in blob
    # display_order() must be the identity permutation applied to pts
    order = rdr.display_order()
    assert sorted(rdr.sample_pts) == [rdr.sample_pts[i] for i in order]
    decoded = heif.decode_sequence(blob)
    assert [_fidx(y) for (y, _, _) in decoded] == list(range(12))


def test_heif_sequence_bf0_has_no_ctts():
    frames = _indexed_frames(6)
    blob = heif.encode_sequence(frames, fps=30, crf=12.0, gop=6, bf=0)
    assert b"ctts" not in blob
    decoded = heif.decode_sequence(blob)
    assert [_fidx(y) for (y, _, _) in decoded] == list(range(6))


def test_heif_sequence_libavformat_crosscheck():
    # libavformat must demux our msf1 container and agree on timing:
    # packet pts (mov reads stts+ctts) == our reader's sample_pts
    frames = _indexed_frames(12)
    blob = heif.encode_sequence(frames, fps=30, crf=12.0, gop=12, bf=2)
    rdr = heif.HeifSequenceReader(blob)
    dm = tk.Demuxer(bytes(blob))
    pkts = [p for p in dm if p.stream == 0]
    assert len(pkts) == 12
    # mov demux rescales to the stream time base; our track timescale is
    # fps so ticks map 1:1 through a (1, fps) time base
    tbn, tbd = dm.time_base
    scale = (tbd * 1.0 / tbn) / 30.0 if tbn else 1.0
    demux_pts = [int(round(p.pts / scale)) for p in pkts]
    assert demux_pts == rdr.sample_pts
    dec = tk.Decoder.from_demuxer(dm)
    got = []
    for p in pkts:
        got += [(y, pp) for (y, u, v, pp) in dec.decode(p.data, p.pts)]
    got += [(y, pp) for (y, u, v, pp) in dec.decode(None)]
    dm.close(); dec.close()
    got.sort(key=lambda t: t[1])
    assert [_fidx(y) for (y, _) in got] == list(range(12))


def test_heif_sequence_edit_list_zero_start():
    # B-frame delay pushes the first composition time past 0; the writer
    # must emit an elst so presentation starts at t=0, and the reader
    # must apply it (first displayed sample_pts == 0)
    frames = _indexed_frames(12)
    blob = heif.encode_sequence(frames, fps=30, crf=12.0, gop=12, bf=2)
    assert b"elst" in blob
    rdr = heif.HeifSequenceReader(blob)
    assert min(rdr.sample_pts) == 0
    # display order still exact
    decoded = heif.decode_sequence(blob)
    assert [_fidx(y) for (y, _, _) in decoded] == list(range(12))
    # bf=0 sequences need no edit list
    blob0 = heif.encode_sequence(frames[:6], fps=30, crf=12.0, gop=6, bf=0)
    assert b"elst" not in blob0


def test_heif_sequence_multientry_elst():
    # multi-entry edit list: empty edit (presentation delay) + media
    # edit (B-delay entry point).  Reader applies both: every pts shifts
    # by the delay, presentation starts at t=delay.
    frames = _indexed_frames(12)
    base = heif.encode_sequence(frames, fps=30, crf=12.0, gop=12, bf=2)
    delayed = heif.encode_sequence(frames, fps=30, crf=12.0, gop=12,
                                   bf=2, presentation_delay=9)
    r0 = heif.HeifSequenceReader(base)
    r1 = heif.HeifSequenceReader(delayed)
    assert len(r1.edits) == 2
    assert r1.edits[0][1] == -1            # empty edit first
    assert r1.edits[0][0] == 9
    assert r1.sample_pts == [p + 9 for p in r0.sample_pts]
    assert min(r1.sample_pts) == 9
    # decode order/content unaffected by the uniform shift
    decoded = heif.decode_sequence(delayed)
    assert [_fidx(y) for (y, _, _) in decoded] == list(range(12))
    # libavformat still demuxes the container (edit lists are mov-core)
    dm = tk.Demuxer(bytes(delayed))
    assert len([p for p in dm if p.stream == 0]) == 12
    dm.close()
    # delay on a bf=0 sequence: the elst appears even without ctts
    d0 = heif.encode_sequence(frames[:6], fps=30, crf=12.0, gop=6,
                              bf=0, presentation_delay=4)
    rr = heif.HeifSequenceReader(d0)
    assert b"elst" in d0 and min(rr.sample_pts) == 4


def test_heif_sequence_rate_entry_tolerated():
    # a rate-changing entry past the entry point must not disturb the
    # per-sample grid; it is recorded in .edits for callers
    import struct as _s
    frames = _indexed_frames(8)
    blob = heif.encode_sequence(frames, fps=30, crf=12.0, gop=8, bf=2)
    r0 = heif.HeifSequenceReader(blob)
    i = blob.find(b"elst")                 # type offset; size at i-4
    assert i > 0
    # writer emits one v0 entry: box = 4 size + 4 type + 4 verflags +
    # 4 count + 12 entry = 28 bytes, spanning [i-4, i+24)
    assert _s.unpack(">I", blob[i - 4:i])[0] == 28
    assert _s.unpack(">I", blob[i + 8:i + 12])[0] == 1
    entry = blob[i + 12:i + 24]
    tail = entry[:8] + _s.pack(">hH", 2, 0)      # same span, rate 2.0
    new_box = (_s.pack(">I", 40) + b"elst" + blob[i + 4:i + 8] +
               _s.pack(">I", 2) + entry + tail)
    out = bytearray(blob[:i - 4] + new_box + blob[i + 24:])
    # grow the ancestor box sizes (moov > trak > edts) by 12
    for anc in (b"moov", b"trak", b"edts"):
        j = out.find(anc)
        sz = _s.unpack(">I", out[j - 4:j])[0]
        out[j - 4:j] = _s.pack(">I", sz + 12)
    # stco offsets shifted by 12 too: fix the single chunk offset
    k = out.find(b"stco")
    off = _s.unpack(">I", out[k + 12:k + 16])[0]
    out[k + 12:k + 16] = _s.pack(">I", off + 12)
    r1 = heif.HeifSequenceReader(bytes(out))
    assert len(r1.edits) == 2 and r1.edits[1][2] == 2.0
    assert r1.sample_pts == r0.sample_pts
    assert r1.frames == r0.frames


def test_heif_grid_roundtrip():
    """'grid' derived items (tiled large stills, the phone-HEIC layout):
    encode a non-tile-aligned image as a 2x2-ish grid, decode via the
    grid assembly path — exact dims, content within codec tolerance."""
    h, w = 150, 200                      # not multiples of the tile
    rng = np.random.default_rng(3)
    base = np.add.outer(np.linspace(30, 200, h), np.linspace(0, 40, w))
    y = (base + rng.normal(0, 2, (h, w))).clip(0, 255).astype(np.uint8)
    u = np.full((h // 2, w // 2), 108, np.uint8)
    v = np.full((h // 2, w // 2), 146, np.uint8)
    blob = heif.encode_still_grid(y, u, v, tile=128, crf=14.0)
    rdr = heif.HeifReader(blob)
    assert rdr.item_types[rdr.primary] == b"grid"
    assert len(rdr.dimg[rdr.primary]) == 4          # 2x2 tiles
    yd, ud, vd = heif.decode_still(blob)
    assert yd.shape == (h, w)
    assert ud.shape == (h // 2, w // 2)
    assert np.abs(yd.astype(int) - y.astype(int)).mean() < 3.0
    assert np.abs(ud.astype(int) - u.astype(int)).mean() < 3.0


def test_heif_grid_parallel_matches_serial():
    h, w = 130, 260
    rng = np.random.default_rng(5)
    y = rng.integers(40, 200, (h, w)).astype(np.uint8)
    u = np.full((h // 2, w // 2), 120, np.uint8)
    v = np.full((h // 2, w // 2), 130, np.uint8)
    a = heif.encode_still_grid(y, u, v, tile=128, crf=18.0, workers=1)
    b = heif.encode_still_grid(y, u, v, tile=128, crf=18.0, workers=4)
    assert a == b                        # deterministic tile encodes
    ya, _, _ = heif.decode_still(a)
    assert ya.shape == (h, w)


def test_heif_grid_validation():
    with pytest.raises(ValueError, match="62-tile"):
        y = np.zeros((4096, 4096), np.uint8)
        u = np.zeros((2048, 2048), np.uint8)
        heif.encode_still_grid(y, u, u, tile=128)
    with pytest.raises(ValueError, match="tiles"):
        heif.write_grid([b""] * 3, 2, 2, 100, 100)


def test_heif_grid_mutation_fuzz():
    """Grid metadata mutations (iinf/iref/grid payload/iloc) raise clean
    errors or decode — never crash or hang (parser robustness parity
    with the PNG/JPEG/HEVC fuzz tests)."""
    import struct as _s
    h, w = 80, 112
    rng = np.random.default_rng(7)
    y = rng.integers(30, 220, (h, w)).astype(np.uint8)
    u = np.full((h // 2, w // 2), 108, np.uint8)
    v = np.full((h // 2, w // 2), 146, np.uint8)
    base = bytearray(heif.encode_still_grid(y, u, v, tile=64, crf=22.0))
    # mutate only the meta region (the mdat is codec payload — the HEVC
    # decoder's own robustness is covered elsewhere)
    meta_at = bytes(base).find(b"meta")
    meta_end = bytes(base).find(b"mdat")
    mrng = np.random.default_rng(11)
    for _ in range(250):
        m = bytearray(base)
        for _ in range(int(mrng.integers(1, 6))):
            m[int(mrng.integers(meta_at, meta_end))] = int(
                mrng.integers(0, 256))
        try:
            heif.decode_still(bytes(m))
        except Exception:
            pass                      # clean exception = pass


def test_heif_grid_declared_dims_beyond_tiles():
    """A grid whose declared output exceeds the tile canvas raises a
    clean IOError instead of returning short arrays."""
    import struct as _s
    h, w = 80, 112
    y = np.full((h, w), 90, np.uint8)
    u = np.full((h // 2, w // 2), 120, np.uint8)
    blob = bytearray(heif.encode_still_grid(y, u, u, tile=64, crf=22.0))
    # grid payload: [ver, flags, rows-1, cols-1, u16 w, u16 h] — last
    # item payload in mdat; find it by its exact bytes
    pat = bytes([0, 0, 1, 1]) + _s.pack(">HH", w, h)
    i = bytes(blob).rfind(pat)
    assert i > 0
    blob[i + 4:i + 6] = _s.pack(">H", 4096)     # declared w >> canvas
    with pytest.raises(IOError, match="tiles only cover"):
        heif.decode_still(bytes(blob))


def test_heif_transform_properties_roundtrip():
    # clap -> irot -> imir (MIAF order), lossless so the oracle is exact
    h, w = 96, 128
    rng = np.random.default_rng(7)
    y = rng.integers(16, 236, (h, w), dtype=np.uint8)
    u = np.full((h // 2, w // 2), 100, np.uint8); u[:10, :10] = 50
    v = np.full((h // 2, w // 2), 160, np.uint8); v[5:20, 5:30] = 200
    blob = heif.encode_still(y, u, v, lossless=True, rotation=90,
                             mirror=0, clean_aperture=(120, 88, 0, 0))
    item = heif.HeifReader(blob).read_image()
    assert item.transforms == [("clap", (120, 1, 88, 1, 0, 1, 0, 1)),
                               ("irot", 1), ("imir", 0)]
    # apply=False returns the coded geometry untouched
    yd, ud, vd = heif.decode_still(blob, apply=False)
    np.testing.assert_array_equal(yd, y)
    # viewer geometry: centered crop, CCW rot, left-right mirror
    x0, y0 = (w - 120) // 2, (h - 88) // 2
    oy = np.rot90(y[y0:y0 + 88, x0:x0 + 120])[:, ::-1]
    ou = np.rot90(u[y0 // 2:(y0 + 88 + 1) // 2,
                    x0 // 2:(x0 + 120 + 1) // 2])[:, ::-1]
    dy, du, dv = heif.decode_still(blob)
    np.testing.assert_array_equal(dy, oy)
    np.testing.assert_array_equal(du, ou)


def test_heif_exif_item():
    y, u, v = synth(64, 64)
    exif = b"II*\x00\x08\x00\x00\x00" + bytes(range(32))
    blob = heif.encode_still(y, u, v, crf=18.0, exif=exif)
    rdr = heif.HeifReader(blob)
    assert rdr.exif() == exif
    # Exif items don't surface as decodable presentations
    assert len(heif.decode_all(blob)) == 1
    # files without exif report None
    assert heif.HeifReader(
        heif.encode_still(y, u, v, crf=18.0)).exif() is None


def test_heif_alpha_auxiliary():
    h, w = 64, 96
    y, u, v = synth(h, w, seed=3)
    alpha = np.zeros((h, w), np.uint8)
    alpha[10:50, 20:80] = 255
    blob = heif.encode_still(y, u, v, lossless=True, alpha=alpha)
    rdr = heif.HeifReader(blob)
    ai = rdr.alpha_item()
    assert ai is not None and rdr.item_types[ai.item_id] == b"hvc1"
    dy, du, dv, da = heif.decode_still(blob, with_alpha=True)
    np.testing.assert_array_equal(da, alpha)
    np.testing.assert_array_equal(dy, y)
    # the aux plane is hidden from decode_all / plain decode
    assert len(heif.decode_all(blob)) == 1
    assert heif.decode_still(blob, with_alpha=True)[3] is not None
    plain = heif.encode_still(y, u, v, lossless=True)
    assert heif.decode_still(plain, with_alpha=True)[3] is None


def test_heif_transform_validation():
    y, u, v = synth(64, 64)
    with pytest.raises(ValueError):
        heif.encode_still(y, u, v, rotation=45)
    with pytest.raises(ValueError):
        heif.encode_still(y, u, v, mirror=2)
    with pytest.raises(ValueError):
        heif.encode_still(y, u, v, clean_aperture=(10, 10, 0))
    # clap region outside the image fails at decode, not silently
    blob = heif.encode_still(y, u, v, clean_aperture=(100, 100, 0, 0))
    with pytest.raises(IOError):
        heif.decode_still(blob)


def test_heif_color_and_hdr_properties():
    """pixi (MIAF-required, always written), colr nclx presets, and the
    mdcv/clli static-HDR boxes roundtrip through writer and reader."""
    y, u, v = synth(64, 64)
    md = ((13250, 34500), (7500, 3000), (34000, 16000), (15635, 16450),
          10000000, 1)
    blob = heif.encode_still(y, u, v, crf=18.0, colr="pq",
                             mastering_display=md,
                             content_light=(1000, 400))
    info = heif.HeifReader(blob).color_info()
    assert info["pixi"] == (8, 8, 8)
    assert info["colr"] == heif.COLR_PRESETS["pq"]
    m = info["mastering_display"]
    assert m.primaries == ((13250, 34500), (7500, 3000), (34000, 16000))
    assert m.max_nits == 1000.0 and m.min_luminance == 1
    c = info["content_light_level"]
    assert (c.max_cll, c.max_fall) == (1000, 400)
    # explicit CICP tuple + default: pixi only
    blob2 = heif.encode_still(y, u, v, crf=18.0, colr=(9, 16, 9, 1))
    assert heif.HeifReader(blob2).color_info()["colr"] == (9, 16, 9, 1)
    plain = heif.HeifReader(heif.encode_still(y, u, v, crf=18.0))
    info3 = plain.color_info()
    assert info3 == {"pixi": (8, 8, 8)}
    with pytest.raises(ValueError):
        heif.encode_still(y, u, v, colr="bt2077")


def test_heif_sequence_rate_entry_remaps_pts():
    """A media edit with rate r presents media r-times faster: sample
    pts map through pres = (m - media_time) / rate (ISO 14496-12
    8.6.6).  rate 0 dwells (every sample pinned to the edit start)."""
    import struct as _s
    frames = _indexed_frames(8)
    blob = heif.encode_sequence(frames, fps=30, crf=12.0, gop=8, bf=2)
    r0 = heif.HeifSequenceReader(blob)
    i = blob.find(b"elst")
    assert i > 0 and _s.unpack(">I", blob[i + 8:i + 12])[0] == 1
    # entry = sd(4) mt(4) rate(2.2) at i+12; overwrite rate in place
    for rate_i, expect in [
            (2, [round(p / 2) for p in r0.sample_pts]),
            (0, [0] * len(r0.sample_pts))]:
        out = bytearray(blob)
        out[i + 20:i + 24] = _s.pack(">hH", rate_i, 0)
        r1 = heif.HeifSequenceReader(bytes(out))
        assert r1.edits[0][2] == float(rate_i)
        assert r1.sample_pts == expect, (rate_i, r1.sample_pts, expect)
    # display order survives a uniform speed change
    out = bytearray(blob)
    out[i + 20:i + 24] = _s.pack(">hH", 2, 0)
    decoded = heif.decode_sequence(bytes(out))
    assert [_fidx(y) for (y, _, _) in decoded] == list(range(8))


def test_heif_thumbnail_item():
    h, w = 128, 192
    y, u, v = synth(h, w, seed=5)
    blob = heif.encode_still(y, u, v, crf=18.0, thumbnail=True)
    rdr = heif.HeifReader(blob)
    t = rdr.thumbnail_item()
    assert t is not None
    # longest edge 256 -> no upscale: thumbnail keeps source dims here;
    # explicit size requested next
    thumb = heif.decode_thumbnail(blob)
    assert thumb is not None and thumb[0].shape == (t.height, t.width)
    blob2 = heif.encode_still(y, u, v, crf=18.0, thumbnail=(96, 64))
    t2 = heif.HeifReader(blob2).thumbnail_item()
    assert (t2.width, t2.height) == (96, 64)
    ty, tu, tv = heif.decode_thumbnail(blob2)
    assert ty.shape == (64, 96) and tu.shape == (32, 48)
    # content tracks the master (nearest downscale + lossy encode)
    ref = y[:: h // 64, :: w // 96][:64, :96]
    assert np.abs(ty.astype(int) - ref.astype(int)).mean() < 8.0
    # thumbnails stay out of decode_all / plain decode
    assert len(heif.decode_all(blob2)) == 1
    assert heif.decode_still(blob2)[0].shape == (h, w)
    assert heif.decode_thumbnail(
        heif.encode_still(y, u, v, crf=18.0)) is None


def test_heif_grid_transforms_and_props():
    """Transform + colour properties on the GRID item apply to the
    assembled canvas (decode_still runs them after tiling)."""
    h, w = 96, 160
    rng = np.random.default_rng(11)
    y = rng.integers(16, 236, (h, w), dtype=np.uint8)
    u = np.full((h // 2, w // 2), 100, np.uint8)
    v = np.full((h // 2, w // 2), 150, np.uint8)
    blob = heif.encode_still_grid(y, u, v, tile=64, crf=16.0,
                                  rotation=180, colr="bt709",
                                  content_light=(600, 200))
    rdr = heif.HeifReader(blob)
    gitem = rdr.read_image()
    assert rdr.item_types[gitem.item_id] == b"grid"
    assert gitem.transforms == [("irot", 2)]
    info = rdr.color_info(gitem.item_id)
    assert info["colr"] == heif.COLR_PRESETS["bt709"]
    assert info["content_light_level"].max_cll == 600
    yd, ud, vd = heif.decode_still(blob)
    y0, u0, v0 = heif.decode_still(blob, apply=False)
    np.testing.assert_array_equal(yd, np.rot90(y0, 2))
    np.testing.assert_array_equal(ud, np.rot90(u0, 2))


def test_heif_icc_profile_colr():
    y, u, v = synth(64, 64)
    icc = b"\x00\x00\x02\x00fakeICCprofiledata" * 4
    blob = heif.encode_still(y, u, v, crf=18.0, colr=("prof", icc))
    info = heif.HeifReader(blob).color_info()
    assert info["colr"] == ("prof", icc)


def test_heif_property_rich_mutation_fuzz():
    # byte mutations over a property-rich file must never hang or
    # crash the parser — clean errors or tolerated parses only
    import random
    import struct
    y, u, v = synth(48, 48)
    alpha = np.full((48, 48), 200, np.uint8)
    blob = heif.encode_still(y, u, v, crf=22.0, rotation=90, mirror=1,
                             exif=b"II*\x00" + bytes(12), alpha=alpha,
                             thumbnail=(24, 24), colr="pq",
                             mastering_display=((1, 2), (3, 4), (5, 6),
                                                (7, 8), 1000, 1),
                             content_light=(10, 5))
    rng = random.Random(0)
    meta_end = blob.find(b"mdat")
    for _ in range(300):
        b = bytearray(blob)
        for _k in range(rng.randint(1, 4)):
            b[rng.randrange(8, meta_end)] = rng.randrange(256)
        try:
            r = heif.HeifReader(bytes(b))
            r.color_info()
            r.exif()
            r.alpha_item()
            r.thumbnail_item()
            for it in r.items[:2]:
                it.to_annexb()
        except (IOError, ValueError, struct.error, IndexError):
            pass


def test_heif_sequence_hdr_sample_entry():
    frames = [synth(64, 64, seed=i) for i in range(4)]
    enc = tk.Encoder("libx265", 64, 64, fps=(30, 1), gop=4, crf=20.0,
                     opts="x265-params=log-level=0")
    wtr = heif.HeifSequenceWriter(
        30, colr="pq", content_light=(1000, 300),
        mastering_display=((1, 2), (3, 4), (5, 6), (7, 8), 5000000, 50))
    pend = []
    for i, (y, u, v) in enumerate(frames):
        pend += enc.encode(y, u, v, pts=i)
    pend += enc.flush()
    extra = enc.extradata()
    enc.close()
    for i, p in enumerate(pend):
        wtr.add_frame((extra if i == 0 else b"") + p.data, pts=p.pts,
                      dts=p.dts)
    blob = wtr.tobytes()
    rdr = heif.HeifSequenceReader(blob)
    assert rdr.color_info["colr"] == heif.COLR_PRESETS["pq"]
    assert rdr.color_info["content_light_level"].max_cll == 1000
    assert rdr.color_info["mastering_display"].max_luminance == 5000000
    assert len(rdr.frames) == 4
    # libavformat still demuxes the container with the extra boxes
    dm = tk.Demuxer(bytes(blob))
    assert len([p for p in dm if p.stream == 0]) == 4
    dm.close()
    # default writer: no color info
    assert heif.HeifSequenceReader(
        heif.encode_sequence(frames, fps=30, crf=20.0)).color_info == {}


def test_heif_grid_composes_with_metadata_items():
    """The generic writer path: a grid primary PLUS exif, alpha and a
    thumbnail in one file (the full phone-HEIC item graph)."""
    h, w = 96, 128
    rng = np.random.default_rng(3)
    y = rng.integers(16, 236, (h, w), dtype=np.uint8)
    u = np.full((h // 2, w // 2), 100, np.uint8)
    v = np.full((h // 2, w // 2), 150, np.uint8)
    wtr = heif.HeifWriter()
    tiles = []
    for r in range(2):
        for c in range(2):
            ty = np.ascontiguousarray(y[r * 48:(r + 1) * 48,
                                        c * 64:(c + 1) * 64])
            tu = np.ascontiguousarray(u[r * 24:(r + 1) * 24,
                                        c * 32:(c + 1) * 32])
            tv = np.ascontiguousarray(v[r * 24:(r + 1) * 24,
                                        c * 32:(c + 1) * 32])
            tiles.append(heif._encode_one_annexb(ty, tu, tv, 16.0, True))
    gid = wtr.add_grid(tiles, 2, 2, w, h, colr="bt709")
    exif = b"II*\x00" + bytes(8)
    wtr.add_exif(exif, gid)
    thumb = heif._encode_one_annexb(y[::2, ::2].copy(),
                                    u[::2, ::2].copy(),
                                    v[::2, ::2].copy(), 20.0)
    wtr.add_thumbnail(thumb, gid)
    blob = wtr.tobytes()
    rdr = heif.HeifReader(blob)
    assert rdr.item_types[rdr.primary] == b"grid"
    assert rdr.exif(rdr.primary) == exif
    assert rdr.thumbnail_item(rdr.primary) is not None
    yd, ud, vd = heif.decode_still(blob)
    np.testing.assert_array_equal(yd, y)       # lossless tiles
    # decode_all presents the assembled canvas; tiles/thumbnail skipped
    allp = heif.decode_all(blob)
    assert len(allp) == 1
    np.testing.assert_array_equal(allp[0][0], y)
    ty2 = heif.decode_thumbnail(blob)
    assert ty2 is not None and ty2[0].shape == (48, 64)


def test_heif_review_fix_regressions():
    """Round-3 review fixes: thumbnail must not inherit a master clap;
    empty-edit-only elst still delays; odd clap offsets keep I420
    chroma sizes consistent."""
    import struct as _s
    h, w = 96, 128
    y, u, v = synth(h, w, seed=9)
    # 1. clap on master + thumbnail: thumb decodes without the crop
    blob = heif.encode_still(y, u, v, crf=18.0, thumbnail=(64, 48),
                             clean_aperture=(120, 88, 0, 0), rotation=90)
    ty, tu, tv = heif.decode_thumbnail(blob)
    assert ty.shape == (64, 48)          # rot90 applied, clap skipped
    # 2. odd clap offsets: chroma exactly ceil(cropped/2)
    blob2 = heif.encode_still(y, u, v, lossless=True,
                              clean_aperture=(100, 80, 1, 1))
    dy, du, dv = heif.decode_still(blob2)
    assert dy.shape == (80, 100) and du.shape == (40, 50)
    from gmat_tpu.core.frame import from_numpy_yuv420
    from_numpy_yuv420(dy[None], du[None], dv[None])   # shapes re-encode
    # 3. empty-edit-only elst: presentation delay preserved
    frames = [synth(64, 64, seed=i) for i in range(4)]
    seq = heif.encode_sequence(frames, fps=30, crf=20.0,
                               presentation_delay=5)
    i = seq.find(b"elst")
    cnt = _s.unpack(">I", seq[i + 8:i + 12])[0]
    # drop the media entry, keep only the empty edit (count 2 -> 1)
    assert cnt == 2
    trimmed = bytearray(seq)
    trimmed[i + 8:i + 12] = _s.pack(">I", 1)
    # shrink elst/edts/trak/moov sizes by 12 and fix stco
    trimmed[i - 4:i] = _s.pack(
        ">I", _s.unpack(">I", seq[i - 4:i])[0] - 12)
    del trimmed[i + 24:i + 36]
    for anc in (b"moov", b"trak", b"edts"):
        j = trimmed.find(anc)
        trimmed[j - 4:j] = _s.pack(
            ">I", _s.unpack(">I", bytes(trimmed[j - 4:j]))[0] - 12)
    k = trimmed.find(b"stco")
    off = _s.unpack(">I", bytes(trimmed[k + 12:k + 16]))[0]
    trimmed[k + 12:k + 16] = _s.pack(">I", off - 12)
    rr = heif.HeifSequenceReader(bytes(trimmed))
    assert min(rr.sample_pts) == 5


def test_heif_grid_parallel_decode_matches_serial():
    h, w = 128, 192
    rng = np.random.default_rng(21)
    y = rng.integers(16, 236, (h, w), dtype=np.uint8)
    u = np.full((h // 2, w // 2), 100, np.uint8)
    v = np.full((h // 2, w // 2), 150, np.uint8)
    blob = heif.encode_still_grid(y, u, v, tile=64, crf=16.0)
    a = heif.decode_still(blob, workers=1)
    b = heif.decode_still(blob, workers=4)
    for pa, pb in zip(a, b):
        np.testing.assert_array_equal(pa, pb)


def test_heif_grid_composes_alpha_and_exif_defaults():
    """Review fixes: default-target attachment works on grid-only
    writers, and grid-coded ALPHA planes decode (the phone-HEIC
    grid-alpha layout crashed parse_hvcc before)."""
    h, w = 96, 128
    rng = np.random.default_rng(6)
    y = rng.integers(16, 236, (h, w), dtype=np.uint8)
    u = np.full((h // 2, w // 2), 100, np.uint8)
    v = np.full((h // 2, w // 2), 150, np.uint8)
    alpha = np.zeros((h, w), np.uint8)
    alpha[20:70, 30:100] = 255
    neutral = np.full((h // 2, w // 2), 128, np.uint8)

    def tiles_of(py, pu, pv):
        out = []
        for r in range(2):
            for c in range(2):
                out.append(heif._encode_one_annexb(
                    np.ascontiguousarray(py[r * 48:(r + 1) * 48,
                                            c * 64:(c + 1) * 64]),
                    np.ascontiguousarray(pu[r * 24:(r + 1) * 24,
                                            c * 32:(c + 1) * 32]),
                    np.ascontiguousarray(pv[r * 24:(r + 1) * 24,
                                            c * 32:(c + 1) * 32]),
                    16.0, True))
        return out

    wtr = heif.HeifWriter()
    gid = wtr.add_grid(tiles_of(y, u, v), 2, 2, w, h)
    exif = b"II*\x00" + bytes(8)
    wtr.add_exif(exif)                     # default target = the grid
    # alpha stored as its OWN grid item (large phone HEICs do this)
    a_tiles = tiles_of(alpha, neutral, neutral)
    a_gid = wtr.add_grid(a_tiles, 2, 2, w, h)
    # demote the alpha grid to an aux: auxC property + auxl ref, unhide
    it = wtr._items[a_gid - 1]
    it.props.append((b"auxC", b"\0\0\0\0" + heif.ALPHA_AUX_TYPE + b"\0",
                     True))
    it.refs.append((b"auxl", [gid]))
    wtr.primary_override = gid
    blob = wtr.tobytes()
    rdr = heif.HeifReader(blob)
    assert rdr.exif(gid) == exif
    dy, du, dv, da = heif.decode_still(blob, with_alpha=True)
    np.testing.assert_array_equal(dy, y)
    np.testing.assert_array_equal(da, alpha)


def test_heif_iloc_index_size_and_pres_duration():
    import struct as _s
    # presentation duration includes the empty-edit delay
    frames = [synth(64, 64, seed=i) for i in range(4)]
    blob = heif.encode_sequence(frames, fps=30, crf=20.0,
                                presentation_delay=6)
    i = blob.find(b"tkhd")
    dur = _s.unpack(">I", blob[i + 24:i + 28])[0]
    assert dur == 4 + 6            # samples + delay (timescale = fps)
    # iloc v1 with index_size=4: extent_index bytes must be skipped
    y, u, v = synth(64, 64)
    base = heif.encode_still(y, u, v, lossless=True)
    it = heif.HeifReader(base).read_image()
    from gmat_tpu.av.heif import _box, _full, _u32
    pitm = _full(b"pitm", 0, 0, _s.pack(">H", 1))
    body = bytes([0x44, 0x04]) + _s.pack(">H", 1)   # index_size=4
    body += _s.pack(">H", 1) + _s.pack(">H", 1)     # id, method 1 (idat)
    body += _s.pack(">H", 0) + _s.pack(">H", 1)     # dref, 1 extent
    body += _s.pack(">I", 0xDEAD)                   # extent_index
    body += _s.pack(">II", 0, len(it.data))
    iloc = _full(b"iloc", 1, 0, body)
    ispe = _full(b"ispe", 0, 0, _s.pack(">II", 64, 64))
    ipco = _box(b"ipco", _box(b"hvcC", it.hvcc) + ispe)
    ipma = _full(b"ipma", 0, 0, _s.pack(">I", 1)
                 + _s.pack(">H", 1) + bytes([2, 0x81, 0x82]))
    meta = _box(b"meta", b"\0\0\0\0" + pitm + iloc
                + _box(b"iprp", ipco + ipma) + _box(b"idat", it.data))
    crafted = _box(b"ftyp", b"heic" + _u32(0) + b"heicmif1") + meta
    yd, ud, vd = heif.decode_still(crafted)
    np.testing.assert_array_equal(yd, y)
