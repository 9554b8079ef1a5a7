"""HEVC RPS parsing + skippable analysis + scan apps."""
import json

import numpy as np
import pytest

from gmat_tpu.av import hevc, toolkit as tk


@pytest.fixture(scope="module")
def hevc_stream():
    w, h = 160, 128
    enc = tk.Encoder("libx265", w, h, fps=(30, 1), gop=30, bf=3, crf=22.0,
                     opts="x265-params=log-level=0")
    pkts = []
    for i in range(40):
        y = ((np.add.outer(np.arange(h), np.arange(w)) * 0.4 + i * 6) % 200
             + 20).astype(np.uint8)
        u = np.full((h // 2, w // 2), 100 + (i % 30), np.uint8)
        v = np.full((h // 2, w // 2), 150 - (i % 20), np.uint8)
        pkts += enc.encode(y, u, v, pts=i)
    pkts += enc.flush()
    extra = enc.extradata()
    enc.close()
    return [extra + pkts[0].data] + [p.data for p in pkts[1:]]


def test_sps_full_and_pps(hevc_stream):
    nals = {hevc.nal_type(n): n for n in hevc.split_annexb(hevc_stream[0])}
    spsf = hevc.parse_sps_full(nals[hevc.NAL_SPS])
    assert spsf.sps.width == 160 and spsf.sps.height == 128
    assert 4 <= spsf.log2_max_poc_lsb <= 16
    # x265 signals RPS per-slice (num_short_term_ref_pic_sets == 0 is valid)
    assert isinstance(spsf.rps_list, list)
    pps = hevc.parse_pps(nals[hevc.NAL_PPS])
    assert pps.pps_id == 0


def test_analyze_skippable_b_frames(hevc_stream):
    res = hevc.analyze_skippable(hevc_stream)
    assert len(res) == 40
    skippable = sum(1 for _, s in res if s)
    assert skippable >= 10            # B-pyramid leaves are skippable
    # should exactly match the *_N NAL-type ground truth for x265 output
    truth = []
    for d in hevc_stream:
        for n in hevc.split_annexb(d):
            if hevc.is_vcl(hevc.nal_type(n)):
                truth.append(hevc.is_sublayer_nonref(hevc.nal_type(n)))
                break
    got = [s for _, s in res]
    assert got == truth


def test_scan_hevc_app(hevc_stream, tmp_path, capsys):
    # mux the hevc stream into an mp4 first
    from gmat_tpu.apps.scan import main
    path = str(tmp_path / "s.mp4")
    mux = tk.Muxer(path, 160, 128, (30, 1), tk.CODEC_HEVC, b"")
    for i, d in enumerate(hevc_stream):
        mux.write(tk.Packet(d, i, i, i == 0, False, 0))
    mux.close()
    assert main(["hevc", path]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    summary = json.loads(out[-1])
    assert summary["total"] == 40 and summary["skippable"] >= 10


def test_scan_census_app(tmp_path, capsys):
    from gmat_tpu.apps.scan import main
    from .test_extractor import make_clip
    make_clip(str(tmp_path / "a.mp4"), bf=2)
    make_clip(str(tmp_path / "b.mp4"))
    (tmp_path / "broken.mp4").write_bytes(b"garbage")
    assert main(["census", str(tmp_path), "-threads", "2"]) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    summary = json.loads(lines[-1])
    assert summary["total_files"] == 3
    assert summary["total_frames"] == 120
    capsys.readouterr()
    assert main(["census", str(tmp_path), "-fast"]) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    recs = [json.loads(l) for l in lines[:-1]]
    a = next(r for r in recs if r["file"] == "a.mp4")
    assert a["skipped"] > 0 and a["frames"] < 60


@pytest.fixture(scope="module")
def hevc_stream_pts():
    """Like hevc_stream but keeps each packet's pts (decode order)."""
    w, h = 160, 128
    enc = tk.Encoder("libx265", w, h, fps=(30, 1), gop=30, bf=3, crf=22.0,
                     opts="x265-params=log-level=0")
    pkts = []
    for i in range(40):
        y = ((np.add.outer(np.arange(h), np.arange(w)) * 0.4 + i * 6) % 200
             + 20).astype(np.uint8)
        u = np.full((h // 2, w // 2), 100 + (i % 30), np.uint8)
        v = np.full((h // 2, w // 2), 150 - (i % 20), np.uint8)
        pkts += enc.encode(y, u, v, pts=i)
    pkts += enc.flush()
    extra = enc.extradata()
    enc.close()
    datas = [extra + pkts[0].data] + [p.data for p in pkts[1:]]
    return datas, [p.pts for p in pkts], (w, h)


def test_vps_parse(hevc_stream_pts):
    datas, _, _ = hevc_stream_pts
    nals = {hevc.nal_type(n): n for n in hevc.split_annexb(datas[0])}
    vps = hevc.parse_vps(nals[hevc.NAL_VPS])
    spsf = hevc.parse_sps_full(nals[hevc.NAL_SPS])
    assert vps.max_sub_layers == spsf.sps.max_sub_layers
    assert vps.general_profile_idc == spsf.sps.general_profile_idc
    assert vps.general_level_idc == spsf.sps.general_level_idc
    assert vps.max_layers == 1
    assert len(vps.num_reorder_pics) == vps.max_sub_layers
    # bf=3 stream must allow reordering in the DPB
    assert vps.num_reorder_pics[-1] >= 1
    if vps.fps:                     # x265 writes vps timing info
        assert abs(vps.fps - 30.0) < 1e-6


def test_poc_matches_libavcodec_display_order(hevc_stream_pts):
    """VERDICT r2 #9: full 8.3.1 POC derivation.  Ranking decode-order
    packets by derived POC must reproduce libavcodec's actual output
    (display) order, B-frames included."""
    datas, pts, (w, h) = hevc_stream_pts
    slices = hevc.parse_stream_slices(datas)
    pocs = hevc.derive_pocs(slices)
    assert len(pocs) == len(datas) == len(pts)
    # libavcodec ground truth: display-order pts sequence
    dec = tk.Decoder(tk.CODEC_HEVC, width=w, height=h)
    disp_pts = []
    for d, p in zip(datas, pts):
        disp_pts += [pp for (_y, _u, _v, pp) in dec.decode(d, p)]
    disp_pts += [pp for (_y, _u, _v, pp) in dec.decode(None)]
    dec.close()
    assert len(disp_pts) == len(datas)
    # our prediction: stable-sort decode order by (coded video sequence,
    # POC) — POC resets at IDR/BLA
    seg_id, seg = [], -1
    for sl in slices:
        if sl.is_idr or sl.nal_type_ in hevc._NAL_BLA:
            seg += 1
        seg_id.append(seg)
    order = sorted(range(len(pocs)), key=lambda i: (seg_id[i], pocs[i], i))
    assert [pts[i] for i in order] == disp_pts
    # sanity: with bf=3 decode order must differ from display order
    assert pts != disp_pts


def test_scan_hevc_display_index(hevc_stream_pts, tmp_path, capsys):
    datas, pts, _ = hevc_stream_pts
    from gmat_tpu.apps.scan import main as scan_main
    import struct
    raw = str(tmp_path / "s.hevc")
    with open(raw, "wb") as f:
        for d in datas:
            f.write(d)
    rc = scan_main(["hevc", raw])
    out = capsys.readouterr().out
    assert rc == 0
    lines = [l for l in out.splitlines() if "display_index=" in l]
    assert len(lines) == len(datas)
    idxs = sorted(int(l.split("display_index=")[1]) for l in lines)
    assert idxs == list(range(len(datas)))


def _hdr_stream(n=4):
    w, h = 96, 64
    md = ("G(13250\\,34500)B(7500\\,3000)R(34000\\,16000)"
          "WP(15635\\,16450)L(10000000\\,1)")
    enc = tk.Encoder("libx265", w, h, fps=(30, 1), crf=24.0,
                     opts="x265-params=log-level=0:master-display=" + md
                          + ":max-cll=1000\\,400")
    y = ((np.add.outer(np.arange(h), np.arange(w)) * 0.7) % 220
         + 16).astype(np.uint8)
    u = np.full((h // 2, w // 2), 110, np.uint8)
    v = np.full((h // 2, w // 2), 130, np.uint8)
    pkts = []
    for i in range(n):
        pkts += enc.encode(y, u, v, pts=i)
    pkts += enc.flush()
    out = [enc.extradata() + pkts[0].data] + [p.data for p in pkts[1:]]
    enc.close()
    return out


def test_sei_hdr_metadata_from_x265():
    """x265-authored mastering-display + max-cll SEI parse back to the
    exact values given on the encoder command line (real-encoder
    oracle, like the RPS tests)."""
    hdr = hevc.stream_hdr_metadata(_hdr_stream())
    m = hdr["mastering_display"]
    assert m.primaries == ((13250, 34500), (7500, 3000), (34000, 16000))
    assert m.white_point == (15635, 16450)
    assert (m.max_luminance, m.min_luminance) == (10000000, 1)
    assert m.max_nits == 1000.0
    c = hdr["content_light_level"]
    assert (c.max_cll, c.max_fall) == (1000, 400)


def test_sei_message_parsing_synthetic():
    # ff-escaped payload type (256 = FF 01) and two messages in one NAL
    pl1 = bytes(range(8))
    pl2 = b"\x03\xe8\x01\x90"                      # CLL 1000/400
    body = (b"\xff\x01" + bytes([len(pl1)]) + pl1
            + bytes([144, len(pl2)]) + pl2 + b"\x80")
    nal = bytes([39 << 1, 1]) + body
    msgs = hevc.parse_sei(nal)
    assert [(m.payload_type, m.payload) for m in msgs] == \
        [(256, pl1), (144, pl2)]
    cll = hevc.parse_content_light_level(msgs[1].payload)
    assert (cll.max_cll, cll.max_fall) == (1000, 400)
    # truncated message: parser keeps the complete prefix, no raise
    assert hevc.parse_sei(nal[:-3])[0].payload_type == 256


def test_sei_recovery_point():
    # recovery_poc_cnt=2 (se codeNum 3: 00100), exact_match=1,
    # broken_link=0, stop bit -> 0010 0101 = 0x25
    nal = bytes([39 << 1, 1]) + bytes([6, 1, 0x25])
    msgs = hevc.parse_sei(nal)
    rp = hevc.parse_recovery_point(msgs[0].payload)
    assert (rp.recovery_poc_cnt, rp.exact_match, rp.broken_link) == \
        (2, True, False)
    with pytest.raises(ValueError):
        hevc.parse_recovery_point(b"")


def test_scan_hevc_reports_hdr(tmp_path, capsys):
    from gmat_tpu.apps import scan
    pkts = _hdr_stream()
    path = str(tmp_path / "hdr.hevc")
    mux = tk.Muxer(path, 96, 64, (30, 1), tk.CODEC_HEVC, b"")
    for i, d in enumerate(pkts):
        mux.write(tk.Packet(d, i, i, i == 0, False, 0))
    mux.close()
    assert scan.main(["hevc", path]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    summary = json.loads(out[-1])
    assert summary["content_light_level"] == {"max_cll": 1000,
                                              "max_fall": 400}
    assert summary["mastering_display"]["max_nits"] == 1000.0


def test_sei_type_128_before_hdr_messages():
    # payload type 0x80 (structure_of_pictures_info) must not be read
    # as the rbsp stop bit — messages after it still parse
    pl128 = bytes(4)
    pl_cll = b"\x03\xe8\x01\x90"
    body = (bytes([0x80, len(pl128)]) + pl128
            + bytes([144, len(pl_cll)]) + pl_cll + b"\x80")
    nal = bytes([39 << 1, 1]) + body
    msgs = hevc.parse_sei(nal)
    assert [m.payload_type for m in msgs] == [128, 144]
    hdr = hevc.stream_hdr_metadata([b"\x00\x00\x00\x01" + nal])
    assert hdr["content_light_level"].max_cll == 1000


def test_split_annexb_trailing_zero_padding():
    # trailing_zero_8bits between NALs (and tail padding) are stripped;
    # a 4-byte start code alone still yields clean payloads
    a, b = bytes([hevc.NAL_SPS << 1, 1, 0x42, 0x80]), \
        bytes([hevc.NAL_PPS << 1, 1, 0x10, 0x80])
    stream = (b"\x00\x00\x00\x01" + a + b"\x00\x00"      # 2 pad zeros
              + b"\x00\x00\x00\x01" + b + b"\x00\x00\x00")
    assert hevc.split_annexb(stream) == [a, b]


def test_truncated_nal_raises_valueerror_not_indexerror():
    # a slice header cut mid-RPS must surface ValueError (and the
    # stream walk must skip it, not crash)
    stream = _hdr_stream()
    nals = hevc.split_annexb(stream[0])
    vcl = next(n for n in nals if hevc.is_vcl(hevc.nal_type(n)))
    cut = vcl[:6]
    with pytest.raises(ValueError):
        hevc.BitReader(cut).u(200)
    # full stream with a truncated final packet: slices parse for the
    # intact pictures, no exception
    packets = stream[:-1] + [stream[-1][:6]]
    slices = hevc.parse_stream_slices(packets)
    assert len(slices) == len(stream) - 1


def test_skippable_at_idr_boundary():
    # closed-GOP stream (forced IDRs): the frame BEFORE each IDR is
    # unreferenced (empty IDR RPS) and must be flagged skippable — the
    # reference's GetRefPicSet().find()==end() behavior
    w, h = 96, 64
    enc = tk.Encoder("libx265", w, h, fps=(30, 1), gop=8, bf=0, crf=24.0,
                     opts="x265-params=log-level=0:no-open-gop=1"
                          ":keyint=8:min-keyint=8:scenecut=0")
    y = ((np.add.outer(np.arange(h), np.arange(w)) * 0.5) % 200
         + 20).astype(np.uint8)
    u = np.full((h // 2, w // 2), 110, np.uint8)
    v = np.full((h // 2, w // 2), 130, np.uint8)
    pkts = []
    for i in range(24):
        pkts += enc.encode(y + i, u, v, pts=i)
    pkts += enc.flush()
    datas = [enc.extradata() + pkts[0].data] + [p.data for p in pkts[1:]]
    enc.close()
    slices = hevc.parse_stream_slices(datas)
    idr_idx = [i for i, sl in enumerate(slices) if sl.is_idr]
    assert len(idr_idx) >= 2          # forced closed GOPs
    res = hevc.analyze_skippable(datas)
    for i in idr_idx:
        if i > 0:
            assert res[i - 1][1], f"frame before IDR {i} not skippable"
