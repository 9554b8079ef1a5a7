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
