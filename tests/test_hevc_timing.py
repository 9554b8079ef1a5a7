"""pic_timing / buffering_period SEI + SPS VUI HRD context
(HevcParserImpl.cpp:203-205, Hevc.h:110 HRD processing analog)."""
import numpy as np
import pytest

from gmat_tpu.av import hevc
from gmat_tpu.av import toolkit as tk


def _encode(n=8, w=192, h=128, extra=""):
    rng = np.random.default_rng(3)
    enc = tk.Encoder("libx265", w, h, fps=(25, 1), bitrate=300_000,
                     preset="veryfast",
                     opts="x265-params=hrd=1:vbv-bufsize=600:"
                          "vbv-maxrate=300:info=0" + extra)
    pkts = []
    for i in range(n):
        y = rng.integers(0, 256, (h, w)).astype(np.uint8)
        u = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
        v = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
        pkts += [bytes(p.data) for p in enc.encode(y, u, v, pts=i)]
    pkts += [bytes(p.data) for p in enc.flush()]
    extradata = bytes(enc.extradata() or b"")
    enc.close()
    return [extradata] + pkts


def test_hrd_context_from_sps_vui():
    pkts = _encode()
    ti = hevc.stream_timing_info(pkts)
    vui = ti["vui"]
    assert vui.num_units_in_tick == 1 and vui.time_scale == 25
    hrd = vui.hrd
    assert hrd is not None and hrd.nal_hrd and not hrd.vcl_hrd
    assert hrd.cpb_dpb_delays_present
    # x265 writes real (non-default) lengths — the parse must pick them up
    assert 1 <= hrd.au_cpb_removal_delay_len <= 32
    assert 1 <= hrd.dpb_output_delay_len <= 32
    assert hrd.cpb_cnt == (1,)


def test_pic_timing_cpb_dpb_delays():
    pkts = _encode(n=8)
    ti = hevc.stream_timing_info(pkts)
    pts = ti["pic_timings"]
    assert len(pts) == 8                       # one per AU
    # no frame_field_info in a progressive stream without interlace
    assert pts[0].pic_struct is None
    delays = [p.au_cpb_removal_delay for p in pts]
    assert all(d is not None and d >= 1 for d in delays)
    assert delays[-1] > delays[1]              # delays advance over the CVS
    assert all(p.pic_dpb_output_delay is not None for p in pts)


def test_buffering_period_initial_delays():
    pkts = _encode()
    ti = hevc.stream_timing_info(pkts)
    bps = ti["buffering_periods"]
    assert len(bps) >= 1
    bp = bps[0]
    assert len(bp.initial_cpb_removal_delay) == 1      # nal hrd, 1 cpb
    assert bp.initial_cpb_removal_delay[0] > 0
    assert bp.initial_cpb_removal_offset[0] >= 0


def test_pic_struct_on_interlaced_stream():
    pkts = _encode(extra=":interlace=tff")
    ti = hevc.stream_timing_info(pkts)
    vui = ti["vui"]
    assert vui.frame_field_info_present and vui.field_seq
    pts = ti["pic_timings"]
    assert pts, "interlaced stream must carry pic_timing SEIs"
    names = {p.pic_struct_name for p in pts}
    assert names <= {"top", "bottom"} and names
    assert all(p.source_scan_type == 0 for p in pts)   # interlaced


def test_malformed_pic_timing_skipped():
    pkts = _encode(n=2)
    ti = hevc.stream_timing_info(pkts)
    assert ti["pic_timings"]
    # direct parse of a truncated payload raises the documented error
    vui = ti["vui"]
    with pytest.raises(ValueError):
        hevc.parse_pic_timing(b"", vui) if vui.hrd else (_ for _ in ()).throw(ValueError)


def test_scan_cli_prints_hrd_summary(tmp_path, capsys):
    from gmat_tpu.apps import scan
    pkts = _encode(n=6)
    path = tmp_path / "hrd.hevc"
    path.write_bytes(b"".join(pkts))
    rc = scan.main(["hevc", str(path)])
    assert rc == 0
    out = capsys.readouterr().out
    import json
    summary = json.loads([l for l in out.splitlines()
                          if l.startswith("{")][-1])
    assert summary["hrd"]["nal_hrd"] is True
    assert summary["pic_timing"]["count"] == 6
    assert all(d >= 1 for d in summary["pic_timing"]["cpb_removal_delays"])


def test_buffering_period_irap_alt_pair_alignment():
    """D.2.2: with irap_cpb_params_present=1 the alt delay/offset pair
    follows each initial pair even without sub_pic_hrd — a second CPB's
    values must still parse aligned (round-4 review fix)."""
    hrd = hevc.Hrd(nal_hrd=True, initial_cpb_removal_delay_len=8,
                   au_cpb_removal_delay_len=4, dpb_output_delay_len=4,
                   cpb_cnt=(2,))
    vui = hevc.Vui(hrd=hrd)
    bits = ""
    bits += "1"            # ue(sps_id)=0
    bits += "1"            # irap_cpb_params_present
    bits += "0101"         # cpb_delay_offset u(4) = 5
    bits += "0110"         # dpb_delay_offset u(4) = 6
    bits += "1"            # concatenation
    bits += "0010"         # au_cpb_removal_delay_delta_minus1 u(4) = 2
    for delay, offset in ((17, 3), (99, 42)):      # two CPBs
        bits += format(delay, "08b") + format(offset, "08b")
        bits += "1" * 16                            # alt pair (skipped)
    bits += "0" * ((8 - len(bits) % 8) % 8)
    payload = int(bits, 2).to_bytes(len(bits) // 8, "big")
    bp = hevc.parse_buffering_period(payload, vui)
    assert bp.irap_cpb_params_present
    assert bp.cpb_delay_offset == 5 and bp.dpb_delay_offset == 6
    assert bp.concatenation and bp.au_cpb_removal_delay_delta == 3
    assert bp.initial_cpb_removal_delay == (17, 99)
    assert bp.initial_cpb_removal_offset == (3, 42)
