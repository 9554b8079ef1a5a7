"""Adversarial HEVC parser fixtures: non-default PPS, dependent slices,
extra slice-header bits, multi-slice addresses, long-term refs.

NALs are synthesized field-by-field from the H.265 syntax tables (7.3.2.2,
7.3.2.3, 7.3.6.1) with an independent bit-writer, so a single misaligned
read in the parser scrambles every later field and fails loudly.
"""
import numpy as np
import pytest

from gmat_tpu.av import hevc


class BitWriter:
    def __init__(self):
        self.bits = []

    def u(self, n, v):
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)
        return self

    def ue(self, v):
        k = v + 1
        nbits = k.bit_length()
        self.u(nbits - 1, 0)
        self.u(nbits, k)
        return self

    def se(self, v):
        k = 2 * v - 1 if v > 0 else -2 * v
        return self.ue(k)

    def nal(self, nal_type):
        """Finish: rbsp stop bit, byte-align, emulation prevention, header."""
        bits = self.bits + [1]
        while len(bits) % 8:
            bits.append(0)
        raw = bytearray()
        for i in range(0, len(bits), 8):
            raw.append(int("".join(map(str, bits[i:i + 8])), 2))
        out = bytearray([nal_type << 1, 1])      # nal header, tid+1=1
        zeros = 0
        for b in raw:
            if zeros >= 2 and b <= 3:
                out.append(3)
                zeros = 0
            out.append(b)
            zeros = zeros + 1 if b == 0 else 0
        return bytes(out)


def make_sps(sps_id=0, w=320, h=256, log2_max_poc=8, n_rps=2,
             lt_sets=()):
    b = BitWriter()
    b.u(4, 0)                  # vps id
    b.u(3, 0)                  # max_sub_layers_minus1
    b.u(1, 1)                  # temporal_id_nesting
    b.u(2, 0).u(1, 0).u(5, 1)  # PTL space/tier/profile
    b.u(32, 0x60000000)        # profile_compat
    b.u(48, 0)                 # constraint flags
    b.u(8, 93)                 # level
    b.ue(sps_id)
    b.ue(1)                    # chroma_format_idc 4:2:0
    b.ue(w).ue(h)
    b.u(1, 0)                  # conformance_window_flag
    b.ue(0).ue(0)              # bit depths
    b.ue(log2_max_poc - 4)
    b.u(1, 0)                  # sub_layer_ordering_info_present
    b.ue(4).ue(2).ue(0)        # dec_pic_buffering/reorder/latency
    b.ue(0)                    # log2_min_cb_minus3 (8)
    b.ue(3)                    # log2_diff -> CTB 64
    b.ue(0).ue(3)              # transform block sizes
    b.ue(0).ue(0)              # transform hierarchy depths
    b.u(1, 0)                  # scaling_list_enabled
    b.u(1, 0).u(1, 1)          # amp, sao
    b.u(1, 0)                  # pcm
    b.ue(n_rps)
    # set 0: one negative ref at delta 1
    b.ue(1).ue(0)              # n_neg=1, n_pos=0
    b.ue(0).u(1, 1)            # delta_poc_s0_minus1=0, used=1
    if n_rps > 1:
        # set 1: inter-set predicted from set 0 (delta_rps = -1)
        b.u(1, 1)              # inter_ref_pic_set_prediction_flag
        b.u(1, 1).ue(0)        # sign=1, abs_delta_minus1=0 -> delta=-1
        b.u(1, 1)              # used_by_curr_pic_flag[0]
        b.u(1, 1)              # used_by_curr_pic_flag[num_delta_pocs]
    b.u(1, 1 if lt_sets else 0)    # long_term_ref_pics_present
    if lt_sets:
        b.ue(len(lt_sets))
        for poc in lt_sets:
            b.u(log2_max_poc, poc).u(1, 1)
    return b.nal(hevc.NAL_SPS)


def make_pps(pps_id=0, sps_id=0, dep=True, output_flag=True, extra=2):
    b = BitWriter()
    b.ue(pps_id).ue(sps_id)
    b.u(1, 1 if dep else 0)
    b.u(1, 1 if output_flag else 0)
    b.u(3, extra)
    b.u(1, 1)                  # sign_data_hiding
    b.u(1, 1)                  # cabac_init_present
    b.ue(2).ue(1)              # num_ref_idx defaults minus1
    b.se(-3)                   # init_qp_minus26
    b.u(1, 0).u(1, 1)          # constrained_intra, transform_skip
    b.u(1, 1).ue(1)            # cu_qp_delta + depth
    b.se(2).se(-2)             # cb/cr offsets
    b.u(1, 1)                  # slice_chroma_qp_offsets_present
    b.u(1, 1).u(1, 0)          # weighted pred/bipred
    b.u(1, 0)                  # transquant_bypass
    b.u(1, 0).u(1, 1)          # tiles, entropy sync
    return b.nal(hevc.NAL_PPS)


def make_slice(pps, spsf, poc_lsb, *, first=True, dependent=False,
               address=0, idr=False, rps_idx=0, lt_pics=(),
               log2_max_poc=8, extra=2, output_flag=True, n_rps=2):
    b = BitWriter()
    b.u(1, 1 if first else 0)
    if idr:
        b.u(1, 0)              # no_output_of_prior_pics
    b.ue(pps)                  # slice_pic_parameter_set_id
    if not first:
        if dependent is not None:
            b.u(1, 1 if dependent else 0)
        nbits = max(1, (spsf.pic_size_in_ctbs - 1).bit_length())
        b.u(nbits, address)
    if not (not first and dependent):
        b.u(extra, 0b10 if extra else 0)   # slice_reserved_flags
        b.ue(1)                # slice_type P
        if output_flag:
            b.u(1, 1)          # pic_output_flag
        if not idr:
            b.u(log2_max_poc, poc_lsb)
            b.u(1, 1)          # short_term_ref_pic_set_sps_flag
            if n_rps > 1:
                b.u(max(1, (n_rps - 1).bit_length()), rps_idx)
            if spsf.lt_present:
                if spsf.lt_poc_lsb_sps:
                    b.ue(0)    # num_long_term_sps
                b.ue(len(lt_pics))
                for poc in lt_pics:
                    b.u(log2_max_poc, poc).u(1, 1)
                    b.u(1, 0)  # delta_poc_msb_present
    t = hevc.NAL_IDR_W_RADL if idr else hevc.NAL_TRAIL_R
    return b.nal(t)


def test_sps_pps_full_fields():
    sps_nal = make_sps(sps_id=2, lt_sets=(5, 9))
    spsf = hevc.parse_sps_full(sps_nal)
    assert spsf.sps_id == 2
    assert spsf.sps.width == 320 and spsf.sps.height == 256
    assert spsf.log2_max_poc_lsb == 8
    assert spsf.pic_size_in_ctbs == (320 // 64) * (256 // 64)
    assert spsf.lt_present and spsf.lt_poc_lsb_sps == (5, 9)
    assert len(spsf.rps_list) == 2
    # set 1 was inter-predicted from set 0 with delta_rps=-1:
    # ref DeltaPoc=-1 -> -2, plus delta itself -> two negative refs
    assert spsf.rps_list[1].s0_deltas == [0, 1]
    pps_nal = make_pps(pps_id=3, sps_id=2, extra=2)
    pps = hevc.parse_pps(pps_nal)
    assert pps.pps_id == 3 and pps.sps_id == 2
    assert pps.dependent_slices and pps.output_flag_present
    assert pps.num_extra_slice_header_bits == 2
    assert pps.num_ref_idx_l0_default == 3 and pps.num_ref_idx_l1_default == 2
    assert pps.init_qp == 23 and pps.cb_qp_offset == 2 and pps.cr_qp_offset == -2
    assert pps.transform_skip and pps.cu_qp_delta_enabled
    assert pps.entropy_coding_sync and not pps.tiles_enabled


def test_slice_header_with_nondefault_pps():
    """extra bits + output flag + dependent slices + addresses must not
    shift the POC/RPS reads."""
    sps_nal = make_sps(sps_id=2)
    pps_nal = make_pps(pps_id=3, sps_id=2)
    spsf = hevc.parse_sps_full(sps_nal)
    pps = hevc.parse_pps(pps_nal)
    sps_map, pps_map = {2: spsf}, {3: pps}

    sl = hevc.parse_slice_rps(
        make_slice(3, spsf, poc_lsb=7, rps_idx=0), sps_map, pps_map)
    assert sl is not None and sl.poc_lsb == 7 and sl.ref_pocs == {6}
    # rps set 1 (two negative refs at -1, -2)
    sl = hevc.parse_slice_rps(
        make_slice(3, spsf, poc_lsb=7, rps_idx=1), sps_map, pps_map)
    assert sl.ref_pocs == {6, 5}
    # dependent slice segment -> None (inherits previous header)
    dep = make_slice(3, spsf, poc_lsb=7, first=False, dependent=True,
                     address=5)
    assert hevc.parse_slice_rps(dep, sps_map, pps_map) is None
    # non-first *independent* segment: address parsed, header still exact
    ind = make_slice(3, spsf, poc_lsb=9, first=False, dependent=False,
                     address=10, rps_idx=0)
    sl = hevc.parse_slice_rps(ind, sps_map, pps_map)
    assert sl.poc_lsb == 9 and sl.ref_pocs == {8}
    # unknown pps id -> None, not garbage
    assert hevc.parse_slice_rps(
        make_slice(1, spsf, poc_lsb=7), sps_map, pps_map) is None


def test_long_term_refs_block_skip():
    """A frame held as a long-term reference must not be skippable."""
    sps_nal = make_sps(lt_sets=())
    # sps WITH lt enabled but no sps-level sets
    b_sps = make_sps(lt_sets=(3,))
    spsf = hevc.parse_sps_full(b_sps)
    pps_nal = make_pps(pps_id=0, sps_id=0, dep=False, extra=0)
    pps = hevc.parse_pps(pps_nal)
    sl = hevc.parse_slice_rps(
        make_slice(0, spsf, poc_lsb=7, rps_idx=0, lt_pics=(2,), extra=0),
        {0: spsf}, {0: pps})
    assert sl.ref_pocs == {6, 2}


def test_analyze_skippable_synthetic_dependent_slices():
    """Full AppHevcParse analysis over a synthetic multi-slice stream."""
    sps_nal = make_sps(sps_id=0)
    pps_nal = make_pps(pps_id=0, sps_id=0)
    spsf = hevc.parse_sps_full(sps_nal)

    def au(*nals):
        return b"".join(b"\x00\x00\x00\x01" + n for n in nals)

    idr = make_slice(0, spsf, 0, idr=True)
    # each AU: independent slice + a dependent slice segment
    def frame(poc, rps_idx):
        main = make_slice(0, spsf, poc, rps_idx=rps_idx)
        dep = make_slice(0, spsf, poc, first=False, dependent=True,
                         address=3)
        return au(main, dep)

    packets = [au(sps_nal, pps_nal, idr),
               frame(1, 0),      # refs {0}
               frame(2, 0),      # refs {1}
               frame(4, 1),      # refs {3, 2} -> frame 2 still referenced
               frame(5, 0)]      # refs {4}  -> frame 4 referenced
    res = hevc.analyze_skippable(packets)
    assert [p for p, _ in res] == [0, 1, 2, 4, 5]
    skip = [s for _, s in res]
    # frame 1 unused by frame 2's successor? frame 2 refs {1} -> not skip;
    # frame 2 is referenced by frame 4 ({3,2}); frame 4 by frame 5; the
    # only provably-unused mid frame is none, last never skippable
    assert skip == [False, False, False, False, False]
    # now a stream where poc 2 is NOT referenced afterwards
    packets2 = [au(sps_nal, pps_nal, idr),
                frame(1, 0),     # refs {0}
                frame(2, 0),     # refs {1}
                frame(3, 1)]     # refs {2, 1}... set1 = {-1,-2}
    res2 = hevc.analyze_skippable(packets2)
    assert res2[1][1] is False   # poc1 referenced by poc2
    packets3 = [au(sps_nal, pps_nal, idr),
                frame(2, 0),     # refs {1}
                frame(4, 0)]     # refs {3} -> poc 2 unused by next
    res3 = hevc.analyze_skippable(packets3)
    assert res3[1][1] is True    # poc 2 skippable


def test_poc_lsb_wraparound_refs():
    """POC-lsb arithmetic wraps mod 2^log2_max_poc_lsb (8.3.1): a frame at
    poc 255 referenced by poc 0's set {delta -1} must not be skippable."""
    sps_nal = make_sps(sps_id=0, log2_max_poc=8)
    pps_nal = make_pps(pps_id=0, sps_id=0, dep=False, extra=0)
    spsf = hevc.parse_sps_full(sps_nal)
    pps = hevc.parse_pps(pps_nal)
    sl = hevc.parse_slice_rps(
        make_slice(0, spsf, poc_lsb=0, rps_idx=0, extra=0),
        {0: spsf}, {0: pps})
    assert 255 in sl.ref_pocs                 # (0 - 1) mod 256


def test_skip_scaling_list_consumes_all_matrices():
    """7.3.4: sizeId 3 iterates matrixId 0 AND 3 (two 32x32 lists) —
    under-consuming desyncs every SPS field after scaling_list_data."""
    w = BitWriter()
    for _ in range(6 + 6 + 6 + 2):       # sizeIds 0-2: 6 each; 3: TWO
        w.u(1, 0)                        # pred_mode_flag = 0
        w.ue(0)                          # pred_matrix_id_delta
    w.u(16, 0xA5A5)                      # sentinel after the list
    bits = list(w.bits)
    while len(bits) % 8:
        bits.append(0)
    raw = bytearray()
    for i in range(0, len(bits), 8):
        raw.append(int("".join(map(str, bits[i:i + 8])), 2))
    r = hevc.BitReader(bytes(raw), skip_header=0)
    hevc._skip_scaling_list(r)
    assert r.u(16) == 0xA5A5


def test_split_annexb_never_emits_empty_nals():
    for data in (b"\x00\x00\x01\x40\x01\x00\x00\x01",      # trailing code
                 b"\x00\x00\x01\x00\x00\x01\x40\x01",      # doubled code
                 b"\x00\x00\x00\x01"):                     # only a code
        for n in hevc.split_annexb(data):
            assert len(n) > 0
            hevc.nal_type(n)             # must not IndexError


def test_parse_hvcc_rejects_truncated():
    with pytest.raises(ValueError):
        hevc.parse_hvcc(b"")
    with pytest.raises(ValueError):
        hevc.parse_hvcc(bytes(22))
