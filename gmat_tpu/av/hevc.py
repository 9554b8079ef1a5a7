"""HEVC bitstream parser subset — rebuild of metrans HevcParser (M8).

Covers what the toolkit needs from the reference's ~4.7k-LoC parser
(metrans/include/HevcParser/*):
  * annexb NAL splitting (NvHeifWriter.cpp:81-155 start-code scan)
  * NAL type classification incl. sub-layer non-reference detection
  * SPS parsing: profile_tier_level, chroma format, dimensions, bit depth
    (enough to build an hvcC record and to reason about streams)
  * slice-header first_slice flag / slice type

Pure Python; packets are small and this runs once per stream setup.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

NAL_TRAIL_N, NAL_TRAIL_R = 0, 1
NAL_IDR_W_RADL, NAL_IDR_N_LP, NAL_CRA = 19, 20, 21
NAL_VPS, NAL_SPS, NAL_PPS = 32, 33, 34


def split_annexb(data: bytes) -> List[bytes]:
    """Split an annexb stream into NAL payloads (no start codes)."""
    out = []
    i = 0
    n = len(data)
    start = -1
    while i + 3 <= n:
        if data[i] == 0 and data[i + 1] == 0 and data[i + 2] == 1:
            if start >= 0:
                end = i
                if end > start and data[end - 1] == 0:
                    end -= 1     # 4-byte start code of the next NAL
                out.append(data[start:end])
            i += 3
            start = i
        else:
            i += 1
    if start >= 0:
        out.append(data[start:n])
    return out


def nal_type(nal: bytes) -> int:
    return (nal[0] >> 1) & 0x3F


def is_vcl(t: int) -> bool:
    return t <= 31


def is_idr(t: int) -> bool:
    return t in (NAL_IDR_W_RADL, NAL_IDR_N_LP)


def is_irap(t: int) -> bool:
    return 16 <= t <= 23


def is_sublayer_nonref(t: int) -> bool:
    """TRAIL_N/TSA_N/STSA_N/RADL_N/RASL_N... — even VCL types <= 14."""
    return t <= 14 and t % 2 == 0


class BitReader:
    """RBSP bit reader (removes emulation-prevention bytes)."""

    def __init__(self, nal: bytes, skip_header: int = 2):
        rbsp = bytearray()
        i = skip_header
        while i < len(nal):
            if i + 2 < len(nal) and nal[i] == 0 and nal[i + 1] == 0 and nal[i + 2] == 3:
                rbsp += nal[i:i + 2]
                i += 3
            else:
                rbsp.append(nal[i])
                i += 1
        self.data = bytes(rbsp)
        self.pos = 0

    def u(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.data[self.pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def ue(self) -> int:
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 31:
                raise ValueError("bad exp-golomb")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)


@dataclasses.dataclass
class Sps:
    width: int
    height: int
    chroma_format_idc: int
    bit_depth_luma: int
    bit_depth_chroma: int
    general_profile_space: int
    general_tier_flag: int
    general_profile_idc: int
    general_profile_compat: int       # 32 bits
    general_constraint_bits: bytes    # 6 bytes
    general_level_idc: int
    max_sub_layers: int
    temporal_id_nesting: int
    raw: bytes = b""


def parse_sps(nal: bytes) -> Sps:
    r = BitReader(nal)
    r.u(4)                                  # sps_video_parameter_set_id
    max_sub_layers = r.u(3) + 1
    nesting = r.u(1)
    # profile_tier_level(1, max_sub_layers-1)
    space = r.u(2); tier = r.u(1); profile = r.u(5)
    compat = r.u(32)
    constraint = bytes(r.u(8) for _ in range(6))
    level = r.u(8)
    sub_present = [(r.u(1), r.u(1)) for _ in range(max_sub_layers - 1)]
    if max_sub_layers > 1:
        for _ in range(max_sub_layers - 1, 8):
            r.u(2)
        for pp, lp in sub_present:
            if pp:
                r.u(2 + 1 + 5 + 32 + 48)
            if lp:
                r.u(8)
    r.ue()                                  # sps_seq_parameter_set_id
    chroma = r.ue()
    if chroma == 3:
        r.u(1)
    width = r.ue()
    height = r.ue()
    if r.u(1):                              # conformance_window_flag
        left, right, top, bottom = r.ue(), r.ue(), r.ue(), r.ue()
        sub_w = 2 if chroma in (1, 2) else 1
        sub_h = 2 if chroma == 1 else 1
        width -= (left + right) * sub_w
        height -= (top + bottom) * sub_h
    bd_luma = r.ue() + 8
    bd_chroma = r.ue() + 8
    return Sps(width, height, chroma, bd_luma, bd_chroma, space, tier,
               profile, compat, constraint, level, max_sub_layers, nesting,
               raw=nal)


def first_slice_in_pic(nal: bytes) -> bool:
    t = nal_type(nal)
    if not is_vcl(t):
        return False
    return bool(nal[2] & 0x80)      # first_slice_segment_in_pic_flag


def classify_stream(data: bytes) -> List[Tuple[int, bytes]]:
    """annexb bytes -> [(nal_type, payload), ...]"""
    return [(nal_type(n), n) for n in split_annexb(data) if n]


def build_hvcc(vps: bytes, sps_nal: bytes, pps: bytes,
               length_size: int = 4) -> bytes:
    """HEVCDecoderConfigurationRecord (ISO 14496-15 §8.3.3.1) from
    parameter set NALs — what NvHeifWriter feeds via feedDecoderConfig
    (NvHeifWriter.cpp:211-224)."""
    sps = parse_sps(sps_nal)
    rec = bytearray()
    rec.append(1)                                         # configurationVersion
    rec.append((sps.general_profile_space << 6) |
               (sps.general_tier_flag << 5) | sps.general_profile_idc)
    rec += sps.general_profile_compat.to_bytes(4, "big")
    rec += sps.general_constraint_bits
    rec.append(sps.general_level_idc)
    rec += (0xF000).to_bytes(2, "big")                    # min_spatial_segmentation
    rec.append(0xFC)                                      # parallelismType
    rec.append(0xFC | (sps.chroma_format_idc & 3))
    rec.append(0xF8 | ((sps.bit_depth_luma - 8) & 7))
    rec.append(0xF8 | ((sps.bit_depth_chroma - 8) & 7))
    rec += (0).to_bytes(2, "big")                         # avgFrameRate
    rec.append((0 << 6) | ((sps.temporal_id_nesting & 1) << 2) |
               ((length_size - 1) & 3))
    arrays = [(NAL_VPS, vps), (NAL_SPS, sps_nal), (NAL_PPS, pps)]
    rec.append(len(arrays))
    for t, nal in arrays:
        rec.append(0x80 | t)                              # array_completeness=1
        rec += (1).to_bytes(2, "big")
        rec += len(nal).to_bytes(2, "big")
        rec += nal
    return bytes(rec)


def parse_hvcc(rec: bytes) -> Tuple[List[bytes], int]:
    """hvcC record -> (parameter set NALs, nal length size)."""
    length_size = (rec[21] & 3) + 1
    n_arrays = rec[22]
    nals = []
    i = 23
    for _ in range(n_arrays):
        i += 1
        count = int.from_bytes(rec[i:i + 2], "big"); i += 2
        for _ in range(count):
            ln = int.from_bytes(rec[i:i + 2], "big"); i += 2
            nals.append(rec[i:i + ln]); i += ln
    return nals, length_size
