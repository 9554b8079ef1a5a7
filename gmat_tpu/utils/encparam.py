"""Encoder option-string parser — NvEncoderParam compatibility.

Parses the GMAT/metrans encoder option strings (NvCodec/NvEncoderParam.h:
140-158; used in AppMeTrans's <VideoEncParam>, e.g.
"codec=hevc:fps=35:preset=p1:rc=vbr:bitrate=2M:gop=300:bf=2") into kwargs
for av.toolkit.Encoder.  NVENC-isms map to their libx264/x265 analogs:

  preset p1..p7  -> ultrafast..veryslow ladder
  rc constqp     -> CRF from -constqp / -cq
  rc vbr/cbr     -> bitrate (+ maxbitrate as vbv)
  -tune lowlatency -> tune zerolatency
"""
from __future__ import annotations

from typing import Dict, Tuple

_PRESET_MAP = {
    "p1": "ultrafast", "p2": "superfast", "p3": "veryfast", "p4": "faster",
    "p5": "medium", "p6": "slow", "p7": "veryslow",
    "default": "medium", "hq": "slow", "hp": "veryfast",
    "ll": "veryfast", "llhq": "faster", "llhp": "ultrafast",
}

_CODEC_MAP = {"h264": "libx264", "avc": "libx264",
              "hevc": "libx265", "h265": "libx265",
              "mjpeg": "mjpeg", "jpeg": "mjpeg"}


def _size(v: str) -> int:
    v = v.strip().upper()
    mult = 1
    if v.endswith("K"):
        mult, v = 1000, v[:-1]
    elif v.endswith("M"):
        mult, v = 1000000, v[:-1]
    return int(float(v) * mult)


def parse_enc_param(s: str, defaults: Dict = None) -> Dict:
    """Option string -> dict for av.toolkit.Encoder(**kwargs) plus extras
    ("codec_name", "fps")."""
    out = dict(defaults or {})
    out.setdefault("codec_name", "libx264")
    opts = {}
    for tok in filter(None, (t.strip() for t in s.split(":"))):
        if "=" in tok:
            k, v = tok.split("=", 1)
        else:
            k, v = tok, "1"
        opts[k.strip().lower()] = v.strip()

    x264_extra = []
    for k, v in opts.items():
        if k == "codec":
            out["codec_name"] = _CODEC_MAP.get(v.lower(), v)
        elif k == "preset":
            out["preset"] = _PRESET_MAP.get(v.lower(), v)
        elif k == "fps":
            if "/" in v:
                num, den = v.split("/")
                out["fps"] = (int(num), int(den))
            else:
                f = float(v)
                if f == int(f):
                    out["fps"] = (int(f), 1)
                else:   # 29.97 must not truncate to 29 (3.3% drift)
                    out["fps"] = (round(f * 1000), 1000)
        elif k == "gop":
            out["gop"] = int(v)
        elif k == "bf":
            out["bf"] = int(v)
        elif k in ("bitrate", "b"):
            out["bitrate"] = _size(v)
        elif k in ("maxbitrate", "vbvbufsize", "vbvinit"):
            x264_extra.append((k, _size(v)))
        elif k in ("constqp", "cq", "initqp", "crf"):
            out["crf"] = float(v.split(",")[0])
        elif k == "qmin":
            x264_extra.append(("qmin", int(v.split(",")[0])))
        elif k == "qmax":
            x264_extra.append(("qmax", int(v.split(",")[0])))
        elif k == "rc":
            # callers seed defaults with crf=-1.0 (the "unset" CLI
            # placeholder) — treat any negative crf as absent, or
            # rc=constqp silently falls back to the encoder default
            if v.lower() == "constqp" and out.get("crf", -1.0) < 0:
                out["crf"] = 23.0
        elif k in ("tune", "tuning"):
            if v.lower() in ("lowlatency", "ull", "lowdelay"):
                x264_extra.append(("tune", "zerolatency"))
        elif k == "profile":
            # NVENC profile GUID names (baseline/main/high/high444/main10)
            # are already the libx264/x265 -profile strings
            x264_extra.append(("profile", v.lower()))
        elif k in ("lookahead", "temporalaq", "aq"):
            pass   # quality knobs without a 1:1 libx264 flag; accepted
        else:
            raise ValueError(f"unknown encoder option {k!r} in {s!r}")

    extras = []
    for k, v in x264_extra:
        if k == "maxbitrate":
            extras.append(f"maxrate={v}")
        elif k == "vbvbufsize":
            extras.append(f"bufsize={v}")
        elif k == "vbvinit":
            # NVENC vbvInitialDelay -> libavcodec rc_initial_buffer_occupancy
            extras.append(f"rc_init_occupancy={v}")
        elif k in ("qmin", "qmax", "tune", "profile"):
            extras.append(f"{k}={v}")
    if extras:
        # MERGE with any opts inherited from `defaults` (layered parses:
        # metrans base params + per-rung suffix) — overwriting would
        # silently drop the base VBV/maxrate/profile settings.  Keys set
        # by this parse win over same-key defaults.
        prev = out.get("opts", "")
        new_keys = {e.split("=", 1)[0] for e in extras}
        kept = [e for e in prev.split(",")
                if e and e.split("=", 1)[0] not in new_keys]
        out["opts"] = ",".join(kept + extras)
    return out
