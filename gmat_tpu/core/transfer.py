"""Transfer characteristics + colour primaries — the HDR half of the
colorspace layer.

TPU rebuild of the conversion machinery the reference reaches through
zimg (ffmpeg-gpu/libavfilter/vf_zscale.c:441-470 maps AVColorTransfer-
Characteristic -> ZIMG_TRANSFER_*, :400-427 maps primaries) and through
libavfilter's own colorspace helpers (ffmpeg-gpu/libavfilter/colorspace.c
ff_fill_rgb2xyz_table / ff_matrix_invert_3x3 / ff_matrix_mul_3x3).

Everything here is pure math over jnp arrays (device) or numpy scalars
(host LUT/matrix construction):

  * ``linearize(x, trc, npl)``    non-linear signal in [0,1] -> linear
                                  light where 1.0 == ``npl`` cd/m2
                                  (zimg's nominal_peak_luminance
                                  convention; vf_zscale.c:1088)
  * ``delinearize(x, trc, npl)``  the inverse
  * ``gamut_matrix(src, dst)``    3x3 linear-RGB primaries conversion
                                  built via XYZ exactly like
                                  colorspace.c ff_fill_rgb2xyz_table

SMPTE ST 2084 (PQ) is absolute: the EOTF yields display luminance in
[0, 10000] cd/m2 which is then divided by ``npl`` — so with the doc
pipelines' npl=100, a 1000-nit HDR10 highlight lands at 10.0, matching
REFERENCE_WHITE=100 in colorspace.h and the peak values
ff_determine_signal_peak produces (colorspace.c:153-175).

ARIB STD-B67 (HLG) is linearized scene-referred (inverse OETF, scaled so
the 1000-nit nominal display peak lands at 1000/npl); the BT.2100 OOTF
(display gamma 1.2) is intentionally NOT applied — same simplification
zimg makes for scene-referred pipelines, documented here for honesty.
"""
from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# SMPTE ST 2084 (PQ) constants
_PQ_M1 = 2610.0 / 16384.0            # 0.1593017578125
_PQ_M2 = 2523.0 / 4096.0 * 128.0     # 78.84375
_PQ_C1 = 3424.0 / 4096.0             # 0.8359375
_PQ_C2 = 2413.0 / 4096.0 * 32.0      # 18.8515625
_PQ_C3 = 2392.0 / 4096.0 * 32.0      # 18.6875

# ARIB STD-B67 (HLG) constants
_HLG_A = 0.17883277
_HLG_B = 1.0 - 4.0 * _HLG_A          # 0.28466892
_HLG_C = 0.5 - _HLG_A * math.log(4.0 * _HLG_A)   # 0.55991073

# zscale/zimg transfer-name grammar (vf_zscale.c:1035-1046) plus the
# ffmpeg AVColorTransferCharacteristic aliases the CLI probe hands us.
_TRC_ALIASES = {
    "bt709": "709", "709": "709", "601": "709", "bt601": "709",
    "smpte170m": "709", "bt470bg": "gamma28", "gamma28": "gamma28",
    "bt470m": "gamma22", "gamma22": "gamma22",
    "2020_10": "709", "2020_12": "709", "bt2020-10": "709",
    "bt2020-12": "709",
    "linear": "linear",
    "smpte2084": "st2084", "st2084": "st2084", "pq": "st2084",
    "arib-std-b67": "arib-std-b67", "hlg": "arib-std-b67",
    "iec61966-2-1": "srgb", "srgb": "srgb",
    "bt1886": "bt1886",
}

TRANSFERS = tuple(sorted(set(_TRC_ALIASES.values())))


def canon_trc(name: str) -> str:
    key = str(name).strip().lower()
    if key not in _TRC_ALIASES:
        raise ValueError(f"unknown transfer characteristic {name!r} "
                         f"(known: {', '.join(sorted(_TRC_ALIASES))})")
    return _TRC_ALIASES[key]


def linearize(x, trc: str, npl: float = 100.0):
    """Non-linear signal in [0,1] -> linear light (1.0 == npl cd/m2).

    SDR curves (709/srgb/gamma/bt1886) map [0,1]->[0,1] (their nominal
    peak IS npl); ST2084 maps to [0, 10000/npl]; HLG to [0, 1000/npl].
    """
    trc = canon_trc(trc)
    x = jnp.asarray(x, jnp.float32)
    if trc == "linear":
        return x
    if trc == "st2084":
        p = jnp.power(jnp.maximum(x, 0.0), 1.0 / _PQ_M2)
        num = jnp.maximum(p - _PQ_C1, 0.0)
        den = _PQ_C2 - _PQ_C3 * p
        return jnp.power(num / den, 1.0 / _PQ_M1) * (10000.0 / npl)
    if trc == "arib-std-b67":
        # inverse OETF -> scene linear in [0,1], nominal display peak
        # 1000 cd/m2 (no OOTF; see module docstring)
        lo = x * x / 3.0
        hi = (jnp.exp((x - _HLG_C) / _HLG_A) + _HLG_B) / 12.0
        return jnp.where(x <= 0.5, lo, hi) * (1000.0 / npl)
    if trc == "709":
        # inverse of the Rec.709 OETF (beta=0.018, 4.5 / 1.099)
        return jnp.where(x < 4.5 * 0.018,
                         x / 4.5,
                         jnp.power((x + 0.099) / 1.099, 1.0 / 0.45))
    if trc == "srgb":
        return jnp.where(x <= 0.04045,
                         x / 12.92,
                         jnp.power((x + 0.055) / 1.055, 2.4))
    if trc == "bt1886":
        return jnp.power(jnp.maximum(x, 0.0), 2.4)
    if trc == "gamma22":
        return jnp.power(jnp.maximum(x, 0.0), 2.2)
    if trc == "gamma28":
        return jnp.power(jnp.maximum(x, 0.0), 2.8)
    raise AssertionError(trc)


def delinearize(x, trc: str, npl: float = 100.0):
    """Linear light (1.0 == npl cd/m2) -> non-linear signal in [0,1]."""
    trc = canon_trc(trc)
    x = jnp.asarray(x, jnp.float32)
    if trc == "linear":
        return x
    if trc == "st2084":
        y = jnp.maximum(x * (npl / 10000.0), 0.0)
        ym = jnp.power(y, _PQ_M1)
        return jnp.power((_PQ_C1 + _PQ_C2 * ym) / (1.0 + _PQ_C3 * ym),
                         _PQ_M2)
    if trc == "arib-std-b67":
        e = jnp.maximum(x * (npl / 1000.0), 0.0)
        lo = jnp.sqrt(3.0 * e)
        hi = _HLG_A * jnp.log(jnp.maximum(12.0 * e - _HLG_B, 1e-7)) + _HLG_C
        return jnp.where(e <= 1.0 / 12.0, lo, hi)
    x = jnp.maximum(x, 0.0)
    if trc == "709":
        return jnp.where(x < 0.018,
                         x * 4.5,
                         1.099 * jnp.power(x, 0.45) - 0.099)
    if trc == "srgb":
        return jnp.where(x <= 0.0031308,
                         x * 12.92,
                         1.055 * jnp.power(x, 1.0 / 2.4) - 0.055)
    if trc == "bt1886":
        return jnp.power(x, 1.0 / 2.4)
    if trc == "gamma22":
        return jnp.power(x, 1.0 / 2.2)
    if trc == "gamma28":
        return jnp.power(x, 1.0 / 2.8)
    raise AssertionError(trc)


# ---------------------------------------------------------------------------
# Colour primaries (CIE 1931 xy chromaticities + D65 white), the values
# libavutil/csp.c tabulates; names follow zscale's primaries grammar
# (vf_zscale.c:1048-1060).
_PRIMARIES = {
    # name: (rx, ry, gx, gy, bx, by)
    "709": (0.640, 0.330, 0.300, 0.600, 0.150, 0.060),
    "2020": (0.708, 0.292, 0.170, 0.797, 0.131, 0.046),
    "170m": (0.630, 0.340, 0.310, 0.595, 0.155, 0.070),
    "470bg": (0.640, 0.330, 0.290, 0.600, 0.150, 0.060),
    "p3dci": (0.680, 0.320, 0.265, 0.690, 0.150, 0.060),
    "p3d65": (0.680, 0.320, 0.265, 0.690, 0.150, 0.060),
}
_PRIM_ALIASES = {
    "bt709": "709", "709": "709",
    "bt2020": "2020", "2020": "2020",
    "smpte170m": "170m", "170m": "170m", "601": "170m", "bt601": "170m",
    "bt470bg": "470bg", "470bg": "470bg",
    "smpte432": "p3d65", "p3d65": "p3d65", "display-p3": "p3d65",
    "smpte431": "p3dci", "p3dci": "p3dci",
}
_WHITE_D65 = (0.3127, 0.3290)
_WHITE_DCI = (0.3140, 0.3510)

PRIMARIES = tuple(sorted(set(_PRIM_ALIASES.values())))


def canon_primaries(name: str) -> str:
    key = str(name).strip().lower()
    if key not in _PRIM_ALIASES:
        raise ValueError(f"unknown primaries {name!r} "
                         f"(known: {', '.join(sorted(_PRIM_ALIASES))})")
    return _PRIM_ALIASES[key]


def rgb2xyz_matrix(primaries: str) -> np.ndarray:
    """3x3 float64 linear-RGB -> CIE XYZ, built exactly like
    colorspace.c ff_fill_rgb2xyz_table (white row normalised to Y=1)."""
    p = canon_primaries(primaries)
    rx, ry, gx, gy, bx, by = _PRIMARIES[p]
    wx, wy = _WHITE_DCI if p == "p3dci" else _WHITE_D65
    # chromaticity -> unscaled XYZ columns (z = 1 - x - y)
    m = np.array([[rx / ry, gx / gy, bx / by],
                  [1.0, 1.0, 1.0],
                  [(1 - rx - ry) / ry, (1 - gx - gy) / gy,
                   (1 - bx - by) / by]], np.float64)
    w = np.array([wx / wy, 1.0, (1 - wx - wy) / wy], np.float64)
    s = np.linalg.solve(m, w)
    return m * s[None, :]


def gamut_matrix(src: str, dst: str) -> np.ndarray:
    """3x3 float32 linear-RGB src-primaries -> dst-primaries matrix
    (xyz2rgb(dst) @ rgb2xyz(src), the colorspace.c composition)."""
    a = rgb2xyz_matrix(src)
    b = rgb2xyz_matrix(dst)
    return np.linalg.solve(b, a).astype(np.float32)
