"""Blend mode math — vf_blend's per-plane compositing kernels.

Rebuilds libavfilter's blend_modes.c (all 39 modes incl. option aliases,
blend_modes.c:119-157) and vf_blend_init.h's dispatch (copy fast paths at
vf_blend_init.h:188-196) for batched device planes.

The C kernels run in *int* arithmetic with C semantics we replicate
exactly on device:
  - int32 wraparound where the C multiplies/shifts overflow int (the
    16-bit SCREEN/heat/divide/... family — signed-overflow UB that gcc
    on x86 wraps; blend_modes.c:63-66),
  - truncating (toward-zero) integer division (lax.div),
  - `2LL*A*B/(A+B)` for harmonic in true 64-bit (here: exact f32
    quotient estimate + two wrapped-remainder correction steps, no x64),
  - `lrintf` = round-half-even (geometric/interpolate),
  - the final store `dst[j] = top + (EXPR-top)*opacity` is a C float ->
    PIXEL conversion: x86 cvttss2si truncation, INT32_MIN on
    nan/overflow, low 8/16 bits kept (blend_modes.c:92-117).

Float (depth 32) planes use the #else macro set (MAX=1.0, CLIP
identity, bit-ops via bitcast; blend_modes.c:72-82).
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp
from jax import lax

# option-name -> canonical mode key (blend_options, vf_blend.c:66-116;
# aliases addition128/grainmerge, difference128/grainextract share keys)
MODE_NAMES = {
    "normal": "normal", "addition": "addition",
    "addition128": "grainmerge", "grainmerge": "grainmerge",
    "and": "and", "average": "average", "burn": "burn",
    "darken": "darken", "difference": "difference",
    "difference128": "grainextract", "grainextract": "grainextract",
    "divide": "divide", "dodge": "dodge", "exclusion": "exclusion",
    "extremity": "extremity", "freeze": "freeze", "glow": "glow",
    "hardlight": "hardlight", "hardmix": "hardmix", "heat": "heat",
    "lighten": "lighten", "linearlight": "linearlight",
    "multiply": "multiply", "multiply128": "multiply128",
    "negation": "negation", "or": "or", "overlay": "overlay",
    "phoenix": "phoenix", "pinlight": "pinlight", "reflect": "reflect",
    "screen": "screen", "softlight": "softlight", "subtract": "subtract",
    "vividlight": "vividlight", "xor": "xor",
    "softdifference": "softdifference", "geometric": "geometric",
    "harmonic": "harmonic", "bleach": "bleach", "stain": "stain",
    "interpolate": "interpolate", "hardoverlay": "hardoverlay",
}

# BlendMode enum order (blend.h:27-70) for numeric mode options
MODE_ENUM = [
    "normal", "addition", "and", "average", "burn", "darken",
    "difference", "grainextract", "divide", "dodge", "exclusion",
    "hardlight", "lighten", "multiply", "negation", "or", "overlay",
    "phoenix", "pinlight", "reflect", "screen", "softlight", "subtract",
    "vividlight", "xor", "hardmix", "linearlight", "glow", "grainmerge",
    "multiply128", "heat", "freeze", "extremity", "softdifference",
    "geometric", "harmonic", "bleach", "stain", "interpolate",
    "hardoverlay",
]

_I32_MIN = jnp.int32(-2147483648)


def _cdiv(a, b):
    """C truncating int32 division with masked zero denominators; the
    caller selects away b==0 lanes (every C formula guards them)."""
    safe = jnp.where(b == 0, jnp.int32(1), b)
    return lax.div(a, safe)


def _trunc_store(f, depth, dtype):
    """C (PIXEL)(float) store: x86 cvttss2si truncation toward zero,
    INT32_MIN on nan/out-of-range, then the low 8/16 bits."""
    i = f.astype(jnp.int32)
    bad = jnp.isnan(f) | (f >= 2147483648.0) | (f < -2147483648.0)
    i = jnp.where(bad, _I32_MIN, i)
    mask = jnp.int32((1 << (8 if depth <= 8 else 16)) - 1)
    return (i & mask).astype(dtype)


def _harmonic_q(a, b):
    """trunc(2*A*B / (A+B)) exactly, without 64-bit ints: f32 quotient
    estimate (error << 1) + two correction rounds on the wrapped
    remainder (r = 2AB - q*d is tiny, so int32-wrapped arithmetic on
    both sides recovers it exactly)."""
    d = a + b                                    # <= 2^17, no wrap
    df = jnp.where(d == 0, jnp.int32(1), d)
    q = jnp.floor(jnp.float32(2.0) * a.astype(jnp.float32)
                  * b.astype(jnp.float32) / df.astype(jnp.float32)) \
        .astype(jnp.int32)
    n_w = jnp.int32(2) * a * b                   # wrapped n mod 2^32
    for _ in range(2):
        r = n_w - q * df                         # wrapped == true small r
        q = jnp.where(r >= df, q + 1, q)
        q = jnp.where(r < 0, q - 1, q)
    return q


_COSF_LUTS = {}


def _cosf_lut(depth):
    """numpy f32 table of glibc cosf((float)(v * M_PI / MAX)) for
    v = 0..MAX — the exact per-pixel cos the C interpolate mode sees
    (argument computed in double, narrowed at the cosf call)."""
    tab = _COSF_LUTS.get(depth)
    if tab is None:
        import ctypes
        import ctypes.util
        import math
        libm = ctypes.CDLL(ctypes.util.find_library("m") or "libm.so.6")
        libm.cosf.restype = ctypes.c_float
        libm.cosf.argtypes = [ctypes.c_float]
        maxv = (1 << depth) - 1
        tab = np.fromiter(
            (libm.cosf(np.float32(v * math.pi / maxv))
             for v in range(maxv + 1)),
            dtype=np.float32, count=maxv + 1)
        _COSF_LUTS[depth] = tab
    return tab


def _int_expr(key, a, b, depth):
    """EXPR of blend_modes.c:119-157 on int32 A/B for depth <= 16."""
    maxv = jnp.int32((1 << depth) - 1)
    half = jnp.int32(1 << (depth - 1))
    zero = jnp.int32(0)

    def clip(x):
        return jnp.clip(x, zero, maxv)

    def multiply(x, aa, bb):                     # MULTIPLY(x, a, b)
        return x * _cdiv(aa * bb, maxv)

    def screen(x, aa, bb):                       # SCREEN(x, a, b)
        return maxv - x * _cdiv((maxv - aa) * (maxv - bb), maxv)

    def burn(aa, bb):                            # BURN(a, b)
        q = _cdiv((maxv - bb) << depth, aa)
        return jnp.where(aa == 0, aa, jnp.maximum(zero, maxv - q))

    def dodge(aa, bb):                           # DODGE(a, b)
        q = _cdiv(bb << depth, maxv - aa)
        return jnp.where(aa == maxv, aa, jnp.minimum(maxv, q))

    if key == "addition":
        return jnp.minimum(maxv, a + b)
    if key == "grainmerge":
        return clip(a + b - half)
    if key == "average":
        return _cdiv(a + b, jnp.int32(2))
    if key == "subtract":
        return jnp.maximum(zero, a - b)
    if key == "multiply":
        return multiply(jnp.int32(1), a, b)
    if key == "multiply128":
        # (A-HALF)*B / MDIV + HALF in float32, MDIV = 0.125f*(1<<depth),
        # then CLIP's int conversion truncates (blend_modes.c:66,124)
        mdiv = jnp.float32(0.125 * (1 << depth))
        v = ((a - half) * b).astype(jnp.float32) / mdiv \
            + half.astype(jnp.float32)
        return clip(v.astype(jnp.int32))         # in-clip-range after clamp
    if key == "negation":
        return maxv - jnp.abs(maxv - a - b)
    if key == "extremity":
        return jnp.abs(maxv - a - b)
    if key == "difference":
        return jnp.abs(a - b)
    if key == "grainextract":
        return clip(half + a - b)
    if key == "screen":
        return screen(jnp.int32(1), a, b)
    if key == "overlay":
        return jnp.where(a < half, multiply(jnp.int32(2), a, b),
                         screen(jnp.int32(2), a, b))
    if key == "hardlight":
        return jnp.where(b < half, multiply(jnp.int32(2), b, a),
                         screen(jnp.int32(2), b, a))
    if key == "hardmix":
        return jnp.where(a < (maxv - b), zero, maxv)
    if key == "heat":
        q = _cdiv((maxv - b) * (maxv - b), a)
        return jnp.where(a == 0, zero, maxv - jnp.minimum(q, maxv))
    if key == "freeze":
        q = _cdiv((maxv - a) * (maxv - a), b)
        return jnp.where(b == 0, zero, maxv - jnp.minimum(q, maxv))
    if key == "darken":
        return jnp.minimum(a, b)
    if key == "lighten":
        return jnp.maximum(a, b)
    if key == "divide":
        return clip(jnp.where(b == 0, maxv, _cdiv(maxv * a, b)))
    if key == "dodge":
        return dodge(a, b)
    if key == "burn":
        return burn(a, b)
    if key == "softlight":
        inner = _cdiv(b * _cdiv(a * (maxv - a), maxv), maxv)
        return clip(_cdiv(a * a, maxv) + 2 * inner)
    if key == "exclusion":
        # C precedence: A + B - 2*A*B/MAX == A + B - ((2*A)*B)/MAX,
        # with the 16-bit (2A)*B product wrapping int32 like gcc
        return a + b - _cdiv(2 * a * b, maxv)
    if key == "pinlight":
        return jnp.where(b < half, jnp.minimum(a, 2 * b),
                         jnp.maximum(a, 2 * (b - half)))
    if key == "phoenix":
        return jnp.minimum(a, b) - jnp.maximum(a, b) + maxv
    if key == "reflect":
        q = _cdiv(a * a, maxv - b)
        return jnp.where(b == maxv, b, jnp.minimum(maxv, q))
    if key == "glow":
        q = _cdiv(b * b, maxv - a)
        return jnp.where(a == maxv, a, jnp.minimum(maxv, q))
    if key == "and":
        return a & b
    if key == "or":
        return a | b
    if key == "xor":
        return a ^ b
    if key == "vividlight":
        return jnp.where(a < half, burn(2 * a, b),
                         dodge(2 * (a - half), b))
    if key == "linearlight":
        return clip(jnp.where(b < half, b + 2 * a - maxv,
                              b + 2 * (a - half)))
    if key == "softdifference":
        up = jnp.where(b == maxv, zero, _cdiv((a - b) * maxv, maxv - b))
        dn = jnp.where(b == 0, zero, _cdiv((b - a) * maxv, b))
        return clip(jnp.where(a > b, up, dn))
    if key == "geometric":
        # lrintf(sqrtf((unsigned)A * B)): uint32 product (no sign wrap),
        # f32 sqrt, round-half-even
        prod = (a.astype(jnp.uint32) * b.astype(jnp.uint32)) \
            .astype(jnp.float32)
        return jnp.rint(jnp.sqrt(prod)).astype(jnp.int32)
    if key == "harmonic":
        return jnp.where((a == 0) & (b == 0), zero, _harmonic_q(a, b))
    if key == "bleach":
        return (maxv - b) + (maxv - a) - maxv
    if key == "stain":
        return 2 * maxv - a - b
    if key == "interpolate":
        # lrintf(MAX*(2 - cosf(A*M_PI/MAX) - cosf(B*M_PI/MAX))*0.25f).
        # The cos argument is a double (A*M_PI/MAX) narrowed at the
        # cosf call; a per-pixel-value libm-cosf LUT reproduces that
        # exactly (one-hot-matmul gather is exact for f32 tables)
        from .lut import apply_lut
        tab = _cosf_lut(depth)
        mf = jnp.float32((1 << depth) - 1)
        ca = apply_lut(a, tab).astype(jnp.float32)
        cb = apply_lut(b, tab).astype(jnp.float32)
        v = mf * (jnp.float32(2.0) - ca - cb) * jnp.float32(0.25)
        return jnp.rint(v).astype(jnp.int32)
    if key == "hardoverlay":
        q1 = _cdiv(maxv * b, 2 * maxv - 2 * a)
        q2 = _cdiv(2 * a * b, maxv)
        s = q1 * (a > half).astype(jnp.int32) \
            + q2 * (a <= half).astype(jnp.int32)
        return jnp.where(a == maxv, maxv, jnp.minimum(maxv, s))
    raise ValueError(f"unknown blend mode {key!r}")


def _float_expr(key, a, b):
    """EXPR on float32 A/B (DEPTH 32 macro set, blend_modes.c:72-82)."""
    one = jnp.float32(1.0)
    half = jnp.float32(0.5)
    zero = jnp.float32(0.0)

    def multiply(x, aa, bb):
        return x * (aa * bb)

    def screen(x, aa, bb):
        return one - x * ((one - aa) * (one - bb))

    def burn(aa, bb):
        return jnp.where(aa <= zero, aa,
                         jnp.maximum(zero, one - (one - bb) / jnp.where(
                             aa <= zero, one, aa)))

    def dodge(aa, bb):
        return jnp.where(aa >= one, aa,
                         jnp.minimum(one, bb / jnp.where(
                             aa >= one, one, one - aa)))

    def bits(x):
        return lax.bitcast_convert_type(x, jnp.int32)

    def unbits(i):
        return lax.bitcast_convert_type(i, jnp.float32)

    if key == "addition":
        return jnp.minimum(one, a + b)
    if key == "grainmerge":
        return a + b - half
    if key == "average":
        return (a + b) / jnp.float32(2.0)
    if key == "subtract":
        return jnp.maximum(zero, a - b)
    if key == "multiply":
        return multiply(one, a, b)
    if key == "multiply128":
        return (a - half) * b / jnp.float32(0.125) + half
    if key == "negation":
        return one - jnp.abs(one - a - b)
    if key == "extremity":
        return jnp.abs(one - a - b)
    if key == "difference":
        return jnp.abs(a - b)
    if key == "grainextract":
        return half + a - b
    if key == "screen":
        return screen(one, a, b)
    if key == "overlay":
        return jnp.where(a < half, multiply(jnp.float32(2), a, b),
                         screen(jnp.float32(2), a, b))
    if key == "hardlight":
        return jnp.where(b < half, multiply(jnp.float32(2), b, a),
                         screen(jnp.float32(2), b, a))
    if key == "hardmix":
        return jnp.where(a < (one - b), zero, one)
    if key == "heat":
        q = (one - b) * (one - b) / jnp.where(a == 0, one, a)
        return jnp.where(a == 0, zero, one - jnp.minimum(q, one))
    if key == "freeze":
        q = (one - a) * (one - a) / jnp.where(b == 0, one, b)
        return jnp.where(b == 0, zero, one - jnp.minimum(q, one))
    if key == "darken":
        return jnp.minimum(a, b)
    if key == "lighten":
        return jnp.maximum(a, b)
    if key == "divide":
        return jnp.where(b == 0, one, a / jnp.where(b == 0, one, b))
    if key == "dodge":
        return dodge(a, b)
    if key == "burn":
        return burn(a, b)
    if key == "softlight":
        return a * a + 2.0 * (b * (a * (one - a)))
    if key == "exclusion":
        return a + b - 2.0 * a * b
    if key == "pinlight":
        return jnp.where(b < half, jnp.minimum(a, 2 * b),
                         jnp.maximum(a, 2 * (b - half)))
    if key == "phoenix":
        return jnp.minimum(a, b) - jnp.maximum(a, b) + one
    if key == "reflect":
        q = a * a / jnp.where(b == one, one, one - b)
        return jnp.where(b == one, b, jnp.minimum(one, q))
    if key == "glow":
        q = b * b / jnp.where(a == one, one, one - a)
        return jnp.where(a == one, a, jnp.minimum(one, q))
    if key == "and":
        return unbits(bits(a) & bits(b))
    if key == "or":
        return unbits(bits(a) | bits(b))
    if key == "xor":
        return unbits(bits(a) ^ bits(b))
    if key == "vividlight":
        return jnp.where(a < half, burn(2 * a, b),
                         dodge(2 * (a - half), b))
    if key == "linearlight":
        return jnp.where(b < half, b + 2 * a - one, b + 2 * (a - half))
    if key == "softdifference":
        up = jnp.where(b == one, zero,
                       (a - b) / jnp.where(b == one, one, one - b))
        dn = jnp.where(b == 0, zero, (b - a) / jnp.where(b == 0, one, b))
        return jnp.where(a > b, up, dn)
    if key == "geometric":
        return jnp.sqrt(jnp.maximum(a, zero) * jnp.maximum(b, zero))
    if key == "harmonic":
        d = jnp.where((a == 0) & (b == 0), one, a + b)
        return jnp.where((a == 0) & (b == 0), zero, 2.0 * a * b / d)
    if key == "bleach":
        return (one - b) + (one - a) - one
    if key == "stain":
        return 2 * one - a - b
    if key == "interpolate":
        import math
        pi = jnp.float32(math.pi)
        return (jnp.float32(2.0) - jnp.cos(a * pi) - jnp.cos(b * pi)) \
            * jnp.float32(0.25)
    if key == "hardoverlay":
        q1 = b / jnp.where(a == one, one, 2 * one - 2 * a)
        q2 = 2 * a * b
        s = q1 * (a > half) + q2 * (a <= half)
        return jnp.where(a == one, one, jnp.minimum(one, s))
    raise ValueError(f"unknown blend mode {key!r}")


def blend_plane(top, bottom, mode: str, opacity: float, depth: int):
    """One plane through one blend mode (same dtype out).

    Mirrors vf_blend_init.h's fast-path dispatch: opacity==0 on a
    non-normal mode copies top; normal at opacity 1/0 copies top/bottom;
    everything else runs `dst = top + (EXPR - top) * opacity` with the C
    float store semantics (blend_modes.c:92-117).
    """
    mode = MODE_NAMES.get(mode, mode)   # addition128/difference128 aliases
    if mode == "normal":
        if opacity == 1.0:
            return top
        if opacity == 0.0:
            return bottom
    elif opacity == 0.0:
        return top

    is_float = jnp.issubdtype(top.dtype, jnp.floating)
    op = jnp.float32(opacity)
    if is_float:
        a = top.astype(jnp.float32)
        b = bottom.astype(jnp.float32)
        if mode == "normal":
            return (a * op + b * (jnp.float32(1.0) - op)).astype(top.dtype)
        e = _float_expr(mode, a, b)
        return (a + (e - a) * op).astype(top.dtype)

    a = top.astype(jnp.int32)
    b = bottom.astype(jnp.int32)
    if mode == "normal":
        v = a.astype(jnp.float32) * op \
            + b.astype(jnp.float32) * (jnp.float32(1.0) - op)
        return _trunc_store(v, depth, top.dtype)
    e = _int_expr(mode, a, b, depth)
    v = a.astype(jnp.float32) + (e - a).astype(jnp.float32) * op
    return _trunc_store(v, depth, top.dtype)
