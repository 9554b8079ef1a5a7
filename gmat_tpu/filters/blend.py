"""vf_blend.c / blend_modes.c analog: the 39 named per-pixel blend
modes plus per-component expressions, for `blend` (dual input) and
`tblend` (current vs previous frame).

Integer depths use the C's INTEGER arithmetic exactly (truncating
divisions, `<<DEPTH` dodge/burn scales, int64 harmonic, av_clip_uintp2
CLIPs); float (gbrpf32/grayf32) uses the float macro set including the
bit-pattern and/or/xor.  The final store is the C's
``dst = top + (EXPR - top) * opacity`` in float32 with a truncating
PIXEL cast (negative results wrap like the x86 cvttss2si + narrow).

Reference: blend_modes.c:60-154 (mode table), vf_blend_init.h:78-199
(normal/copytop/copybottom + opacity dispatch), vf_blend.c:129-161
(expression kernel), :163-250 (slice driver + framesync).
"""
from __future__ import annotations

import numpy as np

F = np.float32


def _clip(x, maxv):
    return np.clip(x, 0, maxv)


def _lrintf(x):
    return np.round(np.asarray(x, F)).astype(np.int64)


def _int_funcs(maxv: int, depth: int):
    """DEPTH<32 macro set (blend_modes.c:61-70), int64 math."""
    half = 1 << (depth - 1)
    mdiv = F(0.125) * F(1 << depth)

    def multiply(x, a, b):
        return x * ((a * b) // maxv)

    def screen(x, a, b):
        return maxv - x * ((maxv - a) * (maxv - b) // maxv)

    def burn(a, b):
        return np.where(a == 0, a,
                        np.maximum(0, maxv - ((maxv - b) << depth)
                                   // np.where(a == 0, 1, a)))

    def dodge(a, b):
        return np.where(a == maxv, a,
                        np.minimum(maxv, (b << depth)
                                   // np.where(a == maxv, 1, maxv - a)))

    return {
        "addition": lambda A, B: np.minimum(maxv, A + B),
        "grainmerge": lambda A, B: _clip(A + B - half, maxv),
        "average": lambda A, B: (A + B) // 2,
        "subtract": lambda A, B: np.maximum(0, A - B),
        "multiply": lambda A, B: multiply(1, A, B),
        "multiply128": lambda A, B: _clip(
            ((A - half) * B).astype(F) / mdiv + F(half), maxv)
            .astype(np.int64),
        "negation": lambda A, B: maxv - np.abs(maxv - A - B),
        "extremity": lambda A, B: np.abs(maxv - A - B),
        "difference": lambda A, B: np.abs(A - B),
        "grainextract": lambda A, B: _clip(half + A - B, maxv),
        "screen": lambda A, B: screen(1, A, B),
        "overlay": lambda A, B: np.where(A < half, multiply(2, A, B),
                                         screen(2, A, B)),
        "hardlight": lambda A, B: np.where(B < half, multiply(2, B, A),
                                           screen(2, B, A)),
        "hardmix": lambda A, B: np.where(A < maxv - B, 0, maxv),
        "heat": lambda A, B: np.where(
            A == 0, 0,
            maxv - np.minimum((maxv - B) * (maxv - B)
                              // np.where(A == 0, 1, A), maxv)),
        "freeze": lambda A, B: np.where(
            B == 0, 0,
            maxv - np.minimum((maxv - A) * (maxv - A)
                              // np.where(B == 0, 1, B), maxv)),
        "darken": lambda A, B: np.minimum(A, B),
        "lighten": lambda A, B: np.maximum(A, B),
        "divide": lambda A, B: _clip(
            np.where(B == 0, maxv,
                     maxv * A // np.where(B == 0, 1, B)), maxv),
        "dodge": dodge,
        "burn": burn,
        "softlight": lambda A, B: _clip(
            A * A // maxv + 2 * (B * ((A * (maxv - A)) // maxv)
                                 // maxv), maxv),
        "exclusion": lambda A, B: A + B - 2 * A * B // maxv,
        "pinlight": lambda A, B: np.where(
            B < half, np.minimum(A, 2 * B),
            np.maximum(A, 2 * (B - half))),
        "phoenix": lambda A, B: (np.minimum(A, B) - np.maximum(A, B)
                                 + maxv),
        "reflect": lambda A, B: np.where(
            B == maxv, B,
            np.minimum(maxv, A * A // np.where(B == maxv, 1,
                                               maxv - B))),
        "glow": lambda A, B: np.where(
            A == maxv, A,
            np.minimum(maxv, B * B // np.where(A == maxv, 1,
                                               maxv - A))),
        "and": lambda A, B: A & B,
        "or": lambda A, B: A | B,
        "xor": lambda A, B: A ^ B,
        "vividlight": lambda A, B: np.where(A < half, burn(2 * A, B),
                                            dodge(2 * (A - half), B)),
        "linearlight": lambda A, B: _clip(
            np.where(B < half, B + 2 * A - maxv, B + 2 * (A - half)),
            maxv),
        "softdifference": lambda A, B: _clip(np.where(
            A > B,
            np.where(B == maxv, 0,
                     (A - B) * maxv // np.where(B == maxv, 1,
                                                maxv - B)),
            np.where(B == 0, 0,
                     (B - A) * maxv // np.where(B == 0, 1, B))), maxv),
        "geometric": lambda A, B: _lrintf(np.sqrt((A * B).astype(F))),
        "harmonic": lambda A, B: np.where(
            (A == 0) & (B == 0), 0,
            2 * A * B // np.where((A == 0) & (B == 0), 1, A + B)),
        "bleach": lambda A, B: (maxv - B) + (maxv - A) - maxv,
        "stain": lambda A, B: 2 * maxv - A - B,
        "interpolate": lambda A, B: _lrintf(
            F(maxv) * (F(2.0) - np.cos((A * np.pi / maxv).astype(F))
                       .astype(F)
                       - np.cos((B * np.pi / maxv).astype(F))
                       .astype(F)) * F(0.25)),
        "hardoverlay": lambda A, B: np.where(
            A == maxv, maxv,
            np.minimum(maxv,
                       maxv * B // np.where(2 * maxv - 2 * A == 0, 1,
                                            2 * maxv - 2 * A)
                       * (A > half)
                       + 2 * A * B // maxv * (A <= half))),
    }


def _float_funcs():
    """DEPTH==32 macro set (blend_modes.c:72-82), float32 math."""
    def bits(x):
        return np.asarray(x, F).view(np.int32)

    def fromb(x):
        return x.view(F)

    def burn(a, b):
        return np.where(a <= 0.0, a,
                        np.maximum(F(0.0), F(1.0) - (F(1.0) - b)
                                   / np.where(a <= 0.0, F(1.0), a)))

    def dodge(a, b):
        return np.where(a >= 1.0, a,
                        np.minimum(F(1.0),
                                   b / np.where(a >= 1.0, F(1.0),
                                                F(1.0) - a)))

    H = F(0.5)
    return {
        "addition": lambda A, B: np.minimum(F(1.0), A + B),
        "grainmerge": lambda A, B: A + B - H,
        "average": lambda A, B: (A + B) / F(2.0),
        "subtract": lambda A, B: np.maximum(F(0.0), A - B),
        "multiply": lambda A, B: A * B,
        "multiply128": lambda A, B: (A - H) * B / F(0.125) + H,
        "negation": lambda A, B: F(1.0) - np.abs(F(1.0) - A - B),
        "extremity": lambda A, B: np.abs(F(1.0) - A - B),
        "difference": lambda A, B: np.abs(A - B),
        "grainextract": lambda A, B: H + A - B,
        "screen": lambda A, B: F(1.0) - (F(1.0) - A) * (F(1.0) - B),
        "overlay": lambda A, B: np.where(
            A < H, F(2.0) * A * B,
            F(1.0) - F(2.0) * ((F(1.0) - A) * (F(1.0) - B))),
        "hardlight": lambda A, B: np.where(
            B < H, F(2.0) * B * A,
            F(1.0) - F(2.0) * ((F(1.0) - B) * (F(1.0) - A))),
        "hardmix": lambda A, B: np.where(A < F(1.0) - B, F(0.0),
                                         F(1.0)),
        "heat": lambda A, B: np.where(
            A == 0.0, F(0.0),
            F(1.0) - np.minimum((F(1.0) - B) ** 2
                                / np.where(A == 0.0, F(1.0), A),
                                F(1.0))),
        "freeze": lambda A, B: np.where(
            B == 0.0, F(0.0),
            F(1.0) - np.minimum((F(1.0) - A) ** 2
                                / np.where(B == 0.0, F(1.0), B),
                                F(1.0))),
        "darken": lambda A, B: np.minimum(A, B),
        "lighten": lambda A, B: np.maximum(A, B),
        "divide": lambda A, B: np.where(
            B == 0.0, F(1.0), A / np.where(B == 0.0, F(1.0), B)),
        "dodge": dodge,
        "burn": burn,
        "softlight": lambda A, B: (A * A
                                   + F(2.0) * (B * (A * (F(1.0) - A)))),
        "exclusion": lambda A, B: A + B - F(2.0) * A * B,
        "pinlight": lambda A, B: np.where(
            B < H, np.minimum(A, F(2.0) * B),
            np.maximum(A, F(2.0) * (B - H))),
        "phoenix": lambda A, B: (np.minimum(A, B) - np.maximum(A, B)
                                 + F(1.0)),
        "reflect": lambda A, B: np.where(
            B == 1.0, B,
            np.minimum(F(1.0), A * A / np.where(B == 1.0, F(1.0),
                                                F(1.0) - B))),
        "glow": lambda A, B: np.where(
            A == 1.0, A,
            np.minimum(F(1.0), B * B / np.where(A == 1.0, F(1.0),
                                                F(1.0) - A))),
        "and": lambda A, B: fromb(bits(A) & bits(B)),
        "or": lambda A, B: fromb(bits(A) | bits(B)),
        "xor": lambda A, B: fromb(bits(A) ^ bits(B)),
        "vividlight": lambda A, B: np.where(
            A < H, burn(F(2.0) * A, B), dodge(F(2.0) * (A - H), B)),
        "linearlight": lambda A, B: np.where(
            B < H, B + F(2.0) * A - F(1.0), B + F(2.0) * (A - H)),
        "softdifference": lambda A, B: np.where(
            A > B,
            np.where(B == 1.0, F(0.0),
                     (A - B) / np.where(B == 1.0, F(1.0),
                                        F(1.0) - B)),
            np.where(B == 0.0, F(0.0),
                     (B - A) / np.where(B == 0.0, F(1.0), B))),
        "geometric": lambda A, B: np.sqrt(np.maximum(A, F(0.0))
                                          * np.maximum(B, F(0.0))),
        "harmonic": lambda A, B: np.where(
            (A == 0.0) & (B == 0.0), F(0.0),
            F(2.0) * A * B / np.where((A == 0.0) & (B == 0.0),
                                      F(1.0), A + B)),
        "bleach": lambda A, B: (F(1.0) - B) + (F(1.0) - A) - F(1.0),
        "stain": lambda A, B: F(2.0) - A - B,
        "interpolate": lambda A, B: (F(1.0)
                                     * (F(2.0)
                                        - np.cos(A * F(np.pi)).astype(F)
                                        - np.cos(B * F(np.pi))
                                        .astype(F)) * F(0.25)),
        "hardoverlay": lambda A, B: np.where(
            A == 1.0, F(1.0),
            np.minimum(F(1.0),
                       B / np.where(F(2.0) - F(2.0) * A == 0.0, F(1.0),
                                    F(2.0) - F(2.0) * A)
                       * (A > H)
                       + F(2.0) * A * B * (A <= H))),
    }


MODE_ALIASES = {"addition128": "grainmerge",
                "difference128": "grainextract"}

MODE_NAMES = tuple(_int_funcs(255, 8)) + ("normal",)


def blend_plane(top: np.ndarray, bottom: np.ndarray, mode: str,
                opacity: float, depth: int, expr=None, values=None):
    """One plane through param->blend: mode table or expression, then
    the opacity mix and the truncating PIXEL store."""
    dt = top.dtype
    is_float = np.issubdtype(dt, np.floating)
    maxv = 1.0 if is_float else (1 << depth) - 1
    op = F(opacity)
    if expr is not None:
        # blend_expr_*: per-pixel av_expr, NO opacity stage (:129-158)
        h, w = top.shape
        out = np.empty((h, w), np.float64)
        env = dict(values or {})
        env["W"], env["H"] = float(w), float(h)
        for y in range(h):
            env["Y"] = float(y)
            for x in range(w):
                env["X"] = float(x)
                env["A"] = env["TOP"] = float(top[y, x])
                env["B"] = env["BOTTOM"] = float(bottom[y, x])
                out[y, x] = expr(env)
        if is_float:
            return out.astype(dt)
        return np.trunc(out).astype(np.int64).astype(dt)
    if opacity == 0.0 and mode != "normal":
        return top.copy()                     # copytop (:188-189)
    if mode == "normal":
        if opacity == 1.0:
            return top.copy()                 # copytop (:190-192)
        if opacity == 0.0:
            return bottom.copy()              # copybottom (:193-194)
        y = (top.astype(F) * op
             + bottom.astype(F) * (F(1.0) - op))
        return y.astype(dt) if is_float \
            else np.trunc(y).astype(np.int64).astype(dt)
    mode = MODE_ALIASES.get(mode, mode)
    if is_float:
        e = _float_funcs()[mode](top.astype(F), bottom.astype(F))
        return (top + (e - top) * op).astype(dt)
    A = top.astype(np.int64)
    B = bottom.astype(np.int64)
    e = _int_funcs(maxv, depth)[mode](A, B)
    y = A.astype(F) + (e - A).astype(F) * op
    # C stores through a truncating (possibly wrapping) PIXEL cast
    return np.trunc(y).astype(np.int64).astype(dt)
