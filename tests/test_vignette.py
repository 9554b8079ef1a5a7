"""vignette vs a literal per-pixel transcription of vf_vignette.c."""
import math

import numpy as np
import pytest

from gmat_tpu.filters.builtin import FilterError
from gmat_tpu.filters.graph import FilterGraph

from .test_filters import from_numpy_yuv420


def oracle_frame(y, u, v, angle, x0, y0, xscale, yscale, backward,
                 dither_state, do_dither=True):
    """filter_frame YUV path (vf_vignette.c:246-276) + get_dither_value
    + get_natural_factor, per pixel; returns planes and the advanced
    dither state."""
    H, W = y.shape
    dmax = math.hypot(W / 2.0, H / 2.0)

    fmap = np.empty((H, W), np.float32)
    for yy in range(H):
        for xx in range(W):
            ix = int((xx - x0) * np.float32(xscale))
            iy = int((yy - y0) * np.float32(yscale))
            dnorm = math.hypot(ix, iy) / dmax
            if dnorm > 1:
                f = 0.0
            else:
                c = math.cos(angle * dnorm)
                f = (c * c) * (c * c)
            if backward:
                f = math.inf if f == 0.0 else 1.0 / f
            fmap[yy, xx] = np.float32(f)

    state = dither_state

    def dv():
        nonlocal state
        if not do_dither:
            return 0.0
        v = state / float(1 << 32)
        state = (state * 1664525 + 1013904223) & 0xFFFFFFFF
        return v

    def cvt(val):
        # (int) of double: cvttsd2si saturates inf/nan/overflow -> INT_MIN
        if not math.isfinite(val) or not (-2**31 < val < 2**31):
            iv = -2**31
        else:
            iv = int(val)
        return min(max(iv, 0), 255)

    outs = []
    for p, (pl, chroma) in enumerate(((y, False), (u, True), (v, True))):
        ph, pw = pl.shape
        hsub = 1 if pw < W else 0
        vsub = 1 if ph < H else 0
        out = np.empty_like(pl)
        for yy in range(ph):
            for xx in range(pw):
                f = fmap[yy << vsub, xx << hsub]
                if chroma:
                    val = np.float32(f * (int(pl[yy, xx]) - 127)) \
                        + np.float32(127.0)
                    out[yy, xx] = cvt(float(val) + dv())
                else:
                    out[yy, xx] = cvt(float(np.float32(f
                                      * int(pl[yy, xx]))) + dv())
        outs.append(out)
    return outs, state


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def _clip(rng, n=2, h=24, w=32):
    y = rng.integers(0, 256, (n, h, w)).astype(np.uint8)
    u = rng.integers(0, 256, (n, h // 2, w // 2)).astype(np.uint8)
    v = rng.integers(0, 256, (n, h // 2, w // 2)).astype(np.uint8)
    return y, u, v


@pytest.mark.parametrize("desc,angle,x0f,y0f,backward,dither", [
    ("vignette", math.pi / 5, 0.5, 0.5, False, True),
    ("vignette=angle=PI/4:dither=0", math.pi / 4, 0.5, 0.5, False,
     False),
    ("vignette=mode=backward", math.pi / 5, 0.5, 0.5, True, True),
    ("vignette=x0=w/3:y0=h/4", math.pi / 5, 1 / 3, 0.25, False, True),
])
def test_vignette_oracle(rng, desc, angle, x0f, y0f, backward, dither):
    y, u, v = _clip(rng)
    H, W = y.shape[1:]
    g = FilterGraph(desc)
    out, _ = g.process(from_numpy_yuv420(y, u, v))
    state = 0
    for i in range(len(y)):
        want, state = oracle_frame(
            y[i], u[i], v[i], angle, W * x0f, H * y0f, 1.0, 1.0,
            backward, state, do_dither=dither)
        np.testing.assert_array_equal(
            np.asarray(out.planes["y"])[i], want[0])
        np.testing.assert_array_equal(
            np.asarray(out.planes["u"])[i], want[1])
        np.testing.assert_array_equal(
            np.asarray(out.planes["v"])[i], want[2])


def test_vignette_dither_state_across_batches(rng):
    """Chunked == one-shot only if the LCG state carries across
    batches like the C context field."""
    y, u, v = _clip(rng, n=4)
    one = FilterGraph("vignette")
    a, _ = one.process(from_numpy_yuv420(y, u, v))
    whole = np.asarray(a.planes["y"])
    g = FilterGraph("vignette")
    o1, _ = g.process(from_numpy_yuv420(y[:2], u[:2], v[:2]))
    o2, _ = g.process(from_numpy_yuv420(y[2:], u[2:], v[2:]))
    got = np.concatenate([np.asarray(o1.planes["y"]),
                          np.asarray(o2.planes["y"])])
    np.testing.assert_array_equal(got, whole)


def test_vignette_gates():
    for bad in ["vignette=mode=sideways", "vignette=eval=never",
                "vignette=aspect=-1"]:
        with pytest.raises(FilterError):
            FilterGraph(bad)


def test_vignette_frame_mode(rng):
    """eval=frame (or NaN-promoting exprs): x0 follows n."""
    y, u, v = _clip(rng, n=2, h=16, w=16)
    g = FilterGraph("vignette=x0=w/2+n:eval=frame:dither=0")
    out, _ = g.process(from_numpy_yuv420(y, u, v))
    gy = np.asarray(out.planes["y"])
    state = 0
    w0, _ = oracle_frame(y[0], u[0], v[0], math.pi / 5, 8.0, 8.0,
                         1.0, 1.0, False, 0, do_dither=False)
    w1, _ = oracle_frame(y[1], u[1], v[1], math.pi / 5, 9.0, 8.0,
                         1.0, 1.0, False, 0, do_dither=False)
    np.testing.assert_array_equal(gy[0], w0[0][0:16])
    np.testing.assert_array_equal(gy[1], w1[0])


def test_vignette_nan_exprs_emit_garbage_not_crash(rng):
    """pts is always NaN in this chain: the C clips NaN geometry and
    emits clipped garbage (cvttsd2si -> 0), never an error — init mode
    auto-promotes to frame mode first (review regression)."""
    y, u, v = _clip(rng, n=2, h=16, w=16)
    for desc in ("vignette=x0=pts:eval=frame:dither=0",
                 "vignette=x0=pts:dither=0"):        # init auto-promote
        g = FilterGraph(desc)
        out, _ = g.process(from_numpy_yuv420(y, u, v))
        gy = np.asarray(out.planes["y"])
        assert gy.shape == y.shape
        assert (gy == 0).all()          # NaN fmap -> INT_MIN -> clip 0
