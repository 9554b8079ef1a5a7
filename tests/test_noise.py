"""noise vs literal transcriptions of av_lfg + vf_noise.c."""
import hashlib
import math

import numpy as np
import pytest

from gmat_tpu.filters.builtin import FilterError
from gmat_tpu.filters.graph import FilterGraph
from gmat_tpu.ops.noise import LFG, MAX_NOISE, MAX_RES, MAX_SHIFT, \
    build_noise

from .test_filters import from_numpy_yuv420


class OracleLFG:
    """Second, independent literal av_lfg (lfg.c:32-48, lfg.h:53-57)."""

    def __init__(self, seed):
        self.state = [0] * 64
        tmp = bytearray(16)
        for i in range(8, 64, 4):
            tmp[0:4] = (seed & 0xFFFFFFFF).to_bytes(4, "little")
            tmp[4] = i
            tmp = bytearray(hashlib.md5(bytes(tmp)).digest())
            for k in range(4):
                self.state[i + k] = int.from_bytes(
                    tmp[4 * k:4 * k + 4], "little")
        self.index = 0

    def get(self):
        a = (self.state[(self.index - 24) & 63]
             + self.state[(self.index - 55) & 63]) & 0xFFFFFFFF
        self.state[self.index & 63] = a
        self.index += 1
        return a


def oracle_noise_table(strength, flags, seed, comp):
    """Literal init_noise (vf_noise.c:70-131), uniform/gaussian paths."""
    lfg = OracleLFG(seed + comp * 31415)

    def rand_n(rng):
        return int(float(rng) * lfg.get() / 4294967296.0)

    patt = (-1, 0, 1, 0)
    uintmax_f = float(np.float32(0xFFFFFFFF))
    noise = np.zeros(MAX_NOISE, np.int8)
    j = 0
    for i in range(MAX_NOISE):
        if flags & 2:           # UNIFORM
            if flags & 16:      # PATTERN
                t = rand_n(strength) - strength // 2
                half = int(t / 2)          # C trunc
                noise[i] = int(half + patt[j % 4] * strength * 0.25)
            else:
                noise[i] = rand_n(strength) - strength // 2
        else:
            while True:
                x1 = 2.0 * lfg.get() / uintmax_f - 1.0
                x2 = 2.0 * lfg.get() / uintmax_f - 1.0
                w = x1 * x1 + x2 * x2
                if w < 1.0:
                    break
            w = math.sqrt((-2.0 * math.log(w)) / w)
            y1 = x1 * w
            y1 *= strength / math.sqrt(3.0)
            if flags & 16:
                y1 /= 2
                y1 += patt[j % 4] * strength * 0.35
            y1 = min(max(y1, -128.0), 127.0)
            noise[i] = int(y1)
        if rand_n(6) == 0:
            j -= 1
        j += 1
    for _ in range(MAX_RES * 3):
        lfg.get()
    return noise, lfg


def test_lfg_matches_oracle():
    a, b = LFG(123457), OracleLFG(123457)
    for _ in range(200):
        assert a.get() == b.get()
    blk = LFG(99).get_block(100)
    o = OracleLFG(99)
    for i in range(100):
        assert int(blk[i]) == o.get()


@pytest.mark.parametrize("flags_s,flags", [
    ("u", 2), ("u+p", 18), ("", 0), ("p", 16), ("t+u", 6),
])
def test_noise_table_matches_oracle(flags_s, flags):
    tab, _ = build_noise(30, flags, 123457, 0)
    want, _ = oracle_noise_table(30, flags, 123457, 0)
    np.testing.assert_array_equal(tab, want)


def test_noise_frame_oracle():
    """Full filter vs a per-pixel transcription of ff_line_noise_c +
    the rand_shift/temporal machinery, across two batches (LFG state
    must continue stream-order)."""
    rng = np.random.default_rng(3)
    h, w = 24, 40
    frames = rng.integers(0, 256, (5, h, w)).astype(np.uint8)
    u = rng.integers(0, 256, (5, h // 2, w // 2)).astype(np.uint8)
    v = u.copy()

    g = FilterGraph("noise=alls=25:allf=t+u")
    got = []
    for sl in (slice(0, 2), slice(2, 5)):    # two batches
        fb = from_numpy_yuv420(frames[sl], u[sl], v[sl])
        out, _ = g.process(fb)
        got.append(np.asarray(out.planes["y"]))
    got = np.concatenate(got)

    # oracle: per-component LFG streams; y=comp0
    tabs, lfgs = {}, {}
    for c in range(3):
        tabs[c], lfgs[c] = oracle_noise_table(25, 6, 123457, c)
    want = np.empty_like(frames)
    for f in range(5):
        shifts = {}
        for c in range(3):        # per-frame comp order (temporal)
            shifts[c] = [lfgs[c].get() & (MAX_SHIFT - 1)
                         for _ in range(MAX_RES)]
        for y in range(h):
            sh = shifts[0][y & (MAX_RES - 1)]
            for x in range(w):
                val = int(frames[f, y, x]) + int(tabs[0][sh + x % MAX_RES])
                want[f, y, x] = min(max(val, 0), 255)
    np.testing.assert_array_equal(got, want)


def test_noise_nontemporal_constant_across_frames():
    rng = np.random.default_rng(4)
    y = np.tile(rng.integers(0, 256, (1, 16, 16)).astype(np.uint8),
                (3, 1, 1))
    u = np.tile(rng.integers(0, 256, (1, 8, 8)).astype(np.uint8),
                (3, 1, 1))
    g = FilterGraph("noise=alls=20:allf=u")
    out, _ = g.process(from_numpy_yuv420(y, u, u.copy()))
    gy = np.asarray(out.planes["y"])
    np.testing.assert_array_equal(gy[0], gy[1])
    np.testing.assert_array_equal(gy[1], gy[2])
    assert (gy[0] != y[0]).any()


def test_noise_option_gates():
    with pytest.raises(FilterError, match="averaged"):
        FilterGraph("noise=alls=20:allf=a+u")
    with pytest.raises(FilterError):
        FilterGraph("noise=alls=101")
    with pytest.raises(FilterError):
        FilterGraph("noise=allf=z")
    with pytest.raises(FilterError):
        FilterGraph("noise=bogus=1")
    # strength 0 everywhere = passthrough
    rng = np.random.default_rng(1)
    y = rng.integers(0, 256, (1, 8, 8)).astype(np.uint8)
    u = rng.integers(0, 256, (1, 4, 4)).astype(np.uint8)
    out, _ = FilterGraph("noise").process(from_numpy_yuv420(y, u,
                                                            u.copy()))
    np.testing.assert_array_equal(np.asarray(out.planes["y"])[0], y[0])
