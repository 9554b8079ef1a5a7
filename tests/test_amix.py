"""amix vs a literal float32 transcription of af_amix.c."""
import numpy as np
import pytest

from gmat_tpu.av.amix import (AmixFilter, AmixStream, parse_amix_opts,
                              parse_weights)

RATE = 8000
f32 = np.float32


class OracleAmix:
    """Literal calculate_scales/output_frame (af_amix.c:208-393) with
    float32 scalar arithmetic and Python loops."""

    def __init__(self, rate, ch, inputs=2, duration="longest",
                 dropout_transition=2.0, weights="1 1", normalize=True):
        self.rate, self.ch, self.n = rate, ch, inputs
        self.dur = {"longest": 0, "shortest": 1, "first": 2}[duration]
        self.dt = dropout_transition
        self.normalize = normalize
        self.w = parse_weights(weights, inputs)
        ws = f32(0.0)
        for x in self.w:
            ws = f32(ws + f32(abs(x)))
        self.weight_sum = ws
        self.scale_norm = [f32(ws / f32(abs(x))) for x in self.w]
        self.state = [1] * inputs
        self.fifos = [[] for _ in range(inputs)]    # lists of rows
        self.frames = []
        self.scale = [f32(0)] * inputs
        self.calc(0)
        self.done = False

    def calc(self, nb):
        ws = f32(0.0)
        for i in range(self.n):
            if self.state[i] & 1:
                ws = f32(ws + f32(abs(self.w[i])))
        for i in range(self.n):
            if self.state[i] & 1:
                tgt = f32(ws / f32(abs(self.w[i])))
                if self.scale_norm[i] > tgt:
                    self.scale_norm[i] = f32(
                        self.scale_norm[i]
                        - f32(f32(f32(f32(self.weight_sum
                                          / f32(abs(self.w[i])))
                                      / f32(self.n)) * f32(nb))
                              / f32(self.dt * self.rate)))
                    if self.scale_norm[i] < tgt:
                        self.scale_norm[i] = tgt
        for i in range(self.n):
            if self.state[i] & 1:
                self.scale[i] = f32(abs(self.w[i])) if not self.normalize \
                    else f32(f32(1.0 / self.scale_norm[i])
                             * f32(1.0 if self.w[i] > 0
                                   else (-1.0 if self.w[i] < 0 else 0.0)))
            else:
                self.scale[i] = f32(0.0)

    def push(self, i, block):
        if i == 0 and len(block):
            self.frames.append(len(block))
        for row in np.asarray(block, np.float32):
            self.fifos[i].append(row.copy())
        return self.drain()

    def finish(self, i):
        if i == 0:
            self.state[0] = 0
        else:
            self.state[i] |= 2
            if not self.fifos[i]:
                self.state[i] = 0
        return self.drain()

    def active_eof(self):
        act = sum(1 for s in self.state if s & 1)
        return (act == 0 or (self.dur == 2 and not (self.state[0] & 1))
                or (self.dur == 1 and act != self.n))

    def output_frame(self):
        if self.state[0] & 1:
            nb = self.frames[0] if self.frames else 0
            for i in range(1, self.n):
                if self.state[i] & 1:
                    ns = len(self.fifos[i])
                    if ns < nb:
                        if not (self.state[i] & 2):
                            return None
                        nb = ns
        else:
            nb = None
            for i in range(1, self.n):
                if self.state[i] & 1:
                    ns = len(self.fifos[i])
                    nb = ns if nb is None else min(nb, ns)
            if nb is None:
                self.done = True
                return None
        rem = nb
        while rem > 0 and self.frames:
            if self.frames[0] <= rem:
                rem -= self.frames.pop(0)
            else:
                self.frames[0] -= rem
                rem = 0
        self.calc(nb)
        if nb == 0:
            return None
        out = np.zeros((nb, self.ch), np.float32)
        for i in range(self.n):
            if self.state[i] & 1:
                for k in range(nb):
                    row = self.fifos[i].pop(0)
                    for c in range(self.ch):
                        out[k, c] = f32(out[k, c]
                                        + f32(row[c] * self.scale[i]))
        return out

    def drain(self):
        outs = []
        while not self.done:
            for i in range(1, self.n):
                if (self.state[i] & 1) and (self.state[i] & 2) \
                        and not self.fifos[i]:
                    self.state[i] = 0
            if self.active_eof():
                self.done = True
                break
            o = self.output_frame()
            if o is None:
                break
            outs.append(o)
        return np.concatenate(outs) if outs \
            else np.zeros((0, self.ch), np.float32)


def _sig(n, ch=2, seed=0, amp=0.3):
    r = np.random.default_rng(seed)
    return r.normal(0.0, amp, (n, ch)).astype(np.float32)


def _drive(cls, a, b, chunk=700, **kw):
    m = cls(RATE, a.shape[1], inputs=2, **kw)
    outs = []
    for i in range(0, max(len(a), len(b)), chunk):
        ca, cb = a[i:i + chunk], b[i:i + chunk]
        if len(ca):
            outs.append(m.push(0, ca))
        if len(cb):
            outs.append(m.push(1, cb))
        if len(cb) < chunk and i + chunk >= len(b):
            pass
    outs.append(m.finish(1))
    outs.append(m.finish(0))
    outs = [o for o in outs if len(o)]
    return np.concatenate(outs) if outs else a[:0]


@pytest.mark.parametrize("kw", [
    {},
    {"weights": "1 0.25"},
    {"weights": "-1 2", "normalize": False},
    {"dropout_transition": 0.5},
])
def test_matches_oracle(kw):
    a = _sig(RATE * 2, seed=1)
    b = _sig(RATE * 1, seed=2)          # shorter -> dropout ramp
    got = _drive(AmixFilter, a, b, **kw)
    want = _drive(OracleAmix, a, b, **kw)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-7)


def test_equal_inputs_normalized_half():
    a = _sig(4096, seed=3)
    b = _sig(4096, seed=4)
    m = AmixFilter(RATE, 2, inputs=2)
    out = [m.push(0, a), m.push(1, b), m.finish(1), m.finish(0)]
    y = np.concatenate([o for o in out if len(o)])
    np.testing.assert_allclose(
        y, a * np.float32(0.5) + b * np.float32(0.5), atol=1e-7)
    assert len(y) == 4096


def test_duration_modes():
    a = _sig(4000, seed=5)
    b = _sig(2000, seed=6)
    assert len(_drive(AmixFilter, a, b)) == 4000                 # longest
    assert len(_drive(AmixFilter, a, b,
                      duration="shortest")) == 2000
    assert len(_drive(AmixFilter, b, a,
                      duration="first")) == 2000
    y = _drive(AmixFilter, a, b, duration="longest",
               dropout_transition=0.1)
    # after the short input ends + ramp, the survivor returns to ~unity
    np.testing.assert_allclose(y[-500:], a[-500:], atol=1e-6)


def test_parse_opts_and_weights():
    kw = parse_amix_opts("inputs=3:duration=first:dropout_transition=1:"
                         "weights=1 0.5:normalize=0:audio=x.mp4")
    assert kw == {"inputs": 3, "duration": "first",
                  "dropout_transition": 1.0, "weights": "1 0.5",
                  "normalize": False, "audio": "x.mp4"}
    np.testing.assert_array_equal(parse_weights("2", 3), [2, 2, 2])
    np.testing.assert_array_equal(parse_weights("1 2 3", 2), [1, 2])
    # av_strtod postfixes (eval.c:106-143): dB, SI prefixes, and the
    # one-char skip on unconsumed tails
    np.testing.assert_allclose(parse_weights("1 2dB", 2),
                               [1.0, 10.0 ** (2 / 20.0)], rtol=1e-6)
    np.testing.assert_allclose(parse_weights("0.5x 2", 2), [0.5, 2.0])
    np.testing.assert_allclose(parse_weights("1k", 2), [1000.0, 1000.0])
    for bad in ["duration=sometimes", "inputs=0", "normalize=x",
                "dropout_transition=-1", "nosuch=1", "inputs"]:
        with pytest.raises(ValueError):
            parse_amix_opts(bad)


def test_amix_stream_with_file(tmp_path):
    from .test_audio import make_av_clip
    from gmat_tpu.av.audio_filters import apply_audio_filters
    clip = str(tmp_path / "bg.mp4")
    make_av_clip(clip, nframes=30)
    r = np.random.default_rng(7)
    x = (r.normal(0, 4000, (44100, 2))).astype(np.int16)
    y, rate = apply_audio_filters(
        x, 44100, f"amix=audio={clip}:duration=first")
    assert rate == 44100
    assert len(y) == len(x)            # duration=first tracks input 0
    assert y.dtype == np.int16 and np.abs(y.astype(np.int32)).sum() > 0


def test_amix_requires_sources_in_chain():
    with pytest.raises(ValueError, match="secondary"):
        AmixStream(48000)
