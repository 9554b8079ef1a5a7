"""Audio filters: atempo / volume / aresample / afade.

Covers the audio filter chain the reference drives through libavfilter
(AppMeTrans options.xml `<AudioFilterDesc>atempo=0.7143</AudioFilterDesc>`,
AppMeTrans.cpp:176-200).  atempo is a WSOLA-style time stretch (same
algorithm family as ffmpeg's af_atempo); afade rebuilds af_afade.c's
20-curve gain family with streaming window semantics; all filters
operate on interleaved s16 numpy blocks.
"""
from __future__ import annotations

from typing import Callable, Dict, List, Tuple

import numpy as np


class AtempoStream:
    """Streaming WSOLA time-stretch: push int16 blocks, pull stretched
    blocks, flush() at EOF — the libavfilter-style chunked behavior, so a
    whole track never has to sit in memory.  State is a small carry
    buffer (window + search lookahead); the one-shot `atempo()` below is
    literally push+flush of this class, so both paths are identical."""

    def __init__(self, rate: int, tempo: float = 1.0):
        if not 0.5 <= tempo <= 2.0:
            raise ValueError("atempo factor must be in [0.5, 2.0]")
        self.tempo = float(tempo)
        self.passthrough = abs(tempo - 1.0) < 1e-6
        self.win = max(int(rate * 0.040), 32)           # 40 ms frames
        self.hop_out = self.win // 2
        self.hop_in = int(round(self.hop_out * tempo))
        self.search = self.win // 4
        self._hann = np.hanning(self.win * 2)[self.win:self.win * 2][:, None] \
            .astype(np.float32)
        self._fade_in = np.hanning(self.win * 2)[:self.win][:, None] \
            .astype(np.float32)
        self._buf = None          # f32 carry, buf[0] is absolute idx _base
        self._base = 0
        self._pos = 0             # absolute next-window position
        self._prev_tail = None
        self._done = False

    def push(self, samples: np.ndarray) -> np.ndarray:
        """Feed an (n, ch) int16 block; returns produced output (may be
        empty while the lookahead fills)."""
        if self.passthrough:
            return samples
        x = samples.astype(np.float32)
        # an empty (0, 0)-shaped first block must not seed _buf: the
        # next concatenate would fail on the channel-axis mismatch
        if x.size:
            self._buf = x if self._buf is None \
                else np.concatenate([self._buf, x])
        return self._emit(self._drain())

    def _drain(self) -> List[np.ndarray]:
        out: List[np.ndarray] = []
        if self._buf is None:
            return out
        n = self._base + len(self._buf)
        win, hop_out, search = self.win, self.hop_out, self.search
        while self._pos + win + search < n:
            pos_r = self._pos - self._base
            if self._prev_tail is None:
                seg = self._buf[pos_r:pos_r + win]
            else:
                best_off, best_score = 0, -np.inf
                ref = self._prev_tail[:, 0]
                lo = max(pos_r - search, 0)
                hi = min(pos_r + search, len(self._buf) - win)
                for off in range(lo, hi):
                    cand = self._buf[off:off + len(ref), 0]
                    score = float(np.dot(ref, cand))
                    if score > best_score:
                        best_score, best_off = score, off
                seg = self._buf[best_off:best_off + win]
            if self._prev_tail is not None:
                out.append(seg[:hop_out] * self._fade_in[:hop_out] +
                           self._prev_tail[:hop_out] * self._hann[:hop_out])
            else:
                out.append(seg[:hop_out])
            self._prev_tail = seg[hop_out:].copy()
            self._pos += self.hop_in
        # trim consumed prefix, keeping the search lookbehind window —
        # but never trim before the first processed window (short-input
        # fallback at flush needs the whole signal)
        if self._prev_tail is not None:
            keep_from = max(self._pos - search - self._base, 0)
            if keep_from > 0:
                self._buf = self._buf[keep_from:]
                self._base += keep_from
        return out

    @staticmethod
    def _emit(chunks: List[np.ndarray]) -> np.ndarray:
        chunks = [c for c in chunks if c.size]
        if not chunks:
            return np.zeros((0, 0), np.int16)
        y = np.concatenate(chunks)
        return np.clip(y, -32768, 32767).astype(np.int16)

    def flush(self) -> np.ndarray:
        """End of stream: emit the epilogue (pending tail + uncovered
        end of the signal)."""
        if self.passthrough or self._buf is None or self._done:
            return np.zeros((0, 0), np.int16)
        self._done = True
        n = self._base + len(self._buf)
        out = self._drain()
        if self._prev_tail is None:
            # whole stream was too short to stretch: nearest-resample
            idx = np.clip((np.arange(int(n / self.tempo)) *
                           self.tempo).astype(int), 0, max(n - 1, 0))
            short = np.clip(self._buf, -32768, 32767).astype(np.int16)
            return short[idx] if n else np.zeros((0, 0), np.int16)
        out.append(self._prev_tail)
        if self._pos < n:
            out.append(self._buf[self._pos + self.win - self._base:])
        return self._emit(out)


def atempo(samples: np.ndarray, rate: int, tempo: float = 1.0) -> np.ndarray:
    """Time-stretch without pitch change. samples: (n, ch) int16.

    tempo > 1 speeds up (shorter output), < 1 slows down. Valid 0.5..2.0
    per ffmpeg's constraint (chain twice for more, like ffmpeg).
    One-shot = push + flush of AtempoStream.
    """
    st = AtempoStream(rate, tempo)
    if st.passthrough or samples.shape[0] == 0:
        return samples
    a = st.push(samples)
    b = st.flush()
    parts = [p for p in (a, b) if p.size]
    return np.concatenate(parts) if parts else samples[:0]


def volume(samples: np.ndarray, rate: int, volume: float = 1.0) -> np.ndarray:
    y = samples.astype(np.float32) * float(volume)
    return np.clip(y, -32768, 32767).astype(np.int16)


def aresample(samples: np.ndarray, rate: int, out_rate: int) -> Tuple[np.ndarray, int]:
    """Linear-interp resample; returns (samples, new_rate).

    One-shot = push + flush of AresampleStream, so the offline and
    streamed chains produce identical output for the same description
    (the same invariant atempo() keeps)."""
    out_rate = int(out_rate)
    if out_rate == rate or samples.shape[0] < 2:
        return samples, out_rate
    st = AresampleStream(rate, out_rate)
    parts = [p for p in (st.push(samples), st.flush()) if p.size]
    y = np.concatenate(parts) if parts else samples[:0]
    return y, out_rate


def parse_audio_filters(desc: str) -> List[Tuple[str, Dict[str, float]]]:
    """'atempo=0.7143,volume=0.5' -> [('atempo', {...}), ...]."""
    chain = []
    for part in filter(None, (p.strip() for p in desc.split(","))):
        if "=" in part:
            name, val = part.split("=", 1)
            if name.strip() == "aresample":
                chain.append((name.strip(), {"out_rate": float(val)}))
            elif name.strip() == "atempo":
                chain.append((name.strip(), {"tempo": float(val)}))
            elif name.strip() == "volume":
                chain.append((name.strip(), {"volume": float(val)}))
            elif name.strip() == "afade":
                chain.append((name.strip(), _parse_afade_opts(val)))
            else:
                raise ValueError(f"unknown audio filter {name!r}")
        elif part == "afade":
            chain.append(("afade", {}))
        else:
            raise ValueError(f"audio filter needs a value: {part!r}")
    return chain


_AFADE_ALIASES = {"t": "type", "ss": "start_sample", "ns": "nb_samples",
                  "st": "start_time", "d": "duration", "c": "curve"}


def _parse_afade_opts(val: str) -> Dict:
    """'t=in:ss=0:ns=44100:c=qsin' (or positional 'in:0:44100')."""
    kw: Dict = {}
    order = ("type", "start_sample", "nb_samples")
    positional = True
    for i, tok in enumerate(filter(None, val.split(":"))):
        if "=" in tok:
            k, v = tok.split("=", 1)
            k = _AFADE_ALIASES.get(k.strip(), k.strip())
            positional = False
        elif positional and i < len(order):
            k, v = order[i], tok
        else:
            raise ValueError(f"afade: bad option {tok!r}")
        if k in ("start_sample", "nb_samples"):
            kw[k] = int(v)
        elif k in ("start_time", "duration"):
            kw[k] = float(v)
        elif k in ("type", "curve"):
            kw[k] = v
        else:
            raise ValueError(f"afade: unknown option {k!r}")
    return kw


class AresampleStream:
    """Streaming linear-interp resampler: uniform output grid
    t_k = k * rate / out_rate across chunk boundaries (1-sample carry)."""

    def __init__(self, rate: int, out_rate: int):
        self.rate, self.out_rate = int(rate), int(out_rate)
        self.step = rate / float(out_rate)
        self._t = 0.0             # absolute source index of next output
        self._base = 0
        self._buf = None

    def push(self, samples: np.ndarray) -> np.ndarray:
        if self.out_rate == self.rate:
            return samples
        x = samples.astype(np.float32)
        # an empty (0, 0)-shaped first block must not seed _buf: the
        # next concatenate would fail on the channel-axis mismatch
        if x.size:
            self._buf = x if self._buf is None \
                else np.concatenate([self._buf, x])
        return self._produce(last=False)

    def _produce(self, last: bool) -> np.ndarray:
        if self._buf is None or len(self._buf) < 2:
            return np.zeros((0, 0), np.int16)
        n = self._base + len(self._buf)
        limit = (n - 1) if not last else (n - 1) + 1e-9
        k0 = self._t
        count = int(np.floor((limit - k0) / self.step)) + 1 \
            if limit >= k0 else 0
        if count <= 0:
            return np.zeros((0, 0), np.int16)
        src = k0 + np.arange(count) * self.step
        i0 = np.floor(src).astype(np.int64)
        i1 = np.minimum(i0 + 1, n - 1)
        f = (src - i0)[:, None].astype(np.float32)
        r0 = self._buf[i0 - self._base]
        r1 = self._buf[i1 - self._base]
        y = r0 * (1 - f) + r1 * f
        self._t = k0 + count * self.step
        # cap at the buffer length: for step >= 2 the next read position
        # can land past the last buffered sample, and trimming beyond the
        # buffer would silently advance _base past the true consumed
        # count, misregistering every later chunk
        keep = min(max(int(np.floor(self._t)) - self._base, 0),
                   len(self._buf))
        if keep > 0:
            self._buf = self._buf[keep:]
            self._base += keep
        return np.clip(y, -32768, 32767).astype(np.int16)

    def flush(self) -> np.ndarray:
        if self.out_rate == self.rate:
            return np.zeros((0, 0), np.int16)
        return self._produce(last=True)


class AudioFilterStream:
    """Chunked audio filter chain (the streaming analog of
    apply_audio_filters): push decoded blocks as they arrive, pull
    filtered blocks, flush() at EOF.  `out_rate` reports the chain's
    output sample rate (aresample changes it)."""

    def __init__(self, desc: str, rate: int):
        self.stages = []
        self.out_rate = int(rate)
        for name, kw in parse_audio_filters(desc):
            if name == "aresample":
                st = AresampleStream(self.out_rate, int(kw["out_rate"]))
                self.out_rate = st.out_rate
                self.stages.append(st)
            elif name == "atempo":
                self.stages.append(AtempoStream(self.out_rate, kw["tempo"]))
            elif name == "afade":
                self.stages.append(AfadeStream(self.out_rate, **kw))
            elif name == "volume":
                vol = float(kw["volume"])
                self.stages.append(("volume", vol))

    def _through(self, block: np.ndarray, start: int) -> np.ndarray:
        for st in self.stages[start:]:
            if block.size == 0:
                break
            if isinstance(st, tuple):
                block = volume(block, 0, st[1])
            else:
                block = st.push(block)
        return block

    def push(self, block: np.ndarray) -> np.ndarray:
        return self._through(block, 0)

    def flush(self) -> np.ndarray:
        outs = []
        for i, st in enumerate(self.stages):
            if isinstance(st, tuple):
                continue
            tail = st.flush()
            if tail.size:
                tail = self._through(tail, i + 1)
                if tail.size:
                    outs.append(tail)
        return np.concatenate(outs) if outs else np.zeros((0, 0), np.int16)


def apply_audio_filters(samples: np.ndarray, rate: int, desc: str):
    """Run a parsed chain; returns (samples, rate)."""
    for name, kw in parse_audio_filters(desc):
        if name == "aresample":
            samples, rate = aresample(samples, rate, **kw)
        elif name == "atempo":
            samples = atempo(samples, rate, **kw)
        elif name == "afade":
            st = AfadeStream(rate, **kw)
            samples = st.push(samples)
        elif name == "volume":
            samples = volume(samples, rate, **kw)
    return samples, rate


# ---- afade (af_afade.c) -----------------------------------------------------

def _afade_gain(curve: str, index: np.ndarray, rng: int) -> np.ndarray:
    """Vectorized fade_gain (af_afade.c:70-146): index may be negative or
    past range (clipped), every curve in double like the C switch."""
    g = np.clip(index.astype(np.float64) / float(rng), 0.0, 1.0)
    if curve == "tri":
        return g
    if curve == "qsin":
        return np.sin(g * np.pi / 2.0)
    if curve == "iqsin":
        return 0.6366197723675814 * np.arcsin(g)
    if curve == "esin":
        return 1.0 - np.cos(np.pi / 4.0 * ((2.0 * g - 1) ** 3 + 1))
    if curve == "hsin":
        return (1.0 - np.cos(g * np.pi)) / 2.0
    if curve == "ihsin":
        return 0.3183098861837907 * np.arccos(1 - 2 * g)
    if curve == "exp":
        return np.exp(-11.512925464970227 * (1 - g))
    if curve == "log":
        with np.errstate(divide="ignore"):
            return np.clip(1 + 0.2 * np.log10(g), 0.0, 1.0)
    if curve == "par":
        return 1 - np.sqrt(1 - g)
    if curve == "ipar":
        return 1 - (1 - g) * (1 - g)
    if curve == "qua":
        return g * g
    if curve == "cub":
        return g ** 3
    if curve == "squ":
        return np.sqrt(g)
    if curve == "cbr":
        return np.cbrt(g)
    if curve == "dese":
        return np.where(g <= 0.5, np.cbrt(2 * g) / 2,
                        1 - np.cbrt(2 * (1 - g)) / 2)
    if curve == "desi":
        return np.where(g <= 0.5, (2 * g) ** 3 / 2,
                        1 - (2 * (1 - g)) ** 3 / 2)
    if curve == "losi":
        a = 1.0 / (1.0 - 0.787) - 1
        A = 1.0 / (1.0 + np.exp(-((g - 0.5) * a * 2.0)))
        B = 1.0 / (1.0 + np.exp(a))
        C = 1.0 / (1.0 + np.exp(-a))
        return (A - B) / (C - B)
    if curve == "sinc":
        with np.errstate(invalid="ignore"):
            return np.where(g >= 1.0, 1.0,
                            np.sin(np.pi * (1.0 - g)) / (np.pi * (1.0 - g)))
    if curve == "isinc":
        with np.errstate(invalid="ignore"):
            return np.where(g <= 0.0, 0.0,
                            1.0 - np.sin(np.pi * g) / (np.pi * g))
    if curve in ("nofade", "none"):
        return np.ones_like(g)
    raise ValueError(f"afade: unknown curve {curve!r}")


_AFADE_CURVES = ("tri", "qsin", "iqsin", "esin", "hsin", "ihsin", "exp",
                 "log", "par", "ipar", "qua", "cub", "squ", "cbr", "dese",
                 "desi", "losi", "sinc", "isinc", "nofade", "none")


class AfadeStream:
    """Streaming afade (af_afade.c filter_frame): gain ramp over an
    absolute sample window; before a fade-in / after a fade-out the
    block is silenced, past a fade-in / before a fade-out it passes
    through untouched.  Sample position counts pushed samples (the
    pts-derived cur_sample of the reference)."""

    def __init__(self, rate: int, type="in", start_sample=0,
                 nb_samples=44100, start_time=None, duration=None,
                 curve="tri"):
        t = str(type).lower()
        if t in ("in", "0"):
            self.out = False
        elif t in ("out", "1"):
            self.out = True
        else:
            raise ValueError(f"afade type must be in|out, got {type!r}")
        self.curve = str(curve).lower()
        if self.curve not in _AFADE_CURVES:
            raise ValueError(f"afade: unknown curve {self.curve!r}")
        rate = int(rate)
        # config_output uses FALSY checks (af_afade.c `if (s->duration)`)
        # — an explicit st=0 / d=0 means unset, ss/ns are kept
        self.start = int(round(float(start_time) * rate)) \
            if start_time else int(start_sample)
        self.range = int(round(float(duration) * rate)) \
            if duration else int(nb_samples)
        self.range = max(1, self.range)
        self._pos = 0

    def push(self, block: np.ndarray) -> np.ndarray:
        n = len(block)
        cur = self._pos
        self._pos += n
        if n == 0:
            return block
        # passthrough regions (af_afade.c:278-280)
        if (not self.out and self.start + self.range < cur) or \
                (self.out and cur + n < self.start):
            return block
        # silence regions (af_afade.c:291-294)
        if (not self.out and cur + n < self.start) or \
                (self.out and self.start + self.range < cur):
            return np.zeros_like(block)
        if not self.out:
            idx = (cur - self.start) + np.arange(n)
        else:
            idx = (self.start + self.range - cur) - np.arange(n)
        gain = _afade_gain(self.curve, idx, self.range)[:, None]
        return (block.astype(np.float64) * gain).astype(block.dtype)

    def flush(self) -> np.ndarray:
        return np.zeros((0, 0), np.int16)
