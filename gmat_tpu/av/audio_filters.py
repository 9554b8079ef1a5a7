"""Audio filters: atempo / volume / aresample.

Covers the audio filter chain the reference drives through libavfilter
(AppMeTrans options.xml `<AudioFilterDesc>atempo=0.7143</AudioFilterDesc>`,
AppMeTrans.cpp:176-200).  atempo is a WSOLA-style time stretch (same
algorithm family as ffmpeg's af_atempo); all filters operate on
interleaved s16 numpy blocks.
"""
from __future__ import annotations

from typing import Callable, Dict, List, Tuple

import numpy as np


def atempo(samples: np.ndarray, rate: int, tempo: float = 1.0) -> np.ndarray:
    """Time-stretch without pitch change. samples: (n, ch) int16.

    tempo > 1 speeds up (shorter output), < 1 slows down. Valid 0.5..2.0
    per ffmpeg's constraint (chain twice for more, like ffmpeg).
    """
    if not 0.5 <= tempo <= 2.0:
        raise ValueError("atempo factor must be in [0.5, 2.0]")
    if abs(tempo - 1.0) < 1e-6 or samples.shape[0] == 0:
        return samples
    x = samples.astype(np.float32)
    n, ch = x.shape
    win = min(int(rate * 0.040), max(n // 4, 32))      # 40 ms frames
    if n <= 2 * win:
        # too short to stretch meaningfully; resample-nearest instead
        idx = np.clip((np.arange(int(n / tempo)) * tempo).astype(int), 0, n - 1)
        return samples[idx]
    hop_out = win // 2
    hop_in = int(round(hop_out * tempo))
    search = win // 4
    hann = np.hanning(win * 2)[win:win * 2][:, None].astype(np.float32)
    fade_in = np.hanning(win * 2)[:win][:, None].astype(np.float32)

    out: List[np.ndarray] = []
    prev_tail = None
    pos = 0
    while pos + win + search < n:
        if prev_tail is None:
            seg = x[pos:pos + win]
        else:
            # search the best-aligned window around pos (WSOLA)
            best_off, best_score = 0, -np.inf
            ref = prev_tail[:, 0]
            lo = max(pos - search, 0)
            for off in range(lo, min(pos + search, n - win)):
                cand = x[off:off + len(ref), 0]
                score = float(np.dot(ref, cand))
                if score > best_score:
                    best_score, best_off = score, off
            seg = x[best_off:best_off + win]
        if prev_tail is not None:
            head = seg[:hop_out] * fade_in[:hop_out] + \
                prev_tail[:hop_out] * hann[:hop_out]
            out.append(head)
        else:
            out.append(seg[:hop_out])
        prev_tail = seg[hop_out:]
        pos += hop_in
    if prev_tail is not None:
        out.append(prev_tail)
    # flush the un-stretched tail the hop loop couldn't cover (~win+search
    # samples) so the clip's ending isn't truncated
    if pos < n:
        out.append(x[pos + (win if prev_tail is not None else 0):])
    y = np.concatenate([o for o in out if o.size]) if out else x
    return np.clip(y, -32768, 32767).astype(np.int16)


def volume(samples: np.ndarray, rate: int, volume: float = 1.0) -> np.ndarray:
    y = samples.astype(np.float32) * float(volume)
    return np.clip(y, -32768, 32767).astype(np.int16)


def aresample(samples: np.ndarray, rate: int, out_rate: int) -> Tuple[np.ndarray, int]:
    """Linear-interp resample; returns (samples, new_rate)."""
    out_rate = int(out_rate)
    if out_rate == rate or samples.shape[0] < 2:
        return samples, out_rate
    n, ch = samples.shape
    m = int(round(n * out_rate / rate))
    src = np.linspace(0, n - 1, m)
    i0 = np.floor(src).astype(int)
    i1 = np.minimum(i0 + 1, n - 1)
    f = (src - i0)[:, None].astype(np.float32)
    y = samples[i0].astype(np.float32) * (1 - f) + \
        samples[i1].astype(np.float32) * f
    return np.clip(y, -32768, 32767).astype(np.int16), out_rate


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
            else:
                raise ValueError(f"unknown audio filter {name!r}")
        else:
            raise ValueError(f"audio filter needs a value: {part!r}")
    return chain


def apply_audio_filters(samples: np.ndarray, rate: int, desc: str):
    """Run a parsed chain; returns (samples, rate)."""
    for name, kw in parse_audio_filters(desc):
        if name == "aresample":
            samples, rate = aresample(samples, rate, **kw)
        elif name == "atempo":
            samples = atempo(samples, rate, **kw)
        elif name == "volume":
            samples = volume(samples, rate, **kw)
    return samples, rate
