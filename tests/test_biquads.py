"""Biquad family vs an independent literal transcription of
af_biquads.c (coefficients AND the DF1 s16 loop in Python doubles —
IEEE semantics make the comparison bit-exact against the C kernel)."""
import math

import numpy as np
import pytest

from gmat_tpu.av.audio_filters import apply_audio_filters
from gmat_tpu.av.biquads import (BiquadStream, compute_coeffs,
                                 parse_biquad_opts)

LOG2_10 = 3.321928094887362347870319429489390175864831393024580612054


def exp10(x):
    return math.exp2(LOG2_10 * x)


def oracle_coeffs(name, rate, frequency, width_type, width, gain=0.0,
                  poles=2, order=2, csg=False, normalize=False):
    """Independent transcription of config_filter (af_biquads.c:
    792-1010) for the types the tests cover."""
    A = exp10(gain / 40.0)
    w0 = 2.0 * math.pi * frequency / rate
    K = math.tan(w0 / 2.0)
    sw, cw = math.sin(w0), math.cos(w0)
    if width_type == "q":
        alpha = sw / (2 * width)
    elif width_type == "h":
        alpha = sw / (2 * frequency / width)
    elif width_type == "o":
        alpha = sw * math.sinh(math.log(2.0) / 2 * width * w0 / sw)
    elif width_type == "s":
        alpha = sw / 2 * math.sqrt((A + 1 / A) * (1 / width - 1) + 2)
    elif width_type == "k":
        alpha = sw / (2 * frequency / (width * 1000))
    beta = 2 * math.sqrt(A)
    if name == "equalizer":
        c = (1 + alpha * A, -2 * cw, 1 - alpha * A,
             1 + alpha / A, -2 * cw, 1 - alpha / A)
    elif name == "lowpass":
        if poles == 1:
            a1 = -math.exp(-w0)
            c = (1 + a1, 0.0, 0.0, 1.0, a1, 0.0)
        else:
            c = ((1 - cw) / 2, 1 - cw, (1 - cw) / 2,
                 1 + alpha, -2 * cw, 1 - alpha)
    elif name == "highpass":
        if poles == 1:
            a1 = -math.exp(-w0)
            b0 = (1 - a1) / 2
            c = (b0, -b0, 0.0, 1.0, a1, 0.0)
        else:
            c = ((1 + cw) / 2, -(1 + cw), (1 + cw) / 2,
                 1 + alpha, -2 * cw, 1 - alpha)
    elif name in ("bass", "lowshelf", "tiltshelf"):
        # bass recomputes beta; lowshelf/tiltshelf keep beta=2*sqrt(A);
        # all three share A = exp10(gain/40) in the 2-pole body, and
        # tiltshelf divides b0/b1/b2 by that A after normalization
        bb = math.sqrt((A * A + 1) - (A - 1) * (A - 1)) \
            if name == "bass" else beta
        if poles == 1:
            A1 = exp10(gain / 20)
            ro = -math.sin(w0 / 2.0 - math.pi / 4) \
                / math.sin(w0 / 2.0 + math.pi / 4)
            n = (A1 + 1) / (A1 - 1)
            alpha1 = n - (1 if n > 0 else -1) * math.sqrt(n * n - 1) \
                if A1 != 1.0 else 0.0
            beta0 = ((1 + A1) + (1 - A1) * alpha1) * 0.5
            beta1 = ((1 - A1) + (1 + A1) * alpha1) * 0.5
            c = (beta0 + ro * beta1, -beta1 - ro * beta0, 0.0,
                 1 + ro * alpha1, -ro - alpha1, 0.0)
        else:
            c = (A * ((A + 1) - (A - 1) * cw + bb * alpha),
                 2 * A * ((A - 1) - (A + 1) * cw),
                 A * ((A + 1) - (A - 1) * cw - bb * alpha),
                 (A + 1) + (A - 1) * cw + bb * alpha,
                 -2 * ((A - 1) + (A + 1) * cw),
                 (A + 1) + (A - 1) * cw - bb * alpha)
    elif name == "treble":
        bb = math.sqrt((A * A + 1) - (A - 1) * (A - 1))
        if poles == 1:
            A1 = exp10(gain / 20)
            ro = math.sin(w0 / 2.0 - math.pi / 4) \
                / math.sin(w0 / 2.0 + math.pi / 4)
            n = (A1 + 1) / (A1 - 1)
            alpha1 = n - (1 if n > 0 else -1) * math.sqrt(n * n - 1) \
                if A1 != 1.0 else 0.0
            beta0 = ((1 + A1) + (1 - A1) * alpha1) * 0.5
            beta1 = ((1 - A1) + (1 + A1) * alpha1) * 0.5
            c = (beta0 + ro * beta1, beta1 + ro * beta0, 0.0,
                 1 + ro * alpha1, ro + alpha1, 0.0)
        else:
            c = (A * ((A + 1) + (A - 1) * cw + bb * alpha),
                 -2 * A * ((A - 1) + (A + 1) * cw),
                 A * ((A + 1) + (A - 1) * cw - bb * alpha),
                 (A + 1) - (A - 1) * cw + bb * alpha,
                 2 * ((A - 1) - (A + 1) * cw),
                 (A + 1) - (A - 1) * cw - bb * alpha)
    elif name == "highshelf":   # like treble but beta = 2*sqrt(A)
        c = (A * ((A + 1) + (A - 1) * cw + beta * alpha),
             -2 * A * ((A - 1) + (A + 1) * cw),
             A * ((A + 1) + (A - 1) * cw - beta * alpha),
             (A + 1) - (A - 1) * cw + beta * alpha,
             2 * ((A - 1) - (A + 1) * cw),
             (A + 1) - (A - 1) * cw - beta * alpha)
    elif name == "bandpass":
        if csg:
            c = (sw / 2, 0.0, -sw / 2, 1 + alpha, -2 * cw, 1 - alpha)
        else:
            c = (alpha, 0.0, -alpha, 1 + alpha, -2 * cw, 1 - alpha)
    elif name == "bandreject":
        c = (1.0, -2 * cw, 1.0, 1 + alpha, -2 * cw, 1 - alpha)
    elif name == "allpass":
        if order == 1:
            a1 = -(1.0 - K) / (1.0 + K)
            c = (a1, 1.0, 0.0, 1.0, a1, 0.0)
        else:
            c = (1 - alpha, -2 * cw, 1 + alpha,
                 1 + alpha, -2 * cw, 1 - alpha)
    b0, b1, b2, a0, a1, a2 = c
    a1, a2 = a1 / a0, a2 / a0
    b0, b1, b2 = b0 / a0, b1 / a0, b2 / a0
    if normalize and abs(b0 + b1 + b2) > 1e-6:
        f = (1.0 + a1 + a2) / (b0 + b1 + b2)
        b0, b1, b2 = b0 * f, b1 * f, b2 * f
    if name == "tiltshelf":
        b0, b1, b2 = b0 / A, b1 / A, b2 / A
    return b0, b1, b2, a1, a2


def oracle_di_s16(x, b0, b1, b2, a1, a2, wet=1.0, state=None):
    """Literal BIQUAD_FILTER(s16) (af_biquads.c:205-283) with the
    even/odd unroll and the tail branch."""
    i1, i2, o1, o2 = state if state is not None else (0.0,) * 4
    a1, a2 = -a1, -a2
    dry = 1.0 - wet
    out = np.empty_like(x)
    n = len(x)
    i = 0
    while i + 1 < n:
        o2 = i2 * b2 + i1 * b1 + x[i] * b0 + o2 * a2 + o1 * a1
        i2 = float(x[i])
        v = o2 * wet + i2 * dry
        out[i] = -32768 if v < -32768.0 else 32767 if v > 32767.0 \
            else int(v)
        i += 1
        o1 = i1 * b2 + i2 * b1 + x[i] * b0 + o1 * a2 + o2 * a1
        i1 = float(x[i])
        v = o1 * wet + i1 * dry
        out[i] = -32768 if v < -32768.0 else 32767 if v > 32767.0 \
            else int(v)
        i += 1
    if i < n:
        o0 = x[i] * b0 + i1 * b1 + i2 * b2 + o1 * a1 + o2 * a2
        i2 = i1
        i1 = float(x[i])
        o2 = o1
        o1 = o0
        v = o0 * wet + i1 * dry
        out[i] = -32768 if v < -32768.0 else 32767 if v > 32767.0 \
            else int(v)
    return out, (i1, i2, o1, o2)


def _sig(n=6000, ch=2, seed=0, amp=9000):
    r = np.random.default_rng(seed)
    return r.normal(0, amp, (n, ch)).astype(np.int16)


@pytest.mark.parametrize("name,opts,okw", [
    ("lowpass", "f=1000", dict(frequency=1000, width_type="q",
                               width=0.707)),
    ("lowpass", "f=800:p=1", dict(frequency=800, width_type="q",
                                  width=0.707, poles=1)),
    ("highpass", "f=2000:w=1.2:t=q", dict(frequency=2000,
                                          width_type="q", width=1.2)),
    ("equalizer", "f=1000:t=h:w=200:g=-6",
     dict(frequency=1000, width_type="h", width=200, gain=-6)),
    ("equalizer", "f=1000:t=o:w=1.5:g=4",
     dict(frequency=1000, width_type="o", width=1.5, gain=4)),
    ("bass", "g=8:f=120", dict(frequency=120, width_type="q",
                               width=0.5, gain=8)),
    ("treble", "g=-4", dict(frequency=3000, width_type="q",
                            width=0.5, gain=-4)),
    ("highshelf", "g=5:t=s:w=0.6",
     dict(frequency=3000, width_type="s", width=0.6, gain=5)),
    ("bandpass", "f=1500:csg=1", dict(frequency=1500, width_type="q",
                                      width=0.5, csg=True)),
    ("bandreject", "f=1500", dict(frequency=1500, width_type="q",
                                  width=0.5)),
    ("allpass", "f=700:o=1", dict(frequency=700, width_type="q",
                                  width=0.707, order=1)),
    ("allpass", "f=700:t=k:w=0.4", dict(frequency=700, width_type="k",
                                        width=0.4)),
    ("lowpass", "f=1000:n=1", dict(frequency=1000, width_type="q",
                                   width=0.707, normalize=True)),
    ("lowshelf", "g=7:f=150", dict(frequency=150, width_type="q",
                                   width=0.5, gain=7)),
    ("tiltshelf", "g=6:f=800", dict(frequency=800, width_type="q",
                                    width=0.5, gain=6)),
    ("tiltshelf", "g=6:f=800:n=1",
     dict(frequency=800, width_type="q", width=0.5, gain=6,
          normalize=True)),
    ("bass", "g=9:f=100:p=1", dict(frequency=100, width_type="q",
                                   width=0.5, gain=9, poles=1)),
    ("bass", "g=-9:f=100:p=1", dict(frequency=100, width_type="q",
                                    width=0.5, gain=-9, poles=1)),
    ("treble", "g=5:f=4000:p=1", dict(frequency=4000, width_type="q",
                                      width=0.5, gain=5, poles=1)),
])
def test_biquad_matches_oracle(name, opts, okw):
    rate = 48000
    x = _sig(seed=hash(name + opts) & 0xFFFF)
    got, r = apply_audio_filters(x, rate, f"{name}={opts}")
    assert r == rate
    cb = oracle_coeffs(name, rate, **okw)
    want = np.empty_like(x)
    for c in range(x.shape[1]):
        want[:, c], _ = oracle_di_s16(x[:, c], *cb)
    np.testing.assert_array_equal(got, want)


def test_biquad_raw_coefficients():
    rate = 48000
    x = _sig(seed=9)
    got, _ = apply_audio_filters(
        x, rate, "biquad=b0=0.3:b1=0.2:b2=0.1:a0=1.0:a1=-0.5:a2=0.1")
    want = np.empty_like(x)
    for c in range(2):
        want[:, c], _ = oracle_di_s16(x[:, c], 0.3, 0.2, 0.1, -0.5, 0.1)
    np.testing.assert_array_equal(got, want)


def test_biquad_streaming_state_continues():
    rate = 48000
    x = _sig(8000, seed=2)
    st = BiquadStream(rate, "lowpass", frequency=900)
    outs = [st.push(x[i:i + 1111]) for i in range(0, len(x), 1111)]
    got = np.concatenate(outs)
    one = BiquadStream(rate, "lowpass", frequency=900).push(x)
    np.testing.assert_array_equal(got, one)


def test_biquad_mix_and_channels():
    rate = 48000
    x = _sig(seed=3)
    got, _ = apply_audio_filters(x, rate, "lowpass=f=500:m=0.4")
    cb = oracle_coeffs("lowpass", rate, 500, "q", 0.707)
    want = np.empty_like(x)
    for c in range(2):
        want[:, c], _ = oracle_di_s16(x[:, c], *cb, wet=0.4)
    np.testing.assert_array_equal(got, want)
    # channels=FL: FR bypassed verbatim
    got2, _ = apply_audio_filters(x, rate, "lowpass=f=500:c=FL")
    np.testing.assert_array_equal(got2[:, 1], x[:, 1])
    assert (got2[:, 0] != x[:, 0]).any()


def test_biquad_bypass_and_gates():
    x = _sig(100, seed=4)
    # equalizer default f=0 -> w0 <= 0 -> bypass with warning in the C
    got, _ = apply_audio_filters(x, 48000, "equalizer=g=6")
    np.testing.assert_array_equal(got, x)
    for bad in ["lowpass=f=-5", "lowpass=a=zdf", "lowpass=r=f32",
                "lowpass=b=256", "lowpass=zz=1", "allpass=o=3",
                "bass=p=3", "lowpass=m=2",
                "lowpass=g=6",           # no gain option on lowpass
                "bandpass=g=1", "biquad=f=100"]:
        with pytest.raises(ValueError):
            apply_audio_filters(x, 48000, bad)


def test_parse_positional_frequency():
    kw = parse_biquad_opts("lowpass", "1200")
    assert kw == {"frequency": 1200.0}
    # multi-positional shorthand in declaration order
    kw = parse_biquad_opts("lowpass", "1000:q:0.9")
    assert kw == {"frequency": 1000.0, "width_type": "q", "width": 0.9}
    kw = parse_biquad_opts("biquad", "1:0:0:0.5:0.2:0.1")
    assert kw == {"a0": 1.0, "a1": 0.0, "a2": 0.0,
                  "b0": 0.5, "b1": 0.2, "b2": 0.1}
    from gmat_tpu.av.audio_filters import _parse_volume_opts
    assert _parse_volume_opts("0.5:fixed") == {"volume": "0.5",
                                               "precision": "fixed"}
    # biquad=a0=0 is C garbage (inf/nan), never a crash
    import numpy as np
    x = np.zeros((64, 1), np.int16)
    from gmat_tpu.av.audio_filters import apply_audio_filters
    y, _ = apply_audio_filters(x, 48000, "biquad=a0=0:b0=1")
    assert y.shape == x.shape
    b = compute_coeffs("lowpass", 48000, frequency=24001)
    assert b[5] is True            # above nyquist -> bypass

def test_parse_allpass_positional_normalize():
    """allpass_options declare frequency, width_type, width, mix,
    channels, NORMALIZE, order, transform, precision (af_biquads.c:1643
    with MIX_CHANNELS_NORMALIZE_OPTION expanding before order): the 6th
    positional binds normalize, not order."""
    kw = parse_biquad_opts("allpass", "3000:q:0.707:1:all:1")
    assert kw.get("normalize") in (True, 1, "1")
    assert "order" not in kw
    kw = parse_biquad_opts("allpass", "3000:q:0.707:1:all:0:1")
    assert kw.get("order") in (1, "1", 1.0)
