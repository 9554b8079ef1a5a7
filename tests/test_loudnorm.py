"""loudnorm tests: segment-vectorized implementation vs the literal
per-sample C transcription (tests/oracle_loudnorm.py).

The comparisons run at internal_rate=19200 (10x cheaper than the real
192 kHz pin; all frame geometry scales with rate while the C's literal
1920-sample constants stay literal in both transcriptions, so every
state machine path is exercised identically)."""
import numpy as np
import pytest

from gmat_tpu.av.ebur128 import EburR128
from gmat_tpu.av.loudnorm import (LoudnormStream, frame_size,
                                  parse_loudnorm_opts)

from .oracle_loudnorm import OracleEbur, OracleLoudnorm

RATE = 19200          # test-only internal rate (see module docstring)


def _sig(seconds, ch=2, rate=RATE, seed=7, loud_db=-30.0, bursts=()):
    """Noise at ~loud_db dBFS with optional (t_sec, amp) bursts."""
    r = np.random.default_rng(seed)
    n = int(seconds * rate)
    amp = 10.0 ** (loud_db / 20.0)
    x = r.normal(0.0, amp, (n, ch))
    for t, a in bursts:
        i = int(t * rate)
        seg = min(int(0.01 * rate), n - i)
        x[i:i + seg] += a * np.sign(r.normal(size=(seg, ch)))
    return np.clip(x, -1.0, 1.0)


def _run_impl(x, rate=RATE, **opts):
    """Drive LoudnormStream on raw doubles at the processing rate (as
    s16 would lose the sub-LSB detail the oracle compares)."""
    st = LoudnormStream(rate, internal_rate=rate, **opts)
    st._configure(x.shape[1])
    outs = []
    first = frame_size(rate, 3000)
    sub = frame_size(rate, 100)
    pos = 0
    # framequeue semantics: fixed-size frames, short last frame
    while pos < len(x):
        need = first if st.frame_type == 0 else sub
        frame = x[pos:pos + need]
        pos += len(frame)
        outs.append(st._process_frame(frame))
    # EOF drain (request_frame)
    if st.frame_type == 1:
        nb = (st.buf_frames - st.prev_nb_samples) \
            - (st.subframe - st.prev_nb_samples)
        off = (st.limiter_frames - st.prev_nb_samples) \
            - (st.subframe - st.prev_nb_samples)
        st.buf_index = (st.buf_index - off) % st.buf_frames
        rd = (st.buf_index + np.arange(nb)) % st.buf_frames
        frame = st.buf[rd].copy()
        st.frame_type = 2
        outs.append(st._process_frame(frame))
    return np.concatenate([o for o in outs if len(o)]), st


def _run_oracle(x, rate=RATE, **opts):
    o = OracleLoudnorm(rate, x.shape[1], **opts)
    outs = []
    first = frame_size(rate, 3000)
    sub = frame_size(rate, 100)
    pos = 0
    while pos < len(x):
        need = first if o.frame_type == 0 else sub
        frame = x[pos:pos + need]
        pos += len(frame)
        outs.append(o.filter_frame(frame))
    tail = o.eof_drain()
    if tail is not None:
        outs.append(tail)
    return np.concatenate([o_ for o_ in outs if len(o_)]), o


# ---------------------------------------------------------------------------
# ebur128 vs oracle


def test_ebur128_measurements_match_oracle():
    x = _sig(4.3, ch=2, loud_db=-20.0, seed=3)
    e = EburR128(2, RATE)
    o = OracleEbur(2, RATE)
    for i in range(0, len(x), 7777):       # ragged chunks
        e.add_frames(x[i:i + 7777])
        o.add_frames(x[i:i + 7777])
    assert e.loudness_global() == pytest.approx(o.loudness_global(),
                                                abs=1e-9)
    assert e.loudness_shortterm() == pytest.approx(
        o.loudness_shortterm(), abs=1e-9)
    assert e.relative_threshold() == pytest.approx(
        o.relative_threshold(), abs=1e-9)
    assert e.loudness_range() == pytest.approx(o.loudness_range(),
                                               abs=1e-9)
    for c in range(2):
        assert e.sample_peak(c) == pytest.approx(o.sample_peak[c],
                                                 abs=1e-15)
    assert np.array_equal(e.block_hist, np.array(o.block_hist))
    assert np.array_equal(e.short_term_hist, np.array(o.st_hist))


def test_ebur128_sine_sanity():
    """BS.1770 calibration: a 0 dBFS 997 Hz sine on a single channel
    reads -3.01 LKFS (the -0.691 offset compensates the K-filter's
    ~+0.68 dB at 997 Hz); both stereo channels add +3.01 dB."""
    sr = 48000
    t = np.arange(int(4.0 * sr)) / sr
    s = np.sin(2 * np.pi * 997.0 * t)
    x = np.stack([s, s], axis=1)
    e = EburR128(2, sr)
    e.add_frames(x)
    assert e.loudness_global() == pytest.approx(0.0, abs=0.15)
    e1 = EburR128(1, sr)
    e1.add_frames(x[:, :1])
    assert e1.loudness_global() == pytest.approx(-3.01, abs=0.15)


def test_ebur128_dual_mono_weight():
    sr = 48000
    t = np.arange(int(4.0 * sr)) / sr
    x = np.sin(2 * np.pi * 997.0 * t)[:, None] * 0.1
    plain = EburR128(1, sr)
    plain.add_frames(x)
    dm = EburR128(1, sr)
    dm.set_channel(0, 6)                  # DUAL_MONO
    dm.add_frames(x)
    assert dm.loudness_global() - plain.loudness_global() == \
        pytest.approx(10.0 * np.log10(2.0), abs=0.1)


# ---------------------------------------------------------------------------
# loudnorm dynamic mode vs oracle


@pytest.mark.parametrize("ch", [1, 2])
def test_dynamic_matches_oracle(ch):
    x = _sig(3.75, ch=ch, loud_db=-30.0, seed=11)
    got, st = _run_impl(x)
    want, o = _run_oracle(x)
    assert got.shape == want.shape == x.shape
    np.testing.assert_allclose(got, want, atol=1e-9)
    assert st.frame_type == 2 and o.frame_type == 2


def test_dynamic_limiter_peaks_match_oracle():
    """Bursts far above the -2 dBTP ceiling force OUT->ATTACK->SUSTAIN->
    RELEASE transitions; outputs must still agree."""
    x = _sig(3.6, ch=2, loud_db=-14.0, seed=5,
             bursts=[(3.05, 0.9), (3.22, 0.95), (3.4, 0.85)])
    got, _ = _run_impl(x, TP=-2.0, I=-16.0)
    want, _ = _run_oracle(x, target_tp=-2.0, target_i=-16.0)
    np.testing.assert_allclose(got, want, atol=1e-9)
    # the ceiling clip at the output stage must hold exactly
    assert np.abs(got).max() <= 10.0 ** (-2.0 / 20.0) + 1e-12


def test_dynamic_quiet_below_measured_thresh_matches_oracle():
    """above_threshold==0 branch: quiet signal under measured_thresh
    walks the prev_delta *= 1.0058 ramp."""
    x = _sig(3.5, ch=1, loud_db=-55.0, seed=9)
    got, _ = _run_impl(x, measured_thresh=-40.0, measured_I=-50.0)
    want, _ = _run_oracle(x, measured_thresh=-40.0, measured_i=-50.0)
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_short_input_linear_fallback_matches_oracle():
    """Sub-3 s input: FIRST frame takes the one-shot linear path
    (af_loudnorm.c:445-460)."""
    x = _sig(1.2, ch=2, loud_db=-28.0, seed=2)
    got, st = _run_impl(x)
    want, o = _run_oracle(x)
    np.testing.assert_allclose(got, want, atol=1e-12)
    assert st.frame_type == 3 and o.frame_type == 3   # LINEAR


# ---------------------------------------------------------------------------
# stream-level (s16 chain) behavior


def test_linear_mode_from_measured_options():
    """All measured_* provided and fitting -> LINEAR at the CHAIN rate
    (no 192 kHz pin), exact constant gain."""
    st = LoudnormStream(48000, I=-16.0, TP=-1.5, LRA=11.0,
                        measured_I=-26.0, measured_LRA=5.0,
                        measured_TP=-13.0, measured_thresh=-36.0)
    assert st.frame_type == 3
    r = np.random.default_rng(0)
    x = (r.normal(0, 1500, (4096, 2))).astype(np.int16)
    a = st.push(x[:1000])
    b = st.push(x[1000:])
    tail = st.flush()
    got = np.concatenate([p for p in (a, b) if p.size])
    assert tail.size == 0
    gain = 10.0 ** ((-16.0 - (-26.0)) / 20.0)
    want = np.clip(np.rint(x.astype(np.float64) * gain), -32768,
                   32767).astype(np.int16)
    np.testing.assert_array_equal(got, want)


def test_linear_rejected_when_tp_would_clip():
    """offset_tp > target_tp -> stays dynamic despite linear=1."""
    st = LoudnormStream(48000, I=-16.0, TP=-2.0,
                        measured_I=-20.0, measured_LRA=5.0,
                        measured_TP=-3.0, measured_thresh=-30.0)
    assert st.frame_type == 0   # FIRST (dynamic)


def test_stream_chunked_equals_one_shot_dynamic():
    rate = RATE
    r = np.random.default_rng(4)
    x = (r.normal(0, 3000, (int(3.4 * rate), 2))).astype(np.int16)
    one = LoudnormStream(rate, internal_rate=rate)
    a = one.push(x)
    b = one.flush()
    whole = np.concatenate([p for p in (a, b) if p.size])
    chunked = LoudnormStream(rate, internal_rate=rate)
    outs = [chunked.push(x[i:i + 1333]) for i in range(0, len(x), 1333)]
    outs.append(chunked.flush())
    got = np.concatenate([p for p in outs if p.size])
    np.testing.assert_array_equal(got, whole)
    assert len(got) == len(x)


def test_loudnorm_via_swr_converges_to_target():
    """48 kHz s16 in, real swresample to/from the 192 kHz pin: the
    output integrated loudness must land near I (within 1 LU for
    steady noise), total length preserved within resampler slack."""
    rate = 48000
    r = np.random.default_rng(12)
    amp = 32768.0 * 10.0 ** (-30.0 / 20.0)
    x = np.clip(r.normal(0, amp, (rate * 5, 2)), -32768,
                32767).astype(np.int16)
    st = LoudnormStream(rate, I=-16.0, TP=-1.5, LRA=11.0)
    a = st.push(x)
    b = st.flush()
    y = np.concatenate([p for p in (a, b) if p.size])
    assert abs(len(y) - len(x)) <= 256
    m = EburR128(2, rate)
    m.add_frames(y.astype(np.float64) / 32768.0)
    assert m.loudness_global() == pytest.approx(-16.0, abs=1.0)
    s = st.stats()
    assert s["normalization_type"] == "dynamic"
    # -30 dBFS RMS white noise reads ~ -24 LUFS: the K-weighting shelf
    # boosts the (dominant) high-frequency energy by ~4 dB
    assert s["input_i"] == pytest.approx(-24.0, abs=1.5)


# ---------------------------------------------------------------------------
# options


def test_parse_loudnorm_opts():
    kw = parse_loudnorm_opts("I=-16:TP=-1.5:LRA=11:linear=true:"
                             "measured_I=-27:print_format=summary")
    assert kw == {"I": -16.0, "TP": -1.5, "LRA": 11.0, "linear": True,
                  "measured_I": -27.0, "print_format": "summary"}
    kw = parse_loudnorm_opts("i=-20:tp=-1:lra=9:dual_mono=1")
    assert kw == {"I": -20.0, "TP": -1.0, "LRA": 9.0, "dual_mono": True}
    for bad in ["I=-4", "I=-71", "TP=1", "LRA=0.5", "nosuch=1",
                "linear=maybe", "print_format=xml", "I"]:
        with pytest.raises(ValueError):
            parse_loudnorm_opts(bad)


def test_chain_integration():
    from gmat_tpu.av.audio_filters import apply_audio_filters
    r = np.random.default_rng(1)
    x = (r.normal(0, 800, (48000 * 4, 2))).astype(np.int16)
    y, rate = apply_audio_filters(x, 48000, "loudnorm=I=-20:TP=-2:LRA=9")
    assert rate == 48000
    assert abs(len(y) - len(x)) <= 256
    assert y.dtype == np.int16
