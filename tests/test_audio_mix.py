"""aecho + pan tests.

The aecho oracle is an INDEPENDENT scalar transcription of the ECHO
macro (af_aecho.c:157-196): per-channel ring buffer, per-sample double
taps, av_clipd + double->int16 truncation toward zero, and the EOF
silence tail of request_frame (:271-293).

pan's mixing math is verified against the REAL libswresample.so.4 via
ctypes (swr_alloc_set_opts2 + swr_set_matrix + swr_convert) — exactly
the library af_pan.c delegates to (af_pan.c:293-341).
"""
import ctypes

import numpy as np
import pytest

from gmat_tpu.av.audio_filters import (AechoStream, PanFilter,
                                       AudioFilterStream,
                                       apply_audio_filters)


# ---------------------------------------------------------------------------
# aecho oracle


def aecho_oracle(x, rate, in_gain, out_gain, delays, decays):
    """x: (n, ch) int16; returns (n + max_samples, ch) int16 including
    the EOF tail.  Options quantize through float32 like the C's
    AV_OPT_TYPE_FLOAT fields / av_sscanf("%f") arrays."""
    in_gain = float(np.float32(in_gain))
    out_gain = float(np.float32(out_gain))
    delays = [float(np.float32(d)) for d in delays]
    decays = [float(np.float32(d)) for d in decays]
    samples = [int(float(np.float32(np.float32(d) * np.float32(rate)))
                   / 1000.0) for d in delays]
    max_samples = max(samples)
    n, ch = x.shape
    full = np.concatenate([x, np.zeros((max_samples, ch), np.int16)])
    out = np.zeros_like(full)
    for c in range(ch):
        dbuf = np.zeros(max_samples, np.float64)
        index = 0
        for i in range(len(full)):
            inp = float(full[i, c])
            o = inp * in_gain
            for lag, dec in zip(samples, decays):
                ix = index + max_samples - lag
                ix = ix - max_samples if ix >= max_samples else ix
                o += dbuf[ix] * dec
            o *= out_gain
            o = min(max(o, -32768.0), 32767.0)
            out[i, c] = int(o)               # C truncation toward zero
            dbuf[index] = inp
            index = index + 1 if index + 1 < max_samples else 0
    return out


def _sig(n=3000, ch=2, seed=3):
    r = np.random.default_rng(seed)
    return r.integers(-20000, 20000, (n, ch)).astype(np.int16)


def test_aecho_oracle_one_shot():
    x = _sig()
    got, rate = apply_audio_filters(x, 8000, "aecho=0.8:0.9:50|130:0.4|0.3")
    ref = aecho_oracle(x, 8000, 0.8, 0.9, [50.0, 130.0], [0.4, 0.3])
    assert rate == 8000
    np.testing.assert_array_equal(got, ref)


def test_aecho_chunked_equals_one_shot():
    x = _sig(5000)
    st = AechoStream(8000, 0.6, 0.3, "100", "0.5")
    outs = [st.push(x[i:i + 777]) for i in range(0, 5000, 777)]
    outs.append(st.flush())
    got = np.concatenate([o for o in outs if o.size])
    one, _ = apply_audio_filters(x, 8000, "aecho=0.6:0.3:100:0.5")
    np.testing.assert_array_equal(got, one)


def test_aecho_defaults_and_validation():
    st = AechoStream(44100)                   # 0.6:0.3:1000:0.5
    assert st.max_samples == 44100
    for bad in [dict(delays="0"), dict(delays="100000"),
                dict(decays="0"), dict(decays="1.5"),
                dict(delays="10|20", decays="0.5"),
                dict(in_gain=1.5), dict(delays="", decays="")]:
        with pytest.raises(ValueError):
            AechoStream(44100, **bad)
    # sub-sample delay at low rate -> samples=0 -> "nothing to echo"
    with pytest.raises(ValueError, match="[Nn]othing to echo"):
        AechoStream(8000, delays="0.1", decays="0.5")


def test_aecho_float32_option_quantization():
    """decay=0.7 is not float32-representable: the C's float storage
    makes the effective tap 0.69999998807...; using the double would
    flip ~0.25% of samples by 1 LSB (regression for the f32 fix)."""
    x = _sig(20000, 1, seed=13)
    got, _ = apply_audio_filters(x, 8000, "aecho=0.6:0.3:50:0.7")
    ref = aecho_oracle(x, 8000, 0.6, 0.3, [50.0], [0.7])
    np.testing.assert_array_equal(got, ref)
    # double-math variant must actually differ somewhere, or this test
    # guards nothing
    st = AechoStream(8000, 0.6, 0.3, "50", "0.7")
    st.decay = [0.7]
    st.in_gain, st.out_gain = 0.6, 0.3
    parts = [p for p in (st.push(x), st.flush()) if p.size]
    dbl = np.concatenate(parts)
    assert (dbl != got).any()


def test_aecho_zero_delay_tap_reads_oldest():
    """samples[j]==0 (delay < 1 sample) with another nonzero delay: the
    C tap reads dbuf[index] BEFORE the store — the value from
    max_samples ago."""
    x = _sig(400, 1)
    got, _ = apply_audio_filters(x, 8000, "aecho=1:1:0.05|25:0.5|0.25")
    # oracle with lag list as the C computes: samples=[0, 200]
    ref = aecho_oracle(x, 8000, 1.0, 1.0, [0.05, 25.0], [0.5, 0.25])
    np.testing.assert_array_equal(got, ref)


# ---------------------------------------------------------------------------
# pan: real swresample oracle


AV_SAMPLE_FMT_S16 = 1


class _AVChannelLayout(ctypes.Structure):
    _fields_ = [("order", ctypes.c_int), ("nb_channels", ctypes.c_int),
                ("u", ctypes.c_uint64), ("opaque", ctypes.c_void_p)]


@pytest.fixture(scope="module")
def swr():
    try:
        lib = ctypes.CDLL("libswresample.so.4")
        avu = ctypes.CDLL("libavutil.so.57")
    except OSError:
        pytest.skip("libswresample not available")
    lib.swr_alloc_set_opts2.restype = ctypes.c_int
    lib.swr_init.restype = ctypes.c_int
    lib.swr_set_matrix.restype = ctypes.c_int
    lib.swr_convert.restype = ctypes.c_int
    avu.av_channel_layout_default.restype = None
    return lib, avu


def swr_mix(swrlibs, x, matrix, nb_out):
    """Real swr: s16 interleaved in/out, explicit double matrix."""
    lib, avu = swrlibs
    n, nb_in = x.shape
    in_l, out_l = _AVChannelLayout(), _AVChannelLayout()
    avu.av_channel_layout_default(ctypes.byref(in_l), nb_in)
    avu.av_channel_layout_default(ctypes.byref(out_l), nb_out)
    ctx = ctypes.c_void_p()
    rc = lib.swr_alloc_set_opts2(
        ctypes.byref(ctx), ctypes.byref(out_l), AV_SAMPLE_FMT_S16, 48000,
        ctypes.byref(in_l), AV_SAMPLE_FMT_S16, 48000, 0, None)
    assert rc == 0
    m = np.ascontiguousarray(matrix, np.float64)
    rc = lib.swr_set_matrix(ctx, m.ctypes.data_as(
        ctypes.POINTER(ctypes.c_double)), m.shape[1])
    assert rc == 0
    assert lib.swr_init(ctx) >= 0
    xc = np.ascontiguousarray(x)
    out = np.zeros((n, nb_out), np.int16)
    inptr = ctypes.cast(xc.ctypes.data, ctypes.c_void_p)
    outptr = ctypes.cast(out.ctypes.data, ctypes.c_void_p)
    got = lib.swr_convert(ctx, ctypes.byref(outptr), n,
                          ctypes.byref(inptr), n)
    assert got == n
    lib.swr_free(ctypes.byref(ctx))
    return out


@pytest.mark.parametrize("desc,nb_in,nb_out,matrix", [
    ("stereo|c0=0.5*c0+0.5*c1|c1=0.5*c0+0.5*c1", 2, 2,
     [[0.5, 0.5], [0.5, 0.5]]),
    ("mono|c0=0.4*c0+0.6*c1", 2, 1, [[0.4, 0.6]]),
    ("stereo|c0=0.9*c0-0.3*c1|c1=c1", 2, 2, [[0.9, -0.3], [0.0, 1.0]]),
    ("stereo|FL<FL+0.5*FC+0.6*BL|FR<FR+0.5*FC+0.6*BR", 6, 2,
     [[1 / 2.1, 0, 0.5 / 2.1, 0, 0.6 / 2.1, 0],
      [0, 1 / 2.1, 0.5 / 2.1, 0, 0, 0.6 / 2.1]]),
    # maxsum > 32768 engages swr's clip variants on the 1/2-input paths
    ("stereo|c0=1.5*c0|c1=c1", 2, 2, [[1.5, 0.0], [0.0, 1.0]]),
    # >=3-input generic path: UNclipped low-bits int16 store
    ("mono|c0=c0+c1+c2", 3, 1, [[1.0, 1.0, 1.0]]),
    # >=3-input with fractional coeffs: matrix32 = plain lrintf(m*32768)
    # (no error diffusion), (v+16384)>>15
    ("mono|c0=0.31*c0+0.27*c1+0.41*c2+0.13*c3", 4, 1,
     [[0.31, 0.27, 0.41, 0.13]]),
    # 5.1->stereo with equal FC/LFE coeffs engages mix6to2: BOTH
    # outputs reuse ROW 0's error-diffused FC coefficient (the
    # template's shared t), even though row 1's own diffusion would
    # quantize FC differently
    ("stereo|c0=0.55*c0+0.333*c2+0.21*c4|c1=0.47*c1+0.333*c2+0.29*c5",
     6, 2,
     [[0.55, 0, 0.333, 0, 0.21, 0], [0, 0.47, 0.333, 0, 0, 0.29]]),
    # same shape but UNequal FC coeffs -> falls back to per-row sum2/
    # generic paths instead of mix6to2
    ("stereo|c0=0.5*c0+0.3*c2+0.2*c4|c1=0.5*c1+0.31*c2+0.2*c5", 6, 2,
     [[0.5, 0, 0.3, 0, 0.2, 0], [0, 0.5, 0.31, 0, 0, 0.2]]),
])
def test_pan_matches_real_swresample(swr, desc, nb_in, nb_out, matrix):
    x = _sig(2048, nb_in, seed=11)
    got = PanFilter(48000, desc).process(
        x, in_ids=[0, 1, 2, 3, 4, 5][:nb_in] if nb_in != 6
        else [0, 1, 2, 3, 4, 5])
    ref = swr_mix(swr, x, np.asarray(matrix, np.float64), nb_out)
    np.testing.assert_array_equal(got, ref)


def test_pan_renorm_matrix():
    """'<' renormalizes the row by sum(|gains|) (af_pan.c:319-334)."""
    p = PanFilter(48000, "mono|c0<0.3*c0+0.7*c1+1.0*c2")
    m = p._matrix(3)
    np.testing.assert_allclose(m, [[0.15, 0.35, 0.5]])
    p2 = PanFilter(48000, "mono|c0=0.3*c0+0.7*c1")
    np.testing.assert_allclose(p2._matrix(2), [[0.3, 0.7]])


def test_pan_pure_channel_map():
    """0/1 single-input rows use swr's channel mapping — verbatim copy,
    silence for unmapped outs (af_pan.c:303-316)."""
    x = _sig(100, 2)
    got = PanFilter(48000, "stereo|c0=c1|c1=c0").process(x)
    np.testing.assert_array_equal(got, x[:, ::-1])
    got3 = PanFilter(48000, "3.0|c0=c0|c1=c1").process(x)
    np.testing.assert_array_equal(got3[:, :2], x)
    assert (got3[:, 2] == 0).all()


def test_pan_named_channels_renumber():
    """Named in-channels renumber against the input layout
    (config_props, af_pan.c:271-281): BL in a stereo input is dropped."""
    x = _sig(64, 2)
    p = PanFilter(48000, "mono|FC=0.5*FL+0.5*FR+0.7*BL")
    got = p.process(x, in_ids=[0, 1])          # stereo: FL, FR
    m = p._matrix(2, in_ids=[0, 1])
    np.testing.assert_allclose(m, [[0.5, 0.5]])
    assert got.shape == (64, 1)


def test_pan_grammar_errors():
    for bad in ["", "stereo|c0=c0|c0=c1",                # out twice
                "stereo|c5=c0",                          # out of range
                "stereo|c0=c0+FL",                       # mixed naming
                "stereo|c0~c0",                          # bad separator
                "nosuchlayout|c0=c0"]:
        with pytest.raises(ValueError):
            PanFilter(48000, bad)


def test_pan_layout_only_is_silence():
    """'pan=stereo' with no channel rows is VALID in the C (the parse
    loop just never runs): all-zero gains are pure, the channel map is
    all -1, and swr emits silence."""
    x = _sig(16, 2)
    got = PanFilter(48000, "stereo").process(x)
    assert got.shape == (16, 2) and (got == 0).all()


def test_pan_layout_forms():
    assert PanFilter(48000, "5.1|c0=c0").nb_out == 6
    assert PanFilter(48000, "4c|c0=c0").nb_out == 4
    assert PanFilter(48000, "FL+FR+LFE|c0=c0").nb_out == 3
    assert PanFilter(48000, "0x3|c0=c0").nb_out == 2


def test_chain_pan_then_aecho():
    """Channel-count change flows through the streaming chain."""
    x = _sig(4096, 2)
    st = AudioFilterStream("pan=mono|c0=0.5*c0+0.5*c1,aecho=0.6:0.3:40:0.5",
                           8000)
    a = st.push(x)
    b = st.flush()
    got = np.concatenate([p for p in (a, b) if p.size])
    mixed = PanFilter(8000, "mono|c0=0.5*c0+0.5*c1").process(x)
    want, _ = apply_audio_filters(mixed, 8000, "aecho=0.6:0.3:40:0.5")
    assert got.shape[1] == 1
    np.testing.assert_array_equal(got, want)
