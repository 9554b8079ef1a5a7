"""dynaudnorm vs the literal C transcription (oracle_dynaudnorm.py)."""
import numpy as np
import pytest

from gmat_tpu.av.dynaudnorm import (DynaudnormStream, parse_dynaudnorm_opts,
                                    setup_compress_thresh)

from .oracle_dynaudnorm import OracleDynaudnorm
from .oracle_dynaudnorm import setup_compress_thresh as oracle_sct

RATE = 8000


def _sig(seconds, ch=2, seed=0, amp=0.2, dc=0.0):
    r = np.random.default_rng(seed)
    n = int(seconds * RATE)
    env = 0.2 + 0.8 * np.abs(np.sin(np.arange(n) / RATE * 2.0))
    x = r.normal(0.0, amp, (n, ch)) * env[:, None] + dc
    return np.clip(x, -1.0, 1.0)


def _impl(x, **kw):
    return DynaudnormStream(RATE, **kw).process_doubles(x)


def _oracle(x, **kw):
    return OracleDynaudnorm(RATE, x.shape[1], **kw).run(x)


@pytest.mark.parametrize("kw", [
    {},                                             # defaults
    {"gausssize": 7, "framelen": 200},
    {"coupling": False, "gausssize": 5, "framelen": 100},
    {"targetrms": 0.3, "gausssize": 5, "framelen": 100},
    {"altboundary": True, "gausssize": 5, "framelen": 100},
    {"correctdc": True, "gausssize": 5, "framelen": 100},
    {"compress": 3.0, "gausssize": 5, "framelen": 100},
    {"overlap": 0.5, "gausssize": 5, "framelen": 100},
    # overlap AND targetrms together: the analysis window is the C's
    # 2*frame_len zero-padded frame, so RMS sees half zeros (regression
    # for the sqrt(2) rms_gain bug)
    {"overlap": 0.5, "targetrms": 0.3, "gausssize": 5, "framelen": 100},
    {"overlap": 0.5, "compress": 3.0, "gausssize": 5, "framelen": 100},
    {"maxgain": 2.0, "threshold": 0.01, "gausssize": 5,
     "framelen": 100},
])
def test_matches_oracle(kw):
    x = _sig(3.0, ch=2, seed=3, dc=0.02 if kw.get("correctdc") else 0.0)
    got = _impl(x, **kw)
    want = _oracle(x, **kw)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-12)
    assert len(got) == len(x)


def test_short_stream_raw_passthrough():
    """Fewer frames than filter_size at EOF: once the smoothed history
    runs dry the queue drains unfiltered (af_dynaudnorm.c:831-837)."""
    x = _sig(0.5, ch=1, seed=5)
    got = _impl(x, gausssize=31)
    want = _oracle(x, gausssize=31)
    np.testing.assert_allclose(got, want, atol=1e-12)
    assert len(got) == len(x)


def test_even_gausssize_forced_odd():
    st = DynaudnormStream(RATE, gausssize=30)
    assert st.filter_size == 31
    o = OracleDynaudnorm(RATE, 1, gausssize=30)
    assert o.filter_size == 31


def test_setup_compress_thresh_matches():
    for t in [0.0, 1.0, 0.1, 0.25, 0.5, 0.9, 0.99, 1e-18]:
        assert setup_compress_thresh(t) == oracle_sct(t)


def test_setup_compress_thresh_pins_compiled_c():
    """Values from the reference function compiled with gcc -O2 on this
    host (llrint INT64_MIN saturation caps the walk just below 1.0 for
    thresholds above ~0.789 — the np.rint model used to escape to 5x)."""
    pins = {0.25: 0.25000013379310326, 0.5: 0.5067892617803369,
            0.7: 0.78806984732172158, 0.79: 0.99999999999999956,
            0.9: 0.99999999999999967, 0.99: 0.99999999999999978,
            0.999: 0.99999999999999989}
    for t, want in pins.items():
        assert setup_compress_thresh(t) == want
        assert setup_compress_thresh(t) < 1.0


def test_quiet_signal_amplified():
    x = _sig(4.0, ch=2, seed=9, amp=0.05)
    y = _impl(x, gausssize=7, framelen=200)
    assert np.abs(y).max() > np.abs(x).max() * 1.5
    assert np.abs(y).max() <= 0.95 + 1e-9


def test_parse_opts():
    kw = parse_dynaudnorm_opts("f=250:g=15:p=0.9:m=20:r=0.5:n=0:c=1:"
                               "b=true:s=2.5:t=0.1:o=0.3")
    assert kw == {"framelen": 250, "gausssize": 15, "peak": 0.9,
                  "maxgain": 20.0, "targetrms": 0.5, "coupling": False,
                  "correctdc": True, "altboundary": True,
                  "compress": 2.5, "threshold": 0.1, "overlap": 0.3}
    for bad in ["f=5", "g=401", "p=2", "m=0.5", "s=31", "o=2",
                "nosuch=1", "n=maybe", "f"]:
        with pytest.raises(ValueError):
            parse_dynaudnorm_opts(bad)


def test_stream_chunked_equals_one_shot():
    r = np.random.default_rng(2)
    x = (r.normal(0, 2000, (RATE * 3, 2))).astype(np.int16)
    one = DynaudnormStream(RATE, gausssize=7, framelen=200)
    whole = np.concatenate([p for p in (one.push(x), one.flush())
                            if p.size])
    st = DynaudnormStream(RATE, gausssize=7, framelen=200)
    outs = [st.push(x[i:i + 917]) for i in range(0, len(x), 917)]
    outs.append(st.flush())
    got = np.concatenate([p for p in outs if p.size])
    np.testing.assert_array_equal(got, whole)
    assert len(got) == len(x)


def test_chain_integration():
    from gmat_tpu.av.audio_filters import apply_audio_filters
    r = np.random.default_rng(1)
    x = (r.normal(0, 1200, (RATE * 2, 2))).astype(np.int16)
    y, rate = apply_audio_filters(x, RATE,
                                  "dynaudnorm=f=200:g=7,volume=0.5")
    assert rate == RATE and len(y) == len(x) and y.dtype == np.int16
