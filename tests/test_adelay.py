"""adelay / apad vs literal transcriptions of af_adelay.c / af_apad.c."""
import numpy as np
import pytest

from gmat_tpu.av.audio_filters import (AdelayStream, ApadStream,
                                       _parse_adelay_opts,
                                       _parse_delay_token,
                                       apply_audio_filters)


def oracle_adelay(blocks, delays, rate, all_=0):
    """Literal af_adelay.c: parse per-channel delays, subtract the
    common minimum (emitted as leading silence, activate :364-381),
    run the DELAY ring (:66-93) per channel, drain max_delay samples
    of silence at EOF (:396-410)."""
    ch = blocks[0].shape[1]
    d = [(_parse_delay_token(t, rate) if i < len(delays) else 0)
         for i, t in enumerate(delays[:ch])]
    d += [0] * (ch - len(d))
    npar = min(len(delays), ch)
    if all_ and npar:
        for j in range(npar, ch):
            d[j] = d[npar - 1]
    padding = min(d)
    d = [x - padding for x in d]
    maxd = max(d)
    rings = [np.zeros(di, np.int64) for di in d]
    idx = [0] * ch          # delay_index (fill phase)
    rix = [0] * ch          # ring index
    outs = [np.zeros((padding, ch), np.int16)] if padding else []

    def ring(i, x):
        o = np.empty_like(x)
        k = 0
        n = len(x)
        while n:
            if idx[i] < d[i]:
                ln = min(n, d[i] - idx[i])
                rings[i][idx[i]:idx[i] + ln] = x[k:k + ln]
                o[k:k + ln] = 0
                idx[i] += ln
                k += ln
                n -= ln
            else:
                o[k] = rings[i][rix[i]]
                rings[i][rix[i]] = x[k]
                n -= 1
                rix[i] += 1
                k += 1
                if rix[i] >= d[i]:
                    rix[i] = 0
        return o

    for blk in blocks:
        cols = []
        for i in range(ch):
            cols.append(blk[:, i] if not d[i] else ring(i, blk[:, i]))
        outs.append(np.stack(cols, 1).astype(np.int16))
    # EOF: maxd samples of silence through the rings
    if maxd:
        sil = np.zeros((maxd, ch), np.int16)
        cols = []
        for i in range(ch):
            cols.append(sil[:, i] if not d[i] else ring(i, sil[:, i]))
        outs.append(np.stack(cols, 1).astype(np.int16))
    return np.concatenate(outs)


@pytest.fixture
def sig():
    rng = np.random.default_rng(30)
    return rng.integers(-20000, 20000, (3000, 2)).astype(np.int16)


def _run(sig, chunks, **kw):
    st = AdelayStream(48000, **kw)
    outs, i = [], 0
    for c in chunks:
        outs.append(st.push(sig[i:i + c]))
        i += c
    outs.append(st.flush())
    return np.concatenate([o for o in outs if o.size])


@pytest.mark.parametrize("delays,all_,chunks", [
    ("1S|100S", 0, [1024, 1024, 952]),
    ("0|5S", 0, [3000]),
    ("10S", 1, [512] * 5 + [440]),       # all=1: ch2 copies 10S
    ("3S|7S", 0, [1] * 50),
    ("100S|100S", 0, [1500, 1500]),      # common min -> pure padding
])
def test_adelay_oracle(sig, delays, all_, chunks):
    got = _run(sig, chunks, delays=delays, all=all_)
    want = oracle_adelay([sig[sum(chunks[:i]):sum(chunks[:i + 1])]
                          for i in range(len(chunks))],
                         delays.split("|"), 48000, all_)
    np.testing.assert_array_equal(got, want)


def test_adelay_padding_and_shape(sig):
    """100S|40S: padding=40 leading silence; residual delays 60|0."""
    got = _run(sig, [3000], delays="100S|40S")
    assert len(got) == 40 + 3000 + 60
    assert (got[:40] == 0).all()
    np.testing.assert_array_equal(got[100:3040, 0], sig[:2940, 0])
    np.testing.assert_array_equal(got[40:3040, 1], sig[:, 1])


def test_adelay_parse_pins():
    # bare number = milliseconds, float math then int64 truncation
    assert _parse_delay_token("1500", 48000) == 72000
    assert _parse_delay_token("1.5s", 48000) == 72000
    assert _parse_delay_token("100S", 48000) == 100
    # float32 product truncation: 0.3ms * 44100 / 1000
    want = int(np.float32(np.float32(np.float32(0.3) * 44100)
                          / np.float32(1000.0)))
    assert _parse_delay_token("0.3", 44100) == want
    with pytest.raises(ValueError):
        _parse_delay_token("-5", 48000)
    with pytest.raises(ValueError):
        _parse_delay_token("zz", 48000)
    assert _parse_adelay_opts("1500|0|500") == {"delays": "1500|0|500"}
    assert _parse_adelay_opts("delays=1S:all=1") == {"delays": "1S",
                                                     "all": "1"}


def test_adelay_offline_and_empty(sig):
    y, r = apply_audio_filters(sig, 48000, "adelay=delays=2S|4S")
    want = oracle_adelay([sig], ["2S", "4S"], 48000)
    np.testing.assert_array_equal(y, want)
    # no delays -> passthrough (the C forwards when !s->delays)
    st = AdelayStream(48000)
    np.testing.assert_array_equal(st.push(sig), sig)


def test_apad(sig):
    st = ApadStream(48000, pad_len=100)
    a = st.push(sig)
    b = st.flush()
    assert len(a) == 3000 and len(b) == 100 and (b == 0).all()
    # whole_len: pad up to the target
    st = ApadStream(48000, whole_len=3500)
    st.push(sig)
    assert len(st.flush()) == 500
    # already past the target -> nothing
    st = ApadStream(48000, whole_len=1000)
    st.push(sig)
    assert len(st.flush()) == 0
    # pad_dur seconds -> av_rescale to samples
    st = ApadStream(48000, pad_dur="0.25")
    st.push(sig)
    assert len(st.flush()) == 12000
    # whole_dur
    y, _ = apply_audio_filters(sig, 48000, "apad=whole_dur=0.1")
    assert len(y) == 4800
    # both unset = infinite -> rejected offline
    with pytest.raises(ValueError):
        ApadStream(48000)
    # pad_len wins over whole_len when both set
    st = ApadStream(48000, pad_len=77, whole_len=10000)
    st.push(sig)
    assert len(st.flush()) == 77
