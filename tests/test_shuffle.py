"""il / shuffleframes / reverse / areverse vs literal C transcriptions
(vf_il.c, vf_shuffleframes.c, f_reverse.c)."""
import numpy as np
import pytest

from gmat_tpu.av.audio_filters import AreverseStream, apply_audio_filters
from gmat_tpu.filters.builtin import FilterError
from gmat_tpu.filters.graph import FilterGraph

from .test_filters import from_numpy_yuv420


def oracle_il(src, mode, swap):
    """interleave() (vf_il.c:110-137) row memcpys; rows past 2*(h>>1)
    stay (the C leaves them uninitialized; we pass source through)."""
    h = src.shape[0]
    m = h >> 1
    a, b = swap, 1 - swap
    dst = src.copy()
    for y in range(m):
        if mode == "d":
            dst[y] = src[y * 2 + a]
            dst[y + m] = src[y * 2 + b]
        elif mode == "n":
            dst[y * 2] = src[y * 2 + a]
            dst[y * 2 + 1] = src[y * 2 + b]
        else:
            dst[y * 2 + a] = src[y]
            dst[y * 2 + b] = src[y + m]
    return dst


@pytest.fixture
def rng():
    return np.random.default_rng(41)


def _clip(rng, n=4, h=16, w=16):
    return (rng.integers(0, 256, (n, h, w)).astype(np.uint8),
            rng.integers(0, 256, (n, h // 2, w // 2)).astype(np.uint8),
            rng.integers(0, 256, (n, h // 2, w // 2)).astype(np.uint8))


@pytest.mark.parametrize("lm,cm,ls,cs", [
    ("deinterleave", "none", 0, 0),
    ("interleave", "deinterleave", 0, 0),
    ("d", "i", 1, 0),
    ("none", "none", 1, 1),
    ("i", "d", 0, 1),
])
def test_il_oracle(rng, lm, cm, ls, cs):
    y, u, v = _clip(rng)
    g = FilterGraph(f"il=luma_mode={lm}:chroma_mode={cm}:"
                    f"luma_swap={ls}:chroma_swap={cs}")
    ofb, _ = g.process(from_numpy_yuv420(y, u, v))
    got_y = np.asarray(ofb.planes["y"])
    got_u = np.asarray(ofb.planes["u"])
    mm = {"deinterleave": "d", "d": "d", "interleave": "i", "i": "i",
          "none": "n"}
    for i in range(4):
        np.testing.assert_array_equal(got_y[i],
                                      oracle_il(y[i], mm[lm], ls))
        np.testing.assert_array_equal(got_u[i],
                                      oracle_il(u[i], mm[cm], cs))


def test_il_roundtrip_and_aliases(rng):
    y, u, v = _clip(rng)
    # deinterleave then interleave is the identity (even heights)
    g = FilterGraph("il=l=d:c=d,il=l=i:c=i")
    ofb, _ = g.process(from_numpy_yuv420(y, u, v))
    np.testing.assert_array_equal(np.asarray(ofb.planes["y"]), y)
    np.testing.assert_array_equal(np.asarray(ofb.planes["u"]), u)
    with pytest.raises(FilterError):
        FilterGraph("il=l=zz")
    with pytest.raises(FilterError):
        FilterGraph("il=bogus=1")


def oracle_shuffle(frames, pts, mapping):
    """vf_shuffleframes.c filter_frame (:82-116)."""
    m = [int(t) for t in mapping.replace("|", " ").split()]
    outs, out_pts = [], []
    group, gpts = [], []
    for f, p in zip(frames, pts):
        group.append(f)
        gpts.append(p)
        if len(group) == len(m):
            for slot, x in enumerate(m):
                if x >= 0:
                    outs.append(group[x])
                    out_pts.append(gpts[slot])
            group, gpts = [], []
    return outs, out_pts


@pytest.mark.parametrize("mapping,batches", [
    ("1|0", None), ("2 1 0", None), ("0|-1|2", None),
    ("1|0", [3, 3, 2]), ("0|0", None),
])
def test_shuffleframes_oracle(rng, mapping, batches):
    y, u, v = _clip(rng, n=8)
    g = FilterGraph(f"shuffleframes=mapping={mapping}"
                    if "|" in mapping or " " not in mapping
                    else f"shuffleframes=mapping='{mapping}'")
    outs, out_pts = [], []
    batches = batches or [8]
    i = 0
    for bs in batches:
        fb = from_numpy_yuv420(y[i:i + bs], u[i:i + bs], v[i:i + bs])
        ofb, k = g.process(fb, pts=np.arange(i, i + bs) * 10)
        ys = np.asarray(ofb.planes["y"])
        for j in np.nonzero(k)[0]:
            outs.append(ys[j])
        if g.out_pts is not None:
            out_pts.extend(np.asarray(g.out_pts)[k].tolist())
        i += bs
    want, want_pts = oracle_shuffle(list(y), list(np.arange(8) * 10),
                                    mapping)
    assert out_pts == want_pts
    assert len(outs) == len(want)
    for g_, w_ in zip(outs, want):
        np.testing.assert_array_equal(g_, w_)


def test_shuffleframes_partial_group_dropped(rng):
    """EOF with a partial group: the C frees it without emitting."""
    y, u, v = _clip(rng, n=5)
    g = FilterGraph("shuffleframes=mapping=1|0")
    fb = from_numpy_yuv420(y, u, v)
    ofb, k = g.process(fb, pts=np.arange(5))
    assert int(k.sum()) == 4          # 2 groups; 5th frame pends
    assert not (g.flush() or [])      # dropped at EOF


def test_shuffleframes_gates():
    for bad in ("shuffleframes=mapping=2|0",      # out of range
                "shuffleframes=mapping=-2",
                "shuffleframes=mapping=a|b"):
        with pytest.raises(FilterError):
            FilterGraph(bad)


def test_reverse(rng):
    """f_reverse: frames reversed, original pts reattached forward."""
    y, u, v = _clip(rng, n=7)
    g = FilterGraph("reverse")
    outs, out_pts = [], []
    for lo, hi in ((0, 3), (3, 7)):
        fb = from_numpy_yuv420(y[lo:hi], u[lo:hi], v[lo:hi])
        ofb, k = g.process(fb, pts=np.arange(lo, hi) * 100,
                           times=np.arange(lo, hi) * 0.04)
        assert int(k.sum()) == 0      # everything buffers
    fl = g.flush() or []
    for ofb, k, m in fl:
        ys = np.asarray(ofb.planes["y"])
        for j in np.nonzero(k)[0]:
            outs.append(ys[j])
        out_pts.extend(np.asarray(m["pts"])[k].tolist())
    assert len(outs) == 7
    for i in range(7):
        np.testing.assert_array_equal(outs[i], y[6 - i])
    assert out_pts == [i * 100 for i in range(7)]


def test_areverse(rng):
    x = rng.integers(-20000, 20000, (5000, 2)).astype(np.int16)
    yout, r = apply_audio_filters(x, 48000, "areverse")
    np.testing.assert_array_equal(yout, x[::-1])
    assert r == 48000
    st = AreverseStream(48000)
    assert st.push(x[:100]).size == 0
    st.push(x[100:])
    np.testing.assert_array_equal(st.flush(), x[::-1])
