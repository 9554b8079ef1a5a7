"""aloop vs a literal transcription of f_loop.c's audio lane."""
import numpy as np
import pytest

from gmat_tpu.av.audio_filters import (AloopStream, _parse_aloop_opts,
                                       apply_audio_filters)


def oracle(blocks, loop, size, start):
    """Literal afilter_frame/push_samples (f_loop.c:93-180) over a
    list of (n, ch) int16 blocks, with activate()'s scheduling: once
    the fifo fills, replay cycles run before the next block is
    consumed; the `left` fifo is never drained (arequest_frame's left
    branch is unreachable from aactivate once loop hits 0); EOF
    truncates size to nb_samples and replays (aactivate:237-241)."""
    fifo = []
    nb = 0
    ignored = 0
    L = loop
    outs = []

    def cycles():
        nonlocal L
        # push_samples reads fifo[0:nb_samples]; after a clamped
        # first-block drain the fifo can hold more than nb_samples
        sect = np.concatenate(fifo)[:max(nb, 0)]
        while L != 0 and nb > 0:
            outs.append(sect)
            if L > 0:
                L -= 1

    for block in blocks:
        n = len(block)
        if ignored + n > start and size > 0 and L != 0:
            if nb < size:
                written = min(n, size - nb)
                buf = block[:written]
                if not nb:
                    drain = max(0, start - ignored)
                    buf = buf[drain:]
                    nb -= drain
                fifo.append(buf)
                nb += written
                outs.append(block[:written])
                if nb == size:
                    cycles()
            # (fifo-full frames are never consumed mid-loop: activate
            # stops pulling until loop exhausts)
        else:
            ignored += n
            outs.append(block)
    if nb > 0 and L != 0 and nb < size:
        size = nb
        cycles()
    return np.concatenate([o for o in outs if len(o)])


@pytest.fixture
def sig():
    rng = np.random.default_rng(20)
    return rng.integers(-20000, 20000, (5000, 2)).astype(np.int16)


def _run_stream(sig, chunks, **kw):
    st = AloopStream(48000, **kw)
    outs = []
    i = 0
    for c in chunks:
        outs.append(st.push(sig[i:i + c]))
        i += c
    outs.append(st.flush())
    return np.concatenate([o for o in outs if o.size])


def _blocks(sig, chunks):
    out, i = [], 0
    for c in chunks:
        out.append(sig[i:i + c])
        i += c
    return out


@pytest.mark.parametrize("kw,chunks", [
    (dict(loop=2, size=1000, start=500), [1024] * 4 + [904]),
    (dict(loop=3, size=2048, start=0), [1024] * 4 + [904]),
    (dict(loop=1, size=900, start=1100), [512] * 9 + [392]),
    (dict(loop=2, size=10000, start=0), [1024] * 4 + [904]),  # EOF trunc
    (dict(loop=0, size=1000, start=0), [1024] * 4 + [904]),   # no-op
    (dict(loop=2, size=0, start=0), [1024] * 4 + [904]),      # size 0
])
def test_aloop_oracle(sig, kw, chunks):
    got = _run_stream(sig, chunks, **kw)
    want = oracle(_blocks(sig, chunks), **kw)
    np.testing.assert_array_equal(got, want)


def test_aloop_boundary_truncation(sig):
    """The block crossing `size` is emitted truncated (the C sets
    frame->nb_samples = written; the tail lands in the never-drained
    `left` fifo and is dropped)."""
    got = _run_stream(sig, [1024] * 2, loop=1, size=1500, start=0)
    # emitted: block0 (1024), block1[:476], cycle (1500), and block
    # tails after the loop are dropped from block1 only; nothing after
    want = np.concatenate([sig[:1024], sig[1024:1500], sig[:1500]])
    np.testing.assert_array_equal(got, want)


def test_aloop_offline_and_parse(sig):
    y, r = apply_audio_filters(sig, 48000, "aloop=loop=1:size=2048")
    want = oracle(_blocks(sig, [1024] * 4 + [904]),
                  loop=1, size=2048, start=0)
    np.testing.assert_array_equal(y, want)
    assert r == 48000
    assert _parse_aloop_opts("2:1000:50") == {"loop": 2, "size": 1000,
                                              "start": 50}
    for bad in ("zz=1", "1:2:3:4"):
        with pytest.raises(ValueError):
            _parse_aloop_opts(bad)
    with pytest.raises(ValueError):
        AloopStream(48000, loop=-1, size=10)
    with pytest.raises(ValueError):
        AloopStream(48000, loop=10, size=2**31 - 1)


def test_aloop_drain_overshoot(sig):
    """start beyond the first recorded block's written prefix: the
    clamped av_audio_fifo_drain leaves nb_samples negative, so the
    fifo later holds more than nb_samples and only fifo[:nb] replays
    (f_loop.c:145-152 + audio_fifo drain clamp)."""
    kw = dict(loop=1, size=100, start=500)
    chunks = [1024] * 3
    got = _run_stream(sig, chunks, **kw)
    want = oracle(_blocks(sig, chunks), **kw)
    np.testing.assert_array_equal(got, want)
    # emitted: block1[:100] (truncated), block2[:500], the cycle
    # = fifo[:nb] = block2[:100], then block3 passes through (loop
    # exhausted -> outer else branch)
    exp = np.concatenate([sig[:100], sig[1024:1524], sig[1024:1124],
                          sig[2048:3072]])
    np.testing.assert_array_equal(got, exp)
