"""yadif deinterlacer vs an independent scalar oracle + streaming protocol."""
import numpy as np
import pytest

import jax.numpy as jnp

from gmat_tpu.core.frame import FrameBatch, from_numpy_yuv420
from gmat_tpu.filters.builtin import YadifFilter
from gmat_tpu.filters.graph import FilterGraph
from gmat_tpu.ops.yadif import yadif_plane

from . import oracle


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def interlaced_seq(rng, n=6, h=16, w=20, dtype=np.uint8, maxv=255):
    """Synthetic interlaced content: two source 'times' per frame (moving
    gradient), fields woven from consecutive times."""
    frames = []
    yy, xx = np.mgrid[0:h, 0:w]
    for t in range(n):
        f0 = ((yy * 5 + xx * 3 + 11 * (2 * t)) % (maxv + 1))
        f1 = ((yy * 5 + xx * 3 + 11 * (2 * t + 1)) % (maxv + 1))
        woven = np.where(yy % 2 == 0, f0, f1)
        noise = rng.integers(0, 3, (h, w))
        frames.append(np.clip(woven + noise, 0, maxv).astype(dtype))
    return frames


@pytest.mark.parametrize("parity,tff", [(0, 1), (1, 1), (0, 0), (1, 0)])
def test_yadif_plane_matches_oracle(rng, parity, tff):
    frames = interlaced_seq(rng, n=3)
    prev, cur, nxt = frames
    got = np.asarray(yadif_plane(jnp.asarray(prev[None]),
                                 jnp.asarray(cur[None]),
                                 jnp.asarray(nxt[None]), parity, tff))
    want = oracle.yadif_frame(prev, cur, nxt, parity, tff)
    np.testing.assert_array_equal(got[0], want)


def test_yadif_plane_nospatial_and_u16(rng):
    frames = interlaced_seq(rng, n=3, dtype=np.uint16, maxv=1023)
    prev, cur, nxt = frames
    got = np.asarray(yadif_plane(jnp.asarray(prev[None]),
                                 jnp.asarray(cur[None]),
                                 jnp.asarray(nxt[None]), 0, 1,
                                 skip_spatial_check=True))
    want = oracle.yadif_frame(prev, cur, nxt, 0, 1, skip_spatial_check=True)
    np.testing.assert_array_equal(got[0], want)
    assert got.dtype == np.uint16


def yuv_frames(rng, n, h=16, w=20):
    ys = interlaced_seq(rng, n=n, h=h, w=w)
    us = interlaced_seq(rng, n=n, h=h // 2, w=w // 2)
    vs = interlaced_seq(rng, n=n, h=h // 2, w=w // 2)
    return ys, us, vs


def run_stream(filt, ys, us, vs, batch):
    """Push frames through a stream filter in `batch`-sized chunks + flush."""
    outs, opts = [], []
    n = len(ys)
    for s in range(0, n, batch):
        e = min(s + batch, n)
        fb = from_numpy_yuv420(np.stack(ys[s:e]), np.stack(us[s:e]),
                               np.stack(vs[s:e]))
        meta = {"pts": np.arange(s, e) * 100, "times": None, "keys": None,
                "keep": np.ones(e - s, bool)}
        ofb, ometa = filt.process_batch(fb, meta)
        for i in range(ofb.batch):
            outs.append({k: np.asarray(v[i]) for k, v in ofb.planes.items()})
            opts.append(int(ometa["pts"][i]))
    res = filt.flush()
    if res is not None:
        ofb, ometa = res
        for i in range(ofb.batch):
            outs.append({k: np.asarray(v[i]) for k, v in ofb.planes.items()})
            opts.append(int(ometa["pts"][i]))
    return outs, opts


def test_streaming_matches_oracle_and_batch_sizes(rng):
    """N frames in any batching -> N outputs equal to the oracle sequence
    (prev of first = first, next of last = last)."""
    n = 7
    ys, us, vs = yuv_frames(rng, n)
    # oracle: send_frame mode, parity auto -> tff=1, field parity tff^1=0
    want = [oracle.yadif_frame(ys[max(i - 1, 0)], ys[i], ys[min(i + 1, n - 1)],
                               parity=0, tff=1) for i in range(n)]
    ref_outs = None
    for batch in (2, 3, 7):
        outs, opts = run_stream(YadifFilter(), ys, us, vs, batch)
        assert len(outs) == n
        assert opts == [i * 100 for i in range(n)]
        for i in range(n):
            np.testing.assert_array_equal(outs[i]["y"], want[i])
        if ref_outs is None:
            ref_outs = outs
        else:   # batching must not change any plane
            for a, b in zip(ref_outs, outs):
                for k in a:
                    np.testing.assert_array_equal(a[k], b[k])


def test_send_field_mode(rng):
    n = 5
    ys, us, vs = yuv_frames(rng, n)
    outs, opts = run_stream(YadifFilter(mode=1), ys, us, vs, batch=3)
    assert len(outs) == 2 * n
    # first field parity tff^1=0, second field parity tff=1
    w0 = oracle.yadif_frame(ys[0], ys[1], ys[2], parity=0, tff=1)
    w1 = oracle.yadif_frame(ys[0], ys[1], ys[2], parity=1, tff=1)
    np.testing.assert_array_equal(outs[2]["y"], w0)
    np.testing.assert_array_equal(outs[3]["y"], w1)
    # pts: doubled timebase (yadif_common.c: pts*2 / cur+next)
    assert opts[2] == 2 * 100 and opts[3] == 100 + 200
    # EOF second field extrapolates next pts
    assert opts[-2] == 2 * 400 and opts[-1] == 400 + 500


def test_graph_level_yadif_flush(rng):
    n = 6
    ys, us, vs = yuv_frames(rng, n)
    g = FilterGraph("yadif=1")   # send_field through the graph
    assert g.fps_mul == 2
    fb = from_numpy_yuv420(np.stack(ys), np.stack(us), np.stack(vs))
    out, keep = g.process(fb, pts=np.arange(n, dtype=np.int64))
    assert out.batch == 2 * (n - 1) and keep.all()
    assert g.out_pts is not None and len(g.out_pts) == 2 * (n - 1)
    flushed = g.flush()
    assert len(flushed) == 1
    ffb, fkeep, fmeta = flushed[0]
    assert ffb.batch == 2 and fkeep.all()


def test_yadif_padded_tail_excluded(rng):
    """Padded (valid<batch) frames must not leak into temporal context."""
    n = 4
    ys, us, vs = yuv_frames(rng, n)
    # garbage pad frame
    ys2 = ys + [np.zeros_like(ys[0])]
    us2 = us + [np.zeros_like(us[0])]
    vs2 = vs + [np.zeros_like(vs[0])]
    g1 = FilterGraph("yadif")
    fb = from_numpy_yuv420(np.stack(ys2), np.stack(us2), np.stack(vs2))
    o1, k1 = g1.process(fb, pts=np.arange(5, dtype=np.int64), valid=4)
    f1 = g1.flush()
    g2 = FilterGraph("yadif")
    fb2 = from_numpy_yuv420(np.stack(ys), np.stack(us), np.stack(vs))
    o2, k2 = g2.process(fb2, pts=np.arange(4, dtype=np.int64))
    f2 = g2.flush()
    np.testing.assert_array_equal(np.asarray(o1.planes["y"]),
                                  np.asarray(o2.planes["y"]))
    np.testing.assert_array_equal(np.asarray(f1[0][0].planes["y"]),
                                  np.asarray(f2[0][0].planes["y"]))


def test_thumbnail_flush_partial_window(rng):
    """Thumbnail emits the true window-best and flushes the open window."""
    from gmat_tpu.filters.builtin import ThumbnailFilter
    n, win = 10, 4
    ys = [rng.integers(0, 256, (8, 8)).astype(np.uint8) for _ in range(n)]
    us = [rng.integers(0, 256, (4, 4)).astype(np.uint8) for _ in range(n)]
    vs = [rng.integers(0, 256, (4, 4)).astype(np.uint8) for _ in range(n)]
    g = FilterGraph("thumbnail=4")
    picked = []
    for s in range(0, n, 3):
        e = min(s + 3, n)
        fb = from_numpy_yuv420(np.stack(ys[s:e]), np.stack(us[s:e]),
                               np.stack(vs[s:e]))
        out, keep = g.process(fb, pts=np.arange(s, e, dtype=np.int64))
        for i in np.nonzero(keep)[0]:
            picked.append((int(g.out_pts[i]), np.asarray(out.planes["y"][i])))
    for out, keep, meta in g.flush():
        for i in np.nonzero(keep)[0]:
            picked.append((int(meta["pts"][i]),
                           np.asarray(out.planes["y"][i])))
    assert len(picked) == 3   # two full windows + flushed partial window

    def best(lo, hi):
        hs = np.stack([np.bincount(y.reshape(-1) >> 2, minlength=64)
                       for y in ys[lo:hi]]).astype(np.float64)
        d = np.abs(hs - hs.mean(0)).sum(1)
        return lo + int(np.argmin(d))

    for (pts, yplane), (lo, hi) in zip(picked, [(0, 4), (4, 8), (8, 10)]):
        idx = best(lo, hi)
        assert pts == idx
        np.testing.assert_array_equal(yplane, ys[idx])


def test_combined_stream_control_chain(rng, tmp_path):
    """yadif (stream) + overlay video (stream) + select (control) + scale
    (pure) composed in one graph: counts, dims, and flush all line up."""
    from gmat_tpu.av.rawvideo import Y4MWriter
    over_p = str(tmp_path / "wm.y4m")
    wr = Y4MWriter(over_p, 8, 8, (30, 1))
    for _ in range(20):
        wr.write(np.full((8, 8), 210, np.uint8),
                 np.full((4, 4), 128, np.uint8),
                 np.full((4, 4), 128, np.uint8))
    wr.close()
    n = 9
    ys, us, vs = yuv_frames(rng, n, h=32, w=48)
    g = FilterGraph(f"yadif,overlay=video={over_p}:x=4:y=4,"
                    "select=not(mod(n\\,2)),scale=24:16")
    total = 0
    for s in range(0, n, 4):
        e = min(s + 4, n)
        fb = from_numpy_yuv420(np.stack(ys[s:e]), np.stack(us[s:e]),
                               np.stack(vs[s:e]))
        out, keep = g.process(fb, pts=np.arange(s, e, dtype=np.int64))
        assert out.width == 24 and out.height == 16
        total += int(keep.sum())
    for out, keep, _meta in g.flush():
        assert out.width == 24 and out.height == 16
        total += int(keep.sum())
    # 9 frames in -> 9 deinterlaced (delay+flush) -> select keeps even n:
    # the select filter sees frames n=0..8, keeps 0,2,4,6,8 = 5
    assert total == 5


def test_yadif_select_dropped_frames_stay_in_context(rng):
    """select-dropped (keep=False, pad=False) frames still feed the
    temporal context, so output is invariant to where batch edges fall."""
    n = 8
    ys, us, vs = yuv_frames(rng, n)
    fb_all = from_numpy_yuv420(np.stack(ys), np.stack(us), np.stack(vs))

    def run(batches):
        g = FilterGraph("select=lt(n\\,6),yadif")
        outs = []
        start = 0
        for b in batches:
            fb = from_numpy_yuv420(np.stack(ys[start:start + b]),
                                   np.stack(us[start:start + b]),
                                   np.stack(vs[start:start + b]))
            out, keep = g.process(fb,
                                  pts=np.arange(start, start + b,
                                                dtype=np.int64))
            host = np.asarray(out.planes["y"])
            outs += [host[i] for i in np.nonzero(keep)[0]]
            start += b
        for out, keep, _m in g.flush():
            host = np.asarray(out.planes["y"])
            outs += [host[i] for i in np.nonzero(keep)[0]]
        return outs

    a = run([8])          # frames 6,7 dropped mid-stream in one batch
    b = run([6, 2])       # batch edge right where the drop begins
    assert len(a) == len(b) == 6
    for x, y_ in zip(a, b):
        np.testing.assert_array_equal(x, y_)


def test_yadif_deint_and_auto_parity(rng):
    """deint=1 passes progressive frames through; parity=-1 locks onto the
    first interlaced frame's field order (per-frame AVFrame props flow via
    the 'interlaced' metadata track)."""
    n = 5
    ys, us, vs = yuv_frames(rng, n)
    fb = from_numpy_yuv420(np.stack(ys), np.stack(us), np.stack(vs))
    pts = np.arange(n, dtype=np.int64)
    # frames 0,2,4 interlaced (bff: bit0=1, bit1=0); 1,3 progressive
    ilace = np.array([1, 0, 1, 0, 1], np.int8)

    g = FilterGraph("yadif=0:-1:1")         # mode 0, auto parity, deint 1
    out, keep = g.process(fb, pts=pts, interlaced=ilace)
    oy = np.asarray(out.planes["y"])
    assert out.batch == n - 1
    # auto parity locked to bff (tff=0) => kernel parity = tff^1 = 1
    want0 = oracle.yadif_frame(ys[0], ys[0], ys[1], parity=1, tff=0)
    np.testing.assert_array_equal(oy[0], want0)
    # frame 1 is progressive: passed through untouched
    np.testing.assert_array_equal(oy[1], ys[1])
    # frame 2 interlaced: deinterlaced
    want2 = oracle.yadif_frame(ys[1], ys[2], ys[3], parity=1, tff=0)
    np.testing.assert_array_equal(oy[2], want2)


def _run_graph(spec, ys, us, vs, batch, pad_batch):
    """select->yadif->scale chain over batches; returns kept frames'
    luma + the downstream pure segment's compile-cache size."""
    g = FilterGraph(spec, pad_batch=pad_batch)
    kept = []
    n = len(ys)
    for s in range(0, n, batch):
        e = min(s + batch, n)
        fb = from_numpy_yuv420(np.stack(ys[s:e]), np.stack(us[s:e]),
                               np.stack(vs[s:e]))
        out, keep = g.process(fb, pts=np.arange(s, e) * 100,
                              times=np.arange(s, e) / 30.0)
        for i in np.nonzero(keep)[0]:
            kept.append((int(g.out_pts[i]),
                         np.asarray(out.planes["y"][i])))
    for out, keep, meta in g.flush():
        for i in np.nonzero(keep)[0]:
            kept.append((int(meta["pts"][i]),
                         np.asarray(out.planes["y"][i])))
    # the scale segment is the last pure segment
    pure_idx = [i for i, (k, _) in enumerate(g.segments) if k == "pure"][-1]
    shapes = (g._jitted[pure_idx]._cache_size()
              if pure_idx in g._jitted else 0)
    return kept, shapes


def test_pad_batch_single_compiled_shape(rng):
    """pad_batch=True: a select->yadif->scale chain compiles ONE
    downstream program regardless of how many frames each batch's select
    drops (VERDICT r3 item 7); outputs are bit-identical to normal mode."""
    ys, us, vs = yuv_frames(rng, 20)
    # select drops a varying number per 5-frame batch: n mod 7 < 4 keeps
    # {4,3,2,...} alive per batch -> several distinct alive-counts
    spec = "select=lt(mod(n\\,7)\\,4),yadif=mode=0,scale=32:24"
    ref, ref_shapes = _run_graph(spec, ys, us, vs, 5, pad_batch=False)
    pad, pad_shapes = _run_graph(spec, ys, us, vs, 5, pad_batch=True)
    assert ref_shapes > 1          # the problem being fixed is real
    assert pad_shapes == 1         # one compiled downstream shape
    assert [p for p, _ in pad] == [p for p, _ in ref]
    for (_, a), (_, b) in zip(pad, ref):
        np.testing.assert_array_equal(a, b)


def test_pad_batch_send_field_and_flush(rng):
    """pad mode with mode=1 (send_field, 2x frames) + EOF flush parity."""
    ys, us, vs = yuv_frames(rng, 9)
    spec = "yadif=mode=1,scale=32:24"
    ref, _ = _run_graph(spec, ys, us, vs, 3, pad_batch=False)
    pad, shapes = _run_graph(spec, ys, us, vs, 3, pad_batch=True)
    assert shapes == 1
    assert [p for p, _ in pad] == [p for p, _ in ref]
    for (_, a), (_, b) in zip(pad, ref):
        np.testing.assert_array_equal(a, b)
