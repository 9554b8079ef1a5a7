"""Smart-decode extractor, scene select, and ingest pipeline tests."""
import numpy as np
import pytest

from gmat_tpu.av import toolkit as tk
from gmat_tpu.av.extractor import FrameExtractor, FrameSelect
from gmat_tpu.av.ingest import decode_stream


W, H, NFRAMES = 320, 240, 60


def make_clip(path, scene_cut_at=None, bf=0):
    """Flat-luma frames: y value encodes the frame index (20 + 3*i)."""
    enc = tk.Encoder("libx264", W, H, fps=(30, 1), gop=12, bf=bf,
                     preset="veryfast", crf=14.0)
    pkts = []
    for i in range(NFRAMES):
        lum = 20 + 3 * i
        uu, vv = 110, 140
        if scene_cut_at is not None and i >= scene_cut_at:
            lum = 235 - (i - scene_cut_at) * 2
            uu, vv = 60, 200
        y = np.full((H, W), lum, np.uint8)
        u = np.full((H // 2, W // 2), uu, np.uint8)
        v = np.full((H // 2, W // 2), vv, np.uint8)
        pkts += enc.encode(y, u, v, pts=i)
    pkts += enc.flush()
    mux = tk.Muxer(path, W, H, (30, 1), tk.CODEC_H264, enc.extradata())
    for p in pkts:
        mux.write(p)
    mux.close()
    enc.close()


@pytest.fixture(scope="module")
def clip(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("sm") / "clip.mp4")
    make_clip(p)
    return p


@pytest.fixture(scope="module")
def cutclip(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("sm") / "cut.mp4")
    make_clip(p, scene_cut_at=30)
    return p


def frame_index_of(y):
    return int(round((float(np.median(y)) - 20) / 3))


def test_extract_every_frame(clip):
    fx = FrameExtractor(clip)  # no interval: every frame
    got = [frame_index_of(y) for (y, u, v, p) in fx.frames()]
    assert got == list(range(NFRAMES))
    fx.close()


def test_extract_interval_frames(clip):
    fx = FrameExtractor(clip, frame_interval=10)
    got = [frame_index_of(y) for (y, u, v, p) in fx.frames()]
    assert got == [0, 10, 20, 30, 40, 50]
    # smart paths actually engaged
    assert fx.n_skipped_seek > 0
    assert fx.n_decoded < NFRAMES
    fx.close()


def test_extract_interval_with_bframes(tmp_path):
    # with B-frames, targets are in decode order (reference semantics:
    # packet count, FrameExtractor.h:231-268) -> near-uniform display steps
    p = str(tmp_path / "b.mp4")
    make_clip(p, bf=2)
    fx = FrameExtractor(p, frame_interval=10)
    got = [frame_index_of(y) for (y, u, v, pp) in fx.frames()]
    assert got[0] == 0 and len(got) >= 5
    steps = np.diff(got)
    assert (steps >= 6).all() and (steps <= 14).all(), got
    assert abs(float(steps.mean()) - 10.0) <= 1.5, got
    # non-ref skipping only possible with B-frames
    assert fx.n_skipped_nonref > 0
    fx.close()


def test_extract_interval_smaller_than_gop(clip):
    fx = FrameExtractor(clip, frame_interval=5)
    got = [frame_index_of(y) for (y, u, v, p) in fx.frames()]
    assert got == list(range(0, NFRAMES, 5))
    fx.close()


def test_extract_time_interval(clip):
    fx = FrameExtractor(clip, time_interval=1.0 / 3.0)  # every 10 frames
    got = [frame_index_of(y) for (y, u, v, p) in fx.frames()]
    assert got[0] == 0 and len(got) >= 5
    steps = np.diff(got)
    assert (steps >= 9).all() and (steps <= 11).all()
    fx.close()


def test_extract_batch(clip):
    fx = FrameExtractor(clip, frame_interval=10)
    b = fx.extract_batch(4)
    assert b[0].shape == (4, H, W)
    b2 = fx.extract_batch(4)
    assert b2[0].shape == (2, H, W)  # remaining 2
    assert fx.extract_batch(4) is None
    fx.close()


def test_scene_select(cutclip):
    fs = FrameSelect(cutclip, threshold=0.4, batch_size=16)
    sel = [(p, s, float(np.median(y))) for (y, u, v, p, s) in fs.frames()]
    assert len(sel) == 1, sel
    pts, score, luma = sel[0]
    num, den = fs.dm.time_base
    idx = round(pts * num / den * 30.0)   # container pts -> frame index
    assert idx == 30          # the cut frame
    assert luma > 200         # post-cut content
    fs.close()


def test_scene_scores_math(rng):
    import jax.numpy as jnp
    from gmat_tpu.core.frame import FrameBatch
    from gmat_tpu.ops.scene import scene_scores
    n, h, w = 4, 32, 32
    y = np.zeros((n, h, w), np.uint8)
    y[2] = 200   # hard cut at frame 2, back at 3
    u = np.full((n, h // 2, w // 2), 128, np.uint8)
    v = np.full((n, h // 2, w // 2), 128, np.uint8)
    fb = FrameBatch({"y": jnp.asarray(y), "u": jnp.asarray(u),
                     "v": jnp.asarray(v)}, "yuv420p", w, h)
    scores, last_mafd = scene_scores(fb)
    scores = np.asarray(scores)
    count = h * w * 1.5
    mafd2 = 200.0 * h * w / count   # frame2 vs frame1
    want2 = min(mafd2 / 100.0, 1.0)
    assert scores[0] == 0.0 and scores[1] == 0.0
    np.testing.assert_allclose(scores[2], want2, rtol=1e-5)
    np.testing.assert_allclose(float(last_mafd), mafd2, rtol=1e-5)


def test_decode_stream_batches(clip):
    total, valid_total = 0, 0
    for fb, pts, valid in decode_stream(clip, batch=16):
        assert fb.planes["y"].shape == (16, H, W)
        total += 16
        valid_total += valid
    assert valid_total == NFRAMES
    assert total == 64  # 60 -> 4 batches of 16 (last padded)


def test_prefetch_queue_close_early(clip):
    """Abandoning the queue mid-stream must not strand the producer."""
    import time
    src = decode_stream(clip, batch=8, depth=1)
    it = iter(src)
    next(it)                       # consume one batch, abandon the rest
    src.close()
    t0 = time.time()
    src._thread.join(timeout=3.0)
    assert not src._thread.is_alive()
    assert time.time() - t0 < 3.0


def test_extract_interval_with_audio(tmp_path):
    """A/V packets must not corrupt the GOP-seek bookkeeping."""
    from .test_audio import make_av_clip
    clip = str(tmp_path / "av.mp4")
    make_av_clip(clip, nframes=120, gop=15)
    fx = FrameExtractor(clip, frame_interval=30)
    got = sum(1 for _ in fx.frames())
    assert got == 4                      # frames 0, 30, 60, 90
    # smart skip still effective with audio interleaved
    assert fx.n_decoded < 60, (fx.n_decoded, fx.n_skipped_seek)
    fx.close()


def test_extract_from_memory_buffer(clip):
    """Demuxer(bytes) / FrameExtractor(bytes) — the memory-AVIO input path
    (Demuxer.h:20-61, FrameExtractor_InitFromBuffer analog) must produce
    exactly what the file path produces, including GOP seek."""
    with open(clip, "rb") as f:
        blob = f.read()
    fx_file = FrameExtractor(clip, frame_interval=30)
    fx_mem = FrameExtractor(blob, frame_interval=30)
    got_f = list(fx_file.frames())
    got_m = list(fx_mem.frames())
    assert len(got_f) == len(got_m) > 0
    for (yf, uf, vf, pf), (ym, um, vm, pm) in zip(got_f, got_m):
        assert pf == pm
        np.testing.assert_array_equal(yf, ym)
        np.testing.assert_array_equal(uf, um)
        np.testing.assert_array_equal(vf, vm)
    # smart-skip stats identical (seek works through the custom AVIO)
    assert fx_mem.n_skipped_seek == fx_file.n_skipped_seek
    assert fx_mem.n_decoded == fx_file.n_decoded
    fx_file.close(); fx_mem.close()


def test_demuxer_memory_metadata(clip):
    from gmat_tpu.av import toolkit as tk
    blob = open(clip, "rb").read()
    dm_f, dm_m = tk.Demuxer(clip), tk.Demuxer(blob)
    assert (dm_m.width, dm_m.height, dm_m.codec) == \
           (dm_f.width, dm_f.height, dm_f.codec)
    assert dm_m.extradata() == dm_f.extradata()
    pf, pm = dm_f.read(), dm_m.read()
    assert pf.data == pm.data and pf.pts == pm.pts
    dm_f.close(); dm_m.close()


def test_decode_stream_10bit(clip):
    """bits=10 ingest: yuv420p10 u16 batches through the whole prefetch
    pipeline (NvDecLite 10-bit output -> ScaleP016 lane)."""
    import numpy as np
    from gmat_tpu.av.ingest import decode_stream
    from gmat_tpu.ops import fused

    path = clip if isinstance(clip, str) else clip[0]
    tot = 0
    for fb, pts, valid in decode_stream(path, batch=16, bits=10):
        assert fb.format == "yuv420p10"
        assert fb.planes["y"].dtype == np.uint16
        assert int(fb.planes["y"].max()) > 255
        x = np.asarray(fused.preprocess_nchw(fb, 32, 32, norm=1023.0,
                                             use_pallas="never"))
        assert np.isfinite(x).all() and x.max() <= 1.0
        tot += int(valid)
    assert tot > 0


def test_set_interval_between_batches(clip):
    """SetInterval takes effect between Extract calls
    (FrameExtractor.h:183-190): the cadence changes mid-stream."""
    fx = FrameExtractor(clip, frame_interval=5)
    first = fx.extract_batch(3)
    assert [frame_index_of(y) for y in first[0]] == [0, 5, 10]
    fx.set_interval(frames=15)
    second = fx.extract_batch(2)
    got = [frame_index_of(y) for y in second[0]]
    # next targets continue from the last reached target at the new step
    assert got[1] - got[0] == 15
    fx.close()


def test_decode_stream_seek_drops_preroll(clip):
    """decode_stream(seek=) on a compressed container starts at the
    requested time, not at the preceding keyframe (the GOP pre-roll is
    decoded but dropped)."""
    from gmat_tpu.av.ingest import decode_stream
    got = []
    for fb, pts, valid in decode_stream(clip, batch=8, seek=1.0):
        ys = np.asarray(fb.planes["y"])
        got += [frame_index_of(ys[i]) for i in range(valid)]
    # 30 fps: t=1.0s is frame 30 (a mid-GOP frame: gop=12 -> keyframe 24)
    assert got[0] == 30, got[:4]
    assert got == list(range(30, NFRAMES))


def test_batch_source_mixed_resolution_yields_every_frame(rng):
    """VERDICT r2 #10: a mid-stream resolution change must not drop
    frames — the partial batch flushes and batching continues at the new
    geometry (NvDecLite pool-recreate analog, NvDecLite.cpp:97-106)."""
    from gmat_tpu.av.ingest import FrameBatchSource

    def frames():
        for i in range(5):                     # 320x240
            yield (np.full((240, 320), i, np.uint8),
                   np.full((120, 160), 110, np.uint8),
                   np.full((120, 160), 140, np.uint8), i)
        for i in range(7):                     # switch to 160x120
            yield (np.full((120, 160), 100 + i, np.uint8),
                   np.full((60, 80), 110, np.uint8),
                   np.full((60, 80), 140, np.uint8), 5 + i)

    src = FrameBatchSource(frames(), batch=4, width=320, height=240)
    got = []
    shapes = []
    for (y, u, v, pts, keys, poss, il, valid) in src:
        shapes.append(y.shape[1:])
        got += [int(y[i].flat[0]) for i in range(valid)]
    assert src.dropped_resize == 0
    assert src.resolution_changes == 1
    # 5 frames @ old dims (4 + flushed 1), then 7 @ new (4 + 3)
    assert got == [0, 1, 2, 3, 4, 100, 101, 102, 103, 104, 105, 106]
    assert shapes == [(240, 320), (240, 320), (120, 160), (120, 160)]


def test_decode_stream_mixed_resolution(tmp_path):
    """End-to-end: splice two H.264 segments of different dims into one
    raw stream; decode_stream must deliver all frames with per-batch
    dims."""
    from gmat_tpu.av.ingest import FrameBatchSource, PrefetchQueue

    def enc_frames(w, h, n, base):
        e = tk.Encoder("libx264", w, h, fps=(30, 1), gop=5, crf=16.0)
        pk = []
        for i in range(n):
            y = np.full((h, w), base + i * 5, np.uint8)
            u = np.full((h // 2, w // 2), 110, np.uint8)
            v = np.full((h // 2, w // 2), 140, np.uint8)
            pk += e.encode(y, u, v, pts=i)
        pk += e.flush()
        data = [p.data for p in pk]
        data[0] = e.extradata() + data[0]
        e.close()
        return data

    d1 = enc_frames(320, 240, 5, 40)
    d2 = enc_frames(160, 120, 5, 150)
    dec = tk.Decoder(tk.CODEC_H264, width=320, height=240)

    def frames():
        for d in d1 + d2:
            yield from ((y, u, v, p) for (y, u, v, p) in dec.decode(d, -1))
        yield from ((y, u, v, p) for (y, u, v, p) in dec.decode(None))

    src = FrameBatchSource(frames(), batch=4, width=320, height=240)
    q = PrefetchQueue(iter(src), depth=2, to_device=False)
    total = 0
    sizes = set()
    for fb, pts, valid in q:
        total += int(valid)
        sizes.add((fb.width, fb.height))
    dec.close()
    assert total == 10
    assert sizes == {(320, 240), (160, 120)}
