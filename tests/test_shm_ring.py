"""Shared-memory decode fan-in tests (the RoundQueue-at-process-scale
analog, RoundQueue.h:5-63 / AppMeTrans.cpp:165-226): ring ordering,
backpressure, error + worker-death propagation, and the full
multi-process decode -> batch -> ladder chain."""
import os
import signal
import threading
import time

import numpy as np
import pytest

from gmat_tpu.av import toolkit as tk
from gmat_tpu.av.shm_ring import (MultiProcDecodeSource, ShmRing,
                                  decode_stream_multiproc)

W, H, NFRAMES = 320, 240, 40


def make_clip(path, nframes=NFRAMES):
    enc = tk.Encoder("libx264", W, H, fps=(30, 1), gop=12,
                     preset="veryfast", crf=14.0)
    pkts = []
    for i in range(nframes):
        y = np.full((H, W), 20 + 3 * i, np.uint8)
        u = np.full((H // 2, W // 2), 110, np.uint8)
        v = np.full((H // 2, W // 2), 140, np.uint8)
        pkts += enc.encode(y, u, v, pts=i)
    pkts += enc.flush()
    mux = tk.Muxer(path, W, H, (30, 1), tk.CODEC_H264, enc.extradata())
    for p in pkts:
        mux.write(p)
    mux.close(); enc.close()


@pytest.fixture(scope="module")
def clip(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("shmring") / "clip.mp4")
    make_clip(p)
    return p


def fidx(y):
    return int(round((float(np.median(y)) - 20) / 3))


# --- raw ring ------------------------------------------------------------

def test_ring_fifo_roundtrip():
    ring = ShmRing(64, 48, slots=4)
    try:
        for i in range(3):
            y = np.full((48, 64), i * 10, np.uint8)
            u = np.full((24, 32), 100 + i, np.uint8)
            v = np.full((24, 32), 200 - i, np.uint8)
            assert ring.put(y, u, v, pts=i * 1000, pos=i * 7,
                            key=(i == 0), interlaced=i)
        for i in range(3):
            y, u, v, pts, key, pos, il = ring.get_nowait()
            assert y[0, 0] == i * 10 and u[0, 0] == 100 + i
            assert v[0, 0] == 200 - i
            assert pts == i * 1000 and pos == i * 7
            assert key == (i == 0) and il == i
        assert ring.get_nowait() is None
    finally:
        ring.close(unlink=True)


def test_ring_backpressure_blocks_then_drains():
    ring = ShmRing(32, 16, slots=2)
    stop = threading.Event()
    sent = []

    def producer():
        for i in range(10):
            ok = ring.put(np.full((16, 32), i, np.uint8),
                          np.zeros((8, 16), np.uint8),
                          np.zeros((8, 16), np.uint8), pts=i, stop=stop)
            if not ok:
                return
            sent.append(i)
        ring.set_eof()

    t = threading.Thread(target=producer, daemon=True)
    try:
        t.start()
        time.sleep(0.1)
        # ring holds only 2 slots: producer must be blocked
        assert len(sent) <= 3 and ring.head - ring.tail <= 2
        got = []
        deadline = time.time() + 10
        while time.time() < deadline:
            item = ring.get_nowait()
            if item is not None:
                got.append(item[3])
            elif ring.eof and ring.empty():
                break
            else:
                time.sleep(0.001)
        assert got == list(range(10))       # FIFO, nothing lost
        t.join(timeout=5)
    finally:
        stop.set()
        ring.close(unlink=True)


def test_ring_attach_cross_handle():
    ring = ShmRing(32, 16, slots=4)
    try:
        other = ShmRing(32, 16, slots=4, name=ring.name, create=False)
        other.put(np.full((16, 32), 7, np.uint8),
                  np.zeros((8, 16), np.uint8), np.zeros((8, 16), np.uint8),
                  pts=42)
        other.set_eof()
        other.close()
        y, _, _, pts, *_ = ring.get_nowait()
        assert y[0, 0] == 7 and pts == 42 and ring.eof
    finally:
        ring.close(unlink=True)


# --- multi-process fan-in ------------------------------------------------

def test_multiproc_all_frames_in_order(clip):
    with MultiProcDecodeSource(clip, procs=2, slots=4) as src:
        per_worker = {}
        for (y, u, v, pts, key, pos, il) in src:
            # frames from the same worker must arrive in decode order;
            # tag by (pts monotonicity per interleave position)
            per_worker.setdefault(fidx(y), 0)
            per_worker[fidx(y)] += 1
        # 2 workers x 40 frames: every frame index seen exactly twice
        assert sorted(per_worker) == list(range(NFRAMES))
        assert all(c == 2 for c in per_worker.values())


def test_multiproc_per_ring_fifo(clip):
    with MultiProcDecodeSource(clip, procs=1, slots=4) as src:
        got = [fidx(y) for (y, *_rest) in src]
    assert got == list(range(NFRAMES))


def test_multiproc_error_propagates(tmp_path):
    bogus = str(tmp_path / "nope.mp4")
    with open(bogus, "wb") as f:
        f.write(b"not a video")
    with MultiProcDecodeSource(bogus, procs=1, width=W, height=H) as src:
        with pytest.raises(RuntimeError, match="decode worker 0"):
            list(src)


def test_multiproc_worker_death_detected(clip):
    src = MultiProcDecodeSource(clip, procs=1, slots=2)
    try:
        # SIGKILL the worker: no EOF, no error record — liveness must trip
        os.kill(src.procs[0].pid, signal.SIGKILL)
        src.procs[0].join(timeout=5)
        with pytest.raises(RuntimeError, match="died"):
            for _ in src:
                pass
    finally:
        src.close()


def test_decode_stream_multiproc_batches(clip):
    q = decode_stream_multiproc(clip, procs=2, batch=16, slots=4)
    total, idxs = 0, set()
    try:
        for fb, pts, valid in q:
            total += int(valid)
            y = np.asarray(fb.planes["y"])[:valid]
            idxs.update(fidx(f) for f in y)
            assert fb.width == W and fb.height == H
    finally:
        q.close()
    assert total == 2 * NFRAMES
    assert idxs == set(range(NFRAMES))


def test_ring_10bit_roundtrip():
    ring = ShmRing(64, 48, slots=3, bits=10)
    try:
        y = np.arange(48 * 64, dtype=np.uint16).reshape(48, 64) % 1024
        u = np.full((24, 32), 512, np.uint16)
        v = np.full((24, 32), 700, np.uint16)
        assert ring.put(y, u, v, pts=7)
        yo, uo, vo, pts, *_ = ring.get_nowait()
        np.testing.assert_array_equal(yo, y)
        np.testing.assert_array_equal(uo, u)
        np.testing.assert_array_equal(vo, v)
        assert yo.dtype == np.uint16 and pts == 7
    finally:
        ring.close(unlink=True)


def test_decode_stream_multiproc_10bit(tmp_path):
    """bits=10 lane: x265 main10 clip -> u16 planes over the ring ->
    'yuv420p10' batches, samples matching the single-process decode16
    path."""
    from gmat_tpu.av.ingest import decode_stream
    w, h, n = 192, 128, 12
    clip = str(tmp_path / "m10.mp4")
    enc = tk.Encoder("libx265", w, h, fps=(30, 1), gop=6, crf=10.0,
                     bits=10, opts="x265-params=log-level=0")
    pkts = []
    for i in range(n):
        y = np.full((h, w), 100 + 60 * i, np.uint16)
        u = np.full((h // 2, w // 2), 512, np.uint16)
        v = np.full((h // 2, w // 2), 512, np.uint16)
        pkts += enc.encode(y, u, v, pts=i)
    pkts += enc.flush()
    mux = tk.Muxer(clip, w, h, (30, 1), tk.CODEC_HEVC, enc.extradata())
    for p in pkts:
        mux.write(p)
    mux.close(); enc.close()

    ref = {}
    q0 = decode_stream(clip, batch=4, bits=10)
    for fb, pts, valid in q0:
        arr = np.asarray(fb.planes["y"])
        for i in range(valid):
            ref[int(pts[i])] = arr[i]
    got = {}
    q = decode_stream_multiproc(clip, procs=1, batch=4, bits=10)
    fmt_seen = None
    for fb, pts, valid in q:
        fmt_seen = fb.format
        arr = np.asarray(fb.planes["y"])
        for i in range(valid):
            got[int(pts[i])] = arr[i]
    assert fmt_seen == "yuv420p10"
    assert set(got) == set(ref) and len(got) == n
    for k in ref:
        np.testing.assert_array_equal(got[k], ref[k])


def test_ring_wraparound_many_cycles():
    """Counters are monotonic u64 with modular slot indexing: hundreds of
    wrap cycles over a tiny ring must preserve every frame in order."""
    ring = ShmRing(16, 8, slots=3)
    rng = np.random.default_rng(9)
    try:
        total = 400
        sent = 0
        got = []
        while len(got) < total:
            while sent < total and ring.head - ring.tail < ring.slots:
                y = np.full((8, 16), sent % 251, np.uint8)
                u = rng.integers(0, 256, (4, 8)).astype(np.uint8)
                ring.put(y, u, u, pts=sent)
                sent += 1
            item = ring.get_nowait()
            if item is not None:
                y, _u, _v, pts, *_ = item
                assert pts == len(got)
                assert y[0, 0] == len(got) % 251
                got.append(pts)
        assert got == list(range(total))
    finally:
        ring.close(unlink=True)


def test_multiproc_bframe_key_pos_match_single_proc(tmp_path):
    """Review fix: with decoder reorder delay (B-frames) the worker must
    attribute key/pos by pts like ingest.py's single-process path —
    tagging frames with the CURRENT packet's metadata marks the wrong
    frames as keyframes."""
    path = str(tmp_path / "bf.mp4")
    enc = tk.Encoder("libx264", W, H, fps=(30, 1), gop=10, bf=2,
                     preset="veryfast", crf=16.0)
    pkts = []
    for i in range(30):
        y = np.full((H, W), 20 + 3 * i, np.uint8)
        u = np.full((H // 2, W // 2), 110, np.uint8)
        v = np.full((H // 2, W // 2), 140, np.uint8)
        pkts += enc.encode(y, u, v, pts=i)
    pkts += enc.flush()
    mux = tk.Muxer(path, W, H, (30, 1), tk.CODEC_H264, enc.extradata())
    for p in pkts:
        mux.write(p)
    mux.close(); enc.close()

    # single-process reference: the ingest frames() mapping
    from gmat_tpu.av.ingest import decode_stream
    q = decode_stream(path, batch=30)
    ref = []
    for fb, pts, valid in q:
        for i in range(valid):
            ref.append((int(pts[i]), bool(q.last_keys[i]),
                        int(q.last_pos[i])))
    with MultiProcDecodeSource(path, procs=1) as src:
        got = [(int(p), bool(k), int(pos))
               for (_y, _u, _v, p, k, pos, _il) in src]
    assert got == ref
    # keyframes land exactly on the IDR pts (gop=10 -> pts 0,10,20)
    keys = sorted(p for (p, k, _pos) in got if k)
    assert keys == [p for (p, k, _) in ref if k]
    assert len(keys) >= 3
