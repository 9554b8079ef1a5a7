"""Host ingest pipeline: decode workers -> prefetch queue -> device batches.

TPU rebuild of the reference's producer/consumer plumbing:
  * RoundQueue (metrans/app/AppMeTrans/RoundQueue.h:5-63): single producer,
    N consumers with per-consumer cursors -> here a bounded queue.Queue per
    consumer fed by one producer thread (Python threads release the GIL in
    libav calls, so decode overlaps JAX dispatch).
  * TransDataConverter pinned staging (TransDataConverter.h:12-89) ->
    jax.device_put double buffering: the next batch is transferred while
    the current one computes.
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..core.frame import FrameBatch


class FrameBatchSource:
    """Iterates (y, u, v, pts) numpy tuples from any generator and groups
    them into planar numpy batches of a fixed size (padding the tail by
    repeating the last frame, with a valid-count)."""

    def __init__(self, frame_iter, batch: int, width: int, height: int,
                 colorspace: str = "bt709"):
        self.it = frame_iter
        self.batch = batch
        self.width, self.height = width, height
        self.colorspace = colorspace

    def __iter__(self):
        ys, us, vs, pts, keys, poss, ilace = [], [], [], [], [], [], []
        self.dropped_resize = 0       # kept for compat; always 0 now
        self.resolution_changes = 0
        ref_shape = None

        def flush(n_valid):
            while len(ys) < self.batch:   # pad to static shape
                ys.append(ys[-1]); us.append(us[-1]); vs.append(vs[-1])
                pts.append(pts[-1]); keys.append(False); poss.append(-1)
                ilace.append(0)
            return self._pack(ys, us, vs, pts, keys, poss, ilace, n_valid)

        for item in self.it:
            y, u, v, p = item[:4]
            k = bool(item[4]) if len(item) > 4 else False
            po = int(item[5]) if len(item) > 5 else -1
            il = int(item[6]) if len(item) > 6 else 0
            if ref_shape is None:
                ref_shape = y.shape
            if y.shape != ref_shape:
                # mid-stream resolution change (NvDecLite recreates its
                # frame pool here, NvDecLite.cpp:97-106): flush the
                # partial batch of the OLD geometry, then continue at the
                # new one — every frame is delivered; batches carry their
                # own dims so downstream recompiles (or rides the
                # bucketed ladder, ops/fused.preprocess_nchw_bucketed)
                self.resolution_changes += 1
                if ys:
                    yield flush(len(ys))
                    ys, us, vs, pts, keys, poss, ilace = \
                        [], [], [], [], [], [], []
                ref_shape = y.shape
            ys.append(y); us.append(u); vs.append(v); pts.append(p)
            keys.append(k); poss.append(po); ilace.append(il)
            if len(ys) == self.batch:
                yield self._pack(ys, us, vs, pts, keys, poss, ilace,
                                 self.batch)
                ys, us, vs, pts, keys, poss, ilace = \
                    [], [], [], [], [], [], []
        if ys:
            yield flush(len(ys))

    def _pack(self, ys, us, vs, pts, keys, poss, ilace, valid):
        return (np.stack(ys), np.stack(us), np.stack(vs),
                np.asarray(pts, np.int64), np.asarray(keys, bool),
                np.asarray(poss, np.int64), np.asarray(ilace, np.int8),
                valid)


class PrefetchQueue:
    """Producer thread fills a bounded queue of device-resident batches.

    The RoundQueue analog: backpressure via the bounded queue (the
    reference spins with 1 ms sleeps, AppMeTrans.cpp:65-67); device upload
    (device_put) happens on the producer thread so the consumer overlaps
    compute with the next batch's H2D transfer.
    """

    _SENTINEL = object()

    def __init__(self, batch_iter, depth: int = 3, device=None,
                 to_device: bool = True, colorspace: str = "bt709",
                 width: int = 0, height: int = 0, fmt: str = "yuv420p"):
        self.q: queue.Queue = queue.Queue(maxsize=depth)
        self.device = device or jax.devices()[0]
        self.to_device = to_device
        self.fmt = fmt
        self.colorspace = colorspace
        self.width, self.height = width, height
        self.error: Optional[BaseException] = None
        self._stop = threading.Event()
        self._thread = threading.Thread(
            target=self._run, args=(batch_iter,), daemon=True)
        self._thread.start()

    def _run(self, batch_iter):
        try:
            for (y, u, v, pts, keys, poss, ilace, valid) in batch_iter:
                if self._stop.is_set():
                    break
                if self.to_device:
                    y = jax.device_put(y, self.device)
                    u = jax.device_put(u, self.device)
                    v = jax.device_put(v, self.device)
                # bounded put that also honors close() so an abandoned
                # consumer (e.g. CLI -frames early exit) can't strand us
                while not self._stop.is_set():
                    try:
                        self.q.put((y, u, v, pts, keys, poss, ilace,
                                    valid), timeout=0.1)
                        break
                    except queue.Full:
                        continue
        except BaseException as e:   # surface worker errors to the consumer
            self.error = e
        finally:
            # the sentinel MUST reach the consumer (a dropped sentinel
            # deadlocks q.get()); only close() may preempt delivery
            while True:
                try:
                    self.q.put(self._SENTINEL, timeout=0.1)
                    break
                except queue.Full:
                    if self._stop.is_set():
                        break

    def close(self):
        """Stop the producer and drain (safe after partial consumption)."""
        self._stop.set()
        while True:
            try:
                self.q.get_nowait()
            except queue.Empty:
                break
        self._thread.join(timeout=5.0)

    def __iter__(self) -> Iterator[FrameBatch]:
        while True:
            item = self.q.get()
            if item is self._SENTINEL:
                if self.error:
                    raise self.error
                return
            y, u, v, pts, keys, poss, ilace, valid = item
            # per-batch dims: a mid-stream resolution change makes the
            # configured width/height stale for later batches
            h, w = y.shape[1], y.shape[2]
            fb = FrameBatch({"y": jnp.asarray(y), "u": jnp.asarray(u),
                             "v": jnp.asarray(v)}, self.fmt, w, h,
                            self.colorspace)
            self.last_keys = keys
            self.last_pos = poss
            self.last_interlaced = ilace
            yield fb, pts, valid


def decode_stream(path: str, batch: int = 32, depth: int = 3,
                  device=None, threads: int = 0, seek: float = 0.0,
                  width: int = 0, height: int = 0, layout: str = "i420",
                  resize=None, crop=None, bits: int = 8):
    """Convenience: full-decode a file into prefetched device FrameBatches.

    Accepts compressed containers (mp4/mkv/...), .y4m, and headerless raw
    .yuv/.nv12/.iyuv (pass width/height/layout).  Yields
    (FrameBatch, pts_array, valid_count).

    resize=(w, h) / crop=(x, y, w, h): decoder-side early downscale/crop
    (compressed containers only) — frames shrink on the host before the
    H2D transfer (NvDecLite pCropRect/pResizeDim analog), cutting
    transfer 4-9x for decode-bound workloads.

    bits=10 decodes through the 10-bit lane (decode16: any source depth
    normalized to lsb-aligned u16) and yields 'yuv420p10' batches, which
    preprocess_nchw routes to the u16 Pallas ladder on TPU — the
    reference's P016 pipeline (NvDecLite 10-bit output -> ScaleP016).
    """
    from . import toolkit as tk

    if bits not in (8, 10, 16):
        raise ValueError(f"bits must be 8, 10 or 16, got {bits}")
    lower = path.lower()
    if bits != 8 and lower.endswith((".yuv", ".nv12", ".iyuv", ".raw")):
        raise ValueError(f"bits={bits} is only supported for compressed "
                         "containers and high-depth .y4m (raw readers "
                         "are 8-bit)")
    if bits == 16 and not lower.endswith(".y4m"):
        raise ValueError("bits=16 ingest is Y4M-only (C420p16); the "
                         "compressed lane normalizes to the 10-bit path "
                         "(decode16), pass bits=10")
    if lower.endswith(".y4m"):
        from .rawvideo import Y4MReader
        rd = Y4MReader(path)
        # the Y4M header states the depth; require the caller to agree so
        # batch dtypes never change silently
        if rd.bits != bits:
            fbits = rd.bits
            rd.close()
            if fbits in (8, 10, 16):
                raise ValueError(f"{path} is {fbits}-bit "
                                 f"(C{rd.colorspace}); pass bits={fbits}")
            raise ValueError(f"{path} is {fbits}-bit (C{rd.colorspace}); "
                             "only 8-, 10- and 16-bit Y4M ingest is "
                             "supported")
        if seek > 0:   # O(1)-per-frame seek (marker + fseek, no reads)
            rd.skip(int(seek * rd.fps[0] / max(rd.fps[1], 1)))

        def frames():
            try:
                yield from rd.frames()
            finally:
                rd.close()
        # unspecified colorspace follows the swscale convention: SD
        # resolutions are bt601, HD bt709
        cs = "bt709" if rd.width > 1024 or rd.height > 576 else "bt601"
        src = FrameBatchSource(frames(), batch, rd.width, rd.height, cs)
        q = PrefetchQueue(iter(src), depth=depth, device=device,
                          colorspace=cs, width=rd.width,
                          height=rd.height,
                          fmt={8: "yuv420p", 10: "yuv420p10",
                               16: "yuv420p16"}[bits])
        q.fps = rd.fps[0] / max(rd.fps[1], 1)
        return q
    if lower.endswith((".yuv", ".nv12", ".iyuv", ".raw")):
        if not (width and height):
            raise ValueError("raw input needs width/height")
        from .rawvideo import RawYUVReader
        lay = "nv12" if lower.endswith(".nv12") else layout
        rd = RawYUVReader(path, width, height, lay)
        if seek > 0:                 # raw assumes 30 fps; single fseek
            rd.skip(int(seek * 30.0))

        def frames():
            try:
                yield from rd.frames()
            finally:
                rd.close()
        cs = "bt709" if width > 1024 or height > 576 else "bt601"
        src = FrameBatchSource(frames(), batch, width, height, cs)
        q = PrefetchQueue(iter(src), depth=depth, device=device,
                          colorspace=cs, width=width, height=height)
        q.fps = 30.0
        return q

    dm = tk.Demuxer(path)
    dec = tk.Decoder.from_demuxer(dm, threads, resize=resize, crop=crop)
    if seek > 0:
        dm.seek(seek)
    out_w, out_h = dec.width, dec.height
    dec_frames = dec.decode16 if bits == 10 else dec.decode

    # the backward keyframe seek lands up to a GOP before the target —
    # drop decoded frames whose time is still before `seek` (the y4m/raw
    # lanes skip to the exact frame; the compressed lane must match).
    # All stream times are offset by start_time (TS containers begin at
    # arbitrary pts); Demuxer.seek compensates too.
    AV_NOPTS = -(1 << 63)
    tbn, tbd = dm.time_base
    tb = tbn / max(tbd, 1)
    min_t = seek + dm.start_time - 1e-9 if seek > 0 else None

    def frames():
        key_pts = {}               # insertion-ordered set (oldest-first
        pos_by_pts = {}            # eviction); packet byte offsets by pts
        try:
            for pkt in dm:
                if pkt.stream != 0:
                    continue
                # NOPTS packets can't be attributed by pts (they'd all
                # collide on the sentinel): their frames report
                # key=False / pos=-1, honestly unknown
                if pkt.pts != AV_NOPTS:
                    if pkt.key:
                        key_pts[pkt.pts] = None
                    pos_by_pts[pkt.pts] = pkt.pos
                # bound both maps: orphaned entries (packets whose pts
                # never emerges as a frame) must not accumulate forever
                # in a 24/7 ingest; 512 packets >> any decoder reorder
                while len(pos_by_pts) > 512:
                    pos_by_pts.pop(next(iter(pos_by_pts)))
                while len(key_pts) > 512:
                    key_pts.pop(next(iter(key_pts)))
                for (y, u, v, p) in dec_frames(pkt.data, pkt.pts):
                    is_key = key_pts.pop(p, False) is None
                    if min_t is not None and p != AV_NOPTS and p * tb < min_t:
                        continue        # pre-roll from the keyframe seek
                    # interlaced flag: bit 0; tff: bit 1 (AVFrame props)
                    il = (int(getattr(dec, "last_interlaced", 0)) |
                          (int(getattr(dec, "last_tff", 0)) << 1))
                    yield y, u, v, p, is_key, pos_by_pts.pop(p, -1), il
            for (y, u, v, p) in dec_frames(None):
                is_key = key_pts.pop(p, False) is None
                if min_t is not None and p != AV_NOPTS and p * tb < min_t:
                    continue
                il = (int(getattr(dec, "last_interlaced", 0)) |
                      (int(getattr(dec, "last_tff", 0)) << 1))
                yield y, u, v, p, is_key, pos_by_pts.pop(p, -1), il
        finally:
            dm.close(); dec.close()

    src = FrameBatchSource(frames(), batch, out_w, out_h, dm.colorspace)
    q = PrefetchQueue(iter(src), depth=depth, device=device,
                      colorspace=dm.colorspace, width=out_w,
                      height=out_h,
                      fmt="yuv420p10" if bits == 10 else "yuv420p")
    q.fps = dm.fps or 30.0
    return q
