"""FrameExtractor / FrameSelect — smart decoding, TPU rebuild.

Port of metrans/app/FrameExtractor.h (dual-demuxer uniform-interval
extraction with GOP seek + non-reference skipping) and FrameSelect.h
(scene-cut selection), re-targeted at host software decode feeding batched
TPU scoring:

  * interval targets in frames or seconds (SetInterval, FrameExtractor.h:183-190)
  * skip non-ref frames before the target  (FrameExtractor.h:261-268 —
    H.264 nal_ref_idc==0 && type==1; we extend to HEVC *_N types)
  * GOP seek: a look-ahead demuxer scans the next interval for a keyframe
    and the main demuxer fast-forwards to it without decoding
    (SeekKeyFrame, FrameExtractor.h:56-126)
  * only frames from at/after-target packets are emitted (the
    timestamp=-bReached trick, FrameExtractor.h:272-283, done here by pts
    bookkeeping)
  * FrameSelect: decode everything, score scene cuts on device in batches
    (gt(scene, threshold), FrameSelect.h:11-57)
"""
from __future__ import annotations

from typing import Iterator, Optional, Tuple

import numpy as np

from . import toolkit as tk

AV_NOPTS = -(1 << 63)    # AV_NOPTS_VALUE passes through the C ABI raw


class FrameExtractor:
    """Uniform-interval frame extraction with smart skipping.

    `src` is a path or an in-memory container (bytes), matching the
    reference's FrameExtractor_InitFromBuffer C ABI
    (metrans/app/CFrameExtractor.cpp) — both demuxers read the same pinned
    buffer zero-copy, each with its own cursor."""

    def __init__(self, src, frame_interval: int = 0,
                 time_interval: float = 0.0, threads: int = 0,
                 resize=None, crop=None):
        self.dm = tk.Demuxer(src)             # main demuxer
        self.dm_seek = tk.Demuxer(src)        # look-ahead demuxer
        self.dec = tk.Decoder.from_demuxer(self.dm, threads, resize=resize,
                                           crop=crop)
        self.frame_interval = frame_interval
        self.time_interval = time_interval
        self.width, self.height = self.dec.width, self.dec.height
        self.colorspace = self.dm.colorspace
        self._iframe = 0                      # index of next frame to demux
        self._frame_target = 0
        self._time_target: Optional[float] = None
        self._tb = self.dm.time_base[0] / self.dm.time_base[1]
        self._emit_pts: set[int] = set()
        # look-ahead stays one packet ahead of main (reference ctor behavior)
        self._seek_ahead = 0   # packets the look-ahead is ahead of main
        # stats (FrameExtractor.h:178-181)
        self.n_demuxed = 0
        self.n_skipped_seek = 0
        self.n_skipped_nonref = 0
        self.n_decoded = 0

    def set_interval(self, frames: int = 0, seconds: float = 0.0):
        self.frame_interval, self.time_interval = frames, seconds

    def _pkt_time(self, pkt: tk.Packet) -> float:
        ts = pkt.pts if pkt.pts != AV_NOPTS else pkt.dts
        if ts == AV_NOPTS:
            # timestamp-less elementary streams: synthesize from the
            # frame INDEX at the container rate.  _iframe ticks for
            # seek-skipped packets too (n_demuxed does not), so the
            # clock can't fall behind and stretch the extraction
            # cadence; at call time the current packet's index is
            # _iframe - 1 (incremented just before).
            return (self._iframe - 1) / max(self.dm.fps, 1.0)
        return ts * self._tb

    def _seek_keyframe_frames(self, interval: int) -> int:
        """Scan `interval` packets ahead; fast-forward main past the last
        keyframe found.  Returns number of packets skipped (not decoded)."""
        found = -1
        scanned = 0
        while scanned < interval:
            p = self.dm_seek.read()
            if p is None:
                break
            if p.stream != 0:      # _seek_ahead counts VIDEO packets only
                continue
            self._seek_ahead += 1
            scanned += 1
            if p.key:
                found = self._seek_ahead
        if found <= 1:
            return 0
        skipped = 0
        # fast-forward main demuxer to just before that keyframe
        while self._seek_ahead > 1 and skipped < found - 1:
            p = self.dm.read()
            if p is None:
                break
            if p.stream == 0:
                self._iframe += 1
                skipped += 1
                self._seek_ahead -= 1
        return skipped

    def frames(self) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray, int]]:
        """Yield (y, u, v, pts) for each extracted frame.  Reads the
        interval attributes every packet so set_interval() takes effect
        between extract_batch calls (SetInterval semantics,
        FrameExtractor.h:183-190)."""
        self._emit_nopts = 0
        eof = False
        while not eof:
            interval_f, interval_t = self.frame_interval, self.time_interval
            pkt = self.dm.read()
            if pkt is None:
                eof = True
                frames = list(self.dec.decode(None))
            else:
                if pkt.stream != 0:
                    continue
                iframe = self._iframe
                self._iframe += 1
                if self._seek_ahead > 0:
                    self._seek_ahead -= 1
                else:
                    sp = self.dm_seek.read()
                    while sp is not None and sp.stream != 0:
                        sp = self.dm_seek.read()
                time = self._pkt_time(pkt)
                if self._time_target is None:
                    self._time_target = time
                self.n_demuxed += 1
                if interval_f:
                    reached = iframe >= self._frame_target
                else:
                    reached = time >= self._time_target - 1e-9
                if not reached and pkt.nonref:
                    self.n_skipped_nonref += 1
                    continue
                if reached:
                    if pkt.pts != AV_NOPTS:
                        self._emit_pts.add(pkt.pts)
                    else:
                        # no packet pts to match against: emit the next
                        # timestamp-less decoded frame instead
                        self._emit_nopts += 1
                frames = list(self.dec.decode(pkt.data, pkt.pts))
                if reached and (interval_f or interval_t):
                    if interval_f:
                        self.n_skipped_seek += self._seek_keyframe_frames(interval_f)
                        self._frame_target += interval_f
                        self._time_target = time
                    else:
                        est = max(int(interval_t * max(self.dm.fps, 1.0)), 1)
                        self.n_skipped_seek += self._seek_keyframe_frames(est)
                        self._time_target += interval_t
                        self._frame_target = iframe
            for (y, u, v, pts) in frames:
                self.n_decoded += 1
                if pts in self._emit_pts:
                    self._emit_pts.discard(pts)
                    yield y, u, v, pts
                elif pts == AV_NOPTS and self._emit_nopts > 0:
                    self._emit_nopts -= 1
                    yield y, u, v, pts

    def extract_batch(self, max_frames: int) -> Optional[Tuple[np.ndarray, ...]]:
        """Stack up to max_frames extracted frames into planar batches."""
        ys, us, vs, pts = [], [], [], []
        it = getattr(self, "_it", None)
        if it is None:
            it = self._it = self.frames()
        for (y, u, v, p) in it:
            ys.append(y); us.append(u); vs.append(v); pts.append(p)
            if len(ys) >= max_frames:
                break
        if not ys:
            return None
        return (np.stack(ys), np.stack(us), np.stack(vs),
                np.asarray(pts, np.int64))

    def close(self):
        self.dm.close(); self.dm_seek.close(); self.dec.close()


class FrameSelect:
    """Scene-cut frame selection (FrameSelect.h analog): decode every
    frame, score scene changes on device per batch, yield frames whose
    score exceeds the threshold (select_gpu='gt(scene,0.4)')."""

    def __init__(self, path, threshold: float = 0.4,
                 batch_size: int = 32, threads: int = 0):
        self.dm = tk.Demuxer(path)   # path or in-memory bytes
        self.dec = tk.Decoder.from_demuxer(self.dm, threads)
        self.threshold = threshold
        self.batch_size = batch_size
        self.width, self.height = self.dm.width, self.dm.height
        self.colorspace = self.dm.colorspace

    def _decoded(self):
        for pkt in self.dm:
            if pkt.stream != 0:
                continue
            yield from self.dec.decode(pkt.data, pkt.pts)
        yield from self.dec.decode(None)

    def frames(self) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray, int, float]]:
        import jax.numpy as jnp
        from ..core.frame import FrameBatch
        from ..ops.scene import scene_scores

        prev_last = None
        prev_mafd = 0.0
        buf = []
        def flush(buf, prev_last, prev_mafd):
            ys = np.stack([f[0] for f in buf])
            us = np.stack([f[1] for f in buf])
            vs = np.stack([f[2] for f in buf])
            fb = FrameBatch({"y": jnp.asarray(ys), "u": jnp.asarray(us),
                             "v": jnp.asarray(vs)}, "yuv420p",
                            self.width, self.height, self.colorspace)
            scores, last_mafd = scene_scores(fb, prev_last, prev_mafd)
            scores = np.asarray(scores)
            new_last = {k: v[-1] for k, v in fb.planes.items()}
            return scores, new_last, float(last_mafd)

        for f in self._decoded():
            buf.append(f)
            if len(buf) >= self.batch_size:
                scores, prev_last, prev_mafd = flush(buf, prev_last, prev_mafd)
                for (y, u, v, pts), s in zip(buf, scores):
                    if s > self.threshold:
                        yield y, u, v, pts, float(s)
                buf = []
        if buf:
            # pad the tail to the full batch shape (repeating the last
            # frame): a distinct partial-batch shape would trigger a
            # fresh 15-60 s remote compile just to score the leftovers;
            # padded duplicates score 0 (sad == 0) and zip() stops at
            # len(buf) anyway
            padded = buf + [buf[-1]] * (self.batch_size - len(buf))
            scores, _, _ = flush(padded, prev_last, prev_mafd)
            for (y, u, v, pts), s in zip(buf, scores):
                if s > self.threshold:
                    yield y, u, v, pts, float(s)

    def close(self):
        self.dm.close(); self.dec.close()
