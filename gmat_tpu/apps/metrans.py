"""AppMeTrans — 1->N ABR transcoding ladder, TPU rebuild.

Port of metrans/app/AppMeTrans (AppMeTrans.cpp:303-365, Options.h:12-72,
options.xml): XML-config-driven sessions, each decoding one input and
fanning out to N resolutions with per-output filters, encoder params and
muxed files.

Execution model vs the reference:
  * reference: decode thread -> RoundQueue ring -> N encoder threads each
    doing CUDA ScaleNv12 + NVENC (AppMeTrans.cpp:71-124)
  * rebuild: the device work for ALL rungs is one jitted program per batch
    (shared decode batch -> N fused scale+filter outputs, no ring needed
    on device); host libx264/x265 encoders run on worker threads fed by
    bounded queues (they release the GIL, overlapping encode with TPU
    compute and decode).

Config: XML with the reference's tags (InputFile, Session, FpsLimit,
VideoEncParam, Resolutions/Resolution{Width,Height,VideoFilterDesc,
VideoEncParamSuffix,OutputFormat,OutputFile}).  '#' in OutputFile is the
session index, like the reference.
"""
from __future__ import annotations

import argparse
import dataclasses
import queue
import sys
import threading
import xml.etree.ElementTree as ET
from typing import List, Optional

import numpy as np


@dataclasses.dataclass
class Rung:
    width: int
    height: int
    filter_desc: str = ""
    enc_suffix: str = ""
    out_format: str = "mp4"
    out_file: str = "out_#.mp4"


@dataclasses.dataclass
class Options:
    input_file: str = ""
    sessions: int = 1
    fps_limit: int = 0
    video_enc_param: str = ""
    video_filter_desc: str = ""
    audio_codec: str = ""          # "aac" | "ac3" | "mp2" | "" (drop audio)
    audio_bitrate: int = 0
    audio_sample_rate: int = 0
    audio_filter_desc: str = ""    # e.g. "atempo=0.7143,volume=0.8"
    proc_decode: bool = False      # decode in a worker PROCESS per
    # session (shm ring, av/shm_ring.py) so libav decode overlaps the
    # session thread's device work without sharing its core — the
    # RoundQueue producer as its own process
    rungs: List[Rung] = dataclasses.field(default_factory=list)

    @classmethod
    def load_xml(cls, path: str) -> "Options":
        root = ET.parse(path).getroot()

        def get(tag, default=""):
            el = root.find(tag)
            return el.text.strip() if el is not None and el.text else default

        o = cls(
            input_file=get("InputFile"),
            sessions=int(get("Session", "1") or 1),
            fps_limit=int(get("FpsLimit", "0") or 0),
            video_enc_param=get("VideoEncParam"),
            video_filter_desc=get("VideoFilterDesc"),
            audio_codec=get("AudioCodec"),
            audio_bitrate=int(get("AudioBitRate", "0") or 0),
            audio_sample_rate=int(get("AudioSampleRate", "0") or 0),
            audio_filter_desc=get("AudioFilterDesc"),
            proc_decode=get("ProcDecode", "0").strip() in ("1", "true"),
        )
        res = root.find("Resolutions")
        if res is not None:
            for r in res.findall("Resolution"):
                def g(tag, default=""):
                    el = r.find(tag)
                    return (el.text or default).strip() if el is not None and el.text else default
                o.rungs.append(Rung(
                    width=int(g("Width", "0") or 0),
                    height=int(g("Height", "0") or 0),
                    filter_desc=g("VideoFilterDesc"),
                    enc_suffix=g("VideoEncParamSuffix"),
                    out_format=g("OutputFormat", "mp4"),
                    out_file=g("OutputFile", "out_#.mp4"),
                ))
        return o


class EncoderWorker(threading.Thread):
    """Host encode+mux worker: consumes (y, u, v) I420 frames from a
    bounded queue (the RoundQueue consumer analog)."""

    def __init__(self, name, path, w, h, fps, enc_kwargs, depth=8,
                 audio=None):
        """audio: optional (codec_id, sample_rate, channels, extradata,
        packets) to interleave into the same container (the reference's
        audio lane, AppMeTrans.cpp:176-200)."""
        super().__init__(daemon=True, name=name)
        from ..av import toolkit as tk
        kw = dict(enc_kwargs)
        codec_name = kw.pop("codec_name", "libx264")
        fps_t = kw.pop("fps", fps)
        self.enc = tk.Encoder(codec_name, w, h, fps=fps_t, **kw)
        mux_kw = tk.mux_kwargs_for_encoder(codec_name)
        # AvMuxer: the enum directly, or a raw AVCodecID negated
        # (enum values 0-2 collide with AVCodecID 1/2 = mpeg1/mpeg2)
        vcodec = mux_kw.get("codec")
        if vcodec is None:
            vcodec = -mux_kw["codec_id"]
        if audio:
            acid, arate, ach, aextra, apkts = audio
            self.mux = tk.AvMuxer(path, w, h, fps_t, vcodec,
                                  self.enc.extradata(), acid, arate, ach,
                                  aextra)
            self.audio_pkts = apkts
            self.audio_rate = arate
            self.fps_t = fps_t
        else:
            self.audio_pkts = None    # makes _write_video's guard real
            self.mux = tk.Muxer(path, w, h, fps_t,
                                extradata=self.enc.extradata(), **mux_kw)
        self.q: queue.Queue = queue.Queue(maxsize=depth)
        self.count = 0
        self.error: Optional[BaseException] = None

    def _write_video(self, pkt):
        if self.audio_pkts is not None and hasattr(self.mux, "write_video"):
            self.mux.write_video(pkt)
        else:
            self.mux.write(pkt)

    def run(self):
        try:
            # audio is PACED by video time instead of written up front:
            # dumping the whole track first bloats the muxer's
            # interleave queue (hours of audio held in memory) and
            # produces an all-audio-first file layout
            apkts = self.audio_pkts or []
            ai = 0

            def pump_audio(upto_sec):
                nonlocal ai
                rate = max(getattr(self, "audio_rate", 1), 1)
                while ai < len(apkts) and \
                        apkts[ai].pts / rate <= upto_sec:
                    self.mux.write_audio(apkts[ai])
                    ai += 1

            n = 0
            while True:
                item = self.q.get()
                if item is None:
                    break
                y, u, v = item
                if apkts:
                    fn, fd = self.fps_t
                    pump_audio((n + 1) * fd / max(fn, 1))
                for pkt in self.enc.encode(y, u, v, pts=n):
                    self._write_video(pkt)
                n += 1
                self.count = n
            for pkt in self.enc.flush():
                self._write_video(pkt)
            pump_audio(float("inf"))      # tail past the video duration
            self.mux.close()
            self.enc.close()
        except BaseException as e:
            self.error = e

    def put(self, frame):
        while True:
            if self.error:
                raise self.error
            try:
                self.q.put(frame, timeout=0.5)
                return
            except queue.Full:
                continue

    def finish(self):
        while True:
            if not self.is_alive():
                return          # worker already died (error set)
            try:
                self.q.put(None, timeout=0.5)
                return
            except queue.Full:
                continue


def transcode_audio(opts: Options):
    """Decode the input's audio lane and re-encode it once per session
    (shared across rungs).  Returns the AvMuxer audio tuple or None."""
    from ..av import toolkit as tk

    dm = tk.Demuxer(opts.input_file)
    info = tk.AudioInfo(dm)
    if not info.present:
        dm.close()
        return None
    rate = opts.audio_sample_rate or info.sample_rate
    ch = min(info.channels, 2) or 2
    # decoder downmixes to the encoder's channel count (>2ch sources)
    dec = enc = None
    try:
        dec = tk.AudioDecoder(info, sample_rate=rate, channels=ch)
    # streamed filter chain: decoded blocks flow through push()/flush()
    # and into the encoder as they arrive — no whole-track buffering
    # (the output rate is known from the chain spec up front)
        filt = None
        out_rate = rate
        if opts.audio_filter_desc:
            from ..av.audio_filters import AudioFilterStream
            filt = AudioFilterStream(opts.audio_filter_desc, rate)
            out_rate = filt.out_rate
        enc = tk.AudioEncoder(opts.audio_codec, out_rate, ch,
                              opts.audio_bitrate or 128000)
        pkts = []

        def feed(chunk):
            if filt is not None:
                chunk = filt.push(chunk)
            if chunk.size:
                pkts.extend(enc.encode(chunk))

        for pkt in dm:
            if pkt.stream != 1:
                continue
            for (chunk, _pts) in dec.decode(pkt.data, pkt.pts):
                feed(chunk)
        for (chunk, _pts) in dec.decode(None):
            feed(chunk)
        if filt is not None:
            tail = filt.flush()
            if tail.size:
                pkts.extend(enc.encode(tail))
        pkts += enc.flush()
        return (enc.codec_id, out_rate, enc.channels, enc.extradata(), pkts)
    finally:   # native handles must not leak on a bad filter/codec/stream
        dm.close()
        if dec is not None:
            dec.close()
        if enc is not None:
            enc.close()


def run_session(session_idx: int, opts: Options, batch: int = 16,
                frames_limit: int = 0, quiet: bool = True) -> dict:
    import jax

    from ..av.ingest import decode_stream
    from ..filters.graph import FilterGraph
    from ..ops import csc, resize as rsz
    from ..utils.encparam import parse_enc_param
    from ..utils.stopwatch import FpsLimiter, FpsMeter, StopWatch

    watch = StopWatch()
    if opts.proc_decode:
        from ..av.shm_ring import decode_stream_multiproc
        src = decode_stream_multiproc(opts.input_file, procs=1,
                                      batch=batch)
    else:
        src = decode_stream(opts.input_file, batch=batch)
    src_fps = getattr(src, "fps", 0.0) or 30.0
    # pts timebase in seconds: container inputs use the stream timebase,
    # raw inputs stamp frame indices (1/fps) — same rule as the CLI
    tb_sec = 1.0 / src_fps
    if not opts.input_file.lower().endswith(
            (".y4m", ".yuv", ".nv12", ".iyuv", ".raw")):
        from ..av import toolkit as tk
        _dmp = tk.Demuxer(opts.input_file)
        tb_sec = _dmp.time_base[0] / max(_dmp.time_base[1], 1)
        _dmp.close()

    common_graph = (FilterGraph(opts.video_filter_desc, src_fps)
                    if opts.video_filter_desc else None)
    # rung graphs consume the COMMON graph's output rate (a common
    # yadif=1 doubles it; a rung fps=N must decimate against that)
    rung_fps = src_fps * getattr(common_graph, "fps_mul", 1)
    rung_graphs = [FilterGraph(r.filter_desc, rung_fps) if r.filter_desc
                   else None for r in opts.rungs]

    base_kwargs = parse_enc_param(opts.video_enc_param) if opts.video_enc_param else {
        "codec_name": "libx264"}
    base_kwargs.setdefault("preset", "ultrafast")
    # default to the SOURCE rate (a 60fps input stamped 30fps would play
    # half speed and desync from the audio lane); explicit fps= wins
    base_kwargs.setdefault("fps", (round(src_fps * 1000), 1000))

    audio = transcode_audio(opts) if opts.audio_codec else None

    # validate EVERY rung's output before starting any worker: raising
    # mid-loop would leak already-started workers blocked on q.get()
    if opts.sessions > 1:
        for r in opts.rungs:
            if "#" not in r.out_file:
                raise ValueError(
                    f"rung output {r.out_file!r} has no '#' placeholder: "
                    f"{opts.sessions} sessions would write the same file "
                    "concurrently")
    workers = []
    for i, r in enumerate(opts.rungs):
        kw = dict(base_kwargs)
        if r.enc_suffix:
            kw = parse_enc_param(r.enc_suffix, kw)
        path = r.out_file.replace("#", str(session_idx))
        fps = kw.get("fps", (30, 1))
        # stream filters that change the frame rate (yadif send_field)
        mul = getattr(common_graph, "fps_mul", 1) * \
            getattr(rung_graphs[i], "fps_mul", 1)
        if mul != 1:
            # keep the rate RATIONAL: fps filters produce float
            # multipliers (1/step) and the native encoder takes ints —
            # scale by 1000 like the CLI does (cli.py fps_tuple)
            fps = (int(round(fps[0] * mul * 1000)), int(fps[1] * 1000))
        kw["fps"] = fps       # EncoderWorker prefers kw['fps'] when present
        workers.append(EncoderWorker(f"enc{i}", path, r.width, r.height,
                                     fps, kw, audio=audio))
        workers[-1].start()

    limiter = FpsLimiter(opts.fps_limit)
    meter = FpsMeter(f"session{session_idx}", quiet=quiet)
    n_in = 0

    def push_rung(g, w_, out, keep, pts, meta=None):
        rkeep = keep
        if g is not None:
            # fold the shared keep in so stream filters (yadif etc.) see
            # the effective mask; rkeep then matches g's output batch.
            # Per-frame metadata (times/keys/pos/interlaced) feeds
            # time/key selects and yadif auto-parity like the CLI does.
            out, rkeep = g.process(out, pts=pts, keep=keep,
                                   **(meta or {}))
        idx = np.nonzero(rkeep)[0]
        if len(idx) == 0:
            return      # skip the D2H transfer when nothing survived
        if out.fmt.is_rgb or out.format != "yuv420p":
            out = csc.convert(out, "yuv420p")
        if len(idx) < out.batch:
            # sparse keep: gather kept frames ON DEVICE first (a full
            # batch is ~48MB of tunnel per rung otherwise)
            import jax.numpy as jnp
            sel = jnp.asarray(idx)
            host = {k: np.asarray(jnp.take(v, sel, axis=0))
                    for k, v in out.planes.items()}
            for j in range(len(idx)):
                w_.put((host["y"][j], host["u"][j], host["v"][j]))
        else:
            host = {k: np.asarray(v) for k, v in out.planes.items()}
            for i in idx:
                w_.put((host["y"][i], host["u"][i], host["v"][i]))

    rung_sizes = tuple((r.width, r.height) for r in opts.rungs)
    fused_ok = (jax.default_backend() == "tpu" and len(opts.rungs) > 1
                and all((ow | oh) % 2 == 0 for ow, oh in rung_sizes))

    def push_ladder(fb, keep, pts, meta=None):
        nonlocal fused_ok
        if fused_ok and fb.format == "yuv420p":
            # ONE Pallas pass: the source planes are read once and every
            # rung's YUV planes come out (vs ScaleNv12 per rung in the
            # reference's EncodeVideoProc consumers)
            from ..core.frame import FrameBatch
            from ..ops.pallas_kernels import fused_rungs, fused_rungs_fits
            if not fused_rungs_fits(fb.height, fb.width, rung_sizes):
                fused_ok = False     # 4K+ sources: per-rung path below
            else:
                outs = fused_rungs(fb.planes["y"], fb.planes["u"],
                                   fb.planes["v"], rung_sizes)
                for r, g, w_, (yy, uu, vv) in zip(opts.rungs, rung_graphs,
                                                  workers, outs):
                    rb = FrameBatch({"y": yy, "u": uu, "v": vv}, "yuv420p",
                                    r.width, r.height, fb.colorspace)
                    push_rung(g, w_, rb, keep, pts, meta)
                return
        # device: all rungs from the shared batch (one jitted program each)
        for r, g, w_ in zip(opts.rungs, rung_graphs, workers):
            push_rung(g, w_, rsz.resize(fb, r.width, r.height), keep, pts,
                      meta)

    try:
        for fb, pts, valid in src:
            src_meta = dict(times=pts * tb_sec,
                            keys=getattr(src, "last_keys", None),
                            pos=getattr(src, "last_pos", None),
                            interlaced=getattr(src, "last_interlaced",
                                               None))
            if common_graph is not None:
                fb, keep = common_graph.process(fb, pts=pts, valid=valid,
                                                **src_meta)
                if common_graph.out_pts is not None:
                    # stream filters (yadif send_field, thumbnail)
                    # re-time / re-size the batch: the rungs must see the
                    # graph's output pts, not the input array
                    pts = common_graph.out_pts
                # a common graph may drop/renumber frames: only the
                # recomputed times stay aligned for the rung graphs
                rmeta = {"times": pts * tb_sec}
            else:
                keep = np.ones(fb.batch, bool)
                keep[valid:] = False
                rmeta = src_meta
            push_ladder(fb, keep, pts, rmeta)
            n_in += int(valid)
            meter.add(int(valid))
            limiter.tick(int(valid))
            if frames_limit and n_in >= frames_limit:
                break
    finally:
        # the -frames early break (and any error) must stop the prefetch
        # producer thread and release the demuxer/decoder handles
        src.close()

    # end-of-stream: drain stateful filters in the common + rung graphs
    if common_graph is not None:
        for fb, keep, meta in common_graph.flush():
            fpts = meta.get("pts")
            push_ladder(fb, keep, fpts,
                        {"times": fpts * tb_sec} if fpts is not None
                        else None)
    for r, g, w_ in zip(opts.rungs, rung_graphs, workers):
        if g is None:
            continue
        for out, rkeep, _meta in g.flush():
            push_rung(None, w_, out, rkeep, None)

    for w_ in workers:
        w_.finish()
    for w_ in workers:
        w_.join()
        if w_.error:
            raise w_.error
    dt = watch.stop()
    return {"session": session_idx, "frames_in": n_in,
            "frames_out": sum(w_.count for w_ in workers),
            "seconds": dt, "fps": n_in / dt if dt else 0.0}


def main(argv=None):
    from ..utils.compile_cache import enable as _enable_cache
    _enable_cache()
    p = argparse.ArgumentParser(prog="gmat-metrans",
                                description="1->N ABR transcode ladder")
    p.add_argument("-c", "--config", help="options.xml (reference format)")
    p.add_argument("-i", "--input", help="input file (overrides config)")
    p.add_argument("-r", "--rung", action="append", default=[],
                   help="WxH[:out.mp4][:encsuffix] (repeatable)")
    p.add_argument("-enc-param", default="")
    p.add_argument("-sessions", type=int, default=0)
    p.add_argument("-proc-decode", action="store_true",
                   help="decode in a worker process per session "
                        "(shm-ring fan-in; XML tag <ProcDecode>1)")
    p.add_argument("-frames", type=int, default=0)
    p.add_argument("-batch", type=int, default=16)
    p.add_argument("-stats", action="store_true")
    args = p.parse_args(argv)

    opts = Options.load_xml(args.config) if args.config else Options()
    if args.input:
        opts.input_file = args.input
    if args.enc_param:
        opts.video_enc_param = args.enc_param
    if args.sessions:
        opts.sessions = args.sessions
    if args.proc_decode:
        opts.proc_decode = True
    for spec in args.rung:
        parts = spec.split(":")
        w, h = parts[0].lower().split("x")
        r = Rung(int(w), int(h))
        if len(parts) > 1:
            r.out_file = parts[1]
        if len(parts) > 2:
            r.enc_suffix = ":".join(parts[2:])
        opts.rungs.append(r)
    if not opts.rungs:
        p.error("no output rungs (use -r WxH:out.mp4 or a config)")
    if not opts.input_file:
        p.error("no input")

    results = []
    errors = []
    threads = []

    def run_one(s):
        try:
            results.append(run_session(s, opts, args.batch, args.frames,
                                       quiet=not args.stats))
        except Exception as e:   # surfaced after join: no silent rc=0
            errors.append((s, e))

    for s in range(opts.sessions):
        if opts.sessions == 1:
            run_one(s)
        else:
            t = threading.Thread(target=run_one, args=(s,))
            t.start()
            threads.append(t)
    for t in threads:
        t.join()
    for s, e in errors:
        print(f"session {s} FAILED: {e}", file=sys.stderr)
    if errors:
        return 1
    for r in sorted(results, key=lambda r: r["session"]):
        print(f"session {r['session']}: {r['frames_in']} frames -> "
              f"{r['frames_out']} encoded in {r['seconds']:.2f}s "
              f"({r['fps']:.1f} fps)", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
