"""CLI and MeTrans ladder app end-to-end tests."""
import os

import numpy as np
import pytest

from gmat_tpu.av import toolkit as tk

from .test_extractor import make_clip, W, H, NFRAMES


@pytest.fixture(scope="module")
def clip(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("apps") / "in.mp4")
    make_clip(p)
    return p


def decode_all(path):
    dm = tk.Demuxer(path)
    dec = tk.Decoder.from_demuxer(dm)
    out = []
    for pkt in dm:
        if pkt.stream == 0:
            out.extend(dec.decode(pkt.data, pkt.pts))
    out.extend(dec.decode(None))
    dm.close(); dec.close()
    return out


def test_cli_transcode_scale(clip, tmp_path):
    from gmat_tpu.apps.cli import main
    out = str(tmp_path / "out.mp4")
    rc = main(["-i", clip, "-vf", "scale=160:120", "-o", out,
               "-c:v", "libx264", "-crf", "20", "-batch", "16"])
    assert rc == 0 and os.path.getsize(out) > 500
    frames = decode_all(out)
    assert len(frames) == NFRAMES
    assert frames[0][0].shape == (120, 160)


def test_cli_select_scene_to_jpeg(tmp_path):
    from gmat_tpu.apps.cli import main
    clip2 = str(tmp_path / "cut.mp4")
    make_clip(clip2, scene_cut_at=30)
    pattern = str(tmp_path / "thumb_%d.jpg")
    rc = main(["-i", clip2, "-vf", "select=gt(scene\\,0.4)",
               "-o", pattern, "-batch", "16"])
    assert rc == 0
    assert os.path.exists(str(tmp_path / "thumb_0.jpg"))
    assert not os.path.exists(str(tmp_path / "thumb_1.jpg"))


def test_cli_null_sink(clip):
    from gmat_tpu.apps.cli import main
    rc = main(["-i", clip, "-vf", "scale=96:64,format=rgbpf32le",
               "-o", "null", "-frames", "16", "-batch", "8"])
    assert rc == 0


def test_cli_enc_param(clip, tmp_path):
    from gmat_tpu.apps.cli import main
    out = str(tmp_path / "hevc.mp4")
    rc = main(["-i", clip, "-vf", "scale=160:120", "-o", out,
               "-enc-param", "codec=hevc:preset=p1:constqp=30:gop=30",
               "-frames", "8", "-batch", "8"])
    assert rc == 0
    dm = tk.Demuxer(out)
    assert dm.codec_name == "hevc"
    dm.close()


def test_metrans_ladder(clip, tmp_path):
    from gmat_tpu.apps.metrans import Options, Rung, run_session
    opts = Options(input_file=clip, rungs=[
        Rung(160, 120, out_file=str(tmp_path / "r0_#.mp4")),
        Rung(96, 64, filter_desc="hflip",
             out_file=str(tmp_path / "r1_#.mp4")),
    ], video_enc_param="codec=h264:preset=p1:constqp=25")
    res = run_session(0, opts, batch=16)
    assert res["frames_in"] == NFRAMES
    assert res["frames_out"] == 2 * NFRAMES
    f0 = decode_all(str(tmp_path / "r0_0.mp4"))
    f1 = decode_all(str(tmp_path / "r1_0.mp4"))
    assert len(f0) == NFRAMES and f0[0][0].shape == (120, 160)
    assert len(f1) == NFRAMES and f1[0][0].shape == (64, 96)


def test_metrans_xml_config(clip, tmp_path):
    from gmat_tpu.apps.metrans import Options
    xml = tmp_path / "options.xml"
    xml.write_text(f"""<Options>
      <InputFile>{clip}</InputFile>
      <Session>2</Session>
      <VideoEncParam>codec=h264:preset=p1:bitrate=500K</VideoEncParam>
      <Resolutions>
        <Resolution><Width>160</Width><Height>120</Height>
          <OutputFile>{tmp_path}/a_#.mp4</OutputFile></Resolution>
        <Resolution><Width>96</Width><Height>64</Height>
          <VideoFilterDesc>hflip</VideoFilterDesc>
          <VideoEncParamSuffix>maxbitrate=800K</VideoEncParamSuffix>
          <OutputFile>{tmp_path}/b_#.mp4</OutputFile></Resolution>
      </Resolutions>
    </Options>""")
    o = Options.load_xml(str(xml))
    assert o.sessions == 2 and len(o.rungs) == 2
    assert o.rungs[1].filter_desc == "hflip"
    assert o.rungs[1].enc_suffix == "maxbitrate=800K"


def test_encparam_parse():
    from gmat_tpu.utils.encparam import parse_enc_param
    kw = parse_enc_param("codec=hevc:fps=30:preset=p4:rc=vbr:bitrate=2M:"
                         "maxbitrate=2.5M:gop=250:bf=3")
    assert kw["codec_name"] == "libx265"
    assert kw["bitrate"] == 2000000
    assert kw["gop"] == 250 and kw["bf"] == 3
    assert kw["preset"] == "faster"
    assert "maxrate=2500000" in kw["opts"]
    with pytest.raises(ValueError):
        parse_enc_param("bogus_opt=1")


def test_cli_select_time_var(clip, tmp_path):
    """'t' expression variable: keep only frames in the first second."""
    from gmat_tpu.apps.cli import main
    out = str(tmp_path / "t_%d.jpg")
    rc = main(["-i", clip, "-vf", "select=lt(t\\,0.5)", "-o", out,
               "-batch", "16"])
    assert rc == 0
    import os
    made = [f for f in os.listdir(tmp_path) if f.startswith("t_")]
    assert len(made) == 15   # 0.5s @30fps


def test_cli_duration_flag(clip, tmp_path):
    from gmat_tpu.apps.cli import main
    out = str(tmp_path / "dur.y4m")
    rc = main(["-i", clip, "-vf", "null", "-o", out, "-t", "1.0",
               "-batch", "16"])
    assert rc == 0
    from gmat_tpu.av.rawvideo import Y4MReader
    r = Y4MReader(out)
    n = sum(1 for _ in r.frames())
    r.close()
    assert n == 30   # 1 second @ 30 fps


def test_cli_transcode_quality_gate(clip, tmp_path):
    """End-to-end quality: identity transcode at high quality must keep
    PSNR > 38 dB vs the source frames."""
    import jax.numpy as jnp
    from gmat_tpu.apps.cli import main
    from gmat_tpu.ops.metrics import psnr
    out = str(tmp_path / "q.mp4")
    rc = main(["-i", clip, "-vf", "null", "-o", out, "-crf", "14",
               "-preset", "veryfast", "-batch", "16"])
    assert rc == 0
    src = decode_all(clip)
    dst = decode_all(out)
    assert len(src) == len(dst)
    ys = jnp.asarray(np.stack([f[0] for f in src]))
    yd = jnp.asarray(np.stack([f[0] for f in dst]))
    p = np.asarray(psnr(ys, yd))
    assert p.mean() > 38.0, p.mean()


def test_cli_select_keyframes(clip, tmp_path):
    """select=key keeps only keyframes (gop 12 over 60 frames -> 5)."""
    from gmat_tpu.apps.cli import main
    out = str(tmp_path / "k.y4m")
    rc = main(["-i", clip, "-vf", "select=key", "-o", out, "-batch", "16"])
    assert rc == 0
    from gmat_tpu.av.rawvideo import Y4MReader
    r = Y4MReader(out)
    n = sum(1 for _ in r.frames())
    r.close()
    assert n == 5


def test_encoder_worker_error_propagates(tmp_path):
    """A dying encoder worker must raise in the producer, not deadlock."""
    import numpy as np
    from gmat_tpu.apps.metrans import EncoderWorker
    w = EncoderWorker("bad", str(tmp_path / "x.mp4"), 64, 64, (30, 1),
                      {"codec_name": "libx264", "preset": "ultrafast"},
                      depth=1)
    w.start()
    bad = (np.zeros((32, 32), np.uint8),) * 3   # wrong dims -> encode error
    with pytest.raises(Exception):
        for _ in range(50):                     # bounded: must raise, not hang
            w.put(bad)
    w.finish()


def test_cli_decoder_resize_and_crop_flags(tmp_path, capsys):
    """cuvid-style -resize / -crop decoder flags (FFmpeg_GPU_Acceleration
    doc: `ffmpeg -hwaccel cuda -resize 1280x720 -i ...`)."""
    from gmat_tpu.apps.cli import main
    from .test_extractor import make_clip
    clip = str(tmp_path / "rc.mp4")
    make_clip(clip)                      # 320x240, y=20+3*i
    out = str(tmp_path / "rc_out.y4m")
    assert main(["-i", clip, "-resize", "160x120", "-o", out,
                 "-batch", "16"]) == 0
    from gmat_tpu.av.rawvideo import Y4MReader
    rd = Y4MReader(out)
    assert (rd.width, rd.height) == (160, 120)
    rd.close()
    out2 = str(tmp_path / "rc_out2.y4m")
    # crop TOPxBOTTOMxLEFTxRIGHT = 40x40x80x80 -> 160x160 window
    assert main(["-i", clip, "-crop", "40x40x80x80", "-o", out2,
                 "-batch", "16"]) == 0
    rd = Y4MReader(out2)
    assert (rd.width, rd.height) == (160, 160)
    rd.close()


def test_cli_audio_copy(tmp_path):
    """-c:a copy passes source audio packets through without re-encode."""
    from gmat_tpu.apps.cli import main
    from gmat_tpu.av import toolkit as tk
    from .test_audio import make_av_clip
    clip = str(tmp_path / "avc.mp4")
    make_av_clip(clip, nframes=30)
    out = str(tmp_path / "avc_out.mp4")
    assert main(["-i", clip, "-o", out, "-c:a", "copy",
                 "-batch", "16"]) == 0
    dm = tk.Demuxer(out)
    info = tk.AudioInfo(dm)
    assert info.present
    src_dm = tk.Demuxer(clip)
    src_info = tk.AudioInfo(src_dm)
    assert info.codec_id == src_info.codec_id
    assert info.sample_rate == src_info.sample_rate
    n_a = sum(1 for p in dm if p.stream == 1)
    n_src = sum(1 for p in src_dm if p.stream == 1)
    assert n_a == n_src > 0
    dm.close(); src_dm.close()


def test_cli_list_filters(capsys):
    from gmat_tpu.apps.cli import main
    assert main(["-list-filters"]) == 0
    out = capsys.readouterr().out
    assert "yadif" in out and "overlay" in out and "positional" in out


def test_cli_filter_help(capsys):
    """ffmpeg `-h filter=NAME` form (FFMPEG-GPU_User_Guide.md:24-26)."""
    from gmat_tpu.apps.cli import main
    assert main(["-h", "filter=smooth"]) == 0
    out = capsys.readouterr().out
    assert "sigmaX" in out and "positional order" in out
    assert main(["-h", "filter=doesnotexist"]) == 1


def test_encparam_profile():
    """-profile maps to a real libx264 profile and lands in the SPS."""
    from gmat_tpu.av import toolkit as tk
    from gmat_tpu.utils.encparam import parse_enc_param

    kw = parse_enc_param("codec=h264:profile=high:bitrate=1M")
    assert "profile=high" in kw["opts"]

    def profile_idc(opts):
        import numpy as np
        enc = tk.Encoder("libx264", 96, 64, fps=(30, 1), crf=30.0,
                         opts=opts)
        ex = enc.extradata()
        enc.close()
        i = ex.find(b"\x00\x00\x01")
        while i >= 0:
            nal = ex[i + 3:]
            if nal and (nal[0] & 0x1F) == 7:      # SPS
                return nal[1]
            i = ex.find(b"\x00\x00\x01", i + 3)
        return None

    assert profile_idc("profile=baseline") == 66
    assert profile_idc("profile=high") == 100


def test_metrans_yadif_rung(clip, tmp_path):
    """A rung running yadif=1 (send_field) muxes at 2x fps and emits ~2x
    frames (incl. the EOF flush)."""
    from gmat_tpu.apps.metrans import Options, Rung, run_session
    opts = Options(input_file=clip, rungs=[
        Rung(160, 120, filter_desc="yadif=1",
             out_file=str(tmp_path / "yd_#.mp4")),
    ], video_enc_param="codec=h264:preset=p1:constqp=25")
    res = run_session(0, opts, batch=16)
    assert res["frames_in"] == NFRAMES
    frames = decode_all(str(tmp_path / "yd_0.mp4"))
    assert len(frames) == 2 * NFRAMES
    dm = tk.Demuxer(str(tmp_path / "yd_0.mp4"))
    assert abs(dm.fps - 60.0) < 0.5          # doubled from 30
    dm.close()


def test_perf_sustained_smoke(capsys):
    """perf sustained runs on CPU and reports the overlap fields."""
    import json as _json
    from gmat_tpu.apps.perf import main
    assert main(["sustained", "-width", "320", "-height", "240"]) == 0
    rec = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    for k in ("h2d_ms_per_batch", "ladder_ms_per_batch",
              "pipelined_ms_per_batch", "overlap_efficiency",
              "sustained_fps"):
        assert k in rec


def test_perf_ingest_smoke(clip, capsys):
    import json as _json
    from gmat_tpu.apps.perf import main
    assert main(["ingest", "-i", clip, "-procs", "2"]) == 0
    rec = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["rows"][0]["frames"] > 0
    assert len(rec["rows"]) == 2 and rec["scaling_vs_1proc"][0] == 1.0


def test_bindings_reference_surface(clip, tmp_path):
    """Drop-in parity with the reference python bindings' class/verb
    surface (metrans/python/frame_extractor.py + heif_format.py)."""
    import numpy as np
    from gmat_tpu.bindings import (FrameExtractor, NvEncLite, NvDecLite,
                                   NvHeifWriter, NvHeifReader)
    # FrameExtractor(file_path=/buffer=) + getter verbs
    fx = FrameExtractor(file_path=clip)
    assert fx.get_width() == 320 and fx.get_height() == 240
    assert fx.get_frame_size() == 320 * 240 * 3 // 2
    fx.close()
    blob = open(clip, "rb").read()
    fx = FrameExtractor(buffer=blob)
    fx.set_frame_interval(30)
    assert fx.extract() is not None
    fx.close()
    # NvEncLite -> NvHeifWriter -> NvHeifReader -> NvDecLite loop
    w, h = 128, 96
    y = np.full((h, w), 140, np.uint8)
    u = np.full((h // 2, w // 2), 100, np.uint8)
    v = np.full((h // 2, w // 2), 160, np.uint8)
    enc = NvEncLite(w, h)
    pkt = enc.encode_frame(y, u, v)
    enc.close()
    img_np, size = NvHeifWriter().write_stillimage(pkt)
    assert size > 0 and img_np.nbytes == size
    pkt2, n = NvHeifReader(img_np, size).read_image()
    assert n > 0
    yd, ud, vd = NvDecLite().decode_still(pkt2)
    assert yd.shape == (h, w)
    assert abs(float(yd.mean()) - 140) < 3


def test_cli_beyond_enum_encoder(clip, tmp_path):
    """-c:v mpeg2video: the CLI muxes non-enum encoders with the right
    codec id instead of mislabeling the stream h264."""
    from gmat_tpu.apps.cli import main
    out = str(tmp_path / "m2.ts")
    assert main(["-i", clip, "-vf", "scale=160:128", "-o", out,
                 "-c:v", "mpeg2video", "-b:v", "1M", "-frames", "8",
                 "-batch", "8"]) == 0
    dm = tk.Demuxer(out)
    assert dm.codec_id == tk.codec_id("mpeg2video")
    dm.close()


def test_cli_beyond_enum_encoder_with_audio(tmp_path):
    """Non-enum video codec + audio lane: the AvMuxer raw-id path must
    not collide with the 0/1/2 enum (AVCodecID 2 == mpeg2video)."""
    from gmat_tpu.apps.cli import main
    from .test_audio import make_av_clip
    clip = str(tmp_path / "a.mp4")
    make_av_clip(clip, nframes=20)
    out = str(tmp_path / "m2a.ts")
    assert main(["-i", clip, "-o", out, "-c:v", "mpeg2video", "-b:v", "1M",
                 "-c:a", "copy", "-batch", "8"]) == 0
    dm = tk.Demuxer(out)
    assert dm.codec_id == tk.codec_id("mpeg2video")
    info = tk.AudioInfo(dm)
    assert info.present
    dm.close()


def test_cli_user_guide_pipeline(clip, tmp_path):
    """The user guide's nvcv pipeline runs unmodified filter-for-filter
    (FFMPEG-GPU_User_Guide.md:19: format=rgb24,hwupload_cuda,
    crop_nvcv=640:480,flip_nvcv=0,smooth_nvcv=gaussian -> hevc)."""
    from gmat_tpu.apps.cli import main
    out = str(tmp_path / "guide.mp4")
    rc = main(["-i", clip, "-vf",
               "format=rgb24,hwupload_cuda,crop_nvcv=160:96,"
               "flip_nvcv=0,smooth_nvcv=gaussian",
               "-c:v", "libx265", "-o", out, "-frames", "12",
               "-batch", "8"])
    assert rc == 0 and os.path.getsize(out) > 500
    frames = decode_all(out)
    assert frames[0][0].shape == (96, 160)


def test_cli_tensorrt_doc_pipeline(clip, tmp_path):
    """The tensorrt-filter doc pipeline (Tensorrt_Filter.md:26):
    scale_npp -> format_cuda=rgbpf32le -> tensorrt -> format_cuda back."""
    from gmat_tpu.apps.cli import main
    out = str(tmp_path / "trt.mp4")
    rc = main(["-i", clip, "-vf",
               "scale_npp=96:64,format_cuda=rgbpf32le:255,"
               "tensorrt=sr2x,format_cuda=yuv420p",
               "-c:v", "libx264", "-o", out, "-frames", "8",
               "-batch", "8"])
    assert rc == 0 and os.path.getsize(out) > 500
    frames = decode_all(out)
    assert frames[0][0].shape == (128, 192)     # sr2x doubled


def test_perf_rungs_smoke(capsys):
    """perf rungs runs on CPU (XLA per-rung path) and reports a rate."""
    import json
    from gmat_tpu.apps.perf import main
    assert main(["rungs", "-width", "256", "-height", "128"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["case"] == "rungs" and out["fps_xla"] > 0


def test_cli_accepts_ffmpeg_noop_flags(clip, tmp_path):
    """Reference doc command lines paste in unmodified: the hwaccel/
    vsync/-y plumbing flags are accepted as no-ops
    (FFmpeg_GPU_Acceleration.md transcode examples)."""
    from gmat_tpu.apps.cli import main
    out = str(tmp_path / "ff.mp4")
    rc = main(["-y", "-vsync", "0", "-hwaccel", "cuda",
               "-hwaccel_output_format", "cuda", "-i", clip,
               "-vf", "scale_cuda=160:120", "-c:a", "copy",
               "-c:v", "libx264", "-b:v", "1M", "-o", out,
               "-frames", "8", "-batch", "8"])
    assert rc == 0 and os.path.getsize(out) > 500


def test_cli_pix_fmt_mapping(capsys):
    """-pix_fmt is semantic: depths we speak map onto -bits, everything
    else warns on stderr instead of silently changing the output format
    (ADVICE r2)."""
    from gmat_tpu.apps.cli import _strip_ffmpeg_noops
    assert _strip_ffmpeg_noops(["-pix_fmt", "yuv420p10le", "-i", "x"]) == \
        ["-bits", "10", "-i", "x"]
    assert _strip_ffmpeg_noops(["-pix_fmt", "p010le"])[:2] == ["-bits", "10"]
    assert _strip_ffmpeg_noops(["-pix_fmt", "yuv420p"]) == []
    # explicit -bits wins over -pix_fmt
    assert _strip_ffmpeg_noops(["-pix_fmt", "yuv420p10le", "-bits", "8"]) \
        == ["-bits", "8"]
    capsys.readouterr()
    assert _strip_ffmpeg_noops(["-pix_fmt", "yuv444p"]) == []
    assert "yuv444p" in capsys.readouterr().err


def test_metrans_proc_decode(clip, tmp_path):
    """<ProcDecode>1: the session's libav decode runs in a worker
    PROCESS feeding the shm ring (av/shm_ring.py) — same outputs as the
    in-process decode path."""
    from gmat_tpu.apps.metrans import Options, Rung, run_session
    opts = Options(input_file=clip, proc_decode=True, rungs=[
        Rung(160, 120, out_file=str(tmp_path / "p0_#.mp4")),
    ], video_enc_param="codec=h264:preset=p1:constqp=25")
    res = run_session(0, opts, batch=16)
    assert res["frames_in"] == NFRAMES
    assert res["frames_out"] == NFRAMES
    f0 = decode_all(str(tmp_path / "p0_0.mp4"))
    assert len(f0) == NFRAMES and f0[0][0].shape == (120, 160)


def test_cli_conforms_mid_stream_resolution_change(tmp_path, capsys):
    """Mixed-resolution ingest now forwards dim changes; fixed-geometry
    sinks (y4m/mux) must conform later frames to the established output
    size instead of writing corrupt files."""
    from gmat_tpu.apps.cli import main
    from gmat_tpu.av import toolkit as tk
    from gmat_tpu.av.rawvideo import Y4MReader

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

    raw = str(tmp_path / "spliced.h264")
    with open(raw, "wb") as f:
        for d in enc_frames(320, 240, 5, 40) + enc_frames(160, 120, 5, 150):
            f.write(d)
    out = str(tmp_path / "conf.y4m")
    rc = main(["-i", raw, "-o", out, "-batch", "4"])
    assert rc == 0
    assert "conforming" in capsys.readouterr().err
    rd = Y4MReader(out)
    frames = list(rd.frames())
    rd.close()
    assert len(frames) == 10
    assert all(y.shape == (240, 320) for (y, u, v, *_r) in frames)
    # the conformed tail really is the second segment's content
    assert float(np.median(frames[-1][0])) > 120


def test_cli_conforms_mid_stream_resolution_change_mux(tmp_path, capsys):
    """Same conformance through the encoder/mux sink: the fixed-geometry
    encoder must never be fed mismatched planes."""
    from gmat_tpu.apps.cli import main
    from gmat_tpu.av import toolkit as tk

    def enc_frames(w, h, n, base):
        e = tk.Encoder("libx264", w, h, fps=(30, 1), gop=5, crf=16.0)
        pk = []
        for i in range(n):
            pk += e.encode(np.full((h, w), base + i * 5, np.uint8),
                           np.full((h // 2, w // 2), 110, np.uint8),
                           np.full((h // 2, w // 2), 140, np.uint8), pts=i)
        pk += e.flush()
        d = [p.data for p in pk]
        d[0] = e.extradata() + d[0]
        e.close()
        return d

    raw = str(tmp_path / "spliced2.h264")
    with open(raw, "wb") as f:
        for d in enc_frames(160, 120, 5, 40) + enc_frames(320, 240, 5, 150):
            f.write(d)
    out = str(tmp_path / "conf.mp4")
    rc = main(["-i", raw, "-o", out, "-batch", "4", "-crf", "18"])
    assert rc == 0
    assert "conforming" in capsys.readouterr().err
    # decode back: 10 frames, all at the established 160x120
    dm = tk.Demuxer(out)
    dec = tk.Decoder.from_demuxer(dm)
    frames = []
    for p in dm:
        if p.stream == 0:
            frames += list(dec.decode(p.data, p.pts))
    frames += list(dec.decode(None))
    dm.close(); dec.close()
    assert len(frames) == 10
    assert all(f[0].shape == (120, 160) for f in frames)
    assert float(np.median(frames[-1][0])) > 120   # upscaled 2nd segment


def test_cli_mjpeg_tpu_lane(clip, tmp_path):
    # -c:v mjpeg_tpu: batched DCT/quant on device, native entropy coding,
    # packets muxed as a real MJPEG video track (the device-assisted
    # encoder lane; reference analog = NVENC fixed-function encode)
    from gmat_tpu.apps.cli import main
    from gmat_tpu.av.jpeg import decode_jpeg_bytes
    out = str(tmp_path / "out_mjpeg.mov")
    rc = main(["-i", clip, "-vf", "scale=160:120", "-o", out,
               "-c:v", "mjpeg_tpu", "-q:v", "90", "-frames", "12",
               "-batch", "8"])
    assert rc == 0
    dm = tk.Demuxer(out)
    assert dm.codec_name == "mjpeg"
    pkts = [p for p in dm if p.stream == 0]
    dm.close()
    assert len(pkts) == 12 and all(p.key for p in pkts)
    # each packet is standalone JFIF; frame 5's flat source luma 35
    # (limited) must land at (35-16)*255/219 after the fused expansion
    y5, _, _ = decode_jpeg_bytes(pkts[5].data)
    assert y5.shape == (120, 160)
    assert abs(float(np.median(y5)) - (35 - 16) * 255.0 / 219.0) < 3
    # libavcodec plays the whole track
    frames = decode_all(out)
    assert len(frames) == 12


def test_cli_mjpeg_tpu_qscale_mapping(clip, tmp_path):
    # ffmpeg-style -q:v 2 (high quality) must beat -q:v 31 (low) in size
    from gmat_tpu.apps.cli import main
    hi = str(tmp_path / "hi.mov")
    lo = str(tmp_path / "lo.mov")
    for q, path in (("2", hi), ("31", lo)):
        rc = main(["-i", clip, "-vf", "scale=160:120", "-o", path,
                   "-c:v", "mjpeg_tpu", "-q:v", q, "-frames", "4",
                   "-batch", "4"])
        assert rc == 0
    assert os.path.getsize(hi) > os.path.getsize(lo)


def test_cli_mjpeg_tpu_optimize(clip, tmp_path):
    # -enc-param optimize=1: per-image optimal Huffman tables on the
    # device-assisted lane — smaller track, still a decodable MJPEG
    from gmat_tpu.apps.cli import main
    plain = str(tmp_path / "plain.mov")
    opt = str(tmp_path / "opt.mov")
    for path, extra in ((plain, []), (opt, ["-enc-param", "optimize=1"])):
        rc = main(["-i", clip, "-vf", "scale=160:120", "-o", path,
                   "-c:v", "mjpeg_tpu", "-q:v", "90", "-frames", "6",
                   "-batch", "6"] + extra)
        assert rc == 0
    assert os.path.getsize(opt) < os.path.getsize(plain)
    assert len(decode_all(opt)) == 6


def test_cli_hwaccel_tpu_mjpeg_decode(clip, tmp_path):
    # -hwaccel tpu: MJPEG input decodes through the device JPEG lane
    # (batched entropy + jitted MXU IDCT); output within 2 LSB of the
    # software-decode path (independent IDCTs), -hwaccel cuda stays the
    # software no-op for pasted reference command lines
    import numpy as np
    from gmat_tpu.apps.cli import main
    from gmat_tpu.av.rawvideo import Y4MReader
    mj = str(tmp_path / "in.mov")
    rc = main(["-i", clip, "-o", mj, "-c:v", "mjpeg_tpu", "-q:v", "90",
               "-frames", "6", "-batch", "6"])
    assert rc == 0
    hw, sw = str(tmp_path / "hw.y4m"), str(tmp_path / "sw.y4m")
    assert main(["-hwaccel", "tpu", "-i", mj, "-vf", "scale=80:60",
                 "-o", hw, "-batch", "3"]) == 0
    assert main(["-hwaccel", "cuda", "-i", mj, "-vf", "scale=80:60",
                 "-o", sw, "-batch", "3"]) == 0
    ra, rb = Y4MReader(hw), Y4MReader(sw)
    fa, fb_ = list(ra.frames()), list(rb.frames())
    ra.close(); rb.close()
    assert len(fa) == len(fb_) == 6
    for x, y in zip(fa, fb_):
        assert np.abs(x[0].astype(int) - y[0].astype(int)).max() <= 2


def test_cli_heic_still_sink(clip, tmp_path):
    # .heic output: graph frames -> HEVC stills (NvHeifWriter app lane)
    import numpy as np
    from gmat_tpu.apps.cli import main
    from gmat_tpu.av import heif
    pat = str(tmp_path / "out_%d.heic")
    rc = main(["-i", clip, "-vf", "scale=96:64", "-o", pat,
               "-frames", "3", "-batch", "3", "-crf", "18"])
    assert rc == 0
    import os
    for i in range(3):
        y, u, v = heif.decode_still(pat % i)
        assert y.shape == (64, 96) and u.shape == (32, 48)
    assert not os.path.exists(pat % 3)


def test_metrans_fps_filter_and_key_select(clip, tmp_path):
    """Review fixes: an fps-decimating filter yields a RATIONAL encoder
    rate (float numerators crashed gav_enc_create), and key/time-based
    selects get real metadata (keys arrived as None -> zero output)."""
    from gmat_tpu.apps.metrans import Options, Rung, run_session
    opts = Options(input_file=clip, rungs=[
        Rung(96, 64, filter_desc="fps=15",
             out_file=str(tmp_path / "half_#.mp4")),
        Rung(96, 64, filter_desc="select=eq(key\\,1)",
             out_file=str(tmp_path / "keys_#.mp4")),
    ], video_enc_param="codec=h264:preset=p1:constqp=25")
    res = run_session(0, opts, batch=16)
    assert res["frames_in"] == NFRAMES
    half = decode_all(str(tmp_path / "half_0.mp4"))
    keys = decode_all(str(tmp_path / "keys_0.mp4"))
    assert len(half) == NFRAMES // 2
    # the clip's GOP structure yields >=1 keyframe and far fewer than all
    assert 1 <= len(keys) < NFRAMES // 2


def test_audio_stream_empty_first_push():
    # review fix: an empty first block must not poison the buffer
    import numpy as np
    from gmat_tpu.av.audio_filters import AresampleStream, AtempoStream
    at = AtempoStream(48000, 2.0)
    empty = np.zeros((0, 0), np.int16)
    out = at.push(empty)
    assert out.size == 0
    x = (np.random.default_rng(0).integers(-3000, 3000, (4096, 2))
         .astype(np.int16))
    at.push(x)
    rs = AresampleStream(48000, 44100)
    rs.push(empty)
    y = rs.push(x)
    assert y.shape[1] == 2 and len(y) > 0


def test_cli_device_codec_roundtrip_chain(clip, tmp_path):
    """Cross-feature integration: mjpeg_tpu ENCODE (optimized tables)
    -> -hwaccel tpu device DECODE -> filter graph -> .heic stills with
    metadata -> decode + verify.  Exercises the whole device-codec
    surface in one chain."""
    import numpy as np
    from gmat_tpu.apps.cli import main
    from gmat_tpu.av import heif, jpeg_tpu

    mj = str(tmp_path / "mid.mov")
    rc = main(["-i", clip, "-vf", "scale=128:96", "-o", mj,
               "-c:v", "mjpeg_tpu", "-q:v", "92",
               "-enc-param", "optimize=1", "-frames", "6", "-batch", "6"])
    assert rc == 0
    # device decode -> crop+flip -> HEIC stills
    pat = str(tmp_path / "s_%02d.heic")
    rc = main(["-hwaccel", "tpu", "-i", mj,
               "-vf", "crop=96:64,hflip", "-o", pat,
               "-frames", "4", "-batch", "2", "-crf", "16"])
    assert rc == 0
    for i in range(4):
        y, u, v = heif.decode_still(pat % i)
        assert y.shape == (64, 96)
    import os
    assert not os.path.exists(pat % 4)
    # the same frames through the software path agree within JPEG+HEVC
    # lossy tolerance
    sw = str(tmp_path / "w_%02d.heic")
    rc = main(["-i", mj, "-vf", "crop=96:64,hflip", "-o", sw,
               "-frames", "4", "-batch", "2", "-crf", "16"])
    assert rc == 0
    for i in range(4):
        a, _, _ = heif.decode_still(pat % i)
        b, _, _ = heif.decode_still(sw % i)
        assert np.abs(a.astype(int) - b.astype(int)).mean() < 3.0


def test_cli_jpeg_sink_honors_qscale(tmp_path):
    # ffmpeg image2 parity: -q:v controls the .jpg still sink quality
    # (textured input — flat frames compress to DC-only at any q)
    import os
    import numpy as np
    from gmat_tpu.apps.cli import main
    src = str(tmp_path / "in.y4m")
    rng = np.random.default_rng(0)
    with open(src, "wb") as f:
        f.write(b"YUV4MPEG2 W160 H120 F30:1 Ip A1:1 C420jpeg\n")
        for i in range(2):
            f.write(b"FRAME\n")
            f.write(rng.integers(0, 256, 160 * 120, dtype=np.uint8)
                    .tobytes())
            f.write(np.full(80 * 60 * 2, 128, np.uint8).tobytes())
    hi = str(tmp_path / "hi_%d.jpg")
    lo = str(tmp_path / "lo_%d.jpg")
    assert main(["-i", src, "-o", hi, "-q:v", "2",
                 "-frames", "2", "-batch", "2"]) == 0
    assert main(["-i", src, "-o", lo, "-q:v", "31",
                 "-frames", "2", "-batch", "2"]) == 0
    assert os.path.getsize(hi % 0) > os.path.getsize(lo % 0) * 1.2
