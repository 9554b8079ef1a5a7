"""Logger / tracing / perf harness / torch interop tests."""
import json
import socket

import numpy as np
import pytest


def test_logger_console_and_file(tmp_path, capsys):
    from gmat_tpu.utils import logger
    f = str(tmp_path / "log.txt")
    logger.setup(level=logger.TRACE, console=False, file=f)
    logger.trace("hello %d", 42)
    logger.error("bad thing")
    text = open(f).read()
    assert "hello 42" in text and "TRACE" in text
    assert "bad thing" in text and "ERROR" in text


def test_logger_udp(tmp_path):
    from gmat_tpu.utils import logger
    sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    sock.bind(("127.0.0.1", 0))
    sock.settimeout(2.0)
    port = sock.getsockname()[1]
    logger.setup(console=False, udp=("127.0.0.1", port))
    logger.info("over the wire")
    data = sock.recv(4096).decode()
    assert "over the wire" in data
    logger.setup(console=False)   # reset


def test_tracing_range_and_timer():
    import jax.numpy as jnp
    from gmat_tpu.utils.tracing import device_timer, trace_range
    with trace_range("Frame#0"):
        x = jnp.ones((8, 8)) * 2
    with device_timer("op", sync=lambda: x) as t:
        y = x + 1
    assert t["seconds"] is not None and t["seconds"] >= 0


def test_compile_cache_enable(tmp_path):
    from gmat_tpu.utils.compile_cache import enable
    d = enable(str(tmp_path / "cache"))
    import os
    assert os.path.isdir(d)


def test_perf_encode_and_ladder(capsys):
    from gmat_tpu.apps.perf import main
    assert main(["encode", "-frames", "12", "-width", "160",
                 "-height", "128"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["fps"] > 0
    assert main(["jpeg", "-frames", "8", "-width", "160",
                 "-height", "128"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["encode_fps"] > 0 and out["decode_fps"] > 0


def test_perf_extract(tmp_path, capsys):
    from gmat_tpu.apps.perf import main
    from .test_extractor import make_clip
    clip = str(tmp_path / "c.mp4")
    make_clip(clip)
    assert main(["extract", "-i", clip, "-interval", "10"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["fast"]["decoded"] < out["normal"]["decoded"]


def test_torch_interop(tmp_path):
    torch = pytest.importorskip("torch")
    from gmat_tpu.av.torch_interop import extract_to_torch, jax_to_torch, torch_to_jax
    import jax.numpy as jnp
    x = jnp.arange(12.0).reshape(3, 4)
    t = jax_to_torch(x)
    assert t.shape == (3, 4) and float(t.sum()) == 66.0
    back = torch_to_jax(t)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))

    from .test_extractor import make_clip
    clip = str(tmp_path / "t.mp4")
    make_clip(clip)
    got = list(extract_to_torch(clip, frame_interval=20, out_size=(64, 48),
                                batch=2))
    assert len(got) >= 1
    tensor, pts = got[0]
    assert tuple(tensor.shape) == (2, 3, 48, 64)
    assert tensor.dtype == torch.float32


def test_bindings_facade(tmp_path):
    from gmat_tpu.bindings import FrameExtractor, HeifFormat, Swscale
    from .test_extractor import make_clip
    clip = str(tmp_path / "b.mp4")
    make_clip(clip)
    fx = FrameExtractor(clip)
    fx.set_frame_interval(20)
    buf = fx.extract_to_buffer()
    assert buf.shape == (240 * 3 // 2, 320)
    dev = fx.extract_to_device_buffer(size=(64, 48))
    assert dev.shape == (3, 48, 64)
    fx.close()

    h = HeifFormat(crf=18.0)
    y = np.full((64, 64), 120, np.uint8)
    u = np.full((32, 32), 100, np.uint8)
    v = np.full((32, 32), 150, np.uint8)
    blob = h.encode(y, u, v)
    y2, u2, v2 = h.decode(blob)
    assert np.abs(y2.astype(int) - 120).mean() < 3

    sw = Swscale(64, 48)
    nv12 = np.random.default_rng(0).integers(0, 256, (72, 64)).astype(np.uint8)
    rgb = sw.nv12_to_rgbpf32(nv12.tobytes())
    assert rgb.shape == (3, 48, 64)


def test_extract_app_and_image_provider(tmp_path, capsys):
    from gmat_tpu.apps.extract import main
    from gmat_tpu.bindings import ImageProvider
    from .test_extractor import make_clip
    clip = str(tmp_path / "e.mp4")
    make_clip(clip)
    out = str(tmp_path / "f_%d.jpg")
    assert main(["-i", clip, "-interval", "20", "-o", out]) == 0
    import os
    assert os.path.exists(str(tmp_path / "f_0.jpg"))
    assert os.path.exists(str(tmp_path / "f_2.jpg"))
    # y4m sink
    assert main(["-i", clip, "-interval", "20",
                 "-o", str(tmp_path / "e.y4m")]) == 0
    ip = ImageProvider(clip, "bgra64")
    img = ip.get_next()
    assert img.shape == (240, 320, 4) and img.dtype == np.uint16
    ip.close()


def test_fps_limiter_batched():
    import time
    from gmat_tpu.utils.stopwatch import FpsLimiter
    lim = FpsLimiter(fps=100.0)
    t0 = time.perf_counter()
    for _ in range(3):
        lim.tick(10)       # 30 frames at 100 fps -> >= ~0.2s
    dt = time.perf_counter() - t0
    assert dt >= 0.15


def test_encparam_constqp_with_cli_placeholder():
    """rc=constqp must not be neutralized by the CLI's crf=-1.0 'unset'
    placeholder in defaults."""
    from gmat_tpu.utils.encparam import parse_enc_param
    out = parse_enc_param("codec=hevc:rc=constqp", {"crf": -1.0})
    assert out["crf"] == 23.0
    # explicit constqp value wins
    out = parse_enc_param("codec=hevc:constqp=30:rc=constqp", {"crf": -1.0})
    assert out["crf"] == 30.0


def test_encparam_fractional_fps_and_vbvinit():
    from gmat_tpu.utils.encparam import parse_enc_param
    out = parse_enc_param("fps=29.97")
    assert out["fps"] == (29970, 1000)
    out = parse_enc_param("bitrate=2M:maxbitrate=2M:vbvbufsize=4M:vbvinit=2M")
    assert "rc_init_occupancy=2000000" in out["opts"]


def test_encparam_layered_opts_merge():
    """Review fix: a rung suffix parse must MERGE the defaults' opts
    string (VBV/maxrate caps), not overwrite it; same-key overrides
    still win."""
    from gmat_tpu.utils.encparam import parse_enc_param
    base = parse_enc_param(
        "codec=h264:bitrate=4M:maxbitrate=6M:vbvbufsize=8M")
    assert "maxrate=6000000" in base["opts"]
    kw = parse_enc_param("bitrate=2M:qmin=16", dict(base))
    assert kw["bitrate"] == 2000000
    assert "maxrate=6000000" in kw["opts"]
    assert "bufsize=8000000" in kw["opts"]
    assert "qmin=16" in kw["opts"]
    # same-key override wins
    kw2 = parse_enc_param("maxbitrate=3M", dict(base))
    assert kw2["opts"].count("maxrate=") == 1
    assert "maxrate=3000000" in kw2["opts"]


def test_encparam_quality_knobs_h264():
    """lookahead/aq/temporalaq map to libx264 rc-lookahead/aq-mode+
    aq-strength/mbtree (NvEncoderParam.h:152,158,162-165)."""
    from gmat_tpu.utils.encparam import parse_enc_param
    out = parse_enc_param("codec=h264:lookahead=25:aq=8:temporalaq")
    assert "rc-lookahead=25" in out["opts"]
    assert "aq-mode=1" in out["opts"]
    assert "aq-strength=1.25" in out["opts"]     # NVENC 8/15 -> x264 1.25
    assert "mbtree=1" in out["opts"]


def test_encparam_quality_knobs_hevc_via_x265_params():
    """libx265 exposes few AVOptions: the knobs ride x265-params."""
    from gmat_tpu.utils.encparam import parse_enc_param
    out = parse_enc_param("codec=hevc:lookahead=30:aq=1:temporalaq")
    assert "x265-params=" in out["opts"]
    p = [e for e in out["opts"].split(",") if e.startswith("x265-params=")][0]
    sub = p.split("=", 1)[1]
    assert "rc-lookahead=30" in sub
    assert "aq-mode=1" in sub and "aq-strength=0.50" in sub
    assert "aq-motion=1" in sub


def test_encparam_x265_params_layered_merge():
    """A rung's aq must not clobber the base parse's x265-params
    rc-lookahead (sub-option-level merge)."""
    from gmat_tpu.utils.encparam import parse_enc_param
    base = parse_enc_param("codec=hevc:lookahead=40")
    rung = parse_enc_param("aq=15", base)
    p = [e for e in rung["opts"].split(",")
         if e.startswith("x265-params=")][0].split("=", 1)[1]
    assert "rc-lookahead=40" in p and "aq-strength=2.00" in p


def test_quality_knobs_reach_the_encoder_bitstream(tmp_path):
    """x264/x265 write their full option string into an info SEI; encode a
    few frames and assert the knobs arrived (VERDICT r3 item 4)."""
    import numpy as np
    from gmat_tpu.av import toolkit as tk
    from gmat_tpu.utils.encparam import parse_enc_param

    w, h = 192, 128
    rng = np.random.default_rng(7)
    frames = [(rng.integers(0, 256, (h, w)).astype(np.uint8),
               rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8),
               rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8))
              for _ in range(3)]

    kw = parse_enc_param("codec=h264:lookahead=25:aq=8:preset=p3")
    enc = tk.Encoder(kw.pop("codec_name"), w, h, fps=(30, 1),
                     preset=kw.get("preset", "veryfast"),
                     opts=kw.get("opts", ""))
    blob = b""
    for i, (y, u, v) in enumerate(frames):
        for p in enc.encode(y, u, v, pts=i):
            blob += bytes(p.data if hasattr(p, "data") else p)
    for p in enc.flush():
        blob += bytes(p.data if hasattr(p, "data") else p)
    blob += bytes(enc.extradata() or b"")   # GLOBAL_HEADER: SEI may sit here
    enc.close()
    assert b"rc_lookahead=25" in blob       # x264 SEI option dump
    assert b"aq=1:1.25" in blob
    assert b"mbtree=1" in blob or b"mbtree=0" in blob  # present either way

    kw = parse_enc_param("codec=hevc:lookahead=20:aq=8:preset=p3")
    enc = tk.Encoder(kw.pop("codec_name"), w, h, fps=(30, 1),
                     preset=kw.get("preset", "veryfast"),
                     opts=kw.get("opts", ""))
    blob = b""
    for i, (y, u, v) in enumerate(frames):
        for p in enc.encode(y, u, v, pts=i):
            blob += bytes(p.data if hasattr(p, "data") else p)
    for p in enc.flush():
        blob += bytes(p.data if hasattr(p, "data") else p)
    blob += bytes(enc.extradata() or b"")   # x265 info SEI rides extradata
    enc.close()
    assert b"rc-lookahead=20" in blob       # x265 SEI option dump
    assert b"aq-mode=1" in blob and b"aq-strength=1.25" in blob


def test_encparam_aq_zero_is_autoselect():
    """NVENC aqStrength 0 = autoselect (NvEncoderParam.h:162-165): AQ is
    enabled but the encoder's default strength is kept — no
    aq-strength override (review r4)."""
    from gmat_tpu.utils.encparam import parse_enc_param
    out = parse_enc_param("codec=h264:aq=0")
    assert "aq-mode=1" in out["opts"]
    assert "aq-strength" not in out["opts"]
    out = parse_enc_param("codec=hevc:aq=0")
    assert "aq-mode=1" in out["opts"]
    assert "aq-strength" not in out["opts"]
