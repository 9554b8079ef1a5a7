"""Filter graph, expression engine, and infer filter tests."""
import numpy as np
import pytest

import jax.numpy as jnp

from gmat_tpu.core.frame import FrameBatch, from_numpy_rgb, from_numpy_yuv420
from gmat_tpu.filters.expr import compile_expr
from gmat_tpu.filters.graph import FilterGraph, parse_graph
from gmat_tpu.filters.builtin import FilterError


def yuv_batch(rng, n=4, h=64, w=96):
    y = rng.integers(0, 256, (n, h, w)).astype(np.uint8)
    u = rng.integers(0, 256, (n, h // 2, w // 2)).astype(np.uint8)
    v = rng.integers(0, 256, (n, h // 2, w // 2)).astype(np.uint8)
    return from_numpy_yuv420(y, u, v)


# ---- expression engine ------------------------------------------------------

def test_expr_arith():
    e = compile_expr("1+2*3-4/2")
    assert e({}) == 5.0


def test_expr_vars_and_funcs():
    e = compile_expr("gt(scene,0.4)")
    assert e({"scene": 0.5}) == 1.0
    assert e({"scene": 0.3}) == 0.0
    e = compile_expr("if(gt(n,10), 1, 0)*between(t, 0, 5)")
    assert e({"n": 11, "t": 3}) == 1.0
    assert e({"n": 11, "t": 6}) == 0.0
    e = compile_expr("not(mod(n,5))")
    assert e({"n": 10}) == 1.0 and e({"n": 11}) == 0.0


def test_expr_errors():
    with pytest.raises(ValueError):
        compile_expr("nosuchfn(1)")
    with pytest.raises(ValueError):
        compile_expr("1+")
    e = compile_expr("undefined_var")
    with pytest.raises(ValueError, match="unknown variable"):
        e({})


# ---- parser ----------------------------------------------------------------

def test_parse_graph_positional_and_kv():
    chain = parse_graph("scale=640:360,crop=w=100:h=80:x=0:y=0,"
                        "rotate=angle=45,select='gt(scene\\,0.4)'")
    assert [c[0] for c in chain] == ["scale", "crop", "rotate", "select"]
    assert chain[0][1] == {"w": "640", "h": "360"}
    assert chain[3][1] == {"expr": "gt(scene,0.4)"}


def test_parse_graph_unknown_filter():
    with pytest.raises(FilterError):
        parse_graph("nosuchfilter=1")


# ---- execution --------------------------------------------------------------

def test_graph_scale_crop_format(rng):
    fb = yuv_batch(rng)
    g = FilterGraph("scale=48:32,crop=w=32:h=32,format=rgbpf32le")
    out, keep = g.process(fb)
    assert out.format == "rgbpf32"
    assert out.planes["rgb"].shape == (4, 32, 32, 3)
    assert keep.all()


def test_graph_gmat_names(rng):
    fb = yuv_batch(rng)
    g = FilterGraph("scale_npp=48:32,crop_nvcv=32:32,flip_nvcv=1,"
                    "smooth_nvcv=gaussian:3:3")
    out, keep = g.process(fb)
    assert out.width == 32 and out.height == 32


def test_graph_select_every_other(rng):
    fb = yuv_batch(rng, n=8)
    g = FilterGraph("select=not(mod(n\\,2))")
    out, keep = g.process(fb)
    assert keep.tolist() == [True, False] * 4
    # state carries across batches
    out, keep = g.process(fb)
    assert keep.tolist() == [True, False] * 4


def test_graph_fps_decimation(rng):
    fb = yuv_batch(rng, n=8)
    g = FilterGraph("fps=15", src_fps=30.0)
    _, keep = g.process(fb)
    assert keep.sum() == 4


def test_graph_valid_mask(rng):
    fb = yuv_batch(rng, n=8)
    g = FilterGraph("null")
    _, keep = g.process(fb, valid=5)
    assert keep.tolist() == [True] * 5 + [False] * 3


def test_infer_sr_rgb(rng):
    fb = yuv_batch(rng, n=2, h=32, w=32)
    g = FilterGraph("format=rgbpf32le:255,tensorrt=sr2x")
    out, _ = g.process(fb)
    assert out.format == "rgbpf32"
    assert out.planes["rgb"].shape == (2, 64, 64, 3)
    vals = np.asarray(out.planes["rgb"])
    assert 0.0 <= vals.min() and vals.max() <= 1.0


def test_infer_luma_only(rng):
    fb = yuv_batch(rng, n=2, h=32, w=32)
    g = FilterGraph("infer=sr2x:luma_only=1")
    out, _ = g.process(fb)
    assert out.format == "yuv420p"
    assert out.planes["y"].shape == (2, 64, 64)
    assert out.planes["u"].shape == (2, 32, 32)


def test_infer_retrace_two_batch_sizes(rng):
    # the infer segment runs under FilterGraph's jit; a second batch size
    # forces a retrace — the bf16 param-cast tree must be concrete
    # (built in __init__), not tracers cached from the first trace
    g = FilterGraph("infer=sr2x:luma_only=1")
    for n in (2, 3):
        out, _ = g.process(yuv_batch(rng, n=n, h=32, w=32))
        assert out.planes["y"].shape == (n, 64, 64)


def test_infer_bf16_matches_fp32(rng):
    # bf16 stores activations half-size but must ACCUMULATE in f32
    # (preferred_element_type) — bf16 accumulation over the conv fan-ins
    # compounds to double-digit LSB error
    fb = yuv_batch(rng, n=2, h=32, w=32)
    o32, _ = FilterGraph("infer=sr2x:luma_only=1:precision=fp32").process(fb)
    o16, _ = FilterGraph("infer=sr2x:luma_only=1").process(fb)
    d = np.abs(np.asarray(o32.planes["y"]).astype(int)
               - np.asarray(o16.planes["y"]).astype(int))
    assert d.max() <= 8 and d.mean() <= 1.0


def test_infer_pose_passthrough(rng):
    from gmat_tpu.filters.builtin import FILTERS
    fb = yuv_batch(rng, n=2, h=120, w=120)
    filt = FILTERS["infer"](model="pose")
    out = filt(fb)
    assert out is fb
    assert filt.last_output.shape == (2, 62)


def test_chromakey(rng):
    rgb = np.zeros((1, 8, 8, 3), np.uint8)
    rgb[0, :4] = [0, 255, 0]       # green half
    rgb[0, 4:] = [200, 20, 30]
    fb = from_numpy_rgb(rgb)
    g = FilterGraph("chromakey=00FF00:0.2")
    out, _ = g.process(fb)
    a = np.asarray(out.planes["rgb"])[0, :, :, 3]
    assert (a[:4] == 0).all() and (a[4:] == 255).all()


def test_overlay_jpeg(tmp_path, rng):
    from gmat_tpu.av.jpeg import encode_rgb_to_jpeg
    logo = np.full((16, 16, 3), [255, 0, 0], np.uint8)
    p = tmp_path / "logo.jpg"
    p.write_bytes(encode_rgb_to_jpeg(logo))
    fb = yuv_batch(rng, n=2)
    g = FilterGraph(f"format=rgb24,overlay=path={p}:x=4:y=4")
    out, _ = g.process(fb)
    patch = np.asarray(out.planes["rgb"])[0, 4:20, 4:20]
    assert patch[..., 0].mean() > 200 and patch[..., 1].mean() < 60


def test_jpeg_roundtrip(rng):
    from gmat_tpu.av.jpeg import decode_jpeg_to_rgb, encode_rgb_to_jpeg
    xx = np.linspace(0, 255, 64)[None, :]
    yy = np.linspace(0, 255, 64)[:, None]
    rgb = np.stack([xx + 0 * yy, 0 * xx + yy, 0.5 * (xx + yy)], -1).astype(np.uint8)
    data = encode_rgb_to_jpeg(rgb, quality=2)
    back = decode_jpeg_to_rgb(data)
    assert back.shape == rgb.shape
    assert np.abs(back.astype(int) - rgb.astype(int)).mean() < 6.0


def test_thumbnail(rng):
    fb = yuv_batch(rng, n=8)
    g = FilterGraph("thumbnail=4")
    _, keep = g.process(fb)
    assert keep.sum() == 2   # one per window of 4


def test_select_selected_n_vars(rng):
    fb = yuv_batch(rng, n=8)
    g = FilterGraph("select=lt(selected_n\\,3)")
    _, keep = g.process(fb)
    assert keep.tolist() == [True] * 3 + [False] * 5
    # state persists: nothing more selected in the next batch
    _, keep = g.process(fb)
    assert keep.sum() == 0


def test_transpose_swaps_dimensions(rng):
    rgb = rng.integers(0, 256, (1, 16, 32, 3)).astype(np.uint8)
    fb = from_numpy_rgb(rgb)
    for d, want in ((0, np.swapaxes(rgb, 1, 2)),
                    (1, np.rot90(rgb, -1, axes=(1, 2))),
                    (2, np.rot90(rgb, 1, axes=(1, 2))),
                    (3, np.swapaxes(rgb, 1, 2)[:, ::-1, ::-1])):
        out, _ = FilterGraph(f"transpose={d}").process(fb)
        assert out.width == 16 and out.height == 32
        np.testing.assert_array_equal(np.asarray(out.planes["rgb"]), want)


def test_transpose_named_dirs_and_passthrough(rng):
    """transpose_npp named dir constants + passthrough geometry gates
    (vf_transpose_npp.c:428-439, 257-259)."""
    rgb = rng.integers(0, 256, (1, 16, 32, 3)).astype(np.uint8)   # landscape
    fb = from_numpy_rgb(rgb)
    yuv = from_numpy_yuv420(
        rng.integers(0, 256, (1, 16, 32)).astype(np.uint8),
        rng.integers(0, 256, (1, 8, 16)).astype(np.uint8),
        rng.integers(0, 256, (1, 8, 16)).astype(np.uint8))
    for name, num in (("cclock_flip", 0), ("clock", 1),
                      ("cclock", 2), ("clock_flip", 3)):
        a, _ = FilterGraph(f"transpose_npp={name}").process(yuv)
        b, _ = FilterGraph(f"transpose={num}").process(yuv)
        for pl in ("y", "u", "v"):
            np.testing.assert_array_equal(np.asarray(a.planes[pl]),
                                          np.asarray(b.planes[pl]))
    # landscape passthrough on a w>h frame: untouched, dims keep W x H
    out, _ = FilterGraph("transpose=clock:landscape").process(fb)
    assert (out.width, out.height) == (32, 16)
    np.testing.assert_array_equal(np.asarray(out.planes["rgb"]), rgb)
    # portrait passthrough does NOT trigger on landscape input
    out2, _ = FilterGraph("transpose=clock:portrait").process(fb)
    assert (out2.width, out2.height) == (16, 32)
    # square frames satisfy both gates (w>=h and w<=h)
    sq = from_numpy_rgb(rng.integers(0, 256, (1, 8, 8, 3)).astype(np.uint8))
    for pt in ("landscape", "portrait"):
        o, _ = FilterGraph(f"transpose=clock:{pt}").process(sq)
        np.testing.assert_array_equal(np.asarray(o.planes["rgb"]),
                                      np.asarray(sq.planes["rgb"]))
    with pytest.raises(FilterError, match="passthrough"):
        FilterGraph("transpose=clock:sideways")
    with pytest.raises(FilterError, match="dir"):
        FilterGraph("transpose=rot180")


def test_transpose_npp_format_gate(rng):
    """transpose_npp enforces supported_formats (vf_transpose_npp.c:37-40)
    like the reference; generic transpose stays format-agnostic; the
    passthrough short-circuit precedes the gate (config_props returns at
    :258-269 before init_processing_chain's format check at :196)."""
    rgb = rng.integers(0, 256, (1, 16, 32, 3)).astype(np.uint8)
    fb = from_numpy_rgb(rgb)
    with pytest.raises(FilterError, match="yuv420p/yuv444p"):
        FilterGraph("transpose_npp=clock").process(fb)
    # generic transpose on the same input is fine
    out, _ = FilterGraph("transpose=clock").process(fb)
    assert (out.width, out.height) == (16, 32)
    # passthrough-on-unsupported-format passes through, like the reference
    o2, _ = FilterGraph("transpose_npp=clock:landscape").process(fb)
    np.testing.assert_array_equal(np.asarray(o2.planes["rgb"]), rgb)


def _sharpen_oracle(plane):
    """Independent NPP FilterSharpen math: 3x3 (-1,...,16,...,-1)/8,
    replicate border, round-half-even, saturate to u8 — scalar loops,
    no shared code with the filter."""
    h, w = plane.shape
    p = plane.astype(np.int64)
    out = np.empty_like(plane)
    for y in range(h):
        for x in range(w):
            acc = 0
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    yy = min(max(y + dy, 0), h - 1)
                    xx = min(max(x + dx, 0), w - 1)
                    k = 16 if (dy == 0 and dx == 0) else -1
                    acc += k * p[yy, xx]
            v = float(np.float32(acc) * np.float32(0.125))
            r = np.rint(v)               # numpy rint = half-even
            out[y, x] = min(max(int(r), 0), 255)
    return out


def test_sharpen_npp_oracle(rng):
    y = rng.integers(0, 256, (2, 12, 14)).astype(np.uint8)
    u = rng.integers(0, 256, (2, 6, 7)).astype(np.uint8)
    v = rng.integers(0, 256, (2, 6, 7)).astype(np.uint8)
    fb = from_numpy_yuv420(y, u, v)
    out, _ = FilterGraph("sharpen_npp").process(fb)
    for name, src in (("y", y), ("u", u), ("v", v)):
        got = np.asarray(out.planes[name])
        for i in range(2):
            np.testing.assert_array_equal(got[i], _sharpen_oracle(src[i]),
                                          err_msg=f"plane {name}[{i}]")
    # flat regions are fixed points (16c - 8c = 8c, /8 = c)
    flat = from_numpy_yuv420(*(np.full(s, 77, np.uint8) for s in
                               ((1, 8, 8), (1, 4, 4), (1, 4, 4))))
    o2, _ = FilterGraph("sharpen_npp=replicate").process(flat)
    assert np.all(np.asarray(o2.planes["y"]) == 77)
    # format gate + border option gate
    rgb = from_numpy_rgb(rng.integers(0, 256, (1, 8, 8, 3)).astype(np.uint8))
    with pytest.raises(FilterError, match="yuv420p/yuv444p"):
        FilterGraph("sharpen_npp").process(rgb)
    with pytest.raises(FilterError, match="border"):
        FilterGraph("sharpen_npp=reflect")


def test_infer_denoise_luma(rng):
    """denoise model in the reference's luma-only IO mode: same dims,
    chroma passthrough untouched."""
    fb = yuv_batch(rng, n=2, h=32, w=32)
    g = FilterGraph("infer=denoise:luma_only=1")
    out, _ = g.process(fb)
    assert out.format == "yuv420p"
    assert out.planes["y"].shape == (2, 32, 32)
    np.testing.assert_array_equal(np.asarray(out.planes["u"]),
                                  np.asarray(fb.planes["u"]))


def test_infer_denoise_rgb(rng):
    fb = yuv_batch(rng, n=1, h=32, w=32)
    g = FilterGraph("format=rgbpf32le,infer=denoise")
    out, _ = g.process(fb)
    assert out.planes["rgb"].shape == (1, 32, 32, 3)
    vals = np.asarray(out.planes["rgb"])
    assert 0.0 <= vals.min() and vals.max() <= 1.0


def test_thumbnail_spans_batches(rng):
    from gmat_tpu.filters.builtin import ThumbnailFilter
    filt = ThumbnailFilter(n=10)
    total = 0
    for _ in range(5):                     # 5 batches of 4 = 20 frames
        fb = yuv_batch(rng, n=4)
        out, meta = filt.process_batch(
            fb, {"pts": None, "times": None, "keys": None,
                 "keep": np.ones(4, bool)})
        total += out.batch
    assert total == 2                      # 20 frames / window 10
    assert filt.flush() is None            # no open window left


def test_select_extended_vars(rng):
    """start_t / prev_t / pict_type / pos vars (vf_select_cuda.c:53-100)."""
    fb = yuv_batch(rng, n=6)
    pts = np.arange(100, 700, 100, np.int64)
    times = pts / 1000.0
    keys = np.array([1, 0, 0, 1, 0, 0], np.float64)
    # keep frames more than 0.25s after the stream start
    g = FilterGraph("select=gt(t-start_t\\,0.25)")
    _, keep = g.process(fb, pts=pts, times=times, keys=keys)
    assert keep.tolist() == [False, False, False, True, True, True]
    # keyframes only, via pict_type constant
    g = FilterGraph("select=eq(pict_type\\,I)")
    _, keep = g.process(fb, pts=pts, times=times, keys=keys)
    assert keep.tolist() == [True, False, False, True, False, False]
    # prev_t: keep frames at least 0.15s after the previous frame
    g = FilterGraph("select=if(isnan(prev_t)\\,1\\,gte(t-prev_t\\,0.05))")
    _, keep = g.process(fb, pts=pts, times=times, keys=keys)
    assert keep.all()
    # pos is NaN (unknown byte position), like ffmpeg
    g = FilterGraph("select=isnan(pos)")
    _, keep = g.process(fb, pts=pts, times=times, keys=keys)
    assert keep.all()


def test_select_pos_variable_real(rng, tmp_path):
    """pos carries real packet byte offsets end-to-end (demux -> ingest
    -> graph -> select expr)."""
    from gmat_tpu.av import toolkit as tk
    from gmat_tpu.av.ingest import decode_stream
    from .test_extractor import make_clip
    clip = str(tmp_path / "p.mp4")
    make_clip(clip)
    # ground truth: pts -> byte offset from the demuxer
    dm = tk.Demuxer(clip)
    pos_by_pts = {p.pts: p.pos for p in dm if p.stream == 0}
    dm.close()
    assert all(v >= 0 for v in pos_by_pts.values())
    g = FilterGraph("select=not(isnan(pos))")
    src = decode_stream(clip, batch=16)
    seen = 0
    for fb, pts, valid in src:
        poss = src.last_pos
        _, keep = g.process(fb, pts=pts, valid=valid, pos=poss)
        assert keep[:valid].all()          # every real frame has a pos
        for i in range(valid):
            assert poss[i] == pos_by_pts[int(pts[i])]
        seen += int(valid)
    assert seen == 60


def test_scale_aspect_preserving(rng):
    """ffmpeg's scale=-1:H / W:-2 placeholders."""
    fb = yuv_batch(rng, n=1, h=64, w=96)        # 3:2 aspect
    out, _ = FilterGraph("scale=-1:32").process(fb)
    assert (out.width, out.height) == (48, 32)
    out, _ = FilterGraph("scale=48:-2").process(fb)
    assert (out.width, out.height) == (48, 32)
    # odd ideal width rounds to even for yuv
    fb2 = yuv_batch(rng, n=1, h=50, w=70)        # 1.4 aspect
    out, _ = FilterGraph("scale=-2:32").process(fb2)
    assert out.height == 32 and out.width % 2 == 0
    with pytest.raises(FilterError):
        FilterGraph("scale=-1:-1")


def test_expr_math_functions():
    """av_expr math set: sin/cos/pow/sqrt/clip/... + PI/E constants."""
    import math
    e = compile_expr("sin(PI/2)+cos(0)")
    assert abs(e({}) - 2.0) < 1e-9
    e = compile_expr("pow(2,10)+sqrt(16)")
    assert e({}) == 1028.0
    e = compile_expr("clip(n,0,10)")
    assert e({"n": 42}) == 10.0 and e({"n": -3}) == 0.0
    e = compile_expr("sgn(-5)+trunc(3.9)")
    assert e({}) == 2.0
    # env vars shadow constants; unknown names still KeyError
    e = compile_expr("PI")
    assert e({"PI": 3.0}) == 3.0
    with pytest.raises(ValueError, match="unknown variable"):
        compile_expr("NOPE")({})
    # the reference-doc style animated position works
    e = compile_expr("mw/2+mw/4*sin(n/10*PI)")
    v = e({"mw": 1920.0, "n": 5.0})
    assert 960 < v <= 1440


def test_infer_classify(rng):
    """classify model: the canonical ladder->model content-tagging chain
    (224x224 NCHW in, logits out, frames pass through)."""
    fb = yuv_batch(rng, n=2, h=224, w=224)
    g = FilterGraph("scale=224:224,format=rgbpf32le,infer=classify")
    out, keep = g.process(fb)
    assert keep.all()
    filt = [s for k, s in g.segments if k == "pure"]
    # logits live on the filter instance (vector model, like pose)
    from gmat_tpu.filters.builtin import FILTERS
    inst = FILTERS["infer"](model="classify")
    x = inst(g.process(fb)[0])          # passthrough
    assert inst.last_output.shape == (2, 1000)
    assert np.isfinite(np.asarray(inst.last_output)).all()


def test_chained_selects_renumber(rng):
    """ffmpeg chain semantics: the second select sees only survivors,
    renumbered — two halvings keep every 4th source frame."""
    fb = yuv_batch(rng, n=8)
    g = FilterGraph("select=not(mod(n\\,2)),select=not(mod(n\\,2))")
    _, keep = g.process(fb)
    assert keep.tolist() == [True, False, False, False] * 2


def test_fps_then_select_counts_survivors(rng):
    fb = yuv_batch(rng, n=8)
    g = FilterGraph("fps=15,select=lt(n\\,2)", src_fps=30.0)
    _, keep = g.process(fb)
    # fps keeps 0,2,4,6; select keeps the first TWO of those
    assert keep.tolist() == [True, False, True, False] + [False] * 4


def test_fps_filter_reports_rate_change(rng):
    g = FilterGraph("fps=15", src_fps=30.0)
    assert abs(g.fps_mul - 0.5) < 1e-9
    g2 = FilterGraph("yadif=1", src_fps=30.0)
    assert g2.fps_mul == 2


def test_positional_after_named_rejected():
    with pytest.raises(FilterError, match="positional"):
        parse_graph("crop=x=10:640:480")


def test_expr_av_semantics():
    # av_expr never raises: div-by-zero -> inf, lazy if, floor-mod,
    # C round (half away from zero)
    assert compile_expr("100/t")({"t": 0.0}) == float("inf")
    assert compile_expr("if(gt(t,0),1/t,7)")({"t": 0.0}) == 7.0
    assert compile_expr("mod(0-100,1920)")({}) == 1820.0
    assert compile_expr("round(2.5)")({}) == 3.0
    assert compile_expr("round(0-2.5)")({}) == -3.0
    import math
    assert math.isnan(compile_expr("asin(2)")({}))


def test_chained_select_scene_sees_survivors_only(rng):
    """After an upstream select drops the alternating frames, the scene
    select must diff consecutive SURVIVORS (identical -> no cuts), not
    raw batch neighbors (alternating -> huge mafd)."""
    a = np.full((32, 48), 40, np.uint8)
    b = np.full((32, 48), 220, np.uint8)
    ys = np.stack([a if i % 2 == 0 else b for i in range(8)])
    us = np.full((8, 16, 24), 128, np.uint8)
    fb = from_numpy_yuv420(ys, us, us.copy())
    g = FilterGraph("select=not(mod(n\\,2)),select=lt(scene\\,0.1)")
    _, keep = g.process(fb)
    # all surviving (identical) frames pass the low-scene gate
    assert keep.tolist() == [True, False] * 4


def test_select_scene_10bit_normalized(rng):
    """scene on a 10-bit stream uses the /4 depth normalization — the
    same content at 8- and 10-bit scores within rounding of each other."""
    from gmat_tpu.filters.builtin import SelectFilter
    y8 = np.concatenate([np.full((4, 32, 48), 40, np.uint8),
                         np.full((4, 32, 48), 200, np.uint8)])
    u8 = np.full((8, 16, 24), 128, np.uint8)
    fb8 = from_numpy_yuv420(y8, u8, u8.copy())
    fb10 = FrameBatch(
        {"y": (y8.astype(np.uint16) << 2), "u": (u8.astype(np.uint16) << 2),
         "v": (u8.astype(np.uint16) << 2)}, "yuv420p10", 48, 32, "bt709")
    s8 = SelectFilter("gt(scene,0.4)")
    s10 = SelectFilter("gt(scene,0.4)")
    k8 = s8.keep_mask(fb8)
    k10 = s10.keep_mask(fb10)
    assert k8.tolist() == k10.tolist()


def test_chromakey_uv_keying_luma_invariant(rng):
    """Reference semantics: keying runs on U/V chroma distance, so dark
    and bright versions of the key color are BOTH keyed out."""
    rgb = np.zeros((1, 8, 8, 3), np.uint8)
    rgb[0, :2] = [0, 255, 0]       # bright green
    rgb[0, 2:4] = [0, 90, 0]       # dark green (RGB distance is large)
    rgb[0, 4:] = [200, 20, 30]     # red
    fb = from_numpy_rgb(rgb)
    g = FilterGraph("chromakey=lime:0.25")
    out, _ = g.process(fb)
    a = np.asarray(out.planes["rgb"])[0, :, :, 3]
    assert (a[:4] == 0).all()      # both greens keyed
    assert (a[4:] == 255).all()


def test_scale_negative_divisible(rng):
    fb = yuv_batch(rng, n=1, h=100, w=362)
    out, _ = FilterGraph("scale=-4:50").process(fb)
    assert out.height == 50 and out.width % 4 == 0


def test_yadif_sees_survivors_only(rng):
    """ffmpeg chain: select-dropped frames never reach yadif's temporal
    register — output is the same whether the drop happened in this
    batch or the frames never existed."""
    fb = yuv_batch(rng, n=6, h=16, w=32)
    keep = np.array([True, True, False, True, True, True])
    g = FilterGraph("yadif")
    out, k = g.process(fb, keep=keep.copy())
    outs = [np.asarray(out.planes["y"])]
    for o, kk, _m in g.flush():
        outs.append(np.asarray(o.planes["y"]))
    got = np.concatenate([o for o in outs if o.size], axis=0)

    sub = fb.with_planes({kx: v[jnp.asarray(np.nonzero(keep)[0])]
                          for kx, v in fb.planes.items()})
    g2 = FilterGraph("yadif")
    out2, _ = g2.process(sub)
    outs2 = [np.asarray(out2.planes["y"])]
    for o, kk, _m in g2.flush():
        outs2.append(np.asarray(o.planes["y"]))
    want = np.concatenate([o for o in outs2 if o.size], axis=0)
    np.testing.assert_array_equal(got, want)


# ------------- true-luma scene scoring for RGB batches (VERDICT r2 #8)

def test_scene_rgb_uses_bt601_luma(rng):
    from gmat_tpu.ops.scene import scene_scores, score_depth
    import gmat_tpu.ops.csc as csc
    # two YUV frames with a hard cut; score in YUV, then score the SAME
    # content converted to rgb24 — the luma-based RGB score must move
    # with the cut, and chroma-only changes must NOT register as full
    # SAD the way the old channel-0 proxy did
    n, h, w = 4, 32, 48
    y = np.stack([np.full((h, w), 60 + (120 if i >= 2 else 0), np.uint8)
                  for i in range(n)])
    u = np.full((n, h // 2, w // 2), 128, np.uint8)
    v = np.full((n, h // 2, w // 2), 128, np.uint8)
    fb = from_numpy_yuv420(y, u, v)
    rgb = csc.convert(fb, "rgb24")
    assert score_depth(rgb.fmt) == 8
    s_yuv, _ = scene_scores(fb)
    s_rgb, _ = scene_scores(rgb)
    s_yuv, s_rgb = np.asarray(s_yuv), np.asarray(s_rgb)
    # the cut lands at frame 2 in both domains, same order of magnitude
    assert s_rgb[2] > 10 * max(s_rgb[1], s_rgb[3], 1e-9)
    assert abs(s_rgb[2] - s_yuv[2]) / s_yuv[2] < 0.5


def test_scene_rgb_planar_float_layout(rng):
    from gmat_tpu.ops.scene import scene_scores
    # rgbpf32 is (N, C, H, W) float in [0,1]: the luma reduction must
    # read the channel axis correctly and scale to 8-bit mafd
    n, h, w = 3, 16, 16
    base = rng.uniform(0.2, 0.4, (1, 3, h, w)).astype(np.float32)
    arr = np.concatenate([base, base, base + 0.5], 0).clip(0, 1)
    fb = FrameBatch({"rgb": jnp.asarray(arr)}, "rgbpf32", w, h, "bt709")
    s, _ = scene_scores(fb)
    s = np.asarray(s)
    assert s[1] < 1e-6 and s[2] > 0.5     # identical, then a big jump


def test_thumbnail_rgb_hist_is_luma(rng):
    from gmat_tpu.filters.builtin import ThumbnailFilter
    from gmat_tpu.core import formats as F
    # a frame whose channel 0 (R) is flat but whose G carries structure:
    # the old channel-0 proxy binned everything identically; BT.601 luma
    # must see the structure
    h, w = 16, 16
    flat_r = np.full((h, w), 100, np.uint8)
    g = np.zeros((h, w), np.uint8); g[:, : w // 2] = 255
    b = np.full((h, w), 50, np.uint8)
    rgb = np.stack([flat_r, g, b], -1)[None]
    hist = ThumbnailFilter._hist({"rgb": rgb}, 0, fmt=F.get("rgb24"))
    assert (hist > 0).sum() >= 2          # two distinct luma populations


# ---- psnr / ssim reference-comparison filters -------------------------------

def _write_ref_y4m(path, y, u, v):
    from gmat_tpu.av.rawvideo import Y4MWriter
    wtr = Y4MWriter(path, y.shape[2], y.shape[1], (30, 1))
    for i in range(y.shape[0]):
        wtr.write(y[i], u[i], v[i])
    wtr.close()


def test_psnr_filter_oracle(rng, tmp_path):
    n, h, w = 6, 64, 96
    y = rng.integers(0, 256, (n, h, w)).astype(np.uint8)
    u = rng.integers(0, 256, (n, h // 2, w // 2)).astype(np.uint8)
    v = rng.integers(0, 256, (n, h // 2, w // 2)).astype(np.uint8)
    ref = str(tmp_path / "ref.y4m")
    _write_ref_y4m(ref, y, u, v)
    # identity: mse==0 floors at 1e-10 -> huge dB, frames pass through
    stats = str(tmp_path / "ident.log")
    g = FilterGraph(f"psnr=video={ref}:stats_file={stats}")
    fb = from_numpy_yuv420(y, u, v)
    out, keep = g.process(fb, pts=np.arange(n),
                          times=np.arange(n) / 30.0, valid=n)
    g.flush()
    np.testing.assert_array_equal(np.asarray(out.planes["y"]), y)
    lines = open(stats).read().strip().splitlines()
    assert len(lines) == n
    assert float(lines[0].split("psnr_y:")[1].split()[0]) > 100
    # degraded main vs the numpy oracle, exact formula match
    noisy = np.clip(y.astype(int)
                    + rng.integers(-6, 7, y.shape), 0, 255).astype(np.uint8)
    stats2 = str(tmp_path / "noisy.log")
    g2 = FilterGraph(f"psnr=video={ref}:stats_file={stats2}")
    g2.process(from_numpy_yuv420(noisy, u, v), pts=np.arange(n),
               times=np.arange(n) / 30.0, valid=n)
    g2.flush()
    got = [float(l.split("psnr_y:")[1].split()[0])
           for l in open(stats2).read().strip().splitlines()]
    want = [10 * np.log10(255.0 ** 2 / ((noisy[i].astype(np.float64)
                                         - y[i]) ** 2).mean())
            for i in range(n)]
    np.testing.assert_allclose(got, want, atol=0.05)


def test_ssim_filter(rng, tmp_path):
    n, h, w = 4, 64, 96
    base = np.add.outer(np.linspace(30, 200, h), np.linspace(0, 40, w))
    y = np.stack([(base + 5 * i).clip(0, 255) for i in range(n)]
                 ).astype(np.uint8)
    u = np.full((n, h // 2, w // 2), 110, np.uint8)
    v = np.full((n, h // 2, w // 2), 140, np.uint8)
    ref = str(tmp_path / "ref.y4m")
    _write_ref_y4m(ref, y, u, v)
    stats = str(tmp_path / "ssim.log")
    g = FilterGraph(f"ssim=video={ref}:stats_file={stats}")
    g.process(from_numpy_yuv420(y, u, v), pts=np.arange(n),
              times=np.arange(n) / 30.0, valid=n)
    g.flush()
    lines = open(stats).read().strip().splitlines()
    assert len(lines) == n
    for l in lines:
        assert float(l.split("ssim_y:")[1].split()[0]) > 0.999
    noisy = np.clip(y.astype(int)
                    + rng.integers(-20, 21, y.shape), 0, 255).astype(np.uint8)
    stats2 = str(tmp_path / "ssim2.log")
    g2 = FilterGraph(f"ssim=video={ref}:stats_file={stats2}")
    g2.process(from_numpy_yuv420(noisy, u, v), pts=np.arange(n),
               times=np.arange(n) / 30.0, valid=n)
    g2.flush()
    vals = [float(l.split("ssim_y:")[1].split()[0])
            for l in open(stats2).read().strip().splitlines()]
    assert all(0.0 < s < 0.99 for s in vals)


def test_psnr_filter_short_reference(rng, tmp_path, capsys):
    n, h, w = 6, 64, 96
    y = rng.integers(0, 256, (n, h, w)).astype(np.uint8)
    u = np.full((n, h // 2, w // 2), 110, np.uint8)
    v = np.full((n, h // 2, w // 2), 140, np.uint8)
    ref = str(tmp_path / "short.y4m")
    _write_ref_y4m(ref, y[:3], u[:3], v[:3])     # 3-frame reference
    stats = str(tmp_path / "short.log")
    g = FilterGraph(f"psnr=video={ref}:stats_file={stats}")
    out, keep = g.process(from_numpy_yuv420(y, u, v), pts=np.arange(n),
                          times=np.arange(n) / 30.0, valid=n)
    g.flush()
    # unscored frames still pass through; only 3 stats lines
    assert int(keep.sum()) == n
    assert len(open(stats).read().strip().splitlines()) == 3


def test_psnr_filter_dim_mismatch(rng, tmp_path):
    y = rng.integers(0, 256, (2, 64, 96)).astype(np.uint8)
    u = np.full((2, 32, 48), 110, np.uint8)
    v = np.full((2, 32, 48), 140, np.uint8)
    ref = str(tmp_path / "ref.y4m")
    _write_ref_y4m(ref, y[:, :32, :48], u[:, :16, :24], v[:, :16, :24])
    g = FilterGraph(f"psnr=video={ref}")
    with pytest.raises(FilterError, match="match the reference"):
        g.process(from_numpy_yuv420(y, u, v), pts=np.arange(2),
                  times=np.arange(2) / 30.0, valid=2)


def test_crop_box_fallback_matches_pallas_convention():
    """Review fix: crop_box is (x, y, w, h) everywhere — the XLA
    fallback must crop the same region the Pallas ladder would (the
    argument order previously hit geometry.crop's (w, h, x, y))."""
    import numpy as np
    from gmat_tpu.core.frame import from_numpy_yuv420
    from gmat_tpu.ops import fused
    rng = np.random.default_rng(0)
    h, w = 64, 96
    y = rng.integers(0, 256, (1, h, w)).astype(np.uint8)
    u = rng.integers(0, 256, (1, h // 2, w // 2)).astype(np.uint8)
    v = rng.integers(0, 256, (1, h // 2, w // 2)).astype(np.uint8)
    fb = from_numpy_yuv420(y, u, v)
    out = fused.preprocess_nchw(fb, 32, 32, crop_box=(8, 4, 48, 40),
                                use_pallas="never")
    ref = fused.preprocess_nchw(
        from_numpy_yuv420(np.ascontiguousarray(y[:, 4:44, 8:56]),
                          np.ascontiguousarray(u[:, 2:22, 4:28]),
                          np.ascontiguousarray(v[:, 2:22, 4:28])),
        32, 32, use_pallas="never")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5)


def test_run_frames_sparse_keep_gathers_on_device():
    # behavior check for the device-side gather: a sparse select yields
    # exactly the kept frames with their pts
    import numpy as np
    from gmat_tpu.core.frame import from_numpy_yuv420
    from gmat_tpu.filters.graph import FilterGraph
    n, h, w = 8, 32, 32
    y = np.stack([np.full((h, w), 10 + 20 * i, np.uint8)
                  for i in range(n)])
    u = np.full((n, h // 2, w // 2), 110, np.uint8)
    v = np.full((n, h // 2, w // 2), 140, np.uint8)
    g = FilterGraph("select=eq(mod(n\\,4)\\,0)")
    got = list(g.run_frames([(from_numpy_yuv420(y, u, v),
                              np.arange(n, dtype=np.int64), n)]))
    assert [p for (_pl, p, _fb) in got] == [0, 4]
    assert int(got[1][0]["y"][0, 0]) == 10 + 20 * 4


def test_review_fixes_filters_batch():
    """Round-3 review fixes across builtin/expr/infer."""
    import numpy as np
    import pytest as _pytest
    from gmat_tpu.core.frame import from_numpy_yuv420
    from gmat_tpu.filters.expr import compile_expr
    from gmat_tpu.filters.graph import FilterGraph, FilterError

    # expr: scientific notation + av_strtod suffixes; nan-safe rounding
    assert compile_expr("gt(pts,1e6)")({"pts": 2e6}) == 1.0
    assert compile_expr("1M+2k")({}) == 1002000.0
    assert compile_expr("1Ki+1B")({}) == 1032.0
    assert str(compile_expr("floor(t)")({"t": float("nan")})) == "nan"

    # select threshold= sugar (FrameSelect-style scene threshold)
    rng = np.random.default_rng(0)
    n, h, w = 6, 32, 32
    y = np.full((n, h, w), 100, np.uint8)
    y[3:] = rng.integers(0, 256, (3, h, w)).astype(np.uint8)  # hard cut
    u = np.full((n, h // 2, w // 2), 110, np.uint8)
    v = np.full((n, h // 2, w // 2), 140, np.uint8)
    fb = from_numpy_yuv420(y, u, v)
    g = FilterGraph("select=threshold=0.3")
    _, keep = g.process(fb, pts=np.arange(n, dtype=np.int64))
    assert bool(keep[3]) and not bool(keep[1])
    with _pytest.raises(FilterError):
        FilterGraph("select=expr=gt(scene\\,0.4):threshold=0.3")

    # transpose: packed float RGB transposes NHWC-correctly; yuv422p
    # rejects with guidance (4:4:0 is not a carried layout)
    g2 = FilterGraph("format=rgbpf32le,transpose=1")
    out, _ = g2.process(fb, pts=np.arange(n, dtype=np.int64))
    assert (out.width, out.height) == (h, w)
    arr = np.asarray(out.planes["rgb"])
    assert arr.shape == (n, w, h, 3)
    ref, _ = FilterGraph("format=rgbpf32le").process(
        from_numpy_yuv420(y, u, v), pts=np.arange(n, dtype=np.int64))
    refa = np.asarray(ref.planes["rgb"])
    np.testing.assert_allclose(
        arr[0], refa[0].transpose(1, 0, 2)[:, ::-1],
        atol=1e-6)


def test_infer_custom_module_prefix_not_hijacked():
    # review fix: 'sr'-prefixed module:function names are user models
    import numpy as np
    import sys
    import types
    from gmat_tpu.filters.infer import InferFilter
    mod = types.ModuleType("srcustom_mod")
    mod.double = lambda x: x * 2.0
    sys.modules["srcustom_mod"] = mod
    f = InferFilter(model="srcustom_mod:double")
    assert f.params is None and f.kind == "image"


def test_infer_vector_last_output_under_jit():
    # review fix: pose/classify logits must be concrete values after a
    # jitted graph run (was a leaked tracer)
    import numpy as np
    from gmat_tpu.core.frame import from_numpy_yuv420
    from gmat_tpu.filters.graph import FilterGraph
    n = 2
    y = np.full((n, 120, 120), 128, np.uint8)
    u = np.full((n, 60, 60), 110, np.uint8)
    v = np.full((n, 60, 60), 140, np.uint8)
    g = FilterGraph("scale=120:120,format=rgbpf32le,infer=pose")
    fb = from_numpy_yuv420(y, u, v)
    for _ in range(2):      # second call = compiled cache hit
        g.process(fb, pts=np.arange(n, dtype=np.int64))
    import jax
    jax.effects_barrier()           # drain debug callbacks
    # the infer instance is held by the graph's filter list
    infs = [f for f in g.filters if hasattr(f, "last_output")]
    out = np.asarray(infs[-1].last_output)
    assert out.shape[0] == n and np.isfinite(out).all()


def test_scene_rgb_channels_last_layout():
    """Review fix: csc-produced rgbpf32 batches are channels-LAST; the
    scene score must reduce true luma, not mistake image rows for
    channels (both layouts are detected from the array shape)."""
    import numpy as np
    import jax.numpy as jnp
    from gmat_tpu.core.frame import FrameBatch
    from gmat_tpu.ops.scene import scene_scores
    rng = np.random.default_rng(4)
    n, h, w = 3, 16, 16
    base = rng.uniform(0.2, 0.4, (1, h, w, 3)).astype(np.float32)
    arr = np.concatenate([base, base, (base + 0.5).clip(0, 1)], 0)
    fb = FrameBatch({"rgb": jnp.asarray(arr)}, "rgbpf32", w, h, "bt709")
    s, _ = scene_scores(fb)
    s = np.asarray(s)
    assert s[1] < 1e-6 and s[2] > 0.5


# ---- negate / swapuv / extractplanes / monochrome ---------------------------

def test_negate_planar_and_depth(rng):
    fb = yuv_batch(rng, n=2, h=16, w=24)
    out, _ = FilterGraph("negate").process(fb)
    for pl in ("y", "u", "v"):
        np.testing.assert_array_equal(
            np.asarray(out.planes[pl]),
            255 - np.asarray(fb.planes[pl]))
    # components=y negates only luma
    o2, _ = FilterGraph("negate=y").process(fb)
    np.testing.assert_array_equal(np.asarray(o2.planes["y"]),
                                  255 - np.asarray(fb.planes["y"]))
    np.testing.assert_array_equal(np.asarray(o2.planes["u"]),
                                  np.asarray(fb.planes["u"]))
    # 10-bit: max = 1023 (vf_negate.c:263 max = (1<<depth)-1)
    y10 = rng.integers(0, 1024, (1, 8, 8)).astype(np.uint16)
    u10 = rng.integers(0, 1024, (1, 4, 4)).astype(np.uint16)
    v10 = rng.integers(0, 1024, (1, 4, 4)).astype(np.uint16)
    fb10 = from_numpy_yuv420(y10, u10, v10, fmt="yuv420p10")
    o3, _ = FilterGraph("negate").process(fb10)
    np.testing.assert_array_equal(np.asarray(o3.planes["y"]), 1023 - y10)
    # asking for r on a YUV input errors (comp_avail check)
    with pytest.raises(FilterError, match="not available"):
        FilterGraph("negate=r").process(fb)


def test_negate_packed_alpha_quirk(rng):
    """vf_negate.c:374-385: for packed formats the channel mask comes only
    from `components`, so negate_alpha alone leaves packed alpha alone."""
    rgba = rng.integers(0, 256, (1, 8, 8, 4)).astype(np.uint8)
    fb = from_numpy_rgb(rgba, fmt="rgba")
    out, _ = FilterGraph("negate=negate_alpha=1").process(fb)
    got = np.asarray(out.planes["rgb"])
    np.testing.assert_array_equal(got[..., :3], 255 - rgba[..., :3])
    np.testing.assert_array_equal(got[..., 3], rgba[..., 3])   # untouched
    # explicit components=r+g+b+a DOES negate alpha
    o2, _ = FilterGraph("negate=r+g+b+a").process(fb)
    np.testing.assert_array_equal(np.asarray(o2.planes["rgb"]), 255 - rgba)
    # bgr ordering maps the component to the right channel
    bgr = rng.integers(0, 256, (1, 4, 4, 3)).astype(np.uint8)
    fbb = from_numpy_rgb(bgr, fmt="bgr24")
    o3, _ = FilterGraph("negate=r").process(fbb)
    got3 = np.asarray(o3.planes["rgb"])
    np.testing.assert_array_equal(got3[..., 2], 255 - bgr[..., 2])  # R at idx 2
    np.testing.assert_array_equal(got3[..., :2], bgr[..., :2])


def test_swapuv(rng):
    fb = yuv_batch(rng, n=1, h=8, w=8)
    out, _ = FilterGraph("swapuv").process(fb)
    np.testing.assert_array_equal(np.asarray(out.planes["u"]),
                                  np.asarray(fb.planes["v"]))
    np.testing.assert_array_equal(np.asarray(out.planes["v"]),
                                  np.asarray(fb.planes["u"]))
    rgb = from_numpy_rgb(np.zeros((1, 4, 4, 3), np.uint8))
    with pytest.raises(FilterError, match="YUV"):
        FilterGraph("swapuv").process(rgb)


def test_extractplanes(rng):
    fb = yuv_batch(rng, n=2, h=16, w=24)
    oy, _ = FilterGraph("extractplanes=y").process(fb)
    assert oy.format == "gray8" and (oy.width, oy.height) == (24, 16)
    np.testing.assert_array_equal(np.asarray(oy.planes["y"]),
                                  np.asarray(fb.planes["y"]))
    ou, _ = FilterGraph("extractplanes=u").process(fb)
    assert (ou.width, ou.height) == (12, 8)   # chroma plane dims
    np.testing.assert_array_equal(np.asarray(ou.planes["y"]),
                                  np.asarray(fb.planes["u"]))
    # packed RGB channel extraction, verbatim values
    rgba = rng.integers(0, 256, (1, 8, 8, 4)).astype(np.uint8)
    fbr = from_numpy_rgb(rgba, fmt="rgba")
    og, _ = FilterGraph("extractplanes=g").process(fbr)
    np.testing.assert_array_equal(np.asarray(og.planes["y"]), rgba[..., 1])
    oa, _ = FilterGraph("alphaextract").process(fbr)
    np.testing.assert_array_equal(np.asarray(oa.planes["y"]), rgba[..., 3])
    # 16-bit source -> gray16
    r48 = rng.integers(0, 65536, (1, 4, 4, 3)).astype(np.uint16)
    f48 = from_numpy_rgb(r48, fmt="rgb48")
    o16, _ = FilterGraph("extractplanes=b").process(f48)
    assert o16.format == "gray16"
    np.testing.assert_array_equal(np.asarray(o16.planes["y"]), r48[..., 2])
    # multiple planes per instance rejected (single-chain graph)
    with pytest.raises(FilterError, match="one plane"):
        FilterGraph("extractplanes=y+u")
    # alpha from an alpha-less format errors
    with pytest.raises(FilterError, match="not available"):
        FilterGraph("extractplanes=a").process(fb)


def _monochrome_oracle(y8, u8, v8, cb, cr, size, high, depth=8):
    """Scalar float32 transcription of vf_monochrome.c PROCESS()."""
    f = np.float32
    maxv = f((1 << depth) - 1)
    imax = f(1.0) / maxv
    b = f(cb) * f(0.5)
    r = f(cr) * f(0.5)
    isize = f(1.0) / f(size)
    ihigh = f(1.0) - f(high)
    beta = f(0.6)
    h, w = y8.shape
    out = np.empty_like(y8)
    for yy in range(h):
        for xx in range(w):
            y = f(y8[yy, xx]) * imax
            u = f(u8[yy >> 1, xx >> 1]) * imax - f(0.5)
            v = f(v8[yy >> 1, xx >> 1]) * imax - f(0.5)
            d = ((b - u) * (b - u) + (r - v) * (r - v)) * isize
            ny = np.exp(min(max(d, f(0.0)), f(1.0)).astype(np.float32) * f(-1.0)).astype(f)
            if y < beta:
                tmp = abs(y / beta - f(1.0))
                tt = f(1.0) - tmp * tmp
            else:
                tmp = (f(1.0) - y) / (f(1.0) - beta)
                tt = tmp * tmp * (f(3.0) - f(2.0) * tmp)
            t = tt + (f(1.0) - tt) * ihigh
            nyv = (f(1.0) - t) * y + t * ny * y
            out[yy, xx] = min(max(int(np.rint(nyv * maxv)), 0),
                              (1 << depth) - 1)
    return out


def test_monochrome_oracle(rng):
    y = rng.integers(0, 256, (1, 10, 12)).astype(np.uint8)
    u = rng.integers(0, 256, (1, 5, 6)).astype(np.uint8)
    v = rng.integers(0, 256, (1, 5, 6)).astype(np.uint8)
    fb = from_numpy_yuv420(y, u, v)
    for cb, cr, size, high in ((0.0, 0.0, 1.0, 0.0),
                               (0.3, -0.2, 2.5, 0.4)):
        out, _ = FilterGraph(
            f"monochrome=cb={cb}:cr={cr}:size={size}:high={high}").process(fb)
        want = _monochrome_oracle(y[0], u[0], v[0], cb, cr, size, high)
        got = np.asarray(out.planes["y"])[0]
        # expf vs XLA exp can differ in the last ulp -> at most 1 LSB
        diff = np.abs(got.astype(int) - want.astype(int))
        assert diff.max() <= 1, (diff.max(), (cb, cr, size, high))
        assert (diff > 0).mean() < 0.02
        np.testing.assert_array_equal(np.asarray(out.planes["u"]), 128)
        np.testing.assert_array_equal(np.asarray(out.planes["v"]), 128)
    with pytest.raises(FilterError, match="size"):
        FilterGraph("monochrome=size=0.01")
    rgbfb = from_numpy_rgb(rng.integers(0, 256, (1, 4, 4, 3)).astype(np.uint8))
    with pytest.raises(FilterError, match="planar YUV"):
        FilterGraph("monochrome").process(rgbfb)


def test_sharpen_npp_tie_half_even():
    """acc % 8 == 4 tie cases, constructed explicitly (VERDICT-r4 #7).

    NPP does not document nppiFilterSharpenBorder's tie direction; we
    chose round-half-even and this test makes the choice falsifiable:
    100.5 must round DOWN to 100 (round-half-up would give 101) and
    101.5 must round UP to 102 (truncation would give 101).  Against
    real NPP output the divergence envelope is at most +/-1 LSB and
    only on pixels whose acc hits the tie exactly.
    """
    # interior pixel (1,1) of a 3x3 plane: acc = 16*center - sum(ring)
    def plane(center, ring_sum):
        # seven ring pixels at 100, the eighth adjusts to ring_sum
        vals = [100] * 7 + [ring_sum - 700]
        p = np.array([[vals[0], vals[1], vals[2]],
                      [vals[3], center, vals[4]],
                      [vals[5], vals[6], vals[7]]], np.uint8)
        return p[None]

    def run(p):
        # yuv444p: chroma planes same size
        fb = from_numpy_yuv420(p, p.copy(), p.copy(), fmt="yuv444p")
        out, _ = FilterGraph("sharpen_npp").process(fb)
        return int(np.asarray(out.planes["y"])[0, 1, 1])

    # center=100, ring=796 -> acc = 1600-796 = 804 -> 100.5 -> 100 (even)
    assert run(plane(100, 796)) == 100
    # center=101, ring=804 -> acc = 1616-804 = 812 -> 101.5 -> 102 (even)
    assert run(plane(101, 804)) == 102
    # sanity: one step off the tie rounds normally
    assert run(plane(100, 795)) == 101   # 100.625 -> 101
    assert run(plane(100, 797)) == 100   # 100.375 -> 100
