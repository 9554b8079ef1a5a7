"""pad + eq filters (upstream vf_pad/vf_eq analogs, round 4)."""
import numpy as np
import pytest

from gmat_tpu.core.frame import FrameBatch, from_numpy_yuv420
from gmat_tpu.filters.graph import FilterGraph
from gmat_tpu.ops import enhance, geometry


def _yuv(rng, n=1, h=16, w=24):
    return from_numpy_yuv420(
        rng.integers(0, 256, (n, h, w)).astype(np.uint8),
        rng.integers(0, 256, (n, h // 2, w // 2)).astype(np.uint8),
        rng.integers(0, 256, (n, h // 2, w // 2)).astype(np.uint8))


# ---- eq ---------------------------------------------------------------------

def _eq_lut_oracle(c, b, g, gw):
    """Independent port of vf_eq.c create_lut (vf_eq.c:37-60)."""
    out = []
    for i in range(256):
        v = c * (i / 255.0 - 0.5) + 0.5 + b
        if v <= 0.0:
            out.append(0)
        else:
            v = v * (1.0 - gw) + (v ** (1.0 / g)) * gw
            out.append(255 if v >= 1.0 else int(256.0 * v))
    return np.array(out, np.uint8)


def test_eq_identity_is_exact_passthrough(rng):
    fb = _yuv(rng)
    out = enhance.eq(fb)
    for k in fb.planes:
        np.testing.assert_array_equal(np.asarray(out.planes[k]),
                                      np.asarray(fb.planes[k]))


def test_eq_matches_vf_eq_lut(rng):
    fb = _yuv(rng)
    out = enhance.eq(fb, contrast=1.5, brightness=0.1, saturation=2.0,
                     gamma=1.8, gamma_weight=0.7)
    luty = _eq_lut_oracle(1.5, 0.1, 1.8, 0.7)
    lutc = _eq_lut_oracle(2.0, 0.0, 1.0, 0.7)
    np.testing.assert_array_equal(
        np.asarray(out.planes["y"]), luty[np.asarray(fb.planes["y"])])
    np.testing.assert_array_equal(
        np.asarray(out.planes["u"]), lutc[np.asarray(fb.planes["u"])])
    np.testing.assert_array_equal(
        np.asarray(out.planes["v"]), lutc[np.asarray(fb.planes["v"])])


def test_eq_saturation_leaves_luma(rng):
    fb = _yuv(rng)
    out = enhance.eq(fb, saturation=0.5)
    np.testing.assert_array_equal(np.asarray(out.planes["y"]),
                                  np.asarray(fb.planes["y"]))
    assert not np.array_equal(np.asarray(out.planes["u"]),
                              np.asarray(fb.planes["u"]))


def test_eq_per_channel_gamma_plumbing(rng):
    """gamma_r/g/b reach the planes per vf_eq.c:113-115."""
    fb = _yuv(rng)
    out = enhance.eq(fb, gamma_b=2.0)           # U gamma = sqrt(2/1)
    lutu = _eq_lut_oracle(1.0, 0.0, 2.0 ** 0.5, 1.0)
    np.testing.assert_array_equal(
        np.asarray(out.planes["u"]), lutu[np.asarray(fb.planes["u"])])
    np.testing.assert_array_equal(np.asarray(out.planes["v"]),
                                  np.asarray(fb.planes["v"]))


def test_eq_rejects_nonyuv(rng):
    rgb = FrameBatch({"rgb": np.zeros((1, 8, 8, 3), np.uint8)},
                     "rgb24", 8, 8, "bt709")
    with pytest.raises(ValueError):
        enhance.eq(rgb, contrast=2.0)


# ---- pad --------------------------------------------------------------------

def test_pad_black_yuv_fill_and_placement(rng):
    fb = _yuv(rng, h=16, w=24)
    out = geometry.pad(fb, 32, 24, 4, 4)
    assert (out.width, out.height) == (32, 24)
    y = np.asarray(out.planes["y"])
    u = np.asarray(out.planes["u"])
    assert y[0, 0, 0] == 16 and u[0, 0, 0] == 128     # studio black
    np.testing.assert_array_equal(y[:, 4:20, 4:28],
                                  np.asarray(fb.planes["y"]))
    np.testing.assert_array_equal(u[:, 2:10, 2:14],
                                  np.asarray(fb.planes["u"]))


def test_pad_color_and_rgb(rng):
    img = rng.integers(0, 256, (1, 8, 12, 3)).astype(np.uint8)
    fb = FrameBatch({"rgb": img}, "rgb24", 12, 8, "bt709")
    out = geometry.pad(fb, 20, 10, 4, 1, color="#ff8000")
    a = np.asarray(out.planes["rgb"])
    assert tuple(a[0, 0, 0]) == (255, 128, 0)
    np.testing.assert_array_equal(a[:, 1:9, 4:16], img)


def test_pad_validation(rng):
    fb = _yuv(rng, h=16, w=24)
    with pytest.raises(ValueError):
        geometry.pad(fb, 16, 16)                 # smaller than input
    with pytest.raises(ValueError):
        geometry.pad(fb, 23, 24)                 # rounds down below input
    with pytest.raises(ValueError):
        geometry.parse_color("nosuchcolor")


def test_pad_rounds_to_chroma_grid_like_ff_draw(rng):
    """vf_pad rounds x/y/w/h DOWN to the chroma grid
    (ff_draw_round_to_sub round_dir=-1) instead of erroring."""
    fb = _yuv(rng, h=16, w=22)
    out = geometry.pad(fb, 32, 24, 5, 4)         # odd x on 4:2:0 -> 4
    y = np.asarray(out.planes["y"])
    np.testing.assert_array_equal(y[:, 4:20, 4:26],
                                  np.asarray(fb.planes["y"]))
    out2 = geometry.pad(fb, 33, 25, 4, 4)        # odd w/h -> 32x24
    assert (out2.width, out2.height) == (32, 24)


def test_pad_centers_out_of_range_xy(rng):
    """vf_pad.c:176-179: x<0 or x+iw>w falls back to centered."""
    fb = _yuv(rng, h=16, w=24)
    ref = np.asarray(fb.planes["y"])
    out = geometry.pad(fb, 32, 24, -1, -1)       # negative -> centered
    np.testing.assert_array_equal(
        np.asarray(out.planes["y"])[:, 4:20, 4:28], ref)
    out2 = geometry.pad(fb, 32, 24, 20, 0)       # 20+24>32 -> x centered
    np.testing.assert_array_equal(
        np.asarray(out2.planes["y"])[:, 0:16, 4:28], ref)


def test_pad_and_chromakey_share_one_color_parser(rng):
    """pad accepts everything chromakey accepts (bare hex, short #RGB,
    names) — one av_parse_color subset, not two divergent tables."""
    fb = _yuv(rng, h=16, w=24)
    for color in ("00FF00", "#0f0", "lime", "orange", "0x00ff00",
                  "white@0.5"):
        geometry.pad(fb, 32, 24, 4, 4, color=color)
    from gmat_tpu.filters.builtin import _parse_color
    np.testing.assert_array_equal(_parse_color("orange"),
                                  np.array([255, 165, 0], np.float32))
    np.testing.assert_array_equal(_parse_color("#0f0"),
                                  np.array([0, 255, 0], np.float32))


def test_pad_graph_expressions(rng):
    """pad=iw+8:ih+8:(ow-iw)/2:(oh-ih)/2 centers via av_expr."""
    fb = _yuv(rng, h=16, w=24)
    g = FilterGraph("pad=iw+8:ih+8:(ow-iw)/2:(oh-ih)/2:gray")
    out, keep = g.process(fb)
    assert (out.width, out.height) == (32, 24)
    y = np.asarray(out.planes["y"])
    np.testing.assert_array_equal(y[:, 4:20, 4:28],
                                  np.asarray(fb.planes["y"]))
    # gray fill: Y = mat@(128,128,128)+16 = 0.859*128+16 ~ 126
    assert 120 <= y[0, 0, 0] <= 130


# ---- trim / setpts ----------------------------------------------------------

def test_trim_by_seconds_and_frames(rng):
    fb = _yuv(rng, n=10)
    g = FilterGraph("trim=start=0.1:end=0.3")
    out, keep = g.process(fb, pts=np.arange(10) * 100,
                          times=np.arange(10) / 10.0)
    assert list(np.nonzero(keep)[0]) == [1, 2]      # t in [0.1, 0.3)
    g2 = FilterGraph("trim=start_frame=4:end_frame=7")
    out2, keep2 = g2.process(fb, pts=np.arange(10) * 100,
                             times=np.arange(10) / 10.0)
    assert list(np.nonzero(keep2)[0]) == [4, 5, 6]


def test_trim_or_within_gates(rng):
    """f_trim.c: OR across configured start bounds (pts OR frame)."""
    fb = _yuv(rng, n=6)
    g = FilterGraph("trim=start_pts=400:start_frame=5")
    out, keep = g.process(fb, pts=np.arange(6) * 100,
                          times=np.arange(6) / 10.0)
    assert list(np.nonzero(keep)[0]) == [4, 5]      # pts gate opens at 4


def test_trim_counts_only_alive_frames(rng):
    """frames dropped upstream are invisible to trim's frame counter
    (ffmpeg chain semantics)."""
    fb = _yuv(rng, n=8)
    g = FilterGraph("select=mod(n\\,2),trim=start_frame=1:end_frame=3")
    out, keep = g.process(fb, pts=np.arange(8) * 100,
                          times=np.arange(8) / 10.0)
    # select keeps odd n: 1,3,5,7 -> trim keeps its frames 1,2 -> 3,5
    assert list(np.nonzero(keep)[0]) == [3, 5]


def test_trim_duration_measured_from_first_kept_frame(rng):
    """f_trim.c: duration is its own end-gate term, pts - first_pts <
    duration_tb, where first_pts is the first frame past the start gate
    — NOT start+duration in absolute stream time."""
    fb = _yuv(rng, n=10)
    # mid-stream timestamps: duration=0.3 keeps the first 0.3s anyway
    g = FilterGraph("trim=duration=0.3")
    out, keep = g.process(fb, pts=np.arange(10) * 100,
                          times=10.0 + np.arange(10) / 10.0)
    assert list(np.nonzero(keep)[0]) == [0, 1, 2]
    # duration windows from the start gate, not from t=0
    g2 = FilterGraph("trim=start_frame=5:duration=0.2")
    out2, keep2 = g2.process(fb, pts=np.arange(10) * 100,
                             times=np.arange(10) / 10.0)
    assert list(np.nonzero(keep2)[0]) == [5, 6]
    # duration ORs with end_frame like any other end bound
    g3 = FilterGraph("trim=duration=0.1:end_frame=3")
    out3, keep3 = g3.process(fb, pts=np.arange(10) * 100,
                             times=np.arange(10) / 10.0)
    assert list(np.nonzero(keep3)[0]) == [0, 1, 2]


def test_trim_eof_latch(rng):
    """f_trim.c s->eof: once the end gate rejects a frame, everything
    after is dropped — even late frames whose pts re-enter the window
    (decode-order B-frame pattern)."""
    fb = _yuv(rng, n=3)
    g = FilterGraph("trim=end_pts=400")
    out, keep = g.process(fb, pts=np.array([100, 420, 350]))
    assert list(np.nonzero(keep)[0]) == [0]      # 350 latched out


def test_setpts_rebase_and_scale(rng):
    fb = _yuv(rng, n=4)
    g = FilterGraph("setpts=PTS-STARTPTS")
    g.process(fb, pts=np.array([500, 600, 700, 800]),
              times=np.arange(4) / 30.0)
    assert list(g.out_pts) == [0, 100, 200, 300]
    g2 = FilterGraph("setpts=0.5*(PTS-STARTPTS)")
    g2.process(fb, pts=np.array([500, 600, 700, 800]),
               times=np.arange(4) / 30.0)
    assert list(g2.out_pts) == [0, 50, 100, 150]


def test_setpts_n_var_and_prev(rng):
    fb = _yuv(rng, n=3)
    g = FilterGraph("setpts=N*42")
    g.process(fb, pts=np.array([7, 9, 11]), times=np.arange(3) / 30.0)
    assert list(g.out_pts) == [0, 42, 84]
    # PREV_OUTPTS starts as NAN (setpts.c:113-118): frame 0 evaluates
    # NAN+100 = NAN -> AV_NOPTS_VALUE, and the NaN chain propagates
    g2 = FilterGraph("setpts=PREV_OUTPTS+100")
    g2.process(fb, pts=np.array([7, 9, 11]), times=np.arange(3) / 30.0)
    assert list(g2.out_pts) == [AV_NOPTS] * 3
    # ...while PREV_INPTS recovers: frame 0 is NOPTS, later frames real
    g3 = FilterGraph("setpts=PREV_INPTS+1")
    g3.process(fb, pts=np.array([7, 9, 11]), times=np.arange(3) / 30.0)
    assert list(g3.out_pts) == [AV_NOPTS, 8, 10]


AV_NOPTS = -(1 << 63)


def test_setpts_d2ts_semantics(rng):
    """D2TS (internal.h:261): NaN -> AV_NOPTS_VALUE, else C truncation
    toward zero — no OverflowError/ValueError on nan/inf results."""
    fb = _yuv(rng, n=2)
    g = FilterGraph("setpts=mod(PTS\\,0)")       # eval.c fmod(x,0) = nan
    g.process(fb, pts=np.array([100, 200]), times=np.arange(2) / 10.0)
    assert list(g.out_pts) == [AV_NOPTS] * 2
    g2 = FilterGraph("setpts=PTS/0")             # inf -> saturates
    g2.process(fb, pts=np.array([100, 200]), times=np.arange(2) / 10.0)
    assert list(g2.out_pts) == [(1 << 63) - 1] * 2
    g3 = FilterGraph("setpts=PTS*1.5")           # 150, 300: trunc to 0
    g3.process(fb, pts=np.array([101, 201]), times=np.arange(2) / 10.0)
    assert list(g3.out_pts) == [151, 301]


def test_setpts_pts_over_tb_infers_timebase(rng):
    """setpts=PTS/TB without tb=: TB is inferred from the pts/times
    slope (the link-timebase analog) instead of binding 0.0 and
    crashing on int(inf)."""
    fb = _yuv(rng, n=3)
    g = FilterGraph("setpts=PTS+round(1/TB)")    # 1/TB = 1000
    g.process(fb, pts=np.array([100, 200, 300]),
              times=np.array([0.1, 0.2, 0.3]))
    assert list(g.out_pts) == [1100, 1200, 1300]
    # no times track and no tb= -> TB is NAN -> NOPTS, not a crash
    g2 = FilterGraph("setpts=PTS/TB")
    g2.process(fb, pts=np.array([100, 200, 300]))
    assert list(g2.out_pts) == [AV_NOPTS] * 3


def test_setpts_rewrites_times_for_downstream_trim(rng):
    """finding: a seconds-based trim AFTER setpts must see the rewritten
    timeline (ffmpeg trim compares pts in the rebased timebase)."""
    fb = _yuv(rng, n=6)
    g = FilterGraph("setpts=PTS-STARTPTS,trim=end=0.25")
    out, keep = g.process(fb, pts=10000 + np.arange(6) * 100,
                          times=10.0 + np.arange(6) / 10.0)
    # rebased timeline starts at 0; end=0.25 keeps t = 0, .1, .2
    assert list(np.nonzero(keep)[0]) == [0, 1, 2]
    assert list(g.out_pts[keep]) == [0, 100, 200]


def test_trim_setpts_chain(rng):
    """the canonical clip extraction: trim + rebase."""
    fb = _yuv(rng, n=10)
    g = FilterGraph("trim=start=0.2:end=0.5,setpts=PTS-STARTPTS")
    out, keep = g.process(fb, pts=np.arange(10) * 100,
                          times=np.arange(10) / 10.0)
    kept = np.nonzero(keep)[0]
    assert list(kept) == [2, 3, 4]
    assert list(g.out_pts[kept]) == [0, 100, 200]


# ---- round-4 review regressions ---------------------------------------------

def test_trim_seconds_without_times_raises(rng):
    """Seconds gates with no times track must diagnose, not silently
    drop the whole stream (review r4)."""
    fb = _yuv(rng, n=6)
    g = FilterGraph("trim=start=0.1")
    with pytest.raises(ValueError, match="times"):
        g.process(fb, pts=np.arange(6) * 100)
    # pts/frame gates stay usable without times
    g2 = FilterGraph("trim=start_pts=200")
    out, keep = g2.process(fb, pts=np.arange(6) * 100)
    assert list(np.nonzero(keep)[0]) == [2, 3, 4, 5]


def test_setpts_tb_inferred_across_single_frame_batches(rng):
    """-batch 1 streaming: the tb-inference anchor must persist across
    process calls (review r4) — frame 0 has no tb yet (NAN -> NOPTS,
    like ffmpeg before link tb is known), later frames rebase fine."""
    g = FilterGraph("setpts=PTS/TB")
    outs = []
    for i in range(3):
        fb = _yuv(rng, n=1)
        g.process(fb, pts=np.array([(i + 1) * 100]),
                  times=np.array([(i + 1) * 0.1]))
        outs.extend(g.out_pts)
    # tb = 0.001 inferred on the second frame: PTS/TB = 200/0.001
    assert outs[1:] == [200000, 300000]


def test_pad_sar_dar_vars(rng):
    """vf_pad sar/dar variables (square pixels: sar=1, dar=a)."""
    fb = _yuv(rng, n=1, h=16, w=24)
    g = FilterGraph("pad=ih*dar:ih")   # canonical aspect-preserving pad
    out, _ = g.process(fb)
    assert (out.width, out.height) == (24, 16)
    g2 = FilterGraph("pad=iw+8*sar:ih")
    out2, _ = g2.process(fb)
    assert (out2.width, out2.height) == (32, 16)


# ---- lut / lutyuv / lutrgb (vf_lut.c) ---------------------------------------

def _lut_oracle(expr_fn, mn, mx, cmax, size=256):
    """Independent vf_lut table: env-free python closure per val."""
    out = np.empty(size, np.int64)
    for val in range(size):
        clipval = min(max(val, mn), mx)
        negval = min(max(mn + mx - val, mn), mx)
        r = expr_fn(val, clipval, negval, mn, mx)
        out[val] = min(max(int(r), 0), cmax)
    return out


def test_lut_default_clamps_to_limited_range(rng):
    """Default expr 'clipval' clamps Y to [16,235], chroma to [16,240]."""
    fb = _yuv(rng, n=2)
    out, _ = FilterGraph("lutyuv").process(fb)
    y = np.asarray(out.planes["y"])
    assert y.min() >= 16 and y.max() <= 235
    u = np.asarray(out.planes["u"])
    assert u.min() >= 16 and u.max() <= 240
    # and it IS the clamp of the input, not a rescale
    np.testing.assert_array_equal(
        y, np.clip(np.asarray(fb.planes["y"]), 16, 235))


def test_lutyuv_negval_oracle(rng):
    fb = _yuv(rng, n=1)
    out, _ = FilterGraph("lutyuv=y=negval:u=128:v=128").process(fb)
    oracle = _lut_oracle(lambda v, cv, nv, mn, mx: nv, 16, 235, 255)
    np.testing.assert_array_equal(
        np.asarray(out.planes["y"]),
        oracle[np.asarray(fb.planes["y"]).astype(np.int64)])
    assert np.all(np.asarray(out.planes["u"]) == 128)
    assert np.all(np.asarray(out.planes["v"]) == 128)


def test_lutyuv_gammaval_oracle(rng):
    fb = _yuv(rng, n=1)
    out, _ = FilterGraph("lutyuv=y=gammaval(0.5)").process(fb)

    def g(v, cv, nv, mn, mx):
        return ((cv - mn) / (mx - mn)) ** 0.5 * (mx - mn) + mn
    oracle = _lut_oracle(g, 16, 235, 255)
    np.testing.assert_array_equal(
        np.asarray(out.planes["y"]),
        oracle[np.asarray(fb.planes["y"]).astype(np.int64)])


def test_lutrgb_invert_channel(rng):
    from gmat_tpu.core.frame import FrameBatch
    import jax.numpy as jnp
    rgb = rng.integers(0, 256, (1, 8, 8, 3)).astype(np.uint8)
    fb = FrameBatch({"rgb": jnp.asarray(rgb)}, "rgb24", 8, 8)
    out, _ = FilterGraph("lutrgb=r=maxval+minval-val").process(fb)
    o = np.asarray(out.planes["rgb"])
    np.testing.assert_array_equal(o[..., 0], 255 - rgb[..., 0])
    np.testing.assert_array_equal(o[..., 1:], rgb[..., 1:])
    # channel_order honored: same filter on bgr24 inverts channel 2
    fb2 = FrameBatch({"rgb": jnp.asarray(rgb)}, "bgr24", 8, 8)
    out2, _ = FilterGraph("lutrgb=r=maxval+minval-val").process(fb2)
    o2 = np.asarray(out2.planes["rgb"])
    np.testing.assert_array_equal(o2[..., 2], 255 - rgb[..., 2])
    np.testing.assert_array_equal(o2[..., :2], rgb[..., :2])


def test_lut_10bit_ranges(rng):
    """yuv420p10: limited range scales by 1<<2, final clip at 1023."""
    from gmat_tpu.core.frame import FrameBatch
    import jax.numpy as jnp
    y = rng.integers(0, 1024, (1, 8, 8)).astype(np.uint16)
    u = rng.integers(0, 1024, (1, 4, 4)).astype(np.uint16)
    v = rng.integers(0, 1024, (1, 4, 4)).astype(np.uint16)
    fb = FrameBatch({"y": jnp.asarray(y), "u": jnp.asarray(u),
                     "v": jnp.asarray(v)}, "yuv420p10", 8, 8)
    out, _ = FilterGraph("lutyuv=y=negval").process(fb)
    oracle = _lut_oracle(lambda vv, cv, nv, mn, mx: nv,
                         64, 940, 1023, size=65536)
    np.testing.assert_array_equal(np.asarray(out.planes["y"]),
                                  oracle[y.astype(np.int64)])


def test_lut_option_aliasing_last_wins(rng):
    """c0 and y share AVOption storage (vf_lut.c:87-100): the later
    option in the string wins; final clip is FULL range (max[A])."""
    fb = _yuv(rng, n=1)
    out, _ = FilterGraph("lutyuv=y=128:c0=255").process(fb)
    assert np.all(np.asarray(out.planes["y"]) == 255)   # not 235!
    out2, _ = FilterGraph("lutyuv=c0=255:y=128").process(fb)
    assert np.all(np.asarray(out2.planes["y"]) == 128)


def test_lut_family_and_format_errors(rng):
    fb = _yuv(rng, n=1)
    with pytest.raises(ValueError, match="RGB"):
        FilterGraph("lutrgb").process(fb)
    with pytest.raises(ValueError, match="unknown option"):
        FilterGraph("lutyuv=q=5").process(fb)
    # gray8 is full-range and only reachable via plain `lut`
    from gmat_tpu.core.frame import FrameBatch
    import jax.numpy as jnp
    g = rng.integers(0, 256, (1, 8, 8)).astype(np.uint8)
    gray = FrameBatch({"y": jnp.asarray(g)}, "gray8", 8, 8)
    out, _ = FilterGraph("lut=c0=negval").process(gray)
    np.testing.assert_array_equal(np.asarray(out.planes["y"]), 255 - g)
    with pytest.raises(ValueError, match="chroma"):
        FilterGraph("lutyuv").process(gray)


def test_lut_composes_in_jitted_chain(rng):
    fb = _yuv(rng, n=2)
    out, _ = FilterGraph("lutyuv=y=negval,scale=12:8,eq=contrast=1.2"
                         ).process(fb)
    assert (out.width, out.height) == (12, 8)


# ---- fade (vf_fade.c) -------------------------------------------------------

def _fade_oracle_yuv(y, u, v, factor, depth=8):
    """Independent integer-exact vf_fade math (filter_slice_luma/chroma)."""
    bl = 16 << (depth - 8)
    bls = (bl << 16) + 32768
    add = 8421367 if depth == 8 else ((1 << (depth - 1)) * 2 + 1) << 15
    mid = 1 << (depth - 1)
    dt = y.dtype
    yf = (((y.astype(np.int64) - bl) * factor + bls) >> 16).astype(dt)
    uf = (((u.astype(np.int64) - mid) * factor + add) >> 16).astype(dt)
    vf = (((v.astype(np.int64) - mid) * factor + add) >> 16).astype(dt)
    return yf, uf, vf


def test_fade_in_frame_based_oracle(rng):
    fb = _yuv(rng, n=8)
    g = FilterGraph("fade=in:0:4")
    out, _ = g.process(fb, pts=np.arange(8))
    y0 = np.asarray(fb.planes["y"]); u0 = np.asarray(fb.planes["u"])
    v0 = np.asarray(fb.planes["v"])
    yo = np.asarray(out.planes["y"]); uo = np.asarray(out.planes["u"])
    vo = np.asarray(out.planes["v"])
    fpf = 65536 // 4
    for i in range(8):
        f = min(i * fpf, 65535)
        if f >= 65535:                 # factor 65535 -> passthrough
            np.testing.assert_array_equal(yo[i], y0[i])
            np.testing.assert_array_equal(uo[i], u0[i])
            continue
        ye, ue, ve = _fade_oracle_yuv(y0[i], u0[i], v0[i], f)
        np.testing.assert_array_equal(yo[i], ye)
        np.testing.assert_array_equal(uo[i], ue)
        np.testing.assert_array_equal(vo[i], ve)
    # frame 0 of a fade-in is (nearly) black: Y==16, chroma ~128
    assert np.all(yo[0] == 16) and np.all(np.abs(uo[0].astype(int) - 128) <= 1)


def test_fade_out_time_based(rng):
    fb = _yuv(rng, n=6)
    g = FilterGraph("fade=type=out:start_time=0.2:duration=0.2")
    out, _ = g.process(fb, pts=np.arange(6) * 100,
                       times=np.arange(6) / 10.0)
    y0 = np.asarray(fb.planes["y"]); yo = np.asarray(out.planes["y"])
    # frames before start_time untouched (factor inverts to 65535)
    np.testing.assert_array_equal(yo[0], y0[0])
    np.testing.assert_array_equal(yo[1], y0[1])
    # past start+duration: fully black
    assert np.all(yo[5] == 16)
    # mid-fade frame matches the oracle with factor = 65535 - int((t-t0)*65535/d)
    f3 = 65535 - int((0.3 - 0.2) * 65535 / 0.2)
    ye, _, _ = _fade_oracle_yuv(y0[3], y0[3], y0[3], f3)
    np.testing.assert_array_equal(yo[3], ye)


def test_fade_rgb_color_and_alpha(rng):
    from gmat_tpu.core.frame import FrameBatch
    import jax.numpy as jnp
    rgba = rng.integers(0, 256, (4, 8, 8, 4)).astype(np.uint8)
    fb = FrameBatch({"rgb": jnp.asarray(rgba)}, "rgba", 8, 8)
    # colored fade-in: frame 0 is the fade color, alpha untouched
    g = FilterGraph("fade=in:0:4:color=red")
    out, _ = g.process(fb, pts=np.arange(4))
    o = np.asarray(out.planes["rgb"])
    assert np.all(o[0, ..., 0] == 255) and np.all(o[0, ..., 1] == 0)
    np.testing.assert_array_equal(o[..., 3], rgba[..., 3])
    # alpha-only fade: rgb untouched, alpha ramps from 0
    g2 = FilterGraph("fade=in:0:4:alpha=1")
    out2, _ = g2.process(fb, pts=np.arange(4))
    o2 = np.asarray(out2.planes["rgb"])
    np.testing.assert_array_equal(o2[..., :3], rgba[..., :3])
    assert np.all(o2[0, ..., 3] == 0)
    # black fade on packed RGB fades ALL bytes incl alpha (luma slice
    # covers width*bpp, vf_fade.c:264)
    g3 = FilterGraph("fade=in:0:4")
    out3, _ = g3.process(fb, pts=np.arange(4))
    o3 = np.asarray(out3.planes["rgb"])
    assert np.all(o3[0] == 0)
    f1 = 65536 // 4
    exp = ((rgba[1].astype(np.int64) * f1 + 32768) >> 16).astype(np.uint8)
    np.testing.assert_array_equal(o3[1], exp)


def test_fade_alive_only_counting(rng):
    """Frames dropped by an upstream select don't advance the fade."""
    fb = _yuv(rng, n=8)
    g = FilterGraph("select=mod(n\\,2),fade=in:0:2")
    out, keep = g.process(fb, pts=np.arange(8))
    yo = np.asarray(out.planes["y"])
    y0 = np.asarray(fb.planes["y"])
    # survivors are n=1,3,5,7 -> fade frames 0,1,2,3: factors 0, 32768, done...
    assert np.all(yo[1] == 16)                       # fade frame 0
    ye, _, _ = _fade_oracle_yuv(y0[3], y0[3], y0[3], 32768)
    np.testing.assert_array_equal(yo[3], ye)
    np.testing.assert_array_equal(yo[7], y0[7])      # past the fade


def test_fade_10bit_and_errors(rng):
    from gmat_tpu.core.frame import FrameBatch
    import jax.numpy as jnp
    y = rng.integers(0, 1024, (2, 8, 8)).astype(np.uint16)
    u = rng.integers(0, 1024, (2, 4, 4)).astype(np.uint16)
    v = rng.integers(0, 1024, (2, 4, 4)).astype(np.uint16)
    fb = FrameBatch({"y": jnp.asarray(y), "u": jnp.asarray(u),
                     "v": jnp.asarray(v)}, "yuv420p10", 8, 8)
    out, _ = FilterGraph("fade=in:0:4").process(fb, pts=np.arange(2))
    yo = np.asarray(out.planes["y"])
    assert np.all(yo[0] == 64)     # 10-bit studio black
    ye, ue, _ = _fade_oracle_yuv(y[1], u[1], v[1], 16384, depth=10)
    np.testing.assert_array_equal(yo[1], ye)
    np.testing.assert_array_equal(np.asarray(out.planes["u"])[1], ue)
    with pytest.raises(ValueError, match="times"):
        FilterGraph("fade=in:st=1").process(fb, pts=np.arange(2))


# ---- drawbox (vf_drawbox.c) -------------------------------------------------

def _drawbox_oracle_yuv(y, u, v, bx, by, bw, bh, t, rgba):
    """Independent per-pixel vf_drawbox draw_region loop (420)."""
    H, W = y.shape
    SB, HALF = 10, 512
    fix = lambda q: int(q * 1024 + 0.5)
    r, g, b, a = rgba
    yc = (fix(.299*219/255)*r + fix(.587*219/255)*g + fix(.114*219/255)*b
          + (HALF + (16 << SB))) >> SB
    uc = ((-fix(.16874*224/255)*r - fix(.33126*224/255)*g
           + fix(.5*224/255)*b + HALF - 1) >> SB) + 128
    vc = ((fix(.5*224/255)*r - fix(.41869*224/255)*g
           - fix(.08131*224/255)*b + HALF - 1) >> SB) + 128
    alpha = a / 255.0
    y, u, v = y.copy(), u.copy(), v.copy()
    for yy in range(max(by, 0), min(by + bh, H)):
        for xx in range(max(bx, 0), min(bx + bw, W)):
            if (yy - by < t or by + bh - 1 - yy < t or
                    xx - bx < t or bx + bw - 1 - xx < t):
                y[yy, xx] = int((1 - alpha) * y[yy, xx] + alpha * yc)
                u[yy >> 1, xx >> 1] = int((1 - alpha) * u[yy >> 1, xx >> 1]
                                          + alpha * uc)
                v[yy >> 1, xx >> 1] = int((1 - alpha) * v[yy >> 1, xx >> 1]
                                          + alpha * vc)
    return y, u, v


def test_drawbox_opaque_oracle(rng):
    fb = _yuv(rng, n=2, h=16, w=24)
    g = FilterGraph("drawbox=4:2:12:10:red:3")
    out, _ = g.process(fb)
    for i in range(2):
        ye, ue, ve = _drawbox_oracle_yuv(
            np.asarray(fb.planes["y"])[i], np.asarray(fb.planes["u"])[i],
            np.asarray(fb.planes["v"])[i], 4, 2, 12, 10, 3,
            (255, 0, 0, 255))
        np.testing.assert_array_equal(np.asarray(out.planes["y"])[i], ye)
        np.testing.assert_array_equal(np.asarray(out.planes["u"])[i], ue)
        np.testing.assert_array_equal(np.asarray(out.planes["v"])[i], ve)


def test_drawbox_translucent_chroma_compounding(rng):
    """alpha<1 re-blends each shared chroma sample once per covered luma
    pixel (vf_drawbox.c x>>hsub writes) — the oracle loop compounds the
    same way."""
    fb = _yuv(rng, n=1, h=16, w=24)
    g = FilterGraph("drawbox=2:2:20:12:green@0.5:fill")
    out, _ = g.process(fb)
    ye, ue, ve = _drawbox_oracle_yuv(
        np.asarray(fb.planes["y"])[0], np.asarray(fb.planes["u"])[0],
        np.asarray(fb.planes["v"])[0], 2, 2, 20, 12, 2**31 - 1,
        (0, 128, 0, 128))
    np.testing.assert_array_equal(np.asarray(out.planes["y"])[0], ye)
    np.testing.assert_array_equal(np.asarray(out.planes["u"])[0], ue)
    np.testing.assert_array_equal(np.asarray(out.planes["v"])[0], ve)


def test_drawbox_invert_and_expressions(rng):
    fb = _yuv(rng, n=1, h=16, w=24)
    # iw/4 etc expressions + invert color: luma inverted, chroma untouched
    g = FilterGraph("drawbox=x=iw/4:y=ih/4:w=iw/2:h=ih/2:color=invert:t=fill")
    out, _ = g.process(fb)
    y0 = np.asarray(fb.planes["y"])[0]
    yo = np.asarray(out.planes["y"])[0]
    np.testing.assert_array_equal(yo[4:12, 6:18], 255 - y0[4:12, 6:18])
    np.testing.assert_array_equal(yo[:4], y0[:4])
    np.testing.assert_array_equal(np.asarray(out.planes["u"]),
                                  np.asarray(fb.planes["u"]))
    # w=0 -> full width (vf_drawbox.c:345)
    g2 = FilterGraph("drawbox=0:0:0:4:white:fill")
    out2, _ = g2.process(fb)
    assert np.all(np.asarray(out2.planes["y"])[0, :4] == 235)


def test_drawbox_rgb_blend_and_replace(rng):
    from gmat_tpu.core.frame import FrameBatch
    import jax.numpy as jnp
    rgba = rng.integers(0, 256, (1, 8, 12, 4)).astype(np.uint8)
    fb = FrameBatch({"rgb": jnp.asarray(rgba)}, "rgba", 12, 8)
    out, _ = FilterGraph("drawbox=2:2:6:4:blue@0.5:fill").process(fb)
    o = np.asarray(out.planes["rgb"])[0]
    a = np.float32(128 / 255.0)          # @0.5 -> alpha byte 128
    exp_r = (np.float32(1.0) - a) * rgba[0, 2:6, 2:8, 0].astype(np.float32)
    np.testing.assert_array_equal(o[2:6, 2:8, 0],
                                  exp_r.astype(np.uint8))
    np.testing.assert_array_equal(o[..., 3], rgba[0, ..., 3])  # alpha kept
    # replace=1 writes color+alpha verbatim
    out2, _ = FilterGraph(
        "drawbox=2:2:6:4:blue@0.5:t=fill:replace=1").process(fb)
    o2 = np.asarray(out2.planes["rgb"])[0]
    assert np.all(o2[2:6, 2:8, 2] == 255) and np.all(o2[2:6, 2:8, 3] == 128)
    np.testing.assert_array_equal(o2[:2], rgba[0, :2])


# ---- unsharp (vf_unsharp.c) -------------------------------------------------

def _unsharp_oracle(plane, msx, msy, amount_f, bits=8):
    """Independent reimplementation: binomial blur with edge clamp, then
    res = p + ((p - round(blur)) * amount) >> (8+bits), clipped."""
    sx, sy = msx // 2, msy // 2
    amount = int(amount_f * 65536.0)
    if amount == 0:
        return plane.copy()
    row = np.ones(1, np.int64)
    for _ in range(2 * sx):
        row = np.convolve(row, [1, 1])
    col = np.ones(1, np.int64)
    for _ in range(2 * sy):
        col = np.convolve(col, [1, 1])
    h, w = plane.shape
    p64 = plane.astype(np.int64)
    padded = np.pad(p64, ((sy, sy), (sx, sx)), mode="edge")
    acc = np.zeros((h, w), np.int64)
    for dy, cy_ in enumerate(col):
        for dx, cx_ in enumerate(row):
            acc += cy_ * cx_ * padded[dy:dy + h, dx:dx + w]
    scalebits = (sx + sy) * 2
    blur = (acc + (1 << (scalebits - 1))) >> scalebits
    res = p64 + (((p64 - blur) * amount) >> (8 + bits))
    return np.clip(res, 0, (1 << bits) - 1).astype(plane.dtype)


def test_unsharp_oracle_default(rng):
    fb = _yuv(rng, n=2, h=16, w=24)
    out, _ = FilterGraph("unsharp").process(fb)     # 5:5:1.0, chroma off
    for i in range(2):
        exp = _unsharp_oracle(np.asarray(fb.planes["y"])[i], 5, 5, 1.0)
        np.testing.assert_array_equal(np.asarray(out.planes["y"])[i], exp)
    np.testing.assert_array_equal(np.asarray(out.planes["u"]),
                                  np.asarray(fb.planes["u"]))


def test_unsharp_blur_and_chroma(rng):
    fb = _yuv(rng, n=1, h=16, w=24)
    # negative amount blurs; asymmetric matrix; chroma active; aliases
    out, _ = FilterGraph("unsharp=lx=7:ly=3:la=-1.5:ca=0.8").process(fb)
    exp_y = _unsharp_oracle(np.asarray(fb.planes["y"])[0], 7, 3, -1.5)
    np.testing.assert_array_equal(np.asarray(out.planes["y"])[0], exp_y)
    exp_u = _unsharp_oracle(np.asarray(fb.planes["u"])[0], 5, 5, 0.8)
    np.testing.assert_array_equal(np.asarray(out.planes["u"])[0], exp_u)


def test_unsharp_16bit_container_semantics(rng):
    """10-bit planes use the 16-bit slice macro: shift 8+16, clip 65535."""
    from gmat_tpu.core.frame import FrameBatch
    import jax.numpy as jnp
    y = rng.integers(0, 1024, (1, 8, 12)).astype(np.uint16)
    u = rng.integers(0, 1024, (1, 4, 6)).astype(np.uint16)
    v = rng.integers(0, 1024, (1, 4, 6)).astype(np.uint16)
    fb = FrameBatch({"y": jnp.asarray(y), "u": jnp.asarray(u),
                     "v": jnp.asarray(v)}, "yuv420p10", 12, 8)
    out, _ = FilterGraph("unsharp=5:5:2.0").process(fb)
    exp = _unsharp_oracle(y[0], 5, 5, 2.0, bits=16)
    np.testing.assert_array_equal(np.asarray(out.planes["y"])[0], exp)


def test_unsharp_validation(rng):
    fb = _yuv(rng, n=1)
    # AVOption range is 3..23 with EVEN values legal (msize/2 floors):
    # unsharp=4 behaves exactly like unsharp=5
    o4, _ = FilterGraph("unsharp=4:4:1.0").process(fb)
    o5, _ = FilterGraph("unsharp=5:5:1.0").process(fb)
    np.testing.assert_array_equal(np.asarray(o4.planes["y"]),
                                  np.asarray(o5.planes["y"]))
    with pytest.raises(ValueError, match="3..23"):
        FilterGraph("unsharp=25:5:1.0").process(fb)
    # the reference's only size gate: scalebits >= 26
    with pytest.raises(ValueError, match="too big"):
        FilterGraph("unsharp=15:13:1.0").process(fb)


# ---- hue (vf_hue.c) ---------------------------------------------------------

def _hue_oracle(u, v, hue_rad, sat, bits=8):
    hs = int(np.rint(np.sin(hue_rad) * 65536.0 * sat))
    hc = int(np.rint(np.cos(hue_rad) * 65536.0 * sat))
    mid = 512 if bits > 8 else 128
    cmax = 1023 if bits > 8 else 255
    ui = u.astype(np.int64) - mid
    vi = v.astype(np.int64) - mid
    add = (1 << 15) + (mid << 16)
    nu = np.clip((hc * ui - hs * vi + add) >> 16, 0, cmax)
    nv = np.clip((hs * ui + hc * vi + add) >> 16, 0, cmax)
    return nu.astype(u.dtype), nv.astype(v.dtype)


def test_hue_rotation_oracle(rng):
    fb = _yuv(rng, n=2)
    out, _ = FilterGraph("hue=h=90:s=1.5").process(fb, pts=np.arange(2))
    ue, ve = _hue_oracle(np.asarray(fb.planes["u"]),
                         np.asarray(fb.planes["v"]),
                         np.pi / 2, 1.5)
    np.testing.assert_array_equal(np.asarray(out.planes["u"]), ue)
    np.testing.assert_array_equal(np.asarray(out.planes["v"]), ve)
    np.testing.assert_array_equal(np.asarray(out.planes["y"]),
                                  np.asarray(fb.planes["y"]))  # b=0


def test_hue_brightness_lut_and_identity(rng):
    fb = _yuv(rng, n=1)
    out, _ = FilterGraph("hue=b=2").process(fb, pts=np.arange(1))
    y0 = np.asarray(fb.planes["y"])
    exp = np.clip(np.trunc(y0.astype(np.float64) + 2 * 25.5),
                  0, 255).astype(np.uint8)
    np.testing.assert_array_equal(np.asarray(out.planes["y"]), exp)
    # pure identity is a true no-op (same arrays)
    out2, _ = FilterGraph("hue").process(fb, pts=np.arange(1))
    np.testing.assert_array_equal(np.asarray(out2.planes["u"]),
                                  np.asarray(fb.planes["u"]))


def test_hue_per_frame_expression(rng):
    """h='n*90' evaluates per frame: frame 0 identity, frame 2 at 180
    degrees (u,v mirrored around mid)."""
    fb = _yuv(rng, n=3)
    out, _ = FilterGraph("hue=h=n*90").process(fb, pts=np.arange(3))
    np.testing.assert_array_equal(np.asarray(out.planes["u"])[0],
                                  np.asarray(fb.planes["u"])[0])
    ue, ve = _hue_oracle(np.asarray(fb.planes["u"])[2],
                         np.asarray(fb.planes["v"])[2], np.pi, 1.0)
    np.testing.assert_array_equal(np.asarray(out.planes["u"])[2], ue)
    np.testing.assert_array_equal(np.asarray(out.planes["v"])[2], ve)


def test_hue_10bit(rng):
    from gmat_tpu.core.frame import FrameBatch
    import jax.numpy as jnp
    y = rng.integers(0, 1024, (1, 8, 12)).astype(np.uint16)
    u = rng.integers(0, 1024, (1, 4, 6)).astype(np.uint16)
    v = rng.integers(0, 1024, (1, 4, 6)).astype(np.uint16)
    fb = FrameBatch({"y": jnp.asarray(y), "u": jnp.asarray(u),
                     "v": jnp.asarray(v)}, "yuv420p10", 12, 8)
    out, _ = FilterGraph("hue=H=PI/3:s=-2:b=1").process(fb,
                                                        pts=np.arange(1))
    ue, ve = _hue_oracle(u, v, np.pi / 3, -2.0, bits=10)
    np.testing.assert_array_equal(np.asarray(out.planes["u"]), ue)
    np.testing.assert_array_equal(np.asarray(out.planes["v"]), ve)
    exp_y = np.clip(np.trunc(y.astype(np.float64) + 102.4),
                    0, 1023).astype(np.uint16)
    np.testing.assert_array_equal(np.asarray(out.planes["y"]), exp_y)


# ---- round-4 review regressions (second pass) -------------------------------

def test_unsharp_13x13_8bit_exact(rng):
    """bits+scalebits == 32 is exact in the reference's uint32
    accumulation — must be accepted and match the oracle (review r4)."""
    fb = _yuv(rng, n=1, h=16, w=24)
    out, _ = FilterGraph("unsharp=13:13:1.0").process(fb)
    exp = _unsharp_oracle(np.asarray(fb.planes["y"])[0], 13, 13, 1.0)
    np.testing.assert_array_equal(np.asarray(out.planes["y"])[0], exp)


def test_unsharp_16bit_uint32_wrap(rng):
    """Past the exact envelope the reference wraps its uint32
    accumulator; the int32 einsum + masked logical shift reproduces
    that (review r4)."""
    from gmat_tpu.core.frame import FrameBatch
    from gmat_tpu.ops.enhance import unsharp
    import jax.numpy as jnp
    y = rng.integers(0, 65536, (1, 12, 12)).astype(np.uint16)
    u = rng.integers(0, 65536, (1, 6, 6)).astype(np.uint16)
    v = rng.integers(0, 65536, (1, 6, 6)).astype(np.uint16)
    fb = FrameBatch({"y": jnp.asarray(y), "u": jnp.asarray(u),
                     "v": jnp.asarray(v)}, "yuv420p16", 12, 12)
    out = unsharp(fb, 11, 9, 1.5)       # scalebits 18: wraps on uint16
    # wrap-emulating oracle: uint32 accumulate, logical shift
    sx, sy = 5, 4
    row = np.ones(1, np.int64)
    for _ in range(2 * sx):
        row = np.convolve(row, [1, 1])
    col = np.ones(1, np.int64)
    for _ in range(2 * sy):
        col = np.convolve(col, [1, 1])
    p64 = y[0].astype(np.int64)
    padded = np.pad(p64, ((sy, sy), (sx, sx)), mode="edge")
    acc = np.zeros_like(p64)
    for dy, cy_ in enumerate(col):
        for dx, cx_ in enumerate(row):
            acc += cy_ * cx_ * padded[dy:dy + 12, dx:dx + 12]
    scalebits = (sx + sy) * 2
    blur = ((acc + (1 << (scalebits - 1))) % (1 << 32)) >> scalebits
    amount = int(1.5 * 65536)
    prod = (p64 - blur) * amount
    prod = ((prod + (1 << 31)) % (1 << 32)) - (1 << 31)   # int32 wrap
    res = p64 + (prod >> 24)
    exp = np.clip(res, 0, 65535).astype(np.uint16)
    np.testing.assert_array_equal(np.asarray(out.planes["y"])[0], exp)


def test_fade_16bit_wrapped_add(rng):
    """depth-16 chroma add constant wraps int32 in the C source; fade
    must accept yuv420p16 and reproduce the wrapped math (review r4)."""
    from gmat_tpu.core.frame import FrameBatch
    import jax.numpy as jnp
    y = rng.integers(0, 65536, (2, 8, 8)).astype(np.uint16)
    u = rng.integers(0, 65536, (2, 4, 4)).astype(np.uint16)
    v = rng.integers(0, 65536, (2, 4, 4)).astype(np.uint16)
    fb = FrameBatch({"y": jnp.asarray(y), "u": jnp.asarray(u),
                     "v": jnp.asarray(v)}, "yuv420p16", 8, 8)
    out, _ = FilterGraph("fade=in:0:4").process(fb, pts=np.arange(2))
    add = ((1 << 16) + 1) << 15
    add -= 1 << 32                    # the C int32 wrap
    f = 65536 // 4
    exp_u = (((u[1].astype(np.int64) - 32768) * f + add) >> 16) \
        .astype(np.uint16)
    np.testing.assert_array_equal(np.asarray(out.planes["u"])[1], exp_u)


def test_fade_alpha_without_alpha_channel_raises(rng):
    fb = _yuv(rng, n=2)
    with pytest.raises(ValueError, match="alpha"):
        FilterGraph("fade=in:0:4:alpha=1").process(fb, pts=np.arange(2))


def test_lut_int_cast_saturation_matches_c(rng):
    """(int)res is cvttsd2si: +/-inf and out-of-int32-range all produce
    INT_MIN -> clip to 0 (BLACK), never clip_max (review r4)."""
    fb = _yuv(rng, n=1)
    out, _ = FilterGraph("lutyuv=y=val*1e10").process(fb)
    assert np.all(np.asarray(out.planes["y"]) == 0)


def test_color_rgba_shared_parser():
    from gmat_tpu.ops.geometry import parse_color_rgba
    assert parse_color_rgba("red") == (255, 0, 0, 255)
    assert parse_color_rgba("green@0.5") == (0, 128, 0, 128)
    assert parse_color_rgba("#11223344") == (0x11, 0x22, 0x33, 0x44)
    assert parse_color_rgba("#11223344@1.0") == (0x11, 0x22, 0x33, 255)
    with pytest.raises(ValueError):
        parse_color_rgba("red@bogus")


# ---- colorchannelmixer (vf_colorchannelmixer.c) -----------------------------

def test_colorchannelmixer_per_term_rounding_oracle(rng):
    from gmat_tpu.core.frame import FrameBatch
    import jax.numpy as jnp
    a = rng.integers(0, 256, (1, 6, 9, 3)).astype(np.uint8)
    fb = FrameBatch({"rgb": jnp.asarray(a)}, "rgb24", 9, 6)
    # rec601-style grayscale mix on every output channel
    g = FilterGraph("colorchannelmixer=.299:.587:.114:0:"
                    ".299:.587:.114:0:.299:.587:.114")
    out, _ = g.process(fb)
    o = np.asarray(out.planes["rgb"])
    r64 = a[..., 0].astype(np.int64)
    g64 = a[..., 1].astype(np.int64)
    b64 = a[..., 2].astype(np.int64)
    # the reference sums FOUR individually lrint'ed LUT terms
    exp = (np.rint(r64 * .299) + np.rint(g64 * .587)
           + np.rint(b64 * .114)).clip(0, 255).astype(np.uint8)
    for c in range(3):
        np.testing.assert_array_equal(o[..., c], exp)


def test_colorchannelmixer_alpha_and_identity(rng):
    from gmat_tpu.core.frame import FrameBatch
    import jax.numpy as jnp
    a = rng.integers(0, 256, (1, 4, 6, 4)).astype(np.uint8)
    fb = FrameBatch({"rgb": jnp.asarray(a)}, "rgba", 6, 4)
    out, _ = FilterGraph("colorchannelmixer").process(fb)   # identity
    np.testing.assert_array_equal(np.asarray(out.planes["rgb"]), a)
    # red channel fed by alpha; alpha stays identity
    out2, _ = FilterGraph("colorchannelmixer=rr=0:ra=1").process(fb)
    o2 = np.asarray(out2.planes["rgb"])
    np.testing.assert_array_equal(o2[..., 0], a[..., 3])
    np.testing.assert_array_equal(o2[..., 3], a[..., 3])
    # negative coefs clip at zero
    out3, _ = FilterGraph("colorchannelmixer=rr=-1").process(fb)
    assert np.all(np.asarray(out3.planes["rgb"])[..., 0] == 0)
    with pytest.raises(ValueError, match="outside"):
        FilterGraph("colorchannelmixer=rr=3")
    with pytest.raises(ValueError, match="preserve"):
        FilterGraph("colorchannelmixer=pc=lum")


# ---- colorbalance (vf_colorbalance.c) ---------------------------------------

def _cb_oracle_px(r8, g8, b8, prm, pl=False, maxv=255.0):
    f = np.float32
    r, g, b = f(r8) / f(maxv), f(g8) / f(maxv), f(b8) / f(maxv)
    l = max(r, g, b) + min(r, g, b)

    def comp(v, s, m, h):
        a, bb, sc = f(4.0), f(0.333), f(0.7)
        cl = lambda x: min(max(x, f(0)), f(1))
        s = f(s) * cl((bb - l) * a + f(0.5)) * sc
        m = f(m) * cl((l - bb) * a + f(0.5)) * cl((f(1) - l - bb) * a
                                                  + f(0.5)) * sc
        h = f(h) * cl((l + bb - f(1)) * a + f(0.5)) * sc
        return cl(v + s + m + h)

    r = comp(r, prm.get("rs", 0), prm.get("rm", 0), prm.get("rh", 0))
    g = comp(g, prm.get("gs", 0), prm.get("gm", 0), prm.get("gh", 0))
    b = comp(b, prm.get("bs", 0), prm.get("bm", 0), prm.get("bh", 0))
    if pl:
        mx, mn = max(r, g, b), min(r, g, b)
        ll = l * f(0.5)
        if r == g == b:
            h = f(0.0)
        elif mx == r:
            h = f(60.0) * ((g - b) / (mx - mn))
        elif mx == g:
            h = f(60.0) * (f(2.0) + (b - r) / (mx - mn))
        else:
            h = f(60.0) * (f(4.0) + (r - g) / (mx - mn))
        if h < 0:
            h += f(360.0)
        s = f(0.0) if (mx == 1.0 or mn == 0.0) \
            else (mx - mn) / (f(1) - abs(f(2) * ll - f(1)))

        def hfun(n):
            a = s * min(ll, f(1) - ll)
            k = np.fmod(f(n) + h / f(30.0), f(12.0))
            return min(max(ll - a * max(min(k - f(3), f(9) - k, f(1)),
                                        f(-1)), f(0)), f(1))
        r, g, b = hfun(0.0), hfun(8.0), hfun(4.0)
    rnd = lambda v: int(min(max(np.rint(np.float32(v) * np.float32(maxv)),
                                0), maxv))
    return rnd(r), rnd(g), rnd(b)


@pytest.mark.parametrize("pl", [0, 1])
def test_colorbalance_oracle(rng, pl):
    from gmat_tpu.core.frame import FrameBatch
    import jax.numpy as jnp
    a = rng.integers(0, 256, (1, 5, 7, 3)).astype(np.uint8)
    fb = FrameBatch({"rgb": jnp.asarray(a)}, "rgb24", 7, 5)
    prm = dict(rs=0.3, gm=-0.4, bh=0.25, rm=0.1)
    g = FilterGraph("colorbalance=rs=0.3:gm=-0.4:bh=0.25:rm=0.1"
                    f":pl={pl}")
    out, _ = g.process(fb)
    o = np.asarray(out.planes["rgb"])
    # pl=0 is pure clipped adds: bit-exact.  pl=1 walks through HSL
    # divisions where XLA's fma contraction can differ from any given C
    # build by 1 ulp (gcc defaults to -ffp-contract=fast too, so the
    # reference itself is compiler-dependent here) -> allow 1 LSB.
    tol = 0 if not pl else 1
    for yy in range(5):
        for xx in range(7):
            exp = _cb_oracle_px(*a[0, yy, xx], prm, pl=bool(pl))
            got = tuple(int(v) for v in o[0, yy, xx])
            assert all(abs(gv - ev) <= tol for gv, ev in zip(got, exp)), \
                (yy, xx, got, exp, tuple(a[0, yy, xx]))


def test_colorbalance_identity_and_validation(rng):
    from gmat_tpu.core.frame import FrameBatch
    import jax.numpy as jnp
    a = rng.integers(0, 256, (1, 4, 6, 4)).astype(np.uint8)
    fb = FrameBatch({"rgb": jnp.asarray(a)}, "rgba", 6, 4)
    out, _ = FilterGraph("colorbalance").process(fb)
    np.testing.assert_array_equal(np.asarray(out.planes["rgb"]), a)
    with pytest.raises(ValueError, match="outside"):
        FilterGraph("colorbalance=rs=2")
