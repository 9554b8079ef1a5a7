"""tonemap / zscale / transfer-curve tests.

The tonemap oracle below is transcribed INDEPENDENTLY from
ffmpeg-gpu/libavfilter/vf_tonemap.c (tonemap():110-173, init():65-88,
hable():90-94, mobius():96-107) — numpy per-pixel math mirroring the C's
float lvalues and double-promoted constant expressions — and compared
against the jnp implementation in gmat_tpu/ops/tonemap.py.

Transfer-curve and primaries checks pin the ST 2084 / Rec.709 / sRGB
constants to published reference values (SMPTE ST 2084:2014 table 4,
ITU-R BT.2087 Rec.709<->2020 matrix) rather than to our own code.
"""
import math

import numpy as np
import pytest

import jax.numpy as jnp

from gmat_tpu.core import transfer as T
from gmat_tpu.core.frame import FrameBatch, from_numpy_yuv420
from gmat_tpu.filters.builtin import FilterError
from gmat_tpu.filters.graph import FilterGraph
from gmat_tpu.ops import tonemap as TM


# ---------------------------------------------------------------------------
# independent oracle (vf_tonemap.c transcription)

def _hable_c(x):
    a, b, c, d, e, f = (np.float32(v) for v in
                        (0.15, 0.50, 0.10, 0.20, 0.02, 0.30))
    x = np.float32(x)
    return (x * (x * a + b * c) + d * e) / (x * (x * a + b) + d * f) - e / f


def _mobius_c(sig, j, peak):
    # mobius() vf_tonemap.c:96-107; a/b are float lvalues of double exprs
    j = np.float32(j)
    a = np.float32(-j * j * (peak - 1.0) / (j * j - 2.0 * j + peak))
    b = np.float32((j * j - 2.0 * j * peak + peak) / max(peak - 1.0, 1e-6))
    val = (b * b + 2 * b * j + j * j) / (b - a) * (sig + a) / (sig + b)
    return np.where(sig <= j, sig, val)


def _init_param_c(method, param):
    # init() vf_tonemap.c:65-88
    if method == "gamma" and math.isnan(param):
        param = 1.8
    elif method == "reinhard" and not math.isnan(param):
        param = (1.0 - param) / param
    elif method == "mobius" and math.isnan(param):
        param = 0.3
    if math.isnan(param):
        param = 1.0
    return param


def tonemap_oracle(rgb, method, param, desat, peak, coeffs):
    """tonemap() vf_tonemap.c:110-173, vectorized verbatim."""
    rin = rgb[..., 0].astype(np.float32)
    gin = rgb[..., 1].astype(np.float32)
    bin_ = rgb[..., 2].astype(np.float32)
    r, g, b = rin.copy(), gin.copy(), bin_.copy()
    if desat > 0 and coeffs is not None:
        cr, cg, cb = coeffs
        luma = np.float32(cr * rin.astype(np.float64)
                          + cg * gin.astype(np.float64)
                          + cb * bin_.astype(np.float64))
        over = (np.maximum(luma - np.float32(desat), np.float32(1e-6))
                / np.maximum(luma, np.float32(1e-6)))
        r = rin * (1 - over) + luma * over
        g = gin * (1 - over) + luma * over
        b = bin_ * (1 - over) + luma * over
    sig = np.maximum(np.maximum(np.maximum(r, g), b), np.float32(1e-6))
    sig_orig = sig.copy()
    if method == "none":
        pass
    elif method == "linear":
        sig = np.float32(sig.astype(np.float64) * param / peak)
    elif method == "gamma":
        sig = np.where(
            sig > 0.05,
            np.float32(np.power(sig.astype(np.float64) / peak,
                                1.0 / param)),
            np.float32(sig.astype(np.float64)
                       * math.pow(0.05 / peak, 1.0 / param) / 0.05))
    elif method == "clip":
        sig = np.clip(np.float32(sig.astype(np.float64) * param), 0, 1
                      ).astype(np.float32)
    elif method == "hable":
        sig = _hable_c(sig) / _hable_c(np.float32(peak))
    elif method == "reinhard":
        sig = np.float32(
            sig.astype(np.float64) / (sig + np.float32(param))
            * (peak + param) / peak)
    elif method == "mobius":
        sig = _mobius_c(sig, param, peak).astype(np.float32)
    scale = sig / sig_orig
    return np.stack([r * scale, g * scale, b * scale], axis=-1)


BT2020 = (0.2627, 0.6780, 0.0593)


@pytest.fixture
def hdr_rgb(rng):
    # linear-light values spanning SDR range and HDR overbrights up to
    # ~peak 12, plus exact knee/branch values
    x = rng.uniform(0.0, 12.0, (2, 7, 9, 3)).astype(np.float32)
    x[0, 0, 0] = [0.05, 0.05, 0.05]       # gamma branch point
    x[0, 0, 1] = [0.3, 0.3, 0.3]          # mobius knee (default j)
    x[0, 0, 2] = [0.0, 0.0, 0.0]          # sig floor 1e-6
    x[0, 0, 3] = [1.0, 0.2, 0.1]
    return x


@pytest.mark.parametrize("method", TM.METHODS)
def test_operators_vs_oracle(method, hdr_rgb):
    peak = 10.0
    p = TM.resolve_param(method, float("nan"))
    assert p == _init_param_c(method, float("nan"))
    got = np.asarray(TM.tonemap_rgb(jnp.asarray(hdr_rgb), method, p,
                                    0.0, peak, None))
    want = tonemap_oracle(hdr_rgb, method, p, 0.0, peak, None)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("method,param", [
    ("linear", 0.5), ("gamma", 2.2), ("clip", 1.5),
    ("reinhard", 0.4), ("mobius", 0.6),
])
def test_operators_explicit_param(method, param, hdr_rgb):
    peak = 49.26   # a 4926-nit mdcv peak
    p = TM.resolve_param(method, param)
    assert p == _init_param_c(method, param)
    got = np.asarray(TM.tonemap_rgb(jnp.asarray(hdr_rgb), method, p,
                                    0.0, peak, None))
    want = tonemap_oracle(hdr_rgb, method, p, 0.0, peak, None)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_reinhard_param_transform():
    # reinhard param p -> (1-p)/p happens ONLY when given
    assert TM.resolve_param("reinhard", 0.25) == pytest.approx(3.0)
    assert TM.resolve_param("reinhard", float("nan")) == 1.0
    assert TM.resolve_param("gamma", float("nan")) == pytest.approx(1.8)
    assert TM.resolve_param("mobius", float("nan")) == pytest.approx(0.3)
    assert TM.resolve_param("hable", float("nan")) == 1.0


def test_desat_path(hdr_rgb):
    got = np.asarray(TM.tonemap_rgb(jnp.asarray(hdr_rgb), "hable", 1.0,
                                    2.0, 10.0, BT2020))
    want = tonemap_oracle(hdr_rgb, "hable", 1.0, 2.0, 10.0, BT2020)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)
    # desat actually changes overbright pixels
    plain = tonemap_oracle(hdr_rgb, "hable", 1.0, 0.0, 10.0, None)
    assert np.abs(want - plain).max() > 1e-3


# ---------------------------------------------------------------------------
# transfer curves / primaries

def test_pq_reference_points():
    # ST 2084: V=1 -> 10000 cd/m2; V=0.508078 -> ~100 cd/m2 (known pair)
    assert float(T.linearize(jnp.float32(1.0), "smpte2084", 100.0)) == \
        pytest.approx(100.0, rel=1e-5)
    v100 = float(T.delinearize(jnp.float32(1.0), "st2084", 100.0))
    assert v100 == pytest.approx(0.5080784, rel=1e-4)
    # round trip across the range
    x = jnp.linspace(0.0, 1.0, 64)
    rt = T.delinearize(T.linearize(x, "pq", 100.0), "pq", 100.0)
    np.testing.assert_allclose(np.asarray(rt), np.asarray(x),
                               rtol=1e-4, atol=1e-5)


def test_sdr_curves_roundtrip():
    x = jnp.linspace(0.0, 1.0, 97)
    for trc in ("709", "srgb", "bt1886", "gamma22", "gamma28",
                "arib-std-b67"):
        rt = T.delinearize(T.linearize(x, trc, 100.0), trc, 100.0)
        np.testing.assert_allclose(np.asarray(rt), np.asarray(x),
                                   rtol=1e-4, atol=1e-5, err_msg=trc)


def test_709_curve_constants():
    # Rec.709 OETF: at the 0.018 knee the power branch applies —
    # 1.099*0.018^0.45-0.099 = 0.081248 (the curve's well-known ~0.00025
    # discontinuity vs the 4.5*L=0.081 linear side)
    assert float(T.delinearize(jnp.float32(0.018), "709")) == \
        pytest.approx(1.099 * 0.018 ** 0.45 - 0.099, rel=1e-5)
    assert float(T.delinearize(jnp.float32(0.0179), "709")) == \
        pytest.approx(4.5 * 0.0179, rel=1e-5)
    assert float(T.linearize(jnp.float32(0.01), "709")) == \
        pytest.approx(0.01 / 4.5, rel=1e-6)


def test_hlg_peak():
    # inverse OETF of 1.0 is 1.0 scene-linear -> 1000/npl
    assert float(T.linearize(jnp.float32(1.0), "hlg", 100.0)) == \
        pytest.approx(10.0, rel=1e-5)
    assert float(T.linearize(jnp.float32(0.5), "hlg", 100.0)) == \
        pytest.approx((0.25 / 3) * 10.0, rel=1e-5)


def test_rgb2xyz_bt709_known():
    # Rec.709 RGB->XYZ (sRGB/IEC 61966 published matrix)
    m = T.rgb2xyz_matrix("bt709")
    np.testing.assert_allclose(
        m, [[0.4124, 0.3576, 0.1805],
            [0.2126, 0.7152, 0.0722],
            [0.0193, 0.1192, 0.9505]], atol=2e-4)


def test_gamut_2020_to_709_known():
    # ITU-R BT.2087-0 table 1 (2020 -> 709 linear matrix)
    m = T.gamut_matrix("bt2020", "bt709")
    np.testing.assert_allclose(
        m, [[1.6605, -0.5876, -0.0728],
            [-0.1246, 1.1329, -0.0083],
            [-0.0182, -0.1006, 1.1187]], atol=2e-4)
    # white maps to white
    np.testing.assert_allclose(m @ np.ones(3), np.ones(3), atol=1e-6)


# ---------------------------------------------------------------------------
# filter plumbing

def _pq_batch(rng, n=2, h=16, w=24):
    y = rng.integers(64, 941, (n, h, w)).astype(np.uint16)
    u = rng.integers(64, 961, (n, h // 2, w // 2)).astype(np.uint16)
    v = rng.integers(64, 961, (n, h // 2, w // 2)).astype(np.uint16)
    return from_numpy_yuv420(y, u, v, "yuv420p10", "bt2020")


HDR_META = {"trc": "smpte2084", "primaries": "bt2020",
            "max_cll": 4000, "max_luminance": 1000.0}


def test_hdr_pipeline_end_to_end(rng):
    fb = _pq_batch(rng)
    g = FilterGraph("zscale=t=linear:npl=100,format=gbrpf32le,"
                    "zscale=p=bt709,tonemap=hable:desat=0,"
                    "zscale=t=bt709:m=bt709:r=tv,format=yuv420p",
                    stream_meta=dict(HDR_META))
    out, keep = g.process(fb)
    assert out.format == "yuv420p" and out.colorspace == "bt709"
    assert keep.all()
    assert g.link_state["trc"] == "709"
    assert g.link_state["primaries"] == "709"
    # post-tonemap side data rewritten to peak*100 (ff_update_hdr_metadata)
    assert g.link_state["max_cll"] == pytest.approx(4000.0)


def test_pipeline_matches_composed_oracle(rng):
    """The full chain equals the hand-composed conversion steps."""
    fb = _pq_batch(rng)
    g = FilterGraph("zscale=t=linear:npl=100,format=gbrpf32le,"
                    "tonemap=tonemap=hable,"
                    "zscale=p=bt709:t=bt709:m=bt709,format=gbrpf32le",
                    stream_meta=dict(HDR_META))
    out, _ = g.process(fb)
    got = np.asarray(out.planes["rgb"])

    from gmat_tpu.ops import csc
    # exact=True: zscale keeps full float precision (zimg semantics), no
    # snap back to the 10-bit integer grid — PQ steepness would turn a
    # half-LSB snap into ~1% linear-light error
    nl = np.asarray(csc.yuv_to_rgb(fb, "rgbpf32", exact=True).planes["rgb"])
    lin = np.asarray(T.linearize(jnp.asarray(nl), "st2084", 100.0))
    peak = 4000 / 100.0                     # MaxCLL wins over mdcv
    tm = tonemap_oracle(lin, "hable", 1.0, 2.0, peak, BT2020)
    gm = T.gamut_matrix("bt2020", "bt709")
    conv = np.einsum("...c,dc->...d", tm, gm)
    want = np.asarray(T.delinearize(jnp.asarray(conv), "709", 100.0))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-5)


def test_peak_resolution_order():
    from gmat_tpu.filters.hdr import resolve_peak
    assert resolve_peak(dict(HDR_META)) == pytest.approx(40.0)
    assert resolve_peak({"max_luminance": 1000.0}) == pytest.approx(10.0)
    assert resolve_peak({"trc": "smpte2084"}) == 100.0
    assert resolve_peak({"trc": "bt709"}) == 10.0
    assert resolve_peak(None) == 10.0
    assert resolve_peak(dict(HDR_META), explicit=25.0) == 25.0


def test_tonemap_rejects_integer_input(rng):
    g = FilterGraph("tonemap=hable")
    fb = _pq_batch(rng)
    with pytest.raises(FilterError, match="float RGB"):
        g.process(fb)


def test_tonemap_alpha_passthrough(rng):
    arr = rng.uniform(0, 4, (1, 8, 8, 4)).astype(np.float32)
    fb = FrameBatch({"rgb": jnp.asarray(arr)}, "rgbapf32", 8, 8, "bt709")
    g = FilterGraph("tonemap=hable:peak=4")
    out, _ = g.process(fb)
    got = np.asarray(out.planes["rgb"])
    assert out.format == "rgbapf32"
    np.testing.assert_array_equal(got[..., 3], arr[..., 3])
    want = tonemap_oracle(arr[..., :3], "hable", 1.0, 2.0, 4.0,
                          (0.2126, 0.7152, 0.0722))
    np.testing.assert_allclose(got[..., :3], want, rtol=2e-5, atol=2e-6)


def test_zscale_unknown_tin_errors():
    with pytest.raises(FilterError, match="input transfer unknown"):
        FilterGraph("zscale=t=linear")


def test_zscale_conflicting_alias_errors():
    with pytest.raises(FilterError, match="conflicting"):
        FilterGraph("zscale=t=linear:transfer=bt709:tin=bt709")


def test_zscale_resize_and_matrix_tag(rng):
    fb = _pq_batch(rng, h=16, w=24)
    g = FilterGraph("zscale=w=12:h=8:m=bt709",
                    stream_meta={"trc": "smpte2084"})
    out, _ = g.process(fb)
    assert (out.width, out.height) == (12, 8)
    assert out.colorspace == "bt709"
    assert out.format == "rgbpf32"


def test_zscale_dim_and_filter_grammar(rng):
    """ffmpeg scale_eval semantics + av_parse_video_size names +
    resample-filter mapping (review-pass regressions)."""
    fb = _pq_batch(rng, h=18, w=32)
    # -1 preserves aspect (was: silently kept the input width)
    g = FilterGraph("zscale=w=-1:h=9", stream_meta={"trc": "smpte2084"})
    out, _ = g.process(fb)
    assert (out.width, out.height) == (16, 9)
    # -2 rounds to even
    g = FilterGraph("zscale=w=-2:h=9", stream_meta={"trc": "smpte2084"})
    out, _ = g.process(fb)
    assert (out.width, out.height) == (16, 9)
    # f=lanczos resolves (was: crashed on the unknown 'lanczos' key)
    g = FilterGraph("zscale=w=16:h=10:f=lanczos",
                    stream_meta={"trc": "smpte2084"})
    out, _ = g.process(fb)
    assert (out.width, out.height) == (16, 10)
    # named sizes
    from gmat_tpu.filters.hdr import _VIDEO_SIZE_ABBRS
    assert _VIDEO_SIZE_ABBRS["hd720"] == (1280, 720)
    with pytest.raises(FilterError, match="cannot parse size"):
        FilterGraph("zscale=s=nosuchsize")
    # spline kernels are rejected, not silently bicubic
    with pytest.raises(FilterError, match="spline36"):
        FilterGraph("zscale=w=16:h=10:f=spline36")
    with pytest.raises(FilterError, match="both"):
        FilterGraph("zscale=w=-1:h=-1")


def test_zscale_linear_only_noop_on_trc_match(rng):
    # t == tin -> pixels unchanged (just the float conversion).  zscale
    # converts at full float precision (zimg lane) while format_cuda
    # snaps to the source integer grid (libgpuscale reference parity),
    # so the two lanes agree only to half a 10-bit LSB.
    fb = _pq_batch(rng)
    g1 = FilterGraph("zscale=tin=bt709:t=bt709,format=gbrpf32le")
    g2 = FilterGraph("format=gbrpf32le")
    a, _ = g1.process(fb)
    b, _ = g2.process(fb)
    np.testing.assert_allclose(np.asarray(a.planes["rgb"]),
                               np.asarray(b.planes["rgb"]),
                               atol=0.5 / 1023 + 1e-6)
    from gmat_tpu.ops import csc
    exact = csc.yuv_to_rgb(fb, "rgbpf32", exact=True)
    np.testing.assert_allclose(np.asarray(a.planes["rgb"]),
                               np.asarray(exact.planes["rgb"]), atol=1e-7)


# ---------------------------------------------------------------------------
# the full HDR10 lane: clip authoring -> probe -> CLI transcode

X265_HDR10_OPTS = (
    "x265-params=colorprim=bt2020:transfer=smpte2084:colormatrix=bt2020nc:"
    "master-display=G(13250\\,34500)B(7500\\,3000)R(34000\\,16000)"
    "WP(15635\\,16450)L(10000000\\,1):hdr10=1")


def make_hdr10_clip(path, n=8, w=64, h=64):
    """Author an HDR10 mp4: hevc main10, PQ/BT.2020 VUI, mastering-display
    SEI declaring a 1000-nit display (L(10000000,1) in 0.0001 cd/m2)."""
    from gmat_tpu.av import toolkit as tk
    enc = tk.Encoder("libx265", w, h, fps=(30, 1), crf=18, gop=30,
                     bits=10, opts=X265_HDR10_OPTS)
    # smooth gradient luma + slow chroma ramp: decodable content with
    # both dark and overbright (post-EOTF > peak) regions
    yy, xx = np.mgrid[0:h, 0:w]
    pkts = []
    for i in range(n):
        y = (64 + (xx + yy + 4 * i) * 876 // (w + h)).astype(np.uint16)
        u = np.full((h // 2, w // 2), 512 - 60 + i, np.uint16)
        v = np.full((h // 2, w // 2), 512 + 40 - i, np.uint16)
        pkts += enc.encode(y, u, v)
    pkts += enc.flush()
    mux = tk.Muxer(path, w, h, fps=(30, 1), extradata=enc.extradata(),
                   **tk.mux_kwargs_for_encoder("libx265"))
    for p in pkts:
        mux.write(p)
    mux.close()
    enc.close()


@pytest.fixture(scope="module")
def hdr_clip(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("hdr") / "hdr10.mp4")
    make_hdr10_clip(p)
    return p


def test_demuxer_stream_meta_hdr10(hdr_clip):
    from gmat_tpu.av import hevc
    from gmat_tpu.av import toolkit as tk
    dm = tk.Demuxer(hdr_clip)
    meta = dm.stream_meta()
    assert meta.get("trc") == "smpte2084"
    assert meta.get("primaries") == "bt2020"
    assert dm.colorspace == "bt2020"
    # mdcv rides SEI (not a container box): the HevcParser fallback path
    pkt = dm.read()
    md = hevc.stream_hdr_metadata([pkt.data])
    assert md["mastering_display"].max_nits == pytest.approx(1000.0)
    dm.close()


def test_cli_hdr10_to_sdr_lossless_roundtrip(hdr_clip, tmp_path):
    """CLI transcodes HDR10 -> SDR h264; with lossless x264 the decoded
    output must be bit-exact with the library graph on the decoded
    input, proving probe -> link-state -> peak auto-derivation wiring."""
    from gmat_tpu.apps.cli import main
    from gmat_tpu.av.ingest import decode_stream

    spec = ("zscale=t=linear:npl=100,format=gbrpf32le,"
            "tonemap=hable:desat=2,"
            "zscale=p=bt709:t=bt709:m=bt709,format=yuv420p")
    out = str(tmp_path / "sdr.mp4")
    rc = main(["-i", hdr_clip, "-bits", "10", "-vf", spec,
               "-c:v", "libx264", "-crf", "0", "-preset", "ultrafast",
               "-batch", "8", "-o", out])
    assert rc == 0

    # library-side reference: same graph, stream meta as the CLI derives
    meta = {"trc": "smpte2084", "primaries": "bt2020",
            "max_luminance": 1000.0}
    want_y = []
    g = FilterGraph(spec, stream_meta=meta)
    for fb, pts, valid in decode_stream(hdr_clip, batch=8, bits=10):
        ofb, keep = g.process(fb, valid=valid)
        want_y.append(np.asarray(ofb.planes["y"])[keep])
    want_y = np.concatenate(want_y)

    got_y = []
    for fb, pts, valid in decode_stream(out, batch=8):
        got_y.append(np.asarray(fb.planes["y"])[:valid])
    got_y = np.concatenate(got_y)
    assert got_y.shape == want_y.shape
    np.testing.assert_array_equal(got_y, want_y)


def test_rgb_to_yuv_clamps_float_overbright():
    """Float RGB reads clamp to [0,1] (swscale av_clipf): an HDR
    overbright must saturate at signal white (Y=235), never leak codes
    >235 through the matrix."""
    from gmat_tpu.ops import csc
    arr = np.array([[[[1.4, 1.4, 1.4], [-0.2, -0.2, -0.2],
                      [1.0, 1.0, 1.0], [0.0, 0.0, 0.0]]]], np.float32)
    fb = FrameBatch({"rgb": jnp.asarray(arr)}, "rgbpf32", 4, 1, "bt709")
    out = csc.rgb_to_yuv(fb, "yuv444p")
    y = np.asarray(out.planes["y"])[0, 0]
    assert list(y) == [235, 16, 235, 16]
