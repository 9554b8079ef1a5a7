"""exposure + colortemperature vs per-pixel float32 oracles."""
import numpy as np
import pytest

from gmat_tpu.filters.builtin import FilterError, _kelvin2rgb
from gmat_tpu.filters.graph import FilterGraph

from .test_filters import from_numpy_yuv420


@pytest.fixture
def rng():
    return np.random.default_rng(2)


def _rgb_fb(rng, n=2, h=12, w=16):
    from gmat_tpu.core.frame import FrameBatch
    import jax.numpy as jnp
    arr = rng.integers(0, 256, (n, h, w, 3)).astype(np.uint8)
    return FrameBatch({"rgb": jnp.asarray(arr)}, "rgb24", w, h,
                      "bt709"), arr


def test_exposure_oracle(rng):
    fb, arr = _rgb_fb(rng)
    g = FilterGraph("format=rgbpf32,exposure=exposure=1.5:black=0.05")
    out, _ = g.process(fb)
    got = np.asarray(out.planes["rgb"])
    f32 = np.float32
    x = np.asarray(np.asarray(fb.planes["rgb"]), np.float32)
    # format converts u8->float (x/255 path per rgb_to_rgb); recompute
    # from the converted frame instead
    g0 = FilterGraph("format=rgbpf32")
    base, _ = g0.process(fb)
    xb = np.asarray(base.planes["rgb"])
    scale = f32(1.0) / f32(np.exp2(f32(-1.5)) - f32(0.05))
    want = (xb - f32(0.05)) * scale
    # (x-black)*scale is one fma on XLA (the C build may contract it
    # too) -> last-ulp envelope like colorbalance's
    np.testing.assert_allclose(got, want, rtol=3e-7, atol=3e-7)


def test_exposure_gates(rng):
    fb, _ = _rgb_fb(rng)
    with pytest.raises(FilterError):
        FilterGraph("exposure=4")
    with pytest.raises(FilterError, match="float RGB"):
        FilterGraph("exposure=1").process(fb)


def test_kelvin2rgb_pins():
    # 6500K is in the <=66 branch: r=1, g from log, b=1 (>=66 false ->
    # kelvin=65: b from log branch)
    c = _kelvin2rgb(6500.0)
    assert c[0] == 1.0 and 0.9 < c[1] <= 1.0 and 0.9 < c[2] <= 1.0
    c = _kelvin2rgb(1500.0)     # warm: blue crushed
    assert c[2] == 0.0
    c = _kelvin2rgb(20000.0)    # cold: red reduced
    assert c[0] < 1.0 and c[2] == 1.0


def test_colortemperature_oracle(rng):
    fb, arr = _rgb_fb(rng)
    for desc, (temp, mix, pl) in [
            ("colortemperature=4000", (4000.0, 1.0, 0.0)),
            ("colortemperature=t=8000:mix=0.6", (8000.0, 0.6, 0.0)),
            ("colortemperature=9000:1:0.7", (9000.0, 1.0, 0.7))]:
        desc = desc.replace("t=", "temperature=")
        g = FilterGraph(desc)
        out, _ = g.process(fb)
        got = np.asarray(out.planes["rgb"])
        f32 = np.float32
        color = _kelvin2rgb(temp)
        eps = np.finfo(np.float32).eps
        want = np.empty_like(arr)
        for f in range(arr.shape[0]):
            for y in range(arr.shape[1]):
                for x in range(arr.shape[2]):
                    r, gg, b = (f32(arr[f, y, x, 0]),
                                f32(arr[f, y, x, 1]),
                                f32(arr[f, y, x, 2]))
                    nr = f32(r * color[0])
                    ng = f32(gg * color[1])
                    nb = f32(b * color[2])
                    nr = f32(r + f32(nr - r) * f32(mix))
                    ng = f32(gg + f32(ng - gg) * f32(mix))
                    nb = f32(b + f32(nb - b) * f32(mix))
                    l0 = f32(f32(max(r, gg, b) + min(r, gg, b)) + eps)
                    l1 = f32(f32(max(nr, ng, nb) + min(nr, ng, nb))
                             + eps)
                    li = f32(l0 / l1)
                    sr, sg, sb = f32(nr * li), f32(ng * li), f32(nb * li)
                    nr = f32(nr + f32(sr - nr) * f32(pl))
                    ng = f32(ng + f32(sg - ng) * f32(pl))
                    nb = f32(nb + f32(sb - nb) * f32(pl))
                    want[f, y, x] = [min(max(int(nr), 0), 255),
                                     min(max(int(ng), 0), 255),
                                     min(max(int(nb), 0), 255)]
        # fma contraction can flip the last float bit (same envelope as
        # colorbalance): allow <=1 LSB
        diff = np.abs(got.astype(int) - want.astype(int))
        assert diff.max() <= 1, diff.max()
        assert (diff > 0).mean() < 0.01


def test_colortemperature_gates(rng):
    for bad in ["colortemperature=500", "colortemperature=mix=2"]:
        with pytest.raises(FilterError):
            FilterGraph(bad)


def test_colortemperature_bgr_order(rng):
    """vf_colortemperature.c indexes channels via rgba_map: the SAME
    image stored bgr24 must produce the channel-reversed rgb24 result
    (regression: the red/blue scales were applied by position)."""
    from gmat_tpu.core.frame import FrameBatch
    import jax.numpy as jnp
    arr = rng.integers(0, 256, (2, 8, 8, 3)).astype(np.uint8)
    fb_rgb = FrameBatch({"rgb": jnp.asarray(arr)}, "rgb24", 8, 8,
                        "bt709")
    fb_bgr = FrameBatch({"rgb": jnp.asarray(arr[..., ::-1])},
                        "bgr24", 8, 8, "bt709")
    g1 = FilterGraph("colortemperature=4000")
    g2 = FilterGraph("colortemperature=4000")
    got_rgb = np.asarray(g1.process(fb_rgb)[0].planes["rgb"])
    got_bgr = np.asarray(g2.process(fb_bgr)[0].planes["rgb"])
    np.testing.assert_array_equal(got_bgr, got_rgb[..., ::-1])
    # and 4000K on rgb24 must actually WARM (blue scaled well below red)
    assert got_rgb[..., 2].astype(int).sum() < arr[..., 2].astype(int).sum()
    np.testing.assert_array_equal(got_rgb[..., 0], arr[..., 0])  # r scale = 1.0
