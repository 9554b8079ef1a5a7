"""deband vs a literal per-pixel transcription of vf_deband.c.

The offset table itself is libm-dependent in the C (huge-argument
sinf), so oracle and implementation share ops/deband.offset_table; the
oracle independently re-implements everything downstream (the actual
filter math)."""
import numpy as np
import pytest

from gmat_tpu.filters.builtin import FilterError
from gmat_tpu.filters.graph import FilterGraph
from gmat_tpu.ops.deband import offset_table

from .test_filters import from_numpy_yuv420


def oracle_plane(src, x_pos, y_pos, thr, blur):
    """deband_8_c/16_c inner loop (vf_deband.c:129-176)."""
    h, w = src.shape
    out = src.copy()
    s = src.astype(np.int64)
    for y in range(h):
        for x in range(w):
            xp, yp = int(x_pos[y, x]), int(y_pos[y, x])
            def cl(v, m):
                return min(max(v, 0), m)
            r0 = s[cl(y + yp, h - 1), cl(x + xp, w - 1)]
            r1 = s[cl(y - yp, h - 1), cl(x + xp, w - 1)]
            r2 = s[cl(y - yp, h - 1), cl(x - xp, w - 1)]
            r3 = s[cl(y + yp, h - 1), cl(x - xp, w - 1)]
            src0 = s[y, x]
            avg = (r0 + r1 + r2 + r3) // 4
            if blur:
                ok = abs(src0 - avg) < thr
            else:
                ok = (abs(src0 - r0) < thr and abs(src0 - r1) < thr
                      and abs(src0 - r2) < thr and abs(src0 - r3) < thr)
            out[y, x] = avg if ok else src0
    return out


@pytest.fixture
def rng():
    return np.random.default_rng(5)


def _banded(rng, n=1, h=32, w=40, step=8):
    """Quantized gradient = banding-prone content."""
    base = (np.linspace(60, 180, w)[None, :]
            + np.linspace(0, 40, h)[:, None])
    y = ((base // step) * step).astype(np.uint8)[None].repeat(n, 0)
    y = np.clip(y + rng.integers(0, 2, y.shape), 0, 255).astype(np.uint8)
    u = ((base[::2, ::2] // step) * step).astype(np.uint8)[None]\
        .repeat(n, 0)
    v = u.copy()
    return y, u, v


@pytest.mark.parametrize("desc,blur", [
    ("deband", True),
    ("deband=blur=0", False),
    ("deband=1thr=0.1:2thr=0.05:r=8:d=1.5", True),
    ("deband=r=-10", True),                  # fixed distance
    ("deband=d=-1.0:b=0", False),            # fixed direction
])
def test_deband_oracle(rng, desc, blur):
    y, u, v = _banded(rng)
    g = FilterGraph(desc)
    out, _ = g.process(from_numpy_yuv420(y, u, v))
    opts = dict(p.split("=") for p in desc.split("=", 1)[1].split(":")) \
        if "=" in desc else {}
    thr = [0.02] * 4
    for k in list(opts):
        if k in ("1thr", "2thr", "3thr", "4thr"):
            thr[int(k[0]) - 1] = float(opts[k])
    rng_ = int(opts.get("r", opts.get("range", 16)))
    d = float(opts.get("d", opts.get("direction", 2 * np.pi)))
    H, W = y.shape[1:]
    xp, yp = offset_table(W, H, rng_, d)
    got_y = np.asarray(out.planes["y"])[0]
    want_y = oracle_plane(y[0], xp, yp, int(255 * thr[0]), blur)
    np.testing.assert_array_equal(got_y, want_y)
    got_u = np.asarray(out.planes["u"])[0]
    ph, pw = u.shape[1:]
    want_u = oracle_plane(u[0], xp[:ph, :pw], yp[:ph, :pw],
                          int(255 * thr[1]), blur)
    np.testing.assert_array_equal(got_u, want_u)


def test_deband_actually_debands(rng):
    """Blur mode must smooth quantized gradients somewhere."""
    y, u, v = _banded(rng, h=64, w=96)
    out, _ = FilterGraph("deband=1thr=0.08").process(
        from_numpy_yuv420(y, u, v))
    gy = np.asarray(out.planes["y"])[0]
    assert (gy != y[0]).mean() > 0.1


def test_deband_coupling_requires_444(rng):
    y, u, v = _banded(rng)
    with pytest.raises(FilterError, match="4:4:4"):
        FilterGraph("deband=c=1").process(from_numpy_yuv420(y, u, v))


def test_deband_coupling_all_planes_gate(rng):
    """Coupled mode replaces a pixel only when EVERY plane passes."""
    from gmat_tpu.ops.deband import deband_coupled
    import jax.numpy as jnp
    h = w = 16
    xp, yp = offset_table(w, h, 8, 2 * np.pi)
    a = jnp.asarray(rng.integers(100, 110, (1, h, w)).astype(np.uint8))
    b = jnp.asarray(rng.integers(0, 256, (1, h, w)).astype(np.uint8))
    outs = deband_coupled([a, b], xp, yp, [30, 1], blur=True)
    # plane b's thr=1 almost never passes -> almost everything kept
    kept = (np.asarray(outs[0]) == np.asarray(a)).mean()
    assert kept > 0.9


def test_deband_option_gates():
    for bad in ["deband=1thr=0.9", "deband=d=9", "deband=zzz=1"]:
        with pytest.raises(FilterError):
            FilterGraph(bad)
