"""Property-based tests: parsers never crash unexpectedly, resample
matrices stay normalized, expression engine is total over its grammar."""
import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from gmat_tpu.filters.builtin import FilterError
from gmat_tpu.filters.expr import compile_expr
from gmat_tpu.filters.graph import parse_graph
from gmat_tpu.ops.resize import METHODS, resample_matrix


@given(st.text(max_size=60))
@settings(max_examples=200, deadline=None)
def test_graph_parser_total(s):
    """Arbitrary input either parses or raises FilterError/ValueError —
    never an unrelated exception type."""
    try:
        parse_graph(s)
    except (FilterError, ValueError):
        pass


@given(st.text(alphabet="0123456789+-*/(),. abcdefgnt", max_size=40))
@settings(max_examples=200, deadline=None)
def test_expr_parser_total(s):
    try:
        e = compile_expr(s)
    except ValueError:
        return
    # parsed expressions evaluate (or fail with KeyError/ZeroDivision)
    env = {"n": 1.0, "t": 2.0, "a": 3.0, "b": 4.0, "c": 0.5, "d": 1.0,
           "e": 1.0, "f": 2.0, "g": 3.0}
    try:
        float(e(env))
    except (ValueError, OverflowError):
        # unknown variables raise a named ValueError; av_expr-style
        # math (div-by-zero etc.) yields inf/nan instead of raising
        pass


@given(st.integers(8, 512), st.integers(1, 512),
       st.sampled_from(METHODS))
@settings(max_examples=60, deadline=None)
def test_resample_matrix_properties(n_in, n_out, method):
    A = resample_matrix(n_in, n_out, method)
    assert A.shape == (n_out, n_in)
    # partition of unity (every output is a normalized combination)
    np.testing.assert_allclose(A.sum(axis=1), 1.0, atol=2e-4)
    # locality: bounded taps per row for the windowed methods
    if method in ("nearest", "bilinear", "bicubic"):
        taps = {"nearest": 1, "bilinear": 2, "bicubic": 4}[method]
        assert (np.count_nonzero(A, axis=1) <= taps).all()


@given(st.integers(2, 64).map(lambda x: x * 2),
       st.integers(2, 64).map(lambda x: x * 2))
@settings(max_examples=20, deadline=None)
def test_csc_roundtrip_identity_bound(w, h):
    """yuv->rgb->yuv on flat fields is near-lossless for any even size."""
    from gmat_tpu.core.frame import from_numpy_yuv420
    from gmat_tpu.ops import csc
    y = np.full((1, h, w), 120, np.uint8)
    u = np.full((1, h // 2, w // 2), 100, np.uint8)
    v = np.full((1, h // 2, w // 2), 150, np.uint8)
    fb = from_numpy_yuv420(y, u, v)
    back = csc.rgb_to_yuv(csc.yuv_to_rgb(fb, "rgb24"), "yuv420p")
    assert abs(int(np.asarray(back.planes["y"])[0, 0, 0]) - 120) <= 1
    assert abs(int(np.asarray(back.planes["u"])[0, 0, 0]) - 100) <= 2


@settings(max_examples=20, deadline=None)
@given(st.integers(8, 24), st.integers(128, 256), st.integers(0, 1),
       st.integers(0, 1), st.integers(0, 2**31 - 1))
def test_yadif_preserves_primary_field(h2, w, parity, tff, seed):
    """yadif never modifies lines of the primary field (y%2 == parity)."""
    import jax.numpy as jnp
    from gmat_tpu.ops.yadif import yadif_plane
    h = h2 * 2
    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 256, (3, 1, h, w)).astype(np.uint8)
    out = np.asarray(yadif_plane(jnp.asarray(frames[0]),
                                 jnp.asarray(frames[1]),
                                 jnp.asarray(frames[2]), parity, tff))
    np.testing.assert_array_equal(out[0, parity::2, :],
                                  frames[1][0, parity::2, :])


@settings(max_examples=20, deadline=None)
@given(st.integers(-16, 40), st.integers(-16, 40), st.integers(0, 2**31 - 1))
def test_overlay_untouched_outside_region(x, y, seed):
    """Pixels outside the (clipped) overlay rect are bit-identical."""
    import jax.numpy as jnp
    from gmat_tpu.ops.overlay import overlay_yuv420
    rng = np.random.default_rng(seed)
    H, W, oh, ow = 32, 48, 8, 12
    main = {"y": rng.integers(0, 256, (1, H, W)).astype(np.uint8),
            "u": rng.integers(0, 256, (1, H // 2, W // 2)).astype(np.uint8),
            "v": rng.integers(0, 256, (1, H // 2, W // 2)).astype(np.uint8)}
    over = {"y": rng.integers(0, 256, (1, oh, ow)).astype(np.uint8),
            "u": rng.integers(0, 256, (1, oh // 2, ow // 2)).astype(np.uint8),
            "v": rng.integers(0, 256, (1, oh // 2, ow // 2)).astype(np.uint8)}
    got = overlay_yuv420({k: jnp.asarray(v) for k, v in main.items()},
                         {k: jnp.asarray(v) for k, v in over.items()},
                         None, jnp.asarray([x]), jnp.asarray([y]))
    xe = x & ~1
    mask = np.ones((H, W), bool)
    mask[max(y, 0):y + oh, max(xe, 0):xe + ow] = False
    np.testing.assert_array_equal(np.asarray(got["y"])[0][mask],
                                  main["y"][0][mask])
    # chroma placement is C truncating division (vf_overlay_cuda.c:303)
    cy = y // 2 if y >= 0 else -((-y) // 2)
    cmask = np.ones((H // 2, W // 2), bool)
    cmask[max(cy, 0):cy + oh // 2,
          max(xe // 2, 0):xe // 2 + ow // 2] = False
    np.testing.assert_array_equal(np.asarray(got["u"])[0][cmask],
                                  main["u"][0][cmask])
