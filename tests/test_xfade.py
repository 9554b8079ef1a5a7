"""xfade vs a per-pixel scalar transcription of vf_xfade.c kernels."""
import os

import numpy as np
import pytest

from gmat_tpu.filters.builtin import FilterError, XfadeFilter
from gmat_tpu.filters.xfade import TRANSITIONS, apply_transition

F = np.float32


def mixf(a, b, m):
    return F(F(a) * F(m) + F(b) * (F(1.0) - F(m)))


def fractf(a):
    return F(F(a) - np.floor(F(a)))


def ssf(e0, e1, x):
    t = min(max(F((F(x) - F(e0)) / (F(e1) - F(e0))), F(0.0)), F(1.0))
    return F(t * t * (F(3.0) - F(2.0) * t))


def frandf(x, y):
    r = F(np.sin(F(F(x) * F(12.9898) + F(y) * F(78.233))) * F(43758.545))
    return F(r - np.floor(r))


def oracle(name, A, B, p, ctx):
    """Literal per-pixel transcription of the vf_xfade.c transition
    kernels (independent scalar float32 math)."""
    P, H, W = A.shape
    maxv = ctx["maxv"]
    black, white = ctx["black"], ctx["white"]
    out = np.zeros_like(A)
    pf = F(p)

    def store(pl, y, x, v):
        out[pl, y, x] = np.trunc(np.float64(v)) if isinstance(
            v, (float, np.floating)) else v

    if name == "fade":
        for pl in range(P):
            for y in range(H):
                for x in range(W):
                    store(pl, y, x, mixf(A[pl, y, x], B[pl, y, x], pf))
    elif name in ("wipeleft", "wiperight", "wipeup", "wipedown"):
        if name == "wipeleft":
            z = int(F(W) * pf)
        elif name == "wiperight":
            z = int(F(W) * (F(1.0) - pf))
        elif name == "wipeup":
            z = int(F(H) * pf)
        else:
            z = int(F(H) * (F(1.0) - pf))
        for pl in range(P):
            for y in range(H):
                for x in range(W):
                    c = x > z if name in ("wipeleft", "wiperight") \
                        else y > z
                    first_b = name in ("wipeleft", "wipeup")
                    v = (B if c == first_b else A)[pl, y, x]
                    out[pl, y, x] = v
    elif name in ("slideleft", "slideright"):
        z = int((-pf if name == "slideleft" else pf) * F(W))
        for pl in range(P):
            for y in range(H):
                for x in range(W):
                    zx = z + x
                    zz = int(np.fmod(zx, W)) + W * (zx < 0)
                    zz = min(zz, W - 1)
                    src = B if 0 <= zx < W else A
                    out[pl, y, x] = src[pl, y, zz]
    elif name in ("slideup", "slidedown"):
        z = int((-pf if name == "slideup" else pf) * F(H))
        for pl in range(P):
            for y in range(H):
                zy = z + y
                zz = int(np.fmod(zy, H)) + H * (zy < 0)
                zz = min(zz, H - 1)
                src = B if 0 <= zy < H else A
                for x in range(W):
                    out[pl, y, x] = src[pl, zz, x]
    elif name == "circlecrop":
        z = F(np.power(F(2.0) * abs(pf - F(0.5)), F(3.0))
              * np.hypot(F(W // 2), F(H // 2)))
        for pl in range(P):
            for y in range(H):
                for x in range(W):
                    dist = F(np.hypot(F(x - W // 2), F(y - H // 2)))
                    val = (B if p < 0.5 else A)[pl, y, x]
                    out[pl, y, x] = black[pl] if z < dist else val
    elif name == "rectcrop":
        zh = int(abs(pf - F(0.5)) * F(H))
        zw = int(abs(pf - F(0.5)) * F(W))
        for pl in range(P):
            for y in range(H):
                for x in range(W):
                    inside = (abs(x - W // 2) < zw
                              and abs(y - H // 2) < zh)
                    val = (B if p < 0.5 else A)[pl, y, x]
                    out[pl, y, x] = val if inside else black[pl]
    elif name == "distance":
        for y in range(H):
            for x in range(W):
                d = F(0.0)
                for pl in range(P):
                    t = F(F(A[pl, y, x]) / F(maxv)
                          - F(B[pl, y, x]) / F(maxv))
                    d = F(d + F(t * t))
                dist = F(1.0) if F(np.sqrt(d)) <= pf else F(0.0)
                for pl in range(P):
                    store(pl, y, x,
                          mixf(mixf(A[pl, y, x], B[pl, y, x], dist),
                               B[pl, y, x], pf))
    elif name in ("fadeblack", "fadewhite"):
        bgv = black if name == "fadeblack" else white
        for pl in range(P):
            bg = bgv[pl]
            s1 = ssf(F(1.0) - F(0.2), 1.0, pf)
            s2 = ssf(0.2, 1.0, pf)
            for y in range(H):
                for x in range(W):
                    store(pl, y, x,
                          mixf(mixf(A[pl, y, x], bg, s1),
                               mixf(bg, B[pl, y, x], s2), pf))
    elif name == "fadegrays":
        mid = (maxv + 1) // 2
        s1 = ssf(F(1.0) - F(0.2), 1.0, pf)
        s2 = ssf(0.2, 1.0, pf)
        for y in range(H):
            for x in range(W):
                bg0 = [0] * 4
                bg1 = [0] * 4
                if ctx["is_rgb"]:
                    for pl in range(min(P, 3)):
                        bg0[0] += int(A[pl, y, x])
                        bg1[0] += int(B[pl, y, x])
                    bg0[0] //= 3
                    bg1[0] //= 3
                    bg0[1] = bg0[2] = bg0[0]
                    bg1[1] = bg1[2] = bg1[0]
                    if P == 4:
                        bg0[3] = int(A[3, y, x])
                        bg1[3] = int(B[3, y, x])
                else:
                    bg0[0] = int(A[0, y, x])
                    bg1[0] = int(B[0, y, x])
                    bg0[1] = bg0[2] = bg1[1] = bg1[2] = mid
                    if P == 4:
                        bg0[3] = int(A[3, y, x])
                        bg1[3] = int(B[3, y, x])
                for pl in range(P):
                    store(pl, y, x,
                          mixf(mixf(A[pl, y, x], bg0[pl], s1),
                               mixf(bg1[pl], B[pl, y, x], s2), pf))
    elif name == "radial":
        for y in range(H):
            for x in range(W):
                sm = F(np.arctan2(F(x - W // 2), F(y - H // 2))
                       - np.float64(pf - F(0.5)) * (np.pi * 2.5))
                g = ssf(0.0, 1.0, sm)
                for pl in range(P):
                    store(pl, y, x,
                          mixf(B[pl, y, x], A[pl, y, x], g))
    elif name in ("smoothleft", "smoothright", "smoothup",
                  "smoothdown", "vertopen", "vertclose", "horzopen",
                  "horzclose", "diagtl", "diagtr", "diagbl", "diagbr"):
        for y in range(H):
            for x in range(W):
                if name == "smoothleft":
                    sm = F(F(1.0) + F(x) / F(W) - pf * F(2.0))
                elif name == "smoothright":
                    sm = F(F(1.0) + F(W - 1 - x) / F(W) - pf * F(2.0))
                elif name == "smoothup":
                    sm = F(F(1.0) + F(y) / F(H) - pf * F(2.0))
                elif name == "smoothdown":
                    sm = F(F(1.0) + F(H - 1 - y) / F(H) - pf * F(2.0))
                elif name == "vertopen":
                    w2 = F(W // 2)
                    sm = F(F(2.0) - abs(F((F(x) - w2) / w2))
                           - pf * F(2.0))
                elif name == "vertclose":
                    w2 = F(W // 2)
                    sm = F(F(1.0) + abs(F((F(x) - w2) / w2))
                           - pf * F(2.0))
                elif name == "horzopen":
                    h2 = F(H // 2)
                    sm = F(F(2.0) - abs(F((F(y) - h2) / h2))
                           - pf * F(2.0))
                elif name == "horzclose":
                    h2 = F(H // 2)
                    sm = F(F(1.0) + abs(F((F(y) - h2) / h2))
                           - pf * F(2.0))
                elif name == "diagtl":
                    sm = F(F(1.0) + F(F(F(F(x) / F(W)) * F(y)) / F(H))
                           - pf * F(2.0))
                elif name == "diagtr":
                    sm = F(F(1.0) + F(F(F(F(W - 1 - x) / F(W)) * F(y))
                                      / F(H)) - pf * F(2.0))
                elif name == "diagbl":
                    sm = F(F(1.0) + F(F(F(F(x) / F(W)) * F(H - 1 - y))
                                      / F(H)) - pf * F(2.0))
                else:
                    sm = F(F(1.0) + F(F(F(F(W - 1 - x) / F(W))
                                       * F(H - 1 - y)) / F(H))
                           - pf * F(2.0))
                g = ssf(0.0, 1.0, sm)
                for pl in range(P):
                    store(pl, y, x,
                          mixf(B[pl, y, x], A[pl, y, x], g))
    elif name in ("circleopen", "circleclose"):
        z = F(np.hypot(F(W // 2), F(H // 2)))
        pp = (F(pf - F(0.5)) * F(3.0) if name == "circleopen"
              else F(F(F(1.0) - pf - F(0.5)) * F(3.0)))
        for y in range(H):
            for x in range(W):
                sm = F(F(np.hypot(F(x - W // 2), F(y - H // 2))) / z
                       + pp)
                g = ssf(0.0, 1.0, sm)
                for pl in range(P):
                    if name == "circleopen":
                        store(pl, y, x,
                              mixf(A[pl, y, x], B[pl, y, x], g))
                    else:
                        store(pl, y, x,
                              mixf(B[pl, y, x], A[pl, y, x], g))
    elif name == "dissolve":
        for y in range(H):
            for x in range(W):
                sm = F(frandf(x, y) * F(2.0) + pf * F(2.0) - F(1.5))
                src = A if sm >= F(0.5) else B
                for pl in range(P):
                    out[pl, y, x] = src[pl, y, x]
    elif name == "pixelize":
        d = min(pf, F(F(1.0) - pf))
        dist = F(np.ceil(F(d * F(50.0))) / F(50.0))
        sq = F(F(2.0) * dist * F(min(W, H)) / F(20.0))
        for y in range(H):
            for x in range(W):
                if dist > 0.0:
                    sx = int(min(F((np.floor(F(F(x) / sq)) + F(0.5))
                                   * sq), F(W - 1)))
                    sy = int(min(F((np.floor(F(F(y) / sq)) + F(0.5))
                                   * sq), F(H - 1)))
                else:
                    sx, sy = x, y
                for pl in range(P):
                    store(pl, y, x,
                          mixf(A[pl, sy, sx], B[pl, sy, sx], pf))
    elif name in ("hlslice", "hrslice", "vuslice", "vdslice"):
        for y in range(H):
            for x in range(W):
                if name == "hlslice":
                    co = F(F(x) / F(W))
                    fr = F(F(F(10.0) * F(x)) / F(W))
                elif name == "hrslice":
                    co = F(F(W - 1 - x) / F(W))
                    fr = F(F(10.0) * co)
                elif name == "vuslice":
                    co = F(F(y) / F(H))
                    fr = F(F(F(10.0) * F(y)) / F(H))
                else:
                    co = F(F(H - 1 - y) / F(H))
                    fr = F(F(10.0) * co)
                sm = ssf(-0.5, 0.0, F(co - pf * F(1.5)))
                ss = F(0.0) if sm <= fractf(fr) else F(1.0)
                for pl in range(P):
                    store(pl, y, x,
                          mixf(B[pl, y, x], A[pl, y, x], ss))
    elif name == "hblur":
        prog = pf * F(2.0) if p <= 0.5 else F((F(1.0) - pf) * F(2.0))
        size = 1 + int(F(W // 2) * prog)
        for pl in range(P):
            for y in range(H):
                s0 = F(0.0)
                s1 = F(0.0)
                for x in range(size):
                    s0 = F(s0 + F(A[pl, y, x]))
                    s1 = F(s1 + F(B[pl, y, x]))
                cnt = F(size)
                for x in range(W):
                    store(pl, y, x, mixf(F(s0 / cnt), F(s1 / cnt), pf))
                    if x + size < W:
                        s0 = F(s0 + F(F(A[pl, y, x + size])
                                      - F(A[pl, y, x])))
                        s1 = F(s1 + F(F(B[pl, y, x + size])
                                      - F(B[pl, y, x])))
                    else:
                        s0 = F(s0 - F(A[pl, y, x]))
                        s1 = F(s1 - F(B[pl, y, x]))
                        cnt = F(cnt - F(1.0))
    elif name in ("wipetl", "wipetr", "wipebl", "wipebr"):
        zw = int(F(W) * (pf if name in ("wipetl", "wipebl")
                         else F(1.0) - pf))
        zh = int(F(H) * (pf if name in ("wipetl", "wipetr")
                         else F(1.0) - pf))
        for pl in range(P):
            for y in range(H):
                for x in range(W):
                    if name == "wipetl":
                        c = y <= zh and x <= zw
                    elif name == "wipetr":
                        c = y <= zh and x > zw
                    elif name == "wipebl":
                        c = y > zh and x <= zw
                    else:
                        c = y > zh and x > zw
                    out[pl, y, x] = (A if c else B)[pl, y, x]
    elif name == "squeezeh":
        for pl in range(P):
            for y in range(H):
                with np.errstate(divide="ignore", invalid="ignore"):
                    z = F(F(0.5) + F(F(F(y) / F(H)) - F(0.5)) / pf)
                for x in range(W):
                    # progress==0 divides by zero: inf rows -> B; the
                    # 0/0 NaN row is lrintf-UB in the C — routed to B
                    if not (0.0 <= z <= 1.0):
                        out[pl, y, x] = B[pl, y, x]
                    else:
                        yy = int(np.round(F(z * F(H - 1))))
                        out[pl, y, x] = A[pl, yy, x]
    elif name == "squeezev":
        for pl in range(P):
            for y in range(H):
                for x in range(W):
                    with np.errstate(divide="ignore", invalid="ignore"):
                        z = F(F(0.5) + F(F(F(x) / F(W)) - F(0.5)) / pf)
                    if not (0.0 <= z <= 1.0):
                        out[pl, y, x] = B[pl, y, x]
                    else:
                        xx = int(np.round(F(z * F(W - 1))))
                        out[pl, y, x] = A[pl, y, xx]
    elif name == "zoomin":
        zf = ssf(0.5, 1.0, pf)
        s2 = ssf(0.0, 0.5, pf)
        for pl in range(P):
            for y in range(H):
                for x in range(W):
                    u = F(F(0.5) + F(F(F(x) / F(W)) - F(0.5)) * zf)
                    v = F(F(0.5) + F(F(F(y) / F(H)) - F(0.5)) * zf)
                    iu = int(np.ceil(F(u * F(W - 1))))
                    iv = int(np.ceil(F(v * F(H - 1))))
                    store(pl, y, x,
                          mixf(A[pl, iv, iu], B[pl, y, x], s2))
    elif name in ("fadefast", "fadeslow"):
        imax = F(F(1.0) / F(maxv))
        for pl in range(P):
            for y in range(H):
                for x in range(W):
                    diff = F(abs(int(A[pl, y, x]) - int(B[pl, y, x])))
                    if name == "fadefast":
                        e = F(F(1.0) + np.log(F(F(1.0) + diff * imax)))
                    else:
                        e = F(F(1.0) + np.log(F(F(2.0) - diff * imax)))
                    store(pl, y, x,
                          mixf(A[pl, y, x], B[pl, y, x],
                               F(np.power(pf, e))))
    else:
        raise AssertionError(name)
    return out


def _ctx(P, H, W, maxv=255, is_rgb=False):
    chroma = 0 if is_rgb else maxv // 2
    wch = maxv if is_rgb else maxv // 2
    return {"w": W, "h": H, "maxv": maxv,
            "black": [0, chroma, chroma, maxv][:P],
            "white": [maxv, wch, wch, maxv][:P],
            "is_rgb": is_rgb, "nb_planes": P, "expr": None}


@pytest.fixture
def ab():
    rng = np.random.default_rng(17)
    A = rng.integers(0, 256, (3, 10, 12)).astype(np.uint8)
    B = rng.integers(0, 256, (3, 10, 12)).astype(np.uint8)
    return A, B


# libm-backed kernels: numpy's array SIMD paths may differ from the
# scalar path by a final ulp, flipping the truncating store by 1 (the
# same class of divergence different C libms have)
LIBM = {"dissolve", "radial", "fadefast", "fadeslow", "circlecrop",
        "circleopen", "circleclose"}


@pytest.mark.parametrize("name", sorted(set(TRANSITIONS) - {"custom"}))
@pytest.mark.parametrize("p", [1.0, 0.75, 0.5, 0.25, 0.0])
def test_transition_oracle(ab, name, p):
    A, B = ab
    ctx = _ctx(3, 10, 12)
    got = apply_transition(name, A, B, p, ctx)
    want = oracle(name, A, B, p, ctx)
    if name in LIBM:
        close = np.abs(got.astype(int) - want.astype(int)) <= 1
        frac = 1.0 - np.mean(close)
        assert frac == 0.0 or np.mean(got == want) > 0.97, \
            (name, p, frac)
    else:
        np.testing.assert_array_equal(got, want, err_msg=f"{name}@{p}")


def test_transition_16bit_and_rgb(ab):
    A8, B8 = ab
    A = (A8.astype(np.uint16) << 8)
    B = (B8.astype(np.uint16) << 8)
    ctx = _ctx(3, 10, 12, maxv=65535)
    for name in ("fade", "fadeblack", "wipeleft", "squeezev"):
        got = apply_transition(name, A, B, 0.5, ctx)
        want = oracle(name, A, B, 0.5, ctx)
        np.testing.assert_array_equal(got, want, err_msg=name)
    ctxr = _ctx(3, 10, 12, is_rgb=True)
    got = apply_transition("fadegrays", A8, B8, 0.4, ctxr)
    want = oracle("fadegrays", A8, B8, 0.4, ctxr)
    np.testing.assert_array_equal(got, want)


def _write_y4m(path, frames_yuv, w, h):
    with open(path, "wb") as f:
        f.write(f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C420jpeg\n"
                .encode())
        for (y, u, v) in frames_yuv:
            f.write(b"FRAME\n")
            f.write(y.tobytes())
            f.write(u.tobytes())
            f.write(v.tobytes())


def test_xfade_stream_machine(tmp_path):
    """activate port: passthrough before offset, 1:1 blend inside the
    window (progress 1->0), second-stream passthrough after."""
    from gmat_tpu.core.frame import FrameBatch
    from gmat_tpu.filters.graph import FilterGraph
    import jax.numpy as jnp
    rng = np.random.default_rng(23)
    W, H, N = 16, 12, 12
    main_y = rng.integers(0, 256, (N, H, W)).astype(np.uint8)
    b_frames = [(rng.integers(0, 256, (H, W)).astype(np.uint8),
                 np.full((H // 2, W // 2), 90, np.uint8),
                 np.full((H // 2, W // 2), 170, np.uint8))
                for _ in range(14)]
    second = str(tmp_path / "b.y4m")
    _write_y4m(second, b_frames, W, H)
    # main: yuv444p with flat chroma so 420->444 conversion is exact
    fbs = FrameBatch(
        {"y": jnp.asarray(main_y),
         "u": jnp.full((N, H, W), 64, jnp.uint8),
         "v": jnp.full((N, H, W), 200, jnp.uint8)},
        "yuv444p", W, H, "bt709")
    g = FilterGraph(f"xfade=transition=fade:duration=1:offset=0.2:"
                    f"video={second}", src_fps=5.0)
    # tb = 1/5 s: offset_pts = 1, duration_pts = 5
    ofb, k = g.process(fbs, pts=np.arange(N))
    ys = np.asarray(ofb.planes["y"])[k]
    pts = np.asarray(g.out_pts)[k]
    # frame 0 passes through (pts 0 < first+offset=1)
    np.testing.assert_array_equal(ys[0], main_y[0])
    # frame 1: progress = 1 - 0/5 = 1.0 -> pure main
    np.testing.assert_array_equal(ys[1], main_y[1])
    # frame 6: progress = 1 - 5/5 = 0 -> pure second frame 5 luma
    np.testing.assert_array_equal(ys[6], b_frames[5][0])
    # frame 4: blended mix at progress 1-3/5
    pr = F(1.0) - F(3.0) / F(5.0)
    want = np.trunc(main_y[4].astype(F) * pr
                    + b_frames[3][0].astype(F) * (F(1.0) - pr)
                    ).astype(np.uint8)
    np.testing.assert_array_equal(ys[4], want)
    # frame 7 onward (delta 6 > 5): second stream passthrough
    np.testing.assert_array_equal(ys[7], b_frames[6][0])
    assert pts.tolist() == list(range(len(ys)))
    assert len(ys) == 12      # 1 passthrough + 7 blends + 4 after
    # flush drains the remaining second frames (11 consumed in-stream)
    fl = g.flush() or []
    tail = sum(int(kk.sum()) for _, kk, _ in fl)
    assert tail == 3
    for ofb2, kk, m2 in fl:
        assert np.asarray(m2["pts"])[kk].tolist() == [12, 13, 14]


def test_xfade_custom_and_gates(tmp_path):
    from gmat_tpu.core.frame import FrameBatch
    from gmat_tpu.filters.graph import FilterGraph
    import jax.numpy as jnp
    rng = np.random.default_rng(3)
    W, H = 8, 6
    b_frames = [(rng.integers(0, 256, (H, W)).astype(np.uint8),
                 np.full((H // 2, W // 2), 128, np.uint8),
                 np.full((H // 2, W // 2), 128, np.uint8))
                for _ in range(4)]
    second = str(tmp_path / "b2.y4m")
    _write_y4m(second, b_frames, W, H)
    main_y = rng.integers(0, 256, (4, H, W)).astype(np.uint8)
    fbs = FrameBatch(
        {"y": jnp.asarray(main_y),
         "u": jnp.full((4, H, W), 128, jnp.uint8),
         "v": jnp.full((4, H, W), 128, jnp.uint8)},
        "yuv444p", W, H, "bt709")
    g = FilterGraph(f"xfade=transition=custom:duration=0.6:offset=0:"
                    f"expr=A*P+B*(1-P):video={second}", src_fps=5.0)
    ofb, k = g.process(fbs, pts=np.arange(4))
    ys = np.asarray(ofb.planes["y"])[k]
    # custom == fade formula (double math on the f32-rounded
    # progress); offset=0 -> frame i blends with second frame i
    pr = float(np.float32(1.0) - np.float32(1.0) / np.float32(3.0))
    want = np.trunc(main_y[1].astype(np.float64) * pr
                    + b_frames[1][0] * (1 - pr)).astype(np.uint8)
    np.testing.assert_array_equal(ys[1], want)
    for bad in ("xfade=transition=zzz:video=x.mp4",
                "xfade=duration=0:video=x.mp4",
                "xfade=duration=61:video=x.mp4",
                "xfade=transition=custom:video=x.mp4",
                "xfade=transition=fade"):
        with pytest.raises(FilterError):
            FilterGraph(bad)
    # subsampled main rejected (444/gray/rgb pix_fmts gate)
    from tests.test_filters import from_numpy_yuv420
    fb420 = from_numpy_yuv420(
        main_y, np.full((4, H // 2, W // 2), 128, np.uint8),
        np.full((4, H // 2, W // 2), 128, np.uint8))
    g2 = FilterGraph(f"xfade=video={second}", src_fps=5.0)
    with pytest.raises(FilterError, match="444"):
        g2.process(fb420, pts=np.arange(4))


def test_xfade_flush_chunks_long_tail(tmp_path):
    """The post-fade tail (the normal clip-join case) drains in
    bounded chunks, never one giant batch."""
    from gmat_tpu.core.frame import FrameBatch
    from gmat_tpu.filters.graph import FilterGraph
    import jax.numpy as jnp
    rng = np.random.default_rng(5)
    W, H = 8, 6
    b_frames = [(np.full((H, W), i % 256, np.uint8),
                 np.full((H // 2, W // 2), 128, np.uint8),
                 np.full((H // 2, W // 2), 128, np.uint8))
                for i in range(150)]
    second = str(tmp_path / "long.y4m")
    _write_y4m(second, b_frames, W, H)
    main_y = rng.integers(0, 256, (4, H, W)).astype(np.uint8)
    fbs = FrameBatch(
        {"y": jnp.asarray(main_y),
         "u": jnp.full((4, H, W), 128, jnp.uint8),
         "v": jnp.full((4, H, W), 128, jnp.uint8)},
        "yuv444p", W, H, "bt709")
    g = FilterGraph(f"xfade=duration=0.4:offset=0:video={second}",
                    src_fps=5.0)
    _, k = g.process(fbs, pts=np.arange(4))
    consumed = int(k.sum())              # blends consume b 0..3
    fl = g.flush() or []
    assert len(fl) >= 2                  # chunked, not one batch
    total, last_pts = 0, None
    for ofb, kk, m in fl:
        assert ofb.batch <= 64
        total += int(kk.sum())
        pts = np.asarray(m["pts"])[kk]
        if last_pts is not None:
            assert pts[0] == last_pts + 1     # contiguous across chunks
        last_pts = int(pts[-1])
    assert total == 150 - consumed
    # luma identifies the source frame index: continuity check
    y0 = int(np.asarray(fl[0][0].planes["y"])[0, 0, 0])
    assert y0 == consumed % 256
