"""Independent numpy oracle replicating the reference CUDA math exactly.

Mirrors ffmpeg-gpu/libswscale/cuda/yuv2rgb_cuda.cu semantics (truncating
casts, 2x2 chroma sharing) so gmat_tpu kernels can be validated against a
second implementation written directly from the reference source.
"""
import numpy as np


def constants(cspace):
    wr, wb = {
        "bt709": (0.2126, 0.0722),
        "fcc": (0.30, 0.11),
        "bt601": (0.2990, 0.1140),
        "smpte240m": (0.212, 0.087),
        "bt2020": (0.2627, 0.0593),
    }[cspace]
    if cspace == "bt2020":
        return wr, wb, 64 << 6, 940 << 6, (1 << 16) - 1
    return wr, wb, 16, 235, 255


def mat_yuv2rgb(cspace):
    wr, wb, black, white, maxv = constants(cspace)
    m = np.array([
        [1.0, 0.0, (1.0 - wr) / 0.5],
        [1.0, -wb * (1.0 - wb) / 0.5 / (1 - wb - wr),
              -wr * (1 - wr) / 0.5 / (1 - wb - wr)],
        [1.0, (1.0 - wb) / 0.5, 0.0]])
    return (m * (1.0 * maxv / (white - black))).astype(np.float32)


def mat_rgb2yuv(cspace):
    wr, wb, black, white, maxv = constants(cspace)
    m = np.array([
        [wr, 1.0 - wb - wr, wb],
        [-0.5 * wr / (1.0 - wb), -0.5 * (1 - wb - wr) / (1.0 - wb), 0.5],
        [0.5, -0.5 * (1.0 - wb - wr) / (1.0 - wr), -0.5 * wb / (1.0 - wr)]])
    return (m * (1.0 * (white - black) / maxv)).astype(np.float32)


def yuv420_to_rgb24(y, u, v, cspace="bt709", bits=8):
    """y: (H,W), u/v: (H/2,W/2) -> (H,W,3) uint8/uint16. Truncating casts."""
    m = mat_yuv2rgb(cspace)
    low, mid = 1 << (bits - 4), 1 << (bits - 1)
    maxf = float((1 << bits) - 1)
    fy = y.astype(np.float32) - low
    fu = np.repeat(np.repeat(u, 2, 0), 2, 1).astype(np.float32) - mid
    fv = np.repeat(np.repeat(v, 2, 0), 2, 1).astype(np.float32) - mid
    out = np.empty(y.shape + (3,), np.float32)
    for i in range(3):
        out[..., i] = np.clip(m[i, 0] * fy + m[i, 1] * fu + m[i, 2] * fv,
                              0.0, maxf)
    dt = np.uint8 if bits == 8 else np.uint16
    return np.floor(out).astype(dt)


def rgb24_to_yuv420(rgb, cspace="bt709", bits=8):
    """(H,W,3) uint -> (y, u, v) with 2x2-average chroma, truncating casts."""
    m = mat_rgb2yuv(cspace)
    low, mid = 1 << (bits - 4), 1 << (bits - 1)
    r = rgb[..., 0].astype(np.float32)
    g = rgb[..., 1].astype(np.float32)
    b = rgb[..., 2].astype(np.float32)
    y = m[0, 0] * r + m[0, 1] * g + m[0, 2] * b + low
    h, w = r.shape
    # integer 2x2 average like the reference (sum/4 with int division)
    def avg(c):
        ci = c.astype(np.uint32).reshape(h // 2, 2, w // 2, 2)
        return (ci.sum(axis=(1, 3)) // 4).astype(np.float32)
    ra, ga, ba = avg(rgb[..., 0]), avg(rgb[..., 1]), avg(rgb[..., 2])
    uu = m[1, 0] * ra + m[1, 1] * ga + m[1, 2] * ba + mid
    vv = m[2, 0] * ra + m[2, 1] * ga + m[2, 2] * ba + mid
    dt = np.uint8 if bits == 8 else np.uint16
    maxf = float((1 << bits) - 1)
    cast = lambda x: np.floor(np.clip(x, 0, maxf)).astype(dt)
    return cast(y), cast(uu), cast(vv)


def bilinear_resize(img, oh, ow):
    """Separable bilinear resize oracle for (H,W) or (H,W,C) float/uint.

    Uses the half-pixel (pixel-center) convention:
      src = (dst + 0.5) * scale - 0.5, clamped — same as CUDA tex2D with
      normalized coords as used by metrans Resize.cu and CV-CUDA bilinear.
    """
    img = img.astype(np.float64)
    ih, iw = img.shape[:2]

    def axis_weights(n_in, n_out):
        src = (np.arange(n_out) + 0.5) * (n_in / n_out) - 0.5
        src = np.clip(src, 0, n_in - 1)
        i0 = np.floor(src).astype(int)
        i1 = np.minimum(i0 + 1, n_in - 1)
        f = src - i0
        return i0, i1, f

    r0, r1, fr = axis_weights(ih, oh)
    c0, c1, fc = axis_weights(iw, ow)
    if img.ndim == 3:
        fr_ = fr[:, None, None]; fc_ = fc[None, :, None]
    else:
        fr_ = fr[:, None]; fc_ = fc[None, :]
    row0 = img[r0][:, c0] * (1 - fc_) + img[r0][:, c1] * fc_
    row1 = img[r1][:, c0] * (1 - fc_) + img[r1][:, c1] * fc_
    return row0 * (1 - fr_) + row1 * fr_


# ---- yadif (scalar port of vf_yadif_cuda.cu, written from the source) ----

def _yadif_spatial(cc, y, x, h, w):
    def at(yy, xx):
        return int(cc[min(max(yy, 0), h - 1), min(max(xx, 0), w - 1)])
    a, b, c = at(y - 1, x - 3), at(y - 1, x - 2), at(y - 1, x - 1)
    d, e = at(y - 1, x), at(y - 1, x + 1)
    f, g = at(y - 1, x + 2), at(y - 1, x + 3)
    hh, i, j = at(y + 1, x - 3), at(y + 1, x - 2), at(y + 1, x - 1)
    k, l = at(y + 1, x), at(y + 1, x + 1)
    m, n = at(y + 1, x + 2), at(y + 1, x + 3)
    pred = (d + k) // 2
    score = abs(c - j) + abs(d - k) + abs(e - l)
    s = abs(b - k) + abs(c - l) + abs(d - m)
    if s < score:
        pred, score = (c + l) // 2, s
        s = abs(a - l) + abs(b - m) + abs(c - n)
        if s < score:
            pred, score = (b + m) // 2, s
    s = abs(d - i) + abs(e - j) + abs(f - k)
    if s < score:
        pred, score = (e + j) // 2, s
        s = abs(e - hh) + abs(f - i) + abs(g - j)
        if s < score:
            pred, score = (f + i) // 2, s
    return pred


def yadif_frame(prev, cur, next_, parity, tff, skip_spatial_check=False):
    """One deinterlaced output frame (vf_yadif_cuda.cu yadif_single)."""
    h, w = cur.shape
    out = np.array(cur, copy=True)
    is_second = (parity ^ tff) == 0
    prev2, next2 = prev, next_
    prev1 = cur if is_second else prev
    next1 = next_ if is_second else cur

    def at(img, yy, xx):
        return int(img[min(max(yy, 0), h - 1), min(max(xx, 0), w - 1)])

    for y in range(h):
        if y % 2 == parity:
            continue
        for x in range(w):
            pred = _yadif_spatial(cur, y, x, h, w)
            A, B = at(prev2, y - 1, x), at(prev2, y + 1, x)
            C, D, E = at(prev1, y - 2, x), at(prev1, y, x), at(prev1, y + 2, x)
            F, G = at(cur, y - 1, x), at(cur, y + 1, x)
            H, I = at(next1, y - 2, x), at(next1, y, x)
            J = at(next1, y + 2, x)
            K, L = at(next2, y - 1, x), at(next2, y + 1, x)
            p0, p1, p2, p3, p4 = (C + H) // 2, F, (D + I) // 2, G, (E + J) // 2
            tdiff0 = abs(D - I)
            tdiff1 = (abs(A - F) + abs(B - G)) // 2
            tdiff2 = (abs(K - F) + abs(G - L)) // 2
            diff = max(tdiff0, tdiff1, tdiff2)
            if not skip_spatial_check:
                maxi = max(p2 - p3, p2 - p1, min(p0 - p1, p4 - p3))
                mini = min(p2 - p3, p2 - p1, max(p0 - p1, p4 - p3))
                diff = max(diff, mini, -maxi)
            if pred > p2 + diff:
                pred = p2 + diff
            if pred < p2 - diff:
                pred = p2 - diff
            out[y, x] = pred
    return out


# ---- overlay (scalar port of vf_overlay_cuda.cu Overlay_Cuda) ----

def overlay_plane(main, over, x, y, alpha=None, adj=1):
    """In-place-style blend of one plane; alpha is the full-res u8 alpha
    plane or None (opaque); adj = alpha_adj (1 luma, 2 chroma)."""
    out = np.array(main, copy=True)
    h, w = main.shape
    oh, ow = over.shape
    for yy in range(h):
        for xx in range(w):
            if xx >= ow + x or yy >= oh + y or xx < x or yy < y:
                continue
            ox, oy = xx - x, yy - y
            a = 1.0 if alpha is None else alpha[adj * oy, adj * ox] / np.float32(255.0)
            out[yy, xx] = np.float32(a) * np.float32(over[oy, ox]) + \
                (np.float32(1.0) - np.float32(a)) * np.float32(main[yy, xx])
    return out


def overlay_yuv420(main, over, x, y, alpha=None):
    """Dict-of-planes blend matching vf_overlay_cuda.c:289-327 geometry."""
    x = x & ~1
    out = {"y": overlay_plane(main["y"], over["y"], x, y, alpha, 1)}
    # C truncating division (vf_overlay_cuda.c:303 "y_position / 2"):
    # floor would shift chroma a row for negative odd y
    cy = y // 2 if y >= 0 else -((-y) // 2)
    for c in ("u", "v"):
        out[c] = overlay_plane(main[c], over[c], x // 2, cy, alpha, 2)
    return out
