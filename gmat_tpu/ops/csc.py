"""Color-space conversion ops (jnp reference path).

TPU rebuild of GMAT's CUDA conversion kernels:
  * yuv->rgb / rgb->yuv: ffmpeg-gpu/libswscale/cuda/yuv2rgb_cuda.cu
    (yuv2rgb_for_pixel:69-103, RgbToY/U/V:653-669, 2x2 chroma avg:672-703)
  * yuv->yuv depth/layout: ffmpeg-gpu/libswscale/cuda/yuv2yuv_cuda.cu
  * metrans ColorSpace.cu (same math, Nv12ToBgra32/BgrFloatPlanar etc.)

Everything here is pure jnp on batched planes, so a full conversion chain
jit-compiles to a single fused XLA program (the reference launches one CUDA
kernel per step).  Chroma upsampling is nearest (2x2 shares one U,V) and
chroma downsampling is the 2x2 average, matching the reference kernels.

`exact=True` truncates like the reference's C float->int casts; the default
rounds to nearest (better quality, 1 LSB difference worst case).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core import formats as F
from ..core.color import rgb2yuv_matrix, yuv2rgb_matrix, yuv_offsets
from ..core.frame import FrameBatch


def _container_bits(fmt: F.PixelFormat) -> int:
    return np.dtype(fmt.planes[0].dtype).itemsize * 8


def _offset_bits(fmt: F.PixelFormat) -> int:
    # p010/p016 carry samples in the high bits of u16, so offsets use the
    # container width, exactly like the reference's sizeof(YuvUnit)-based
    # offsets; lsb-aligned yuv420p10 uses its true bit depth.
    if fmt.name in ("p010", "p016", "yuv420p16"):
        return 16
    return fmt.bits


def _quantize(x: jax.Array, maxv: float, exact: bool) -> jax.Array:
    x = jnp.clip(x, 0.0, maxv)
    return jnp.floor(x) if exact else jnp.round(x)


def _chroma_up(c: jax.Array, sub_h: int, sub_w: int) -> jax.Array:
    """Nearest chroma upsample to luma resolution for any per-axis
    subsampling (4:2:0 = 1,1; 4:2:2 = 0,1)."""
    if sub_h:
        c = jnp.repeat(c, 1 << sub_h, axis=1)
    if sub_w:
        c = jnp.repeat(c, 1 << sub_w, axis=2)
    return c


def _chroma_box(c: jax.Array, sub_h: int, sub_w: int,
                exact: bool = False) -> jax.Array:
    """Box-mean downsample from luma resolution by per-axis factors."""
    if not (sub_h or sub_w):
        return c
    n, h, w = c.shape
    fh, fw = 1 << sub_h, 1 << sub_w
    c = c.reshape(n, h // fh, fh, w // fw, fw)
    if exact:
        # integer //(fh*fw) of the block sum, like the reference (:684-687)
        return jnp.floor(c.sum(axis=(2, 4)) / float(fh * fw))
    return c.mean(axis=(2, 4))


def _yuv_to_float(fb: FrameBatch):
    """Return (y, u, v) as f32 at luma resolution, offsets removed."""
    fmt = fb.fmt
    bits = _offset_bits(fmt)
    low, mid = yuv_offsets(bits)
    y = fb.planes["y"].astype(jnp.float32) - low
    if "u" not in fb.planes:           # gray8: neutral chroma
        z = jnp.zeros_like(y)
        return y, z, z
    u = fb.planes["u"].astype(jnp.float32) - mid
    v = fb.planes["v"].astype(jnp.float32) - mid
    pu = fmt.plane("u")
    if pu.sub_w or pu.sub_h:   # 4:2:0 / 4:2:2 -> upsample to 4:4:4
        u = _chroma_up(u, pu.sub_h, pu.sub_w)
        v = _chroma_up(v, pu.sub_h, pu.sub_w)
    return y, u, v


def _pack_rgb(r, g, b, out_fmt: F.PixelFormat, src_maxv: float, exact: bool,
              norm: Optional[float], shift: Optional[Sequence[float]],
              src_float: bool = False):
    """Take float RGB in [0, src_maxv] and pack into the target format."""
    if out_fmt.is_float:
        # Canonical float-RGB range is [0, 1] (what _rgb_to_float assumes
        # on the way back).  Default = quantize-to-u8 then /src_maxv;
        # format_cuda-style custom (x-shift)/norm is available (the caller
        # owns the inverse then), and norm=1.0 reproduces libgpuscale's
        # 0..255-valued RGBF32 (yuv2rgb_cuda.cu:104-126) for one-way
        # handoffs.
        chans = {"r": r, "g": g, "b": b}
        sh = shift or (0.0, 0.0, 0.0)
        nm = norm if norm is not None else src_maxv
        # float SOURCES skip the integer grid entirely: a pure channel
        # reorder (rgbpf32 <-> bgrpf32/rgbapf32) must be lossless, not
        # snapped to 1/255 steps
        if src_float:
            out = [jnp.clip(chans[c], 0, src_maxv) for c in "rgb"]
        else:
            out = [(jnp.clip(chans[c], 0, src_maxv) if exact else
                    jnp.clip(jnp.round(chans[c]), 0, src_maxv))
                   for c in "rgb"]
        out = [(o - s) / nm for o, s in zip(out, sh)]
        if out_fmt.channel_order.startswith("bgr"):
            out = out[::-1]
        if len(out_fmt.channel_order) == 4:
            out.append(jnp.ones_like(out[0]))
        rgb = jnp.stack(out, axis=-1).astype(jnp.float32)
    else:
        dst_bits = _container_bits(out_fmt)
        src_bits = int(round(np.log2(src_maxv + 1)))
        q = [_quantize(c, src_maxv, exact) for c in (r, g, b)]
        if dst_bits > src_bits:
            q = [c * (1 << (dst_bits - src_bits)) for c in q]
        elif dst_bits < src_bits:
            q = [jnp.floor(c / (1 << (src_bits - dst_bits))) for c in q]
        chans = dict(r=q[0], g=q[1], b=q[2])
        order = out_fmt.channel_order
        alpha = float((1 << dst_bits) - 1) if dst_bits <= 8 else 255.0
        # (alpha=255 even at 16-bit matches the reference's DEFAULT_ALPHA
        #  quirk, yuv2rgb_cuda.cu:9,88)
        out = [chans[c] if c != "a" else jnp.full_like(q[0], alpha)
               for c in order]
        rgb = jnp.stack(out, axis=-1).astype(out_fmt.planes[0].dtype)
    return rgb


def yuv_to_rgb(fb: FrameBatch, out_format: str = "rgb24", *,
               exact: bool = False, norm: Optional[float] = None,
               shift: Optional[Sequence[float]] = None) -> FrameBatch:
    """YUV (any registered 4:2:0 / 4:4:4 depth) -> RGB (any registered)."""
    out_fmt = F.get(out_format)
    assert out_fmt.is_rgb, out_format
    mat = yuv2rgb_matrix(fb.colorspace)
    y, u, v = _yuv_to_float(fb)
    maxv = float((1 << _offset_bits(fb.fmt)) - 1)
    r = mat[0, 0] * y + mat[0, 1] * u + mat[0, 2] * v
    g = mat[1, 0] * y + mat[1, 1] * u + mat[1, 2] * v
    b = mat[2, 0] * y + mat[2, 1] * u + mat[2, 2] * v
    r, g, b = (jnp.clip(c, 0.0, maxv) for c in (r, g, b))
    rgb = _pack_rgb(r, g, b, out_fmt, maxv, exact, norm, shift)
    return fb.with_planes({"rgb": rgb}, out_format)


def _rgb_to_float(fb: FrameBatch):
    """Return (r, g, b) float at native scale, plus the scale max."""
    fmt = fb.fmt
    arr = fb.planes["rgb"].astype(jnp.float32)
    if fmt.is_float:
        # float sources clamp to the canonical [0,1] range on read, like
        # swscale's float input readers (av_clipf) — HDR overbrights >1.0
        # (e.g. a tonemapped highlight after gamut mapping) must saturate
        # at signal white, not leak through the matrix into Y codes >235
        arr = jnp.clip(arr, 0.0, 1.0)
    order = fmt.channel_order
    chans = {c: arr[..., i] for i, c in enumerate(order)}
    maxv = 1.0 if fmt.is_float else float(F.max_value(fmt))
    return chans["r"], chans["g"], chans["b"], maxv


def rgb_to_yuv(fb: FrameBatch, out_format: str = "yuv420p", *,
               exact: bool = False) -> FrameBatch:
    """RGB -> YUV 4:2:0/4:4:4.  Chroma = convert(mean of 2x2 RGB block)."""
    out_fmt = F.get(out_format)
    assert out_fmt.is_yuv, out_format
    mat = rgb2yuv_matrix(fb.colorspace)
    r, g, b, src_maxv = _rgb_to_float(fb)
    dst_bits = _offset_bits(out_fmt)
    if out_fmt.name == "p010":
        # WRITE the clean <<6 wire convention: quantize at the true
        # 10-bit depth then shift into the container msb (yuv_to_yuv's
        # >>6 and packed-P010 consumers rely on clean low bits; reading
        # keeps container-scale offsets like the reference kernels)
        dst_bits = 10
    low, mid = yuv_offsets(dst_bits)
    dst_maxv = float((1 << dst_bits) - 1)
    scale = dst_maxv / src_maxv

    def to_y(r, g, b):
        return mat[0, 0] * r + mat[0, 1] * g + mat[0, 2] * b + low

    y = _quantize(to_y(r * scale, g * scale, b * scale), dst_maxv, exact)
    if not any(p.name == "u" for p in out_fmt.planes):   # gray8: luma only
        dt = out_fmt.planes[0].dtype
        return fb.with_planes({"y": y.astype(dt)}, out_format)
    pu = out_fmt.plane("u")
    if pu.sub_w or pu.sub_h:
        ex = exact and not fb.fmt.is_float
        r = _chroma_box(r, pu.sub_h, pu.sub_w, ex)
        g = _chroma_box(g, pu.sub_h, pu.sub_w, ex)
        b = _chroma_box(b, pu.sub_h, pu.sub_w, ex)
    r, g, b = r * scale, g * scale, b * scale
    u = _quantize(mat[1, 0] * r + mat[1, 1] * g + mat[1, 2] * b + mid,
                  dst_maxv, exact)
    vv = _quantize(mat[2, 0] * r + mat[2, 1] * g + mat[2, 2] * b + mid,
                   dst_maxv, exact)
    shift_up = _container_bits(out_fmt) - dst_bits if out_fmt.name == "p010" else 0
    dt = out_fmt.planes[0].dtype
    planes = {
        "y": (y.astype(jnp.uint32) << shift_up).astype(dt) if shift_up else y.astype(dt),
        "u": (u.astype(jnp.uint32) << shift_up).astype(dt) if shift_up else u.astype(dt),
        "v": (vv.astype(jnp.uint32) << shift_up).astype(dt) if shift_up else vv.astype(dt),
    }
    return fb.with_planes(planes, out_format)


def yuv_to_yuv(fb: FrameBatch, out_format: str) -> FrameBatch:
    """Depth / chroma-layout conversion between YUV formats.

    Depth changes follow yuv2yuv_cuda.cu:16-120: u8->u16 is x<<8 (high-bit
    alignment), u16->u8 is x>>8.
    """
    out_fmt = F.get(out_format)
    in_fmt = fb.fmt
    dt = out_fmt.planes[0].dtype
    # significant bits + in-container alignment (p010 stores 10-bit
    # samples msb-aligned, i.e. << 6; yuv420p10 is lsb-aligned)
    src_sig, dst_sig = in_fmt.bits, out_fmt.bits
    src_sh = 6 if in_fmt.name == "p010" else 0
    dst_sh = 6 if out_fmt.name == "p010" else 0

    def conv(p):
        v = p.astype(jnp.int32) >> src_sh
        if dst_sig > src_sig:
            v = v << (dst_sig - src_sig)
        elif dst_sig < src_sig:
            v = v >> (src_sig - dst_sig)
        return (v << dst_sh).astype(dt)

    planes = {k: conv(v) for k, v in fb.planes.items()}
    in_has_c = any(p.name == "u" for p in in_fmt.planes)
    out_has_c = any(p.name == "u" for p in out_fmt.planes)
    if in_has_c and not out_has_c:       # -> gray8: drop chroma
        planes = {"y": planes["y"]}
        return fb.with_planes(planes, out_format)
    if out_has_c and not in_has_c:       # gray8 -> yuv: neutral chroma
        mid = 1 << (_offset_bits(out_fmt) - 1)
        pu = out_fmt.plane("u")
        # per-axis shifts: 4:2:2 halves width only (sub_h = 0)
        cshape = (fb.batch, fb.height >> pu.sub_h, fb.width >> pu.sub_w)
        neutral = jnp.full(cshape, mid, dt)
        planes["u"] = neutral
        planes["v"] = neutral
        return fb.with_planes(planes, out_format)
    ipu = in_fmt.plane("u") if in_has_c else None
    opu = out_fmt.plane("u") if out_has_c else None
    if ipu is None or opu is None:       # gray -> gray: depth-only
        return fb.with_planes(planes, out_format)
    if (ipu.sub_w, ipu.sub_h) != (opu.sub_w, opu.sub_h):
        # generic per-axis relayout (420<->444, 422<->444, 420<->422):
        # nearest-upsample to 4:4:4 then box-mean down to the target
        for k in ("u", "v"):
            c = _chroma_up(planes[k], ipu.sub_h, ipu.sub_w)
            if opu.sub_w or opu.sub_h:
                c = _chroma_box(c.astype(jnp.float32), opu.sub_h, opu.sub_w)
                c = jnp.round(c)
            planes[k] = c.astype(dt)
    return fb.with_planes(planes, out_format)


def rgb_to_rgb(fb: FrameBatch, out_format: str, *, exact: bool = False,
               norm: Optional[float] = None,
               shift: Optional[Sequence[float]] = None) -> FrameBatch:
    """Channel reorder / depth / float conversion between RGB formats."""
    out_fmt = F.get(out_format)
    if (fb.fmt.is_float and out_fmt.is_float and norm is None
            and shift is None):
        # pure channel reorder between float formats: bit-exact (the
        # scale-by-255 round trip below costs 1 ulp)
        arr = fb.planes["rgb"]
        src_o, dst_o = fb.fmt.channel_order, out_fmt.channel_order
        chans = {c: arr[..., i] for i, c in enumerate(src_o)}
        out = [chans.get(c, jnp.ones_like(arr[..., 0])) for c in dst_o]
        return fb.with_planes(
            {"rgb": jnp.stack(out, axis=-1).astype(jnp.float32)},
            out_format)
    r, g, b, src_maxv = _rgb_to_float(fb)
    if fb.fmt.is_float:
        r, g, b = (c * 255.0 for c in (r, g, b))
        src_maxv = 255.0
    rgb = _pack_rgb(r, g, b, out_fmt, src_maxv, exact, norm, shift,
                    src_float=fb.fmt.is_float)
    return fb.with_planes({"rgb": rgb}, out_format)


def convert(fb: FrameBatch, out_format: str, **kw) -> FrameBatch:
    """Format dispatcher — the TPU analog of sws 'unscaled' conversion
    (libswscale/swscale_unscaled.c:1992-2056 wrapper table)."""
    if out_format == fb.format and not kw:
        return fb
    in_rgb, out_rgb = fb.fmt.is_rgb, F.get(out_format).is_rgb
    if out_format == fb.format and in_rgb:
        return rgb_to_rgb(fb, out_format, **kw)
    if out_format == fb.format:
        return fb   # yuv same-format: no kwargs apply
    if in_rgb and out_rgb:
        return rgb_to_rgb(fb, out_format, **kw)
    if in_rgb:
        return rgb_to_yuv(fb, out_format, **kw)
    if out_rgb:
        return yuv_to_rgb(fb, out_format, **kw)
    kw.pop("exact", None)
    return yuv_to_yuv(fb, out_format, **kw)


def to_nchw(fb: FrameBatch) -> jax.Array:
    """Packed (N,H,W,C) RGB batch -> NCHW fp32 planar (the RGBPF32 tensor
    shape DL models consume, format_cuda.h:74-89)."""
    return jnp.transpose(fb.planes["rgb"], (0, 3, 1, 2)).astype(jnp.float32)


def from_nchw(x: jax.Array, fmt: str, colorspace: str = "bt709") -> FrameBatch:
    n, c, h, w = x.shape
    return FrameBatch({"rgb": jnp.transpose(x, (0, 2, 3, 1))}, fmt, w, h,
                      colorspace)
