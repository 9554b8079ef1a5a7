"""FrameBatch — the device-side frame container (JAX pytree).

The TPU analog of the reference's AVFrame-in-CUDA-pool / NvDecLite frame
pool (metrans/include/NvCodec/NvDecLite.h:55-109): instead of per-frame
pitched device pointers, we carry *batched dense planes* so the whole batch
is one XLA value and every op is a fused per-batch transform.

A FrameBatch is a pytree: plane arrays are leaves, everything else is
static metadata, so it passes through jit/shard_map/vmap transparently.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import formats as F


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class FrameBatch:
    planes: Dict[str, jax.Array]     # name -> (N, h, w[, c]) array
    format: str                       # key into formats.FORMATS
    width: int                        # luma width
    height: int                       # luma height
    colorspace: str = "bt709"

    # -- pytree protocol ----------------------------------------------------
    def tree_flatten(self):
        names = tuple(sorted(self.planes))
        children = tuple(self.planes[n] for n in names)
        aux = (names, self.format, self.width, self.height, self.colorspace)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        names, fmt, w, h, cs = aux
        return cls(dict(zip(names, children)), fmt, w, h, cs)

    # -- conveniences --------------------------------------------------------
    @property
    def fmt(self) -> F.PixelFormat:
        return F.get(self.format)

    @property
    def batch(self) -> int:
        return next(iter(self.planes.values())).shape[0]

    def plane(self, name: str) -> jax.Array:
        return self.planes[name]

    def validate(self) -> "FrameBatch":
        fmt = self.fmt
        n = self.batch
        for p in fmt.planes:
            arr = self.planes[p.name]
            want = (n,) + fmt.plane_shape(p.name, self.height, self.width)
            if tuple(arr.shape) != want:
                raise ValueError(
                    f"{self.format} plane {p.name}: shape {arr.shape} != {want}")
            if np.dtype(p.dtype) != arr.dtype:
                raise ValueError(
                    f"{self.format} plane {p.name}: dtype {arr.dtype} != {p.dtype}")
        return self

    def with_planes(self, planes: Dict[str, jax.Array], fmt: Optional[str] = None,
                    width: Optional[int] = None, height: Optional[int] = None):
        return FrameBatch(
            planes, fmt or self.format,
            self.width if width is None else width,
            self.height if height is None else height,
            self.colorspace,
        )


def from_numpy_yuv420(y: np.ndarray, u: np.ndarray, v: np.ndarray,
                      fmt: str = "yuv420p", colorspace: str = "bt709") -> FrameBatch:
    if y.ndim == 2:
        y, u, v = y[None], u[None], v[None]
    h, w = y.shape[1], y.shape[2]
    return FrameBatch({"y": jnp.asarray(y), "u": jnp.asarray(u),
                       "v": jnp.asarray(v)}, fmt, w, h, colorspace).validate()


def from_numpy_rgb(rgb: np.ndarray, fmt: str = "rgb24",
                   colorspace: str = "bt709") -> FrameBatch:
    if rgb.ndim == 3:
        rgb = rgb[None]
    h, w = rgb.shape[1], rgb.shape[2]
    return FrameBatch({"rgb": jnp.asarray(rgb)}, fmt, w, h, colorspace).validate()


def unpack_nv12(data: jax.Array, height: int, width: int,
                colorspace: str = "bt709") -> FrameBatch:
    """Unpack wire-format NV12 bytes -> planar FrameBatch.

    `data` is (N, H*3//2, W) uint8 exactly as decoded (Y plane stacked on the
    interleaved UV plane), the TPU analog of the pitched NV12 surface
    NvDecLite hands out (NvDecLite.cpp:177-242).  The deinterleave is a
    reshape+slice, which XLA fuses into whatever consumes the planes.
    """
    n = data.shape[0]
    y = data[:, :height, :]
    uv = data[:, height:, :].reshape(n, height // 2, width // 2, 2)
    return FrameBatch({"y": y, "u": uv[..., 0], "v": uv[..., 1]},
                      "nv12", width, height, colorspace)


def pack_nv12(fb: FrameBatch) -> jax.Array:
    """Planar FrameBatch -> wire-format NV12 (N, H*3//2, W) uint8."""
    n = fb.batch
    uv = jnp.stack([fb.planes["u"], fb.planes["v"]], axis=-1)
    uv = uv.reshape(n, fb.height // 2, fb.width)
    return jnp.concatenate([fb.planes["y"], uv], axis=1)
