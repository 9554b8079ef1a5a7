"""8x8 DCT / quantization tiles — the TPU half of the JPEG/HEIF still codec.

Replaces the nvjpeg fixed-function path (metrans/samples/
AppNvjpegDec.cpp:24-67, nvjpegDecode + Nv12ToBgr handoff) with MXU math: a frame is blockified to (..., 8, 8) tiles and the whole
batch is transformed as two batched matmuls  C = D @ X @ D^T  (DCT-II,
orthonormal).  Quantization is elementwise.  Entropy coding happens on the
host in C++ (csrc/gmat_jpeg.cpp) — the TPU analog of the reference's
GPU-compute + host-mux split.
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

# ITU-T81 Annex K base quantization tables
QUANT_LUMA = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99]], np.float32)

QUANT_CHROMA = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99]], np.float32)


def quality_tables(quality: int):
    """libjpeg quality scaling -> (luma, chroma) uint8 tables."""
    q = int(np.clip(quality, 1, 100))
    scale = 5000 // q if q < 50 else 200 - 2 * q

    def scale_tbl(t):
        return np.clip((t * scale + 50) // 100, 1, 255).astype(np.uint8)

    return scale_tbl(QUANT_LUMA), scale_tbl(QUANT_CHROMA)


@lru_cache(maxsize=1)
def dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II matrix."""
    k = np.arange(8)
    D = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16.0)
    D[0] *= 1.0 / np.sqrt(2.0)
    return (D * 0.5).astype(np.float32)


# T.81 zigzag scan: ZIGZAG[i] = natural (row-major) index of scan pos i
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], np.int32)
ZIGZAG_INV = np.argsort(ZIGZAG).astype(np.int32)


def to_zigzag(coefs: jax.Array) -> jax.Array:
    """(..., 8, 8) natural-order blocks -> (..., 64) zigzag scan order.
    Runs inside the jitted coef program: the permutation is free on
    device, so the host entropy coder reads purely sequential memory."""
    flat = coefs.reshape(coefs.shape[:-2] + (64,))
    return flat[..., jnp.asarray(ZIGZAG)]


def from_zigzag(z: jax.Array) -> jax.Array:
    """(..., 64) zigzag order -> (..., 8, 8) natural-order blocks."""
    flat = z[..., jnp.asarray(ZIGZAG_INV)]
    return flat.reshape(z.shape[:-1] + (8, 8))


def blockify(x: jax.Array) -> jax.Array:
    """(N, H, W) -> (N, H//8, W//8, 8, 8)."""
    n, h, w = x.shape
    x = x.reshape(n, h // 8, 8, w // 8, 8)
    return jnp.transpose(x, (0, 1, 3, 2, 4))


def unblockify(b: jax.Array) -> jax.Array:
    """(N, bh, bw, 8, 8) -> (N, bh*8, bw*8)."""
    n, bh, bw = b.shape[:3]
    x = jnp.transpose(b, (0, 1, 3, 2, 4))
    return x.reshape(n, bh * 8, bw * 8)


def dct8x8(blocks: jax.Array) -> jax.Array:
    """DCT-II over trailing (8, 8) dims (batched MXU matmuls)."""
    D = jnp.asarray(dct_matrix())
    y = jnp.einsum("ij,...jk->...ik", D, blocks.astype(jnp.float32),
                   precision="highest")
    return jnp.einsum("...ik,jk->...ij", y, D, precision="highest")


def idct8x8(coefs: jax.Array) -> jax.Array:
    D = jnp.asarray(dct_matrix())
    y = jnp.einsum("ji,...jk->...ik", D, coefs.astype(jnp.float32),
                   precision="highest")
    return jnp.einsum("...ik,kj->...ij", y, D, precision="highest")


def encode_plane(x: jax.Array, qtable: np.ndarray) -> jax.Array:
    """(N, H, W) uint8 plane -> (N, H//8, W//8, 8, 8) int16 quantized
    coefficients (level-shifted JPEG forward transform).

    Scale note: JPEG uses the *scaled* DCT where DC of a flat-128 block is
    0 and coefficients span +-1024; the orthonormal D above already gives
    exactly that (D includes the 1/2 factor per axis = T.81's convention).
    """
    blocks = blockify(x.astype(jnp.float32) - 128.0)
    coefs = dct8x8(blocks)
    q = jnp.asarray(qtable, jnp.float32)
    return jnp.round(coefs / q).astype(jnp.int16)


def decode_plane(coefs: jax.Array, qtable: np.ndarray) -> jax.Array:
    """Quantized coefficients -> (N, H, W) uint8 plane."""
    q = jnp.asarray(qtable, jnp.float32)
    blocks = idct8x8(coefs.astype(jnp.float32) * q)
    x = unblockify(blocks) + 128.0
    return jnp.clip(jnp.round(x), 0, 255).astype(jnp.uint8)
