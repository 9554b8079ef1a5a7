"""Quality metrics: PSNR / SSIM over frame batches.

The measurement half of the reference's manual quality tooling
(metrans/test/AppNvTransDiff.cpp compares interpolated/scaled/encoded
output by eyeball and printed values) — here as batched device
reductions usable in tests and perf gates.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def psnr(a: jax.Array, b: jax.Array, max_val: float = 255.0) -> jax.Array:
    """Per-frame PSNR (dB) over (N, ...) batches."""
    af = a.astype(jnp.float32)
    bf = b.astype(jnp.float32)
    axes = tuple(range(1, a.ndim))
    mse = jnp.mean((af - bf) ** 2, axis=axes)
    return 10.0 * jnp.log10((max_val * max_val) / jnp.maximum(mse, 1e-10))


def ssim(a: jax.Array, b: jax.Array, max_val: float = 255.0,
         win: int = 8) -> jax.Array:
    """Per-frame mean SSIM over (N, H, W) planes (non-overlapping windows,
    uniform weighting — the fast variant used for monitoring)."""
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    n, h, w = a.shape
    if h < win or w < win:
        raise ValueError(f"ssim needs planes of at least {win}x{win}, "
                         f"got {h}x{w} (pass a smaller win=)")
    hh, ww = h // win * win, w // win * win

    def blocks(x):
        x = x[:, :hh, :ww].astype(jnp.float32)
        return x.reshape(n, hh // win, win, ww // win, win)

    xa, xb = blocks(a), blocks(b)
    mu_a = xa.mean(axis=(2, 4))
    mu_b = xb.mean(axis=(2, 4))
    var_a = xa.var(axis=(2, 4))
    var_b = xb.var(axis=(2, 4))
    cov = (xa * xb).mean(axis=(2, 4)) - mu_a * mu_b
    s = ((2 * mu_a * mu_b + c1) * (2 * cov + c2) /
         ((mu_a ** 2 + mu_b ** 2 + c1) * (var_a + var_b + c2)))
    return s.mean(axis=(1, 2))
