"""ESPCN-style super-resolution model — the in-graph inference workload.

Stands in for the reference's TensorRT SR engine (doc/Tensorrt_Filter.md:26,
vf_tensorrt.c) as a JAX model that runs *inside* the same jitted program as
the preprocessing ladder, so frames never leave HBM.

Pure-JAX (explicit param pytree): conv 5x5 -> conv 3x3 -> conv 3x3 to
r^2*C channels -> pixel shuffle (depth-to-space).  NCHW like the RGBPF32
tensors the TRT filter binds (tensorrt.cpp:586-631).
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def init_params(key: jax.Array, scale: int = 2, channels: int = 3,
                hidden: int = 64, dtype=jnp.float32) -> Dict:
    k1, k2, k3 = jax.random.split(key, 3)

    def conv_init(k, shape):
        fan_in = shape[1] * shape[2] * shape[3]
        return (jax.random.normal(k, shape, dtype) *
                jnp.asarray(np.sqrt(2.0 / fan_in), dtype))

    return {
        "w1": conv_init(k1, (hidden, channels, 5, 5)),
        "b1": jnp.zeros((hidden,), dtype),
        "w2": conv_init(k2, (hidden // 2, hidden, 3, 3)),
        "b2": jnp.zeros((hidden // 2,), dtype),
        "w3": conv_init(k3, (channels * scale * scale, hidden // 2, 3, 3)),
        "b3": jnp.zeros((channels * scale * scale,), dtype),
    }


def _conv(x, w, b, pad):
    # activations ride in the weight dtype (bf16 inference halves the HBM
    # traffic of the inter-layer tensors) but dot-products ACCUMULATE in
    # f32: bf16 accumulation over the 576-term fan-ins compounds to
    # whole-picture error (measured ~46 LSB mean on random init)
    x = x.astype(w.dtype)
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32)
    return (out + b.astype(jnp.float32)[None, :, None, None]).astype(w.dtype)


def pixel_shuffle(x: jax.Array, r: int) -> jax.Array:
    """(N, C*r^2, H, W) -> (N, C, H*r, W*r) depth-to-space."""
    n, crr, h, w = x.shape
    c = crr // (r * r)
    x = x.reshape(n, c, r, r, h, w)
    x = jnp.transpose(x, (0, 1, 4, 2, 5, 3))
    return x.reshape(n, c, h * r, w * r)


def scale_of(params: Dict, channels: int = 3) -> int:
    """Recover the (static) upscale factor from the w3 shape."""
    rr = params["w3"].shape[0] // channels
    return int(np.sqrt(rr))


def _forward(params: Dict, x: jax.Array) -> jax.Array:
    r = scale_of(params, x.shape[1])
    h = jax.nn.relu(_conv(x, params["w1"], params["b1"], 2))
    h = jax.nn.relu(_conv(h, params["w2"], params["b2"], 1))
    h = _conv(h, params["w3"], params["b3"], 1)
    return pixel_shuffle(h, r)


def apply(params: Dict, x: jax.Array) -> jax.Array:
    """x: (N, C, H, W) fp32 in [0,1] -> (N, C, H*r, W*r)."""
    return jnp.clip(_forward(params, x), 0.0, 1.0)


def loss_fn(params: Dict, x_lr: jax.Array, y_hr: jax.Array) -> jax.Array:
    # UNclipped forward: differentiating through the inference clip
    # zeroes gradients for every saturated pixel (half of them at init)
    # and can stall training dead after an LR spike
    pred = _forward(params, x_lr)
    return jnp.mean((pred - y_hr) ** 2)
