"""DnCNN-style residual denoiser — third in-graph inference workload.

Rounds out the tensorrt-filter model set (SR upscale, pose regression,
denoise) with a same-size image->image model, the natural fit for the
reference's luma-only IO mode (vf_tensorrt.c:206-217: 1-channel in/out
with chroma passthrough).  Conv stack predicts the noise residual;
output = input - residual.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def init_params(key: jax.Array, channels: int = 1, hidden: int = 32,
                depth: int = 5, dtype=jnp.float32) -> Dict:
    keys = jax.random.split(key, depth)
    layers = []
    cin = channels
    for i, k in enumerate(keys):
        cout = channels if i == depth - 1 else hidden
        fan_in = cin * 9
        layers.append({
            "w": jax.random.normal(k, (cout, cin, 3, 3), dtype) *
                 jnp.asarray(np.sqrt(2.0 / fan_in), dtype),
            "b": jnp.zeros((cout,), dtype),
        })
        cin = cout
    return {"layers": layers}


def apply(params: Dict, x: jax.Array) -> jax.Array:
    """x: (N, C, H, W) fp32 in [0,1] -> denoised, same shape."""
    h = x
    n_layers = len(params["layers"])
    for i, layer in enumerate(params["layers"]):
        # f32 accumulation, weight-dtype (bf16) inter-layer storage
        h = jax.lax.conv_general_dilated(
            h.astype(layer["w"].dtype), layer["w"], window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            preferred_element_type=jnp.float32)
        h = (h + layer["b"].astype(jnp.float32)[None, :, None, None]
             ).astype(layer["w"].dtype)
        if i < n_layers - 1:
            h = jax.nn.relu(h)
    return jnp.clip(x - h, 0.0, 1.0)     # residual learning
