"""3DDFA-style pose/3DMM regression model.

Stands in for the reference's pose/3ddfa inference filters
(doc/Pose_Filter.md:1-72, doc/3DDFA_filter.md:1-62 — the filters live on
the ffmpeg-gpu-demo branch; the docs specify a 120x120 RGB input and a
62-dim 3DMM parameter output).  Small strided conv backbone + head.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

N_PARAMS = 62          # 3DMM params (12 pose + 40 shape + 10 expression)
INPUT_SIZE = 120       # doc/3DDFA_filter.md input crop


def init_params(key: jax.Array, widths=(16, 32, 64, 128),
                dtype=jnp.float32) -> Dict:
    keys = jax.random.split(key, len(widths) + 1)
    # NOTE: arrays only — a Python-int leaf (the old n_layers) breaks
    # grad/optimizer tree ops over the params
    params = {"convs": []}
    cin = 3
    for k, cout in zip(keys[:-1], widths):
        fan_in = cin * 9
        params["convs"].append({
            "w": jax.random.normal(k, (cout, cin, 3, 3), dtype) *
                 jnp.asarray(np.sqrt(2.0 / fan_in), dtype),
            "b": jnp.zeros((cout,), dtype),
        })
        cin = cout
    params["head_w"] = (jax.random.normal(keys[-1], (cin, N_PARAMS), dtype) *
                        jnp.asarray(np.sqrt(1.0 / cin), dtype))
    params["head_b"] = jnp.zeros((N_PARAMS,), dtype)
    return params


def apply(params: Dict, x: jax.Array) -> jax.Array:
    """x: (N, 3, H, W) fp32 -> (N, 62) 3DMM parameters."""
    h = x
    for layer in params["convs"]:
        # f32 accumulation, weight-dtype (bf16) inter-layer storage
        h = jax.lax.conv_general_dilated(
            h.astype(layer["w"].dtype), layer["w"], window_strides=(2, 2), padding="SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            preferred_element_type=jnp.float32)
        h = jax.nn.relu(h + layer["b"].astype(jnp.float32)[None, :, None, None]
                        ).astype(layer["w"].dtype)
    h = jnp.mean(h.astype(jnp.float32), axis=(2, 3))   # global average pool
    return h @ params["head_w"].astype(jnp.float32) + \
        params["head_b"].astype(jnp.float32)
