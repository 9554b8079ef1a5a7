"""Small conv classifier — fourth in-graph inference workload.

The datacenter pattern the fused ladder exists for: decode -> 224x224
RGB NCHW (bench.py's op) -> content tagging inside the same jit.  The
reference ships this scenario as the tensorrt filter with a
classification ONNX (doc/Tensorrt_Filter.md "video enhancement /
inference" pipelines); like models/pose.py it is a vector-output model
(logits in `InferFilter.last_output`, frames pass through).

Architecture: 4 strided 3x3 conv blocks (stride 2, ReLU) + global
average pool + linear head — MXU-shaped (channels multiples of 8,
bf16-friendly), ~0.2 GFLOP at 224x224.  Real deployments load trained
weights via `infer=classify:weights=model.npz`.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def init_params(key: jax.Array, num_classes: int = 1000,
                widths=(32, 64, 128, 256), dtype=jnp.float32) -> Dict:
    keys = jax.random.split(key, len(widths) + 1)
    layers = []
    cin = 3
    for k, cout in zip(keys[:-1], widths):
        fan_in = cin * 9
        layers.append({
            "w": jax.random.normal(k, (cout, cin, 3, 3), dtype) *
                 jnp.asarray(np.sqrt(2.0 / fan_in), dtype),
            "b": jnp.zeros((cout,), dtype),
        })
        cin = cout
    # FLAT head keys (like pose.py): the npz checkpoint loader handles
    # top-level arrays and lists of layer dicts — a nested head dict
    # could never load from infer=classify:weights=model.npz
    return {"layers": layers,
            "head_w": jax.random.normal(keys[-1], (cin, num_classes),
                                        dtype) *
            jnp.asarray(np.sqrt(1.0 / cin), dtype),
            "head_b": jnp.zeros((num_classes,), dtype)}


def apply(params: Dict, x: jax.Array) -> jax.Array:
    """x: (N, 3, H, W) fp32 in [0,1] -> (N, num_classes) logits."""
    h = x
    for layer in params["layers"]:
        # f32 accumulation, weight-dtype (bf16) inter-layer storage
        h = jax.lax.conv_general_dilated(
            h.astype(layer["w"].dtype), layer["w"], window_strides=(2, 2), padding="SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            preferred_element_type=jnp.float32)
        h = jax.nn.relu(h + layer["b"].astype(jnp.float32)[None, :, None, None]
                        ).astype(layer["w"].dtype)
    h = jnp.mean(h.astype(jnp.float32), axis=(2, 3))  # global average pool
    return h @ params["head_w"].astype(jnp.float32) + \
        params["head_b"].astype(jnp.float32)
