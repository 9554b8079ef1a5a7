"""Device mesh / sharding helpers — the multi-chip scale-out layer.

The reference scales by running N processes with a `-gpu` ordinal
(AppSelect.cpp:49-56) and host threads per session (AppMeTrans.cpp:342-344).
The TPU-native equivalent is SPMD over an ICI mesh: frames are the
embarrassingly-parallel axis ("data"), and an orthogonal "model" axis is
reserved for tensor-parallel in-graph inference (the tensorrt-filter
analog) when a model is too big for one chip.

All helpers work on any device set (real TPUs or the 8-device CPU mesh the
tests force), so sharding is validated without hardware.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.frame import FrameBatch

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    devs = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devs, (DATA_AXIS, MODEL_AXIS))



def shard_batch(fb: FrameBatch, mesh: Mesh) -> FrameBatch:
    """Shard every plane's leading (frame) axis across the data axis."""
    sh = NamedSharding(mesh, P(DATA_AXIS))
    planes = {k: jax.device_put(v, sh) for k, v in fb.planes.items()}
    return fb.with_planes(planes)



def shard_sr_params(params: dict, mesh: Mesh) -> dict:
    """Tensor-parallel layout for the SR model: the hidden dimension is
    split on the model axis where it appears ONCE per tensor — w1/b1 on
    their out-channel axis, w2 on its in-channel axis; w3 and the later
    biases are replicated (w2's out channels are the narrow hidden//2).
    XLA inserts the all-reduces where contractions cross the sharded dim.
    """
    def ns(*spec):
        return NamedSharding(mesh, P(*spec))

    placed = dict(params)
    placed["w1"] = jax.device_put(params["w1"], ns(MODEL_AXIS))
    placed["b1"] = jax.device_put(params["b1"], ns(MODEL_AXIS))
    placed["w2"] = jax.device_put(params["w2"], ns(None, MODEL_AXIS))
    placed["b2"] = jax.device_put(params["b2"], ns())
    placed["w3"] = jax.device_put(params["w3"], ns())
    placed["b3"] = jax.device_put(params["b3"], ns())
    return placed
