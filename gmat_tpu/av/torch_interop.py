"""PyTorch interop — parity with the reference's python bindings.

metrans hands decoded GPU frames to PyTorch as CUDA tensors
(python/frame_extractor.py:22-52, app_extract.py:5-30).  Here JAX arrays
exchange with torch via DLPack — zero-copy on CPU, and on matching
device runtimes where supported (falls back to a host copy otherwise).
"""
from __future__ import annotations

import numpy as np


def jax_to_torch(x):
    """jax.Array -> torch.Tensor (DLPack, zero-copy where possible)."""
    import torch
    try:
        return torch.from_dlpack(x)
    except Exception:
        return torch.from_numpy(np.asarray(x))


def torch_to_jax(t):
    """torch.Tensor -> jax.Array."""
    import jax
    import jax.dlpack
    try:
        return jax.dlpack.from_dlpack(t)
    except Exception:
        import jax.numpy as jnp
        return jnp.asarray(t.detach().cpu().numpy())


def extract_to_torch(path: str, frame_interval: int = 0,
                     out_size=None, batch: int = 8):
    """FrameExtractor -> torch NCHW fp32 tensors (the
    frame_extractor.extract_to_device_buffer analog).

    Yields (tensor, pts) pairs; tensors are (n, 3, H, W) in [0, 1]
    where n == batch except for the final partial batch (n == its
    real frame count).
    """
    import jax.numpy as jnp

    from ..core.frame import FrameBatch
    from ..ops import fused
    from .extractor import FrameExtractor

    fx = FrameExtractor(path, frame_interval=frame_interval)
    w, h = fx.width, fx.height
    out_w, out_h = out_size or (w, h)
    try:
        while True:
            b = fx.extract_batch(batch)
            if b is None:
                return
            ys, us, vs, pts = b
            valid = ys.shape[0]
            if valid < batch:
                # pad the tail to the steady-state batch shape: a
                # distinct leading dim would trigger a fresh remote
                # compile just for the leftovers
                pad = batch - valid
                ys = np.concatenate([ys, np.repeat(ys[-1:], pad, 0)])
                us = np.concatenate([us, np.repeat(us[-1:], pad, 0)])
                vs = np.concatenate([vs, np.repeat(vs[-1:], pad, 0)])
            fb = FrameBatch({"y": jnp.asarray(ys), "u": jnp.asarray(us),
                             "v": jnp.asarray(vs)}, "yuv420p", w, h,
                            fx.colorspace)
            x = fused.preprocess_nchw(fb, out_w, out_h)
            # trim AFTER the torch conversion: a device-side x[:valid]
            # would dispatch a tail-shaped slice program (a fresh remote
            # compile — the very thing the padding above avoids)
            yield jax_to_torch(x)[:valid], pts
    finally:
        fx.close()
