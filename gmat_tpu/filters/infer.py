"""In-graph inference filter — the tensorrt filter, TPU-native.

Where the reference binds AVFrames as TensorRT engine bindings
(vf_tensorrt.c:160-179, tensorrt.cpp:586-631), here the model is a JAX
function fused into the same XLA program as the surrounding filters, so
activations never leave HBM and there is no engine/cache round trip (the
JAX persistent compilation cache plays the .trtcache role,
tensorrt.cpp:198-222).

Two IO modes mirroring the reference (vf_tensorrt.c:206-217):
  * 3-channel: RGBPF32 in -> RGBPF32 out (any spatial scale factor)
  * luma-only: Y plane in (1 channel), chroma passed through / resampled
    (copy_UV_plane, tensorrt.cpp:562-584)
"""
from __future__ import annotations

import importlib
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.frame import FrameBatch
from ..ops import csc, resize


def _bundled_weights(model: str, channels: int, hidden: int) -> str:
    """Path of a shipped pretrained checkpoint for this config, or ''.

    sr2x at the default width ships models/weights/espcn_x2.npz (trained
    by tools/train_sr.py) so `infer=sr2x` does real super-resolution out
    of the box — the reference's demo engines are user-supplied
    (doc/Tensorrt_Filter.md:26), ours is batteries-included."""
    import os
    name = None
    if model == "sr2x" and channels == 3 and hidden in (0, 64):
        name = "espcn_x2.npz"
    elif model == "sr2x" and channels == 3 and hidden == 128:
        # the MXU runs the 128-wide model at the same wall time as 64
        # (BENCHMARKS "in-graph inference"); +0.4 dB held-out over h64
        name = "espcn_x2_h128.npz"
    elif model == "sr3x" and channels == 3 and hidden in (0, 64):
        name = "espcn_x3.npz"
    elif model == "denoise" and channels == 3:
        name = "dncnn.npz"
    elif model == "denoise" and channels == 1:
        # luma-only checkpoint (tools/train_denoise.py --channels 1);
        # absent file falls through to '' like every other config
        name = "dncnn_l.npz"
    if name:
        p = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "models", "weights", name)
        if os.path.exists(p):
            return p
    return ""


def _load_one(name, v, loaded):
    if hasattr(v, "shape") and loaded[name].shape != v.shape:
        raise ValueError(
            f"weights[{name!r}] shape {loaded[name].shape} does not "
            f"match the model's {tuple(v.shape)} — was the "
            "checkpoint trained at a different hidden width?")
    return jnp.asarray(loaded[name])


def _load_weights(params, path: str):
    """Map a flat .npz onto the model's param pytree.  Flat dicts match
    by key; lists of layer dicts use the `layers.{i}.{name}` convention
    (the denoise trainer's save format)."""
    if not path or path == "random":   # "random" skips the bundled npz
        return params
    loaded = dict(np.load(path))
    used = set()
    out = {}
    for k, v in params.items():
        if k in loaded:
            out[k] = _load_one(k, v, loaded)
            used.add(k)
        elif isinstance(v, list):
            # a checkpoint carrying ANY layers.* keys must carry them
            # all: a depth-mismatched npz half-loading would silently
            # mix trained and random weights
            has_any = any(key.startswith(f"{k}.") for key in loaded)
            missing = [f"{k}.{i}.{n}"
                       for i, layer in enumerate(v)
                       for n in layer
                       if f"{k}.{i}.{n}" not in loaded]
            if has_any and missing:
                raise ValueError(
                    f"checkpoint {path!r} is missing {missing[:3]}... — "
                    "was it trained at a different depth?")
            out[k] = [
                {n: (_load_one(f"{k}.{i}.{n}", a, loaded)
                     if f"{k}.{i}.{n}" in loaded else a)
                 for n, a in layer.items()}
                for i, layer in enumerate(v)]
            used.update(key for key in loaded
                        if key.startswith(f"{k}."))
        else:
            out[k] = v
    unused = sorted(set(loaded) - used)
    if unused:
        # keys matching nothing mean the wrong/renamed checkpoint: the
        # model would silently run on (partly) random weights
        raise ValueError(
            f"checkpoint {path!r} has keys the model does not: "
            f"{unused[:4]}{'...' if len(unused) > 4 else ''}")
    return out


class InferFilter:
    """Callable FrameBatch filter wrapping a JAX model."""

    def __init__(self, model: str = "sr2x", weights: str = "",
                 luma_only: bool = False, precision: str = "bf16",
                 hidden: int = 0):
        """precision="bf16" (default) runs the convs on the bf16 MXU path
        with f32 accumulation — the reference builds its TensorRT engines
        with the FP16 flag by default (tensorrt.cpp:198-222); "fp32"
        keeps full precision.  hidden widens the sr model's conv layers
        (0 = model default 64); width 128 fills the MXU's 128 lanes and
        runs 3.4x the FLOPs at the same wall time (BENCHMARKS.md)."""
        if precision not in ("bf16", "fp32"):
            raise ValueError(f"precision must be bf16|fp32, got {precision!r}")
        self.precision = precision
        self._params_cast = None
        self.name = model
        self.luma_only = luma_only
        self.last_output = None          # for non-image models (pose)
        channels = 1 if luma_only else 3
        if int(hidden) and not (model.startswith("sr")
                                and ":" not in model):
            raise ValueError("hidden= only applies to the sr models")
        if ":" in model:
            # custom module:function FIRST — a user module named
            # 'sr_models' must not be hijacked by the sr-builtin prefix
            mod, fn = model.split(":", 1)
            m = importlib.import_module(mod)
            self.apply = getattr(m, fn)
            self.params = None
            self.scale = 1
            self.kind = "image"
        elif model.startswith("sr"):
            from ..models import sr
            scale = int(model[2]) if len(model) > 2 and model[2].isdigit() else 2
            kw = {"hidden": int(hidden)} if int(hidden) else {}
            params = sr.init_params(jax.random.PRNGKey(0), scale=scale,
                                    channels=channels, **kw)
            if not weights:
                weights = _bundled_weights(model, channels, int(hidden))
            self.params = _load_weights(params, weights)
            self.apply = sr.apply
            self.scale = scale
            self.kind = "image"
        elif model == "denoise":
            from ..models import denoise
            params = denoise.init_params(jax.random.PRNGKey(0),
                                         channels=channels)
            if not weights:
                weights = _bundled_weights(model, channels, 0)
            self.params = _load_weights(params, weights)
            self.apply = denoise.apply
            self.scale = 1
            self.kind = "image"
        elif model == "pose":
            from ..models import pose
            params = pose.init_params(jax.random.PRNGKey(0))
            self.params = _load_weights(params, weights)
            self.apply = pose.apply
            self.scale = 1
            self.kind = "vector"
        elif model == "classify":
            from ..models import classify
            params = classify.init_params(jax.random.PRNGKey(0))
            self.params = _load_weights(params, weights)
            self.apply = classify.apply
            self.scale = 1
            self.kind = "vector"
        else:
            raise ValueError(f"unknown infer model {model!r} "
                             "(sr2x|sr3x|denoise|pose|classify|"
                             "module:function)")
        if self.params is not None and self.precision == "bf16":
            # build the cast tree HERE, where params are concrete arrays —
            # _run executes under FilterGraph's jit, and caching arrays
            # created during a trace would leak tracers across traces
            self._params_cast = jax.tree.map(
                lambda a: a.astype(jnp.bfloat16)
                if hasattr(a, "dtype") and a.dtype == jnp.float32 else a,
                self.params)

    def _run(self, x):
        if self.params is None:
            return self.apply(x)
        if self.precision == "bf16":
            # cast at the model boundary: convs + inter-layer activations
            # run in bf16 (on TPU the MXU still accumulates products in
            # f32 internally; other backends may accumulate in bf16 —
            # precision="fp32" is the exact path)
            out = self.apply(self._params_cast, x.astype(jnp.bfloat16))
            return out.astype(jnp.float32)
        return self.apply(self.params, x)

    def __call__(self, fb: FrameBatch) -> FrameBatch:
        if self.luma_only:
            return self._call_luma(fb)
        rgb = fb if fb.format == "rgbpf32" else csc.convert(
            fb, "rgbpf32", norm=255.0)
        x = csc.to_nchw(rgb)
        out = self._run(x)
        if self.kind == "vector":
            # __call__ runs under FilterGraph's jit: a direct assignment
            # would store a TRACER on the instance (stale after the
            # first compile, UnexpectedTracerError on read — the
            # CLAUDE.md tracer-leak class).  debug.callback executes on
            # every run, eager or compiled, with the concrete values.
            def _stash(a):
                self.last_output = np.asarray(a)
            jax.debug.callback(_stash, out)
            return fb
        return csc.from_nchw(out, "rgbpf32", fb.colorspace)

    def _call_luma(self, fb: FrameBatch) -> FrameBatch:
        if fb.fmt.is_rgb:
            raise ValueError("luma_only infer requires a YUV input")
        if fb.fmt.bits != 8:
            raise ValueError("luma_only infer is an 8-bit lane (got "
                             f"{fb.format}); insert format=yuv420p first")
        y = fb.planes["y"].astype(jnp.float32)[:, None] / 255.0
        out = jnp.clip(self._run(y), 0.0, 1.0)
        y_out = jnp.round(out[:, 0] * 255.0).astype(jnp.uint8)
        r = self.scale
        planes = {"y": y_out}
        for c in ("u", "v"):
            if c not in fb.planes:       # gray8: luma IS the image
                continue
            p = fb.planes[c]
            if r != 1:   # keep chroma consistent with the scaled luma
                p = resize.resize_plane(p, p.shape[1] * r, p.shape[2] * r,
                                        "nearest", dtype=jnp.float32)
                p = jnp.clip(jnp.round(p), 0, 255).astype(jnp.uint8)
            planes[c] = p
        return fb.with_planes(planes, width=fb.width * r,
                              height=fb.height * r)
