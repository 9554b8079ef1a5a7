"""Filter-graph parser and runner.

Keeps ffmpeg-gpu's `-vf` semantics (filters separated by ',', options by
':' as k=v or positional, '\\' escapes) so GMAT CLI pipelines port
directly, e.g.:

    scale=1280:720,format=rgbpf32le,tensorrt=sr2x,format=nv12
    crop=w=480:h=480,rotate=angle=45,smooth=type=median:kw=5
    select='gt(scene,0.4)'

Execution model (the TPU-first departure from per-frame AVFilter passes):
consecutive *pure* filters are composed into one function and jitted once,
so a whole chain is a single fused XLA program over the frame batch.
Batch-control filters (select/fps/thumbnail) evaluate keep-masks between
jitted segments; compaction happens on host at the end.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np

from ..core.frame import FrameBatch
from .builtin import FILTERS, FilterError

# positional option names per filter (ffmpeg shorthand order)
POSITIONAL = {
    "crop": ("w", "h", "x", "y"),
    "crop_nvcv": ("w", "h", "x", "y"),
    "scale": ("w", "h", "interp"),
    "scale_cuda": ("w", "h", "interp"),
    "scale_npp": ("w", "h", "interp"),
    "rotate": ("angle", "interp", "shift_x", "shift_y"),
    "rotate_nvcv": ("angle", "interp", "shift_x", "shift_y"),
    "flip": ("code",),
    "flip_nvcv": ("code",),
    "transpose": ("dir",),
    "smooth": ("type", "kw", "kh", "border_type", "sigmaX", "sigmaY"),
    "smooth_nvcv": ("type", "kw", "kh", "border_type", "sigmaX", "sigmaY"),
    "format": ("pix_fmt", "norm", "shift"),
    "format_cuda": ("pix_fmt", "norm", "shift"),
    "select": ("expr",),
    "select_cuda": ("expr",),
    "select_gpu": ("expr",),
    "fps": ("fps",),
    "thumbnail": ("n",),
    "thumbnail_cuda": ("n",),
    "tensorrt": ("model", "weights", "luma_only"),
    "infer": ("model", "weights", "luma_only"),
    "chromakey": ("color", "similarity", "blend"),
    "chromakey_cuda": ("color", "similarity", "blend"),
    "overlay": ("path", "x", "y"),
    "overlay_cuda": ("path", "x", "y"),
    "yadif": (),
    "yadif_cuda": (),
    "null": (),
    "hflip": (),
    "vflip": (),
}


def _split(s: str, sep: str) -> List[str]:
    """Split on sep, honoring backslash escapes and quotes."""
    out, cur, i, q = [], [], 0, None
    while i < len(s):
        ch = s[i]
        if ch == "\\" and i + 1 < len(s):
            cur.append(s[i + 1])
            i += 2
            continue
        if q:
            if ch == q:
                q = None
            else:
                cur.append(ch)
        elif ch in "'\"":
            q = ch
        elif ch == sep:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
        i += 1
    out.append("".join(cur))
    return out


def parse_graph(spec: str) -> List[Tuple[str, Dict[str, str]]]:
    chain = []
    for part in _split(spec.strip(), ","):
        part = part.strip()
        if not part:
            continue
        if "=" in part:
            name, argstr = part.split("=", 1)
        else:
            name, argstr = part, ""
        name = name.strip()
        if name not in FILTERS:
            raise FilterError(f"unknown filter {name!r}; known: "
                              f"{sorted(set(FILTERS))}")
        kwargs: Dict[str, str] = {}
        pos = POSITIONAL.get(name, ())
        if argstr:
            for i, tok in enumerate(_split(argstr, ":")):
                if "=" in tok and not tok.startswith("gt(") and \
                        tok.split("=", 1)[0].replace("_", "").isalnum() and \
                        not tok.split("=", 1)[0][0].isdigit():
                    k, v = tok.split("=", 1)
                    kwargs[k.strip()] = v
                else:
                    if i >= len(pos):
                        raise FilterError(
                            f"too many positional args for {name}: {tok!r}")
                    kwargs[pos[i]] = tok
        chain.append((name, kwargs))
    return chain


class FilterGraph:
    """Compiled filter chain over FrameBatches."""

    def __init__(self, spec: str, src_fps: float = 30.0):
        self.spec = spec
        self.segments: List = []   # alternating: list-of-pure-fns | control
        chain = parse_graph(spec)
        pure: List = []
        for name, kwargs in chain:
            factory = FILTERS[name]
            if name in ("fps",):
                kwargs.setdefault("src_fps", src_fps)
            inst = factory(**kwargs)
            if getattr(inst, "batch_control", False):
                if pure:
                    self.segments.append(("pure", self._compose(pure)))
                    pure = []
                self.segments.append(("control", inst))
            else:
                pure.append(inst)
        if pure:
            self.segments.append(("pure", self._compose(pure)))
        self._jitted = {}

    @staticmethod
    def _compose(fns: Sequence):
        def run(fb: FrameBatch) -> FrameBatch:
            for f in fns:
                fb = f(fb)
            return fb
        return run

    def _jit_pure(self, idx, fn):
        if idx not in self._jitted:
            self._jitted[idx] = jax.jit(fn)
        return self._jitted[idx]

    def process(self, fb: FrameBatch, pts: Optional[np.ndarray] = None,
                times: Optional[np.ndarray] = None,
                keys: Optional[np.ndarray] = None,
                valid: Optional[int] = None):
        """Run the chain on one batch.

        Returns (FrameBatch, keep_mask).  keep_mask already excludes padded
        tail frames when `valid` < batch.
        """
        n = fb.batch
        keep = np.ones(n, bool)
        if valid is not None:
            keep[valid:] = False
        for i, (kind, seg) in enumerate(self.segments):
            if kind == "pure":
                fb = self._jit_pure(i, seg)(fb)
            else:
                mask = seg.keep_mask(fb, pts=pts, times=times, keys=keys)
                keep &= mask
        return fb, keep

    def run_frames(self, batch_iter):
        """Iterate (FrameBatch, pts, valid) batches -> per-frame results.

        Yields (frame_planes_dict, pts) for kept frames (host numpy).
        """
        for fb, pts, valid in batch_iter:
            out, keep = self.process(fb, pts=pts, valid=valid)
            host = {k: np.asarray(v) for k, v in out.planes.items()}
            for i in np.nonzero(keep)[0]:
                yield {k: v[i] for k, v in host.items()}, int(pts[i]), out
