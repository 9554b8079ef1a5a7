"""gmat-extract — AppExtract / AppSelect analog.

    python -m gmat_tpu.apps.extract -i in.mp4 -interval 30 -o f_%d.jpg
    python -m gmat_tpu.apps.extract -i in.mp4 -time-interval 2.0 -o f_%d.jpg
    python -m gmat_tpu.apps.extract -i in.mp4 -scene 0.4 -o cut_%d.jpg

Mirrors metrans/app/AppExtract.cpp:26-72 (-i -o -interval flags) and
AppSelect.cpp (scene threshold 0.4); outputs JPEG stills (our TPU codec)
or raw .y4m.
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def main(argv=None):
    from ..utils.compile_cache import enable as _enable_cache
    _enable_cache()
    p = argparse.ArgumentParser(prog="gmat-extract")
    p.add_argument("-i", "--input", required=True)
    p.add_argument("-o", "--output", default="frame_%d.jpg",
                   help="pattern with %%d, or out.y4m")
    p.add_argument("-interval", type=int, default=0,
                   help="extract every Nth frame (smart GOP seek)")
    p.add_argument("-time-interval", type=float, default=0.0)
    p.add_argument("-scene", type=float, default=0.0,
                   help="scene-cut threshold instead of intervals")
    p.add_argument("-frames", type=int, default=0)
    p.add_argument("-quality", type=int, default=92)
    args = p.parse_args(argv)

    from ..av.extractor import FrameExtractor, FrameSelect

    t0 = time.perf_counter()
    if args.scene > 0:
        src = FrameSelect(args.input, threshold=args.scene)
        frames = ((y, u, v, pts) for (y, u, v, pts, score) in src.frames())
    else:
        src = FrameExtractor(args.input, frame_interval=args.interval,
                             time_interval=args.time_interval)
        frames = src.frames()

    n = 0
    y4m = None
    try:
        for (y, u, v, pts) in frames:
            if args.output.endswith(".y4m"):
                if y4m is None:
                    from ..av.rawvideo import Y4MWriter
                    fps = getattr(src.dm, "fps", 0.0) or 30.0
                    y4m = Y4MWriter(args.output, y.shape[1], y.shape[0],
                                    (round(fps * 1000), 1000))
                y4m.write(y, u, v)
            else:
                from ..av import jpeg_tpu
                from ..core.frame import from_numpy_yuv420
                fb = from_numpy_yuv420(y[None], u[None], v[None],
                                       colorspace=src.colorspace)
                data = jpeg_tpu.encode_batch(fb, args.quality)[0]
                if "%" in args.output:
                    pattern = args.output
                elif args.output.lower().endswith((".jpg", ".jpeg")):
                    base, dot, ext = args.output.rpartition(".")
                    pattern = base + "_%d" + dot + ext
                else:
                    raise SystemExit(
                        f"gmat-extract: unsupported output "
                        f"{args.output!r} (use .y4m, .jpg, or a %d "
                        "pattern)")
                with open(pattern % n, "wb") as f:
                    f.write(data)
            n += 1
            if args.frames and n >= args.frames:
                break
    finally:
        if y4m is not None:
            y4m.close()
        src.close()
    dt = time.perf_counter() - t0
    stats = ""
    if hasattr(src, "n_decoded"):
        stats = (f", decoded {src.n_decoded}, skipped "
                 f"{src.n_skipped_seek + src.n_skipped_nonref}")
    print(f"extracted {n} frames in {dt:.2f}s{stats}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
