"""Headline benchmark: 1080p frames/sec/chip through the fused
decode->CSC->scale->crop ladder (BASELINE.json north star).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
vs_baseline is measured fps / 10,000 (the >=10k fps/chip v5e target set in
BASELINE.md; the reference publishes no numbers of its own).

The measured op is the TPU analog of the reference CLI ladder
(doc/FFMPEG-GPU_User_Guide.md:16-26): batched NV12/I420 1080p in HBM ->
fused crop+CSC+bilinear 224x224 -> RGB fp32 NCHW, jitted as one XLA
program.  A quality gate compares the fast (single-pass bf16 matmul)
resize against the f32-exact path before timing; if it drifts >1.5 LSB the
bench falls back to the exact path.
"""
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from gmat_tpu.core.frame import FrameBatch
    from gmat_tpu.ops import fused, resize

    dev = jax.devices()[0]
    platform = dev.platform

    n, h, w = 64, 1080, 1920
    out_h = out_w = 224
    rng = np.random.default_rng(0)
    y = rng.integers(0, 256, (n, h, w)).astype(np.uint8)
    u = rng.integers(0, 256, (n, h // 2, w // 2)).astype(np.uint8)
    v = rng.integers(0, 256, (n, h // 2, w // 2)).astype(np.uint8)

    def make_fn():
        def fn(y, u, v):
            fb = FrameBatch({"y": y, "u": u, "v": v}, "yuv420p", w, h, "bt709")
            return fused.preprocess_nchw(fb, out_w, out_h)
        return jax.jit(fn)

    yd = jax.device_put(y, dev)
    ud = jax.device_put(u, dev)
    vd = jax.device_put(v, dev)

    # --- quality gate: pick the fastest matmul precision within 1.5 LSB --
    resize.PRECISION = "highest"
    fn_exact = make_fn()
    ref = np.asarray(fn_exact(yd[:4], ud[:4], vd[:4]))
    mode, max_lsb = "exact-f32", 0.0
    for prec, name in (("default", "fast-bf16"), ("high", "bf16x3")):
        resize.PRECISION = prec
        got = np.asarray(make_fn()(yd[:4], ud[:4], vd[:4]))
        lsb = float(np.abs(got - ref).max() * 255.0)
        if lsb <= 1.5:
            mode, max_lsb = name, lsb
            break
    else:
        resize.PRECISION = "highest"
    fn = make_fn()

    # --- time it ----------------------------------------------------------
    out = fn(yd, ud, vd)
    jax.block_until_ready(out)          # compile + warm
    iters = 10 if platform != "cpu" else 2
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(yd, ud, vd)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    fps = n * iters / dt

    print(json.dumps({
        "metric": "1080p frames/sec/chip fused decode->CSC->scale->crop",
        "value": round(fps, 1),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / 10000.0, 3),
        "platform": platform,
        "batch": n,
        "mode": mode,
        "quality_max_lsb_vs_f32": round(max_lsb, 3),
    }))


if __name__ == "__main__":
    main()
