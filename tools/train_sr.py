"""Train the bundled ESPCN checkpoints (models/weights/espcn_x{2,3}.npz).

The reference ships its SR demo as a TensorRT engine the user brings
(doc/Tensorrt_Filter.md:26); our `infer=sr2x` filter previously ran
random weights, i.e. computed noise.  This script trains a real x2
model on a procedural dataset (smooth gradients + anti-aliased shapes +
sinusoid textures — exactly the content classes the PSNR golden test
holds out) and writes the ~110 KB .npz the InferFilter auto-loads.

    python tools/train_sr.py [--steps 3000] [--out models/weights/...]

Degradation model: HR -> kxk box average (area downsample, k=--scale),
the same `area` kernel ops/resize implements, so the filter chain
`scale=area,infer=sr2x` (or sr3x) is self-consistent.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# ------------------------------------------------------------ dataset

def _upsample_smooth(rng, n, size, lo_min=6, lo_max=24):
    """Low-res noise linearly upsampled -> smooth natural-ish gradients."""
    out = np.empty((n, size, size, 3), np.float32)
    for i in range(n):
        lo = rng.integers(lo_min, lo_max)
        small = rng.uniform(0, 1, (lo, lo, 3)).astype(np.float32)
        # separable linear upsample (np only)
        xi = np.linspace(0, lo - 1, size)
        x0 = np.floor(xi).astype(int)
        x1 = np.minimum(x0 + 1, lo - 1)
        fx = (xi - x0).astype(np.float32)
        t = small[x0] * (1 - fx)[:, None, None] + small[x1] * fx[:, None, None]
        t = (t[:, x0] * (1 - fx)[None, :, None]
             + t[:, x1] * fx[None, :, None])
        out[i] = t
    return out


def _draw_shapes(rng, img):
    """Anti-aliased ellipses/rectangles/lines drawn at 4x then box-averaged
    (sub-pixel edges are what SR must learn to reconstruct)."""
    size = img.shape[0]
    s4 = size * 4
    canvas = np.repeat(np.repeat(img, 4, 0), 4, 1).astype(np.float32)
    yy, xx = np.mgrid[0:s4, 0:s4].astype(np.float32)
    for _ in range(rng.integers(2, 7)):
        color = rng.uniform(0, 1, 3).astype(np.float32)
        kind = rng.integers(0, 3)
        if kind == 0:      # ellipse
            cy, cx = rng.uniform(0, s4, 2)
            ry, rx = rng.uniform(s4 * 0.03, s4 * 0.35, 2)
            m = (((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2) <= 1.0
        elif kind == 1:    # rectangle (maybe rotated by shear-ish bounds)
            y0, x0 = rng.uniform(0, s4 * 0.8, 2)
            hgt, wid = rng.uniform(s4 * 0.05, s4 * 0.5, 2)
            m = (yy >= y0) & (yy < y0 + hgt) & (xx >= x0) & (xx < x0 + wid)
        else:              # thick line
            a = rng.uniform(0, np.pi)
            c, s = np.cos(a), np.sin(a)
            d = rng.uniform(-s4 / 2, s4 / 2)
            t = rng.uniform(2.0, 14.0)
            m = np.abs((xx - s4 / 2) * c + (yy - s4 / 2) * s - d) < t
        alpha = rng.uniform(0.5, 1.0)
        canvas[m] = canvas[m] * (1 - alpha) + color * alpha
    # 4x4 box average back to size (anti-aliased edges)
    return canvas.reshape(size, 4, size, 4, 3).mean((1, 3))


def _add_texture(rng, img):
    size = img.shape[0]
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    for _ in range(rng.integers(0, 3)):
        fy, fx = rng.uniform(0.05, 0.8, 2)
        ph = rng.uniform(0, 2 * np.pi)
        amp = rng.uniform(0.02, 0.12)
        wave = amp * np.sin(fy * yy + fx * xx + ph)
        ch = rng.integers(0, 3)
        img[..., ch] = np.clip(img[..., ch] + wave, 0, 1)
    return img


def make_dataset(n_patches: int, hr: int, seed: int):
    """(N, 3, hr, hr) HR patches in [0,1], NCHW."""
    rng = np.random.default_rng(seed)
    out = _upsample_smooth(rng, n_patches, hr)
    for i in range(n_patches):
        out[i] = _draw_shapes(rng, out[i])
        out[i] = _add_texture(rng, out[i])
    return np.clip(out, 0, 1).transpose(0, 3, 1, 2).astype(np.float32)


def area_down(x, k=2):
    """(N, C, H, W) -> (N, C, H/k, W/k) kxk box average."""
    n, c, h, w = x.shape
    return x.reshape(n, c, h // k, k, w // k, k).mean((3, 5))


# ------------------------------------------------------------ training

def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=24000)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--hr", type=int, default=96)
    p.add_argument("--patches", type=int, default=4096)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--hidden", type=int, default=64)
    p.add_argument("--scale", type=int, default=2, choices=(2, 3))
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--platform", default="")
    p.add_argument("--out", default="")
    args = p.parse_args(argv)
    if not args.out:
        # non-default widths land in their own file (the _bundled_weights
        # naming): --hidden 128 must not overwrite the shipped h64 npz
        # with shape-incompatible weights
        suffix = f"_h{args.hidden}" if args.hidden != 64 else ""
        args.out = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "gmat_tpu", "models", "weights",
            f"espcn_x{args.scale}{suffix}.npz")
    if args.hr % args.scale:
        raise SystemExit(f"--hr must be divisible by --scale")

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from gmat_tpu.utils.compile_cache import enable as _enable_cache
    _enable_cache()     # tunnel remote compiles take minutes contended
    import jax.numpy as jnp
    import optax
    from gmat_tpu.models import sr

    print(f"generating {args.patches} HR patches ...", flush=True)
    t0 = time.time()
    hrs = make_dataset(args.patches, args.hr, args.seed)
    lrs = area_down(hrs, args.scale)
    print(f"  {time.time() - t0:.1f}s", flush=True)

    params = sr.init_params(jax.random.PRNGKey(args.seed),
                            scale=args.scale, hidden=args.hidden)
    # cosine decay to ~0: the last-mile mse on smooth regions is what
    # decides PSNR vs bicubic on this dataset
    sched = optax.cosine_decay_schedule(args.lr, args.steps, alpha=0.01)
    opt = optax.adam(sched)
    opt_state = opt.init(params)

    # K steps per device call (lax.scan): the dev TPU tunnel costs
    # 10-20 ms per call, so per-step dispatch would dominate wall time
    CHUNK = 100

    # the dataset MUST be a jit argument, not a closure: closed-over
    # arrays embed as program constants and blow the remote-compile
    # request past its size limit (HTTP 413 on the dev tunnel)
    @jax.jit
    def run_chunk(params, opt_state, idxs, lrs_d, hrs_d):
        def body(carry, idx):
            params, opt_state = carry
            x = jnp.take(lrs_d, idx, axis=0)
            y = jnp.take(hrs_d, idx, axis=0)
            loss, grads = jax.value_and_grad(sr.loss_fn)(params, x, y)
            updates, opt_state = opt.update(grads, opt_state)
            return (optax.apply_updates(params, updates), opt_state), loss
        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), idxs)
        return params, opt_state, losses[-1]

    rng = np.random.default_rng(args.seed + 1)
    dev = jax.devices()[0]
    lrs_d = jax.device_put(lrs, dev)
    hrs_d = jax.device_put(hrs, dev)
    t0 = time.time()
    # round the step count UP to whole chunks: a ragged tail chunk is a
    # distinct jitted shape (= one extra full remote compile)
    total = ((args.steps + CHUNK - 1) // CHUNK) * CHUNK
    for i in range(0, total, CHUNK):
        idxs = jnp.asarray(rng.integers(0, args.patches,
                                        (CHUNK, args.batch)))
        params, opt_state, loss = run_chunk(params, opt_state, idxs,
                                            lrs_d, hrs_d)
        if (i // CHUNK) % 20 == 0 or i + CHUNK >= args.steps:
            l = float(np.asarray(loss))
            print(f"step {i + CHUNK:5d}  mse {l:.6f}  psnr "
                  f"{-10 * np.log10(max(l, 1e-12)):.2f} dB  "
                  f"({time.time() - t0:.0f}s)", flush=True)

    # held-out eval: model vs bicubic upsample
    from gmat_tpu.ops.resize import resize_plane
    test = make_dataset(16, args.hr, args.seed + 999)
    test_lr = area_down(test, args.scale)
    pred = np.asarray(jax.jit(sr.apply)(params, jnp.asarray(test_lr)))
    flat = test_lr.reshape(-1, test_lr.shape[2], test_lr.shape[3])
    bic = np.asarray(resize_plane(jnp.asarray(flat) * 255.0, args.hr,
                                  args.hr, "bicubic")) / 255.0
    bic = np.clip(bic.reshape(test.shape), 0, 1)

    def psnr(a, b):
        return -10 * np.log10(max(np.mean((a - b) ** 2), 1e-12))

    p_model, p_bic = psnr(pred, test), psnr(bic, test)
    print(f"held-out PSNR: model {p_model:.2f} dB vs bicubic "
          f"{p_bic:.2f} dB (gain {p_model - p_bic:+.2f})")
    if p_model <= p_bic:
        raise SystemExit("model does not beat bicubic; not saving")

    np.savez(args.out, **{k: np.asarray(v) for k, v in params.items()})
    print(f"saved {args.out} ({os.path.getsize(args.out) / 1024:.0f} KB)")


if __name__ == "__main__":
    main()
