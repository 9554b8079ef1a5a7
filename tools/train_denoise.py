"""Train the bundled DnCNN denoise checkpoint (models/weights/dncnn.npz).

Blind gaussian denoising: inputs are procedural patches (the same
generator as the SR trainer) corrupted with sigma ~ U[5, 30]/255 noise;
the residual net learns the noise.  Ships ~120 KB of weights so
`infer=denoise` removes real noise out of the box (the reference's
TensorRT demo engines are user-supplied, doc/Tensorrt_Filter.md:26).

    python tools/train_denoise.py [--steps 16000]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from train_sr import make_dataset  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=16000)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--patches", type=int, default=4096)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--platform", default="")
    p.add_argument("--channels", type=int, default=3, choices=(1, 3),
                   help="1 trains the luma-only checkpoint "
                        "(dncnn_l.npz — infer denoise luma_only=1)")
    p.add_argument("--out", default="")
    args = p.parse_args(argv)
    if not args.out:
        name = "dncnn.npz" if args.channels == 3 else "dncnn_l.npz"
        args.out = os.path.join(REPO, "gmat_tpu", "models", "weights",
                                name)

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from gmat_tpu.utils.compile_cache import enable as _enable_cache
    _enable_cache()
    import jax.numpy as jnp
    import optax
    from gmat_tpu.models import denoise

    print(f"generating {args.patches} patches ...", flush=True)
    t0 = time.time()
    clean = make_dataset(args.patches, args.size, args.seed)
    if args.channels == 1:
        # BT.601 luma of the RGB patches: the luma-only training set
        clean = (0.299 * clean[:, :1] + 0.587 * clean[:, 1:2]
                 + 0.114 * clean[:, 2:3]).astype(np.float32)
    print(f"  {time.time() - t0:.1f}s", flush=True)

    params = denoise.init_params(jax.random.PRNGKey(args.seed),
                                 channels=args.channels)
    sched = optax.cosine_decay_schedule(args.lr, args.steps, alpha=0.01)
    opt = optax.adam(sched)
    opt_state = opt.init(params)

    def loss_fn(p, noisy, target):
        pred = denoise.apply(p, noisy)
        return jnp.mean((pred - target) ** 2)

    CHUNK = 100

    # dataset as jit ARGS, never a closure (remote-compile body limit);
    # noise is drawn ON DEVICE from a per-chunk key — shipping f32 noise
    # tensors over the dev tunnel (~30 MB/s) would dominate wall time
    @jax.jit
    def run_chunk(params, opt_state, idxs, key, clean_d):
        def body(carry, inp):
            params, opt_state, key = carry
            idx = inp
            key, kn, ks = jax.random.split(key, 3)
            x = jnp.take(clean_d, idx, axis=0)
            nz = jax.random.normal(kn, x.shape, jnp.float32)
            sg = jax.random.uniform(ks, (x.shape[0],), jnp.float32,
                                    5.0 / 255, 30.0 / 255)
            noisy = jnp.clip(x + nz * sg[:, None, None, None], 0.0, 1.0)
            loss, grads = jax.value_and_grad(loss_fn)(params, noisy, x)
            updates, opt_state = opt.update(grads, opt_state)
            return (optax.apply_updates(params, updates), opt_state,
                    key), loss
        (params, opt_state, _), losses = jax.lax.scan(
            body, (params, opt_state, key), idxs)
        return params, opt_state, losses[-1]

    rng = np.random.default_rng(args.seed + 1)
    dev = jax.devices()[0]
    clean_d = jax.device_put(clean, dev)
    sz = args.size
    t0 = time.time()
    # whole chunks only: a ragged tail is a distinct jitted shape
    total = ((args.steps + CHUNK - 1) // CHUNK) * CHUNK
    for i in range(0, total, CHUNK):
        idxs = jnp.asarray(rng.integers(0, args.patches,
                                        (CHUNK, args.batch)))
        key = jax.random.PRNGKey(args.seed * 100003 + i)
        params, opt_state, loss = run_chunk(params, opt_state, idxs,
                                            key, clean_d)
        if (i // CHUNK) % 20 == 0 or i + CHUNK >= total:
            l = float(np.asarray(loss))
            print(f"step {i + CHUNK:5d}  mse {l:.6f}  psnr "
                  f"{-10 * np.log10(max(l, 1e-12)):.2f} dB  "
                  f"({time.time() - t0:.0f}s)", flush=True)

    # held-out eval at sigma=25
    test = make_dataset(16, sz, args.seed + 777)
    if args.channels == 1:
        test = (0.299 * test[:, :1] + 0.587 * test[:, 1:2]
                + 0.114 * test[:, 2:3]).astype(np.float32)
    trng = np.random.default_rng(42)
    noisy = np.clip(test + trng.normal(0, 25.0 / 255, test.shape)
                    .astype(np.float32), 0, 1)
    pred = np.asarray(jax.jit(denoise.apply)(params, jnp.asarray(noisy)))

    def psnr(a, b):
        return -10 * np.log10(max(float(np.mean((a - b) ** 2)), 1e-12))

    p_noisy, p_model = psnr(noisy, test), psnr(pred, test)
    print(f"held-out sigma=25: noisy {p_noisy:.2f} dB -> model "
          f"{p_model:.2f} dB (gain {p_model - p_noisy:+.2f})")
    if p_model < p_noisy + 3.0:
        raise SystemExit("model gain < 3 dB; not saving")

    flat = {}
    for i, layer in enumerate(params["layers"]):
        flat[f"layers.{i}.w"] = np.asarray(layer["w"])
        flat[f"layers.{i}.b"] = np.asarray(layer["b"])
    np.savez(args.out, **flat)
    print(f"saved {args.out} ({os.path.getsize(args.out) / 1024:.0f} KB)")


if __name__ == "__main__":
    main()
