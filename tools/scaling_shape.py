"""Multi-chip throughput-scaling SHAPE artifact (VERDICT-r4 item 6).

Runs the fused decode->CSC->scale ladder data-parallel over 1/2/4/8
virtual CPU devices and records the scaling shape.  Reference analog:
N-session decode scaling in metrans/AppNvDecPerf.cpp:155-171 (sessions
x fps table).

On this 1-core host, wall-clock cannot show dp speedup (all virtual
devices share one core and total work is constant), so the primary,
hardware-independent signal is the compiled PER-DEVICE program cost
from XLA's cost_analysis(): healthy dp sharding halves per-device
flops/bytes per doubling of the mesh; an accidentally-serialized
pipeline (e.g. an all-gather pulling the full batch onto one device
before the ladder) keeps per-device flops ~constant.  Wall time per
step is recorded as a secondary column with that caveat.

Writes SCALING.json at the repo root and prints the table.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")   # axon sitecustomize override

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from gmat_tpu.core.frame import FrameBatch  # noqa: E402
from gmat_tpu.ops import fused  # noqa: E402
from gmat_tpu.parallel import mesh as pmesh  # noqa: E402

TOTAL_BATCH = 16
SRC_H, SRC_W = 360, 640
OUT = 224


def _ladder(y, u, v):
    fb = FrameBatch({"y": y, "u": u, "v": v}, "yuv420p",
                    y.shape[2], y.shape[1], "bt709")
    # XLA path ("never"): cost_analysis must see the real conv/matmul
    # ops, not an opaque pallas custom-call
    return fused.preprocess_nchw(fb, OUT, OUT, use_pallas="never")


def measure(n_dev: int, reps: int = 5) -> dict:
    devs = jax.devices("cpu")[:n_dev]
    mesh = pmesh.make_mesh(n_dev, 1, devices=devs)
    sh = NamedSharding(mesh, P(pmesh.DATA_AXIS))
    rng = np.random.default_rng(0)
    y = jax.device_put(rng.integers(0, 256, (TOTAL_BATCH, SRC_H, SRC_W))
                       .astype(np.uint8), sh)
    u = jax.device_put(rng.integers(0, 256, (TOTAL_BATCH, SRC_H // 2,
                                             SRC_W // 2)).astype(np.uint8), sh)
    v = jax.device_put(rng.integers(0, 256, (TOTAL_BATCH, SRC_H // 2,
                                             SRC_W // 2)).astype(np.uint8), sh)
    with mesh:
        compiled = jax.jit(_ladder).lower(y, u, v).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):    # older jax returns [dict]
            cost = cost[0]
        out = compiled(y, u, v)
        jax.block_until_ready(out)
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(compiled(y, u, v))
            times.append(time.perf_counter() - t0)
    return {
        "devices": n_dev,
        "flops_per_device": float(cost.get("flops", float("nan"))),
        "bytes_per_device": float(cost.get("bytes accessed",
                                           float("nan"))),
        "wall_ms_median": round(1e3 * sorted(times)[len(times) // 2], 2),
    }


def main():
    rows = [measure(n) for n in (1, 2, 4, 8)]
    base = rows[0]["flops_per_device"]
    for r in rows:
        r["flops_ratio_vs_1dev"] = round(r["flops_per_device"] / base, 4)
    artifact = {
        "case": "scaling_shape",
        "total_batch": TOTAL_BATCH,
        "src": f"{SRC_W}x{SRC_H}",
        "out": f"{OUT}x{OUT}",
        "note": ("per-device compiled flops is the scaling signal; wall "
                 "time is 1-core-host bound (virtual devices share a "
                 "core) and only sanity-checks that total work is flat"),
        "rows": rows,
    }
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "SCALING.json"), "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps(artifact, indent=1))
    # near-linear check: 8-dev per-device flops within 1.35x of ideal 1/8
    r8 = rows[-1]["flops_ratio_vs_1dev"]
    assert r8 <= 1.35 / 8, f"dp sharding not near-linear: 8-dev ratio {r8}"
    print("OK: 8-device per-device flops ratio", r8, "(ideal 0.125)")


if __name__ == "__main__":
    main()
