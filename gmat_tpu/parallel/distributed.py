"""Multi-host scale-out: jax.distributed init + global mesh + per-host feed.

The reference scales past one GPU by launching N independent processes with
a `-gpu` ordinal (AppSelect.cpp:49-56) — no cross-process coordination at
all.  A TPU v5e pod slice beyond 8 chips is inherently multi-HOST: one
Python process per host, each seeing only its local chips, cooperating in
one SPMD program over the global mesh (SURVEY §2.3: "hosts feeding their
local chips").  This module is that runtime:

  * init_distributed()       — one call per process; wraps
                               jax.distributed.initialize.  On a real TPU
                               pod slice the no-arg form autodetects the
                               coordinator from the TPU metadata; on
                               CPU test clusters pass coordinator/rank
                               explicitly (gloo collectives).
  * global_mesh()            — data x model mesh over ALL processes'
                               devices, model axis kept process-local so
                               tensor-parallel collectives ride ICI, never
                               DCN.
  * feed_process_local()     — each host turns the frames IT decoded into
                               its shard of one global array
                               (jax.make_array_from_process_local_data);
                               steady-state ingest does no cross-host
                               traffic, exactly like the reference's
                               independent `-gpu` processes, but the
                               result is a single jittable global batch.
  * shard_batch_global()     — FrameBatch version of the above.

Run `python -m gmat_tpu.parallel.distributed --selftest-worker ...` as N
coordinated processes to execute one full dp x tp train step on a CPU
cluster — __graft_entry__.dryrun_multihost and tests/test_distributed.py
drive exactly that (2 processes x 4 devices).  docs/DISTRIBUTED.md is the
pod-slice runbook.
"""
from __future__ import annotations

import argparse
import json
import sys
from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from . import mesh as pmesh

DATA_AXIS = pmesh.DATA_AXIS
MODEL_AXIS = pmesh.MODEL_AXIS


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None,
                     local_device_count: Optional[int] = None,
                     platform: Optional[str] = None) -> None:
    """Initialize this process's membership in the multi-host cluster.

    On a real TPU pod slice call with no arguments — JAX autodetects the
    coordinator and process topology from the TPU environment.  For CPU
    test clusters (and CI), pass everything explicitly; gloo CPU
    collectives are enabled and `local_device_count` virtual CPU devices
    are created per process.

    Must run before any other JAX API touches a backend (the axon
    sitecustomize pins jax_platforms early, so `platform="cpu"` is applied
    via jax.config here, not the env var — CLAUDE.md quirk).
    """
    if platform is not None:
        jax.config.update("jax_platforms", platform)
    if platform == "cpu":
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    if local_device_count is not None:
        jax.config.update("jax_num_cpu_devices", local_device_count)
    kwargs = {}
    if coordinator_address is not None:
        # explicit clusters need the full triple — forwarding Nones into
        # jax.distributed.initialize fails deep inside JAX (or hangs on
        # a bogus topology) instead of at this boundary
        if num_processes is None or process_id is None:
            raise ValueError(
                "coordinator_address given without num_processes/"
                "process_id — explicit (non-TPU-pod) clusters must pass "
                "all three")
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def global_mesh(n_model: int = 1,
                devices: Optional[Sequence] = None) -> Mesh:
    """Mesh over every device of every process: (data, model).

    Devices are laid out so each model-axis group lives inside ONE
    process (jax.devices() orders by process id) — tensor-parallel
    all-reduces stay on intra-host ICI, the data axis spans hosts but
    carries no steady-state traffic (frames are embarrassingly parallel).
    """
    devices = list(devices if devices is not None else jax.devices())
    if len(devices) % n_model:
        raise ValueError(f"{len(devices)} devices not divisible by "
                         f"n_model={n_model}")
    devs = np.asarray(devices).reshape(len(devices) // n_model, n_model)
    if n_model > 1:
        # validate the ACTUAL layout, not jax.local_devices() globally:
        # an explicit subset/reorder must still keep every model-axis
        # row inside one process or TP collectives ride DCN
        for row in devs:
            pids = {getattr(d, "process_index", 0) for d in row}
            if len(pids) > 1:
                raise ValueError(
                    "model-axis group spans processes "
                    f"{sorted(pids)} — reorder `devices` so each "
                    f"consecutive group of {n_model} is host-local "
                    "(TP collectives must ride ICI, not DCN)")
    return Mesh(devs, (DATA_AXIS, MODEL_AXIS))


def process_batch_size(mesh: Mesh, global_batch: int) -> int:
    """Frames THIS process must decode for a `global_batch`-frame step."""
    if global_batch % jax.process_count():
        raise ValueError(f"global batch {global_batch} not divisible by "
                         f"{jax.process_count()} processes")
    return global_batch // jax.process_count()


def feed_process_local(mesh: Mesh, local: np.ndarray,
                       spec: P = P(DATA_AXIS)) -> jax.Array:
    """This host's locally-decoded frames -> its shard of a global array.

    Every process calls this with its OWN `local` block (equal shapes);
    the returned jax.Array is globally (N_total, ...) sharded over the
    data axis with zero cross-host transfer — the multi-host RoundQueue:
    each host's ingest feeds only its local chips.
    """
    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, spec), np.asarray(local))


def replicate_global(tree, mesh: Mesh):
    """Replicate a host-identical pytree onto every device of the global
    mesh (all processes must pass bitwise-identical values)."""
    sh = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def shard_batch_global(fb, mesh: Mesh):
    """FrameBatch whose planes are this process's local decode output ->
    one global FrameBatch sharded over the data axis."""
    planes = {k: feed_process_local(mesh, np.asarray(v))
              for k, v in fb.planes.items()}
    return fb.with_planes(planes)


# ---------------------------------------------------------------------------
# Self-test worker: one process of an N-process CPU cluster running the
# full dp x tp train step (the multi-host variant of
# __graft_entry__._dryrun_body).  Driven by dryrun_multihost / tests.
# ---------------------------------------------------------------------------

def _ladder_workload(args) -> dict:
    """The PRODUCTION shape, multi-host: each host 'decodes' its own
    frames, feeds them to its local chips, one SPMD ladder runs over the
    global batch — then every host verifies its addressable output
    shards bitwise against a locally-recomputed reference (proof that
    per-host ingest + global jit == per-host local compute for the
    embarrassingly-parallel frame axis)."""
    import jax.numpy as jnp

    from ..core.frame import FrameBatch
    from ..ops import fused

    mesh = global_mesh(n_model=1)
    n_total = mesh.shape[DATA_AXIS] * 2
    n_local = process_batch_size(mesh, n_total)
    h, w = 64, 96
    rng = np.random.default_rng(1000 + args.process_id)
    ly = rng.integers(0, 256, (n_local, h, w)).astype(np.uint8)
    lu = rng.integers(0, 256, (n_local, h // 2, w // 2)).astype(np.uint8)
    lv = rng.integers(0, 256, (n_local, h // 2, w // 2)).astype(np.uint8)
    y = feed_process_local(mesh, ly)
    u = feed_process_local(mesh, lu)
    v = feed_process_local(mesh, lv)

    def ladder(y, u, v):
        fb = FrameBatch({"y": y, "u": u, "v": v}, "yuv420p", w, h, "bt709")
        return fused.preprocess_nchw(fb, 32, 32, use_pallas="never")

    with mesh:
        out = jax.jit(ladder)(y, u, v)
        out.block_until_ready()
    # local single-device reference for THIS host's frames
    ref = np.asarray(jax.jit(ladder, backend="cpu")(
        jnp.asarray(ly), jnp.asarray(lu), jnp.asarray(lv)))
    start = args.process_id * n_local
    checked = 0
    for shard in out.addressable_shards:
        lo = shard.index[0].start or 0
        block = np.asarray(shard.data)
        np.testing.assert_allclose(
            block, ref[lo - start:lo - start + block.shape[0]],
            atol=1e-5)
        checked += block.shape[0]
    assert checked == n_local, (checked, n_local)
    return {"workload": "ladder", "frames_checked": checked,
            "global_batch": n_total}


def _selftest_worker(args) -> int:
    from ..utils.compile_cache import enable as _enable_cache
    _enable_cache()
    init_distributed(coordinator_address=args.coordinator,
                     num_processes=args.num_processes,
                     process_id=args.process_id,
                     local_device_count=args.devices_per_host,
                     platform="cpu")
    if args.workload == "ladder":
        rec = _ladder_workload(args)
        rec.update(process=args.process_id,
                   processes=jax.process_count(),
                   global_devices=len(jax.devices()),
                   local_devices=len(jax.local_devices()),
                   loss=0.0)
        print(json.dumps(rec), flush=True)
        jax.distributed.shutdown()
        return 0
    import jax.numpy as jnp
    import optax

    from ..core.frame import FrameBatch
    from ..models import sr
    from ..ops import fused

    n_global = args.num_processes * args.devices_per_host
    n_model = 2 if args.devices_per_host % 2 == 0 else 1
    mesh = global_mesh(n_model=n_model)
    assert int(np.prod(list(mesh.shape.values()))) == n_global

    params = sr.init_params(jax.random.PRNGKey(0), scale=2, hidden=16)
    # tensor-parallel param placement on the global mesh (same layout as
    # the single-host dryrun; device_put moves only local shards)
    def ns(*spec):
        return NamedSharding(mesh, P(*spec))
    params = dict(params,
                  w1=jax.device_put(params["w1"], ns(MODEL_AXIS)),
                  b1=jax.device_put(params["b1"], ns(MODEL_AXIS)),
                  w2=jax.device_put(params["w2"], ns(None, MODEL_AXIS)))
    params = {k: (v if isinstance(v, jax.Array) and len(v.sharding.device_set) > 1
                  else jax.device_put(v, ns())) for k, v in params.items()}
    opt = optax.sgd(1e-3)
    opt_state = opt.init(params)

    def train_step(params, opt_state, y, u, v, target):
        fb = FrameBatch({"y": y, "u": u, "v": v}, "yuv420p",
                        y.shape[2], y.shape[1], "bt709")
        x = fused.preprocess_nchw(fb, 32, 32, use_pallas="never")

        def loss(p):
            pred = sr.apply(p, x)
            return jnp.mean((pred - target) ** 2)

        l, grads = jax.value_and_grad(loss)(params)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, l

    # per-host ingest: every process synthesizes only ITS frames — the
    # global batch never exists on any single host
    g_batch = n_global * 2 // n_model * n_model
    n_local = process_batch_size(mesh, g_batch)
    h = w = 64
    rng = np.random.default_rng(args.process_id)
    y = feed_process_local(mesh, rng.integers(
        0, 256, (n_local, h, w)).astype(np.uint8))
    u = feed_process_local(mesh, rng.integers(
        0, 256, (n_local, h // 2, w // 2)).astype(np.uint8))
    v = feed_process_local(mesh, rng.integers(
        0, 256, (n_local, h // 2, w // 2)).astype(np.uint8))
    target = feed_process_local(mesh, rng.uniform(
        0, 1, (n_local, 3, 64, 64)).astype(np.float32))

    with mesh:
        step = jax.jit(train_step)
        params, opt_state, loss = step(params, opt_state, y, u, v, target)
        loss_f = float(jax.device_get(
            jax.jit(lambda x: x, out_shardings=ns())(loss)))
    assert np.isfinite(loss_f), "non-finite loss in multi-host dryrun"
    print(json.dumps({"process": args.process_id,
                      "processes": jax.process_count(),
                      "global_devices": len(jax.devices()),
                      "local_devices": len(jax.local_devices()),
                      "mesh": dict(mesh.shape),
                      "loss": loss_f}), flush=True)
    jax.distributed.shutdown()
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="gmat-distributed")
    p.add_argument("--selftest-worker", action="store_true", required=True)
    p.add_argument("--coordinator", required=True)
    p.add_argument("--num-processes", type=int, required=True)
    p.add_argument("--process-id", type=int, required=True)
    p.add_argument("--devices-per-host", type=int, default=4)
    p.add_argument("--workload", choices=("train", "ladder"),
                   default="train")
    return _selftest_worker(p.parse_args(argv))


if __name__ == "__main__":
    sys.exit(main())
