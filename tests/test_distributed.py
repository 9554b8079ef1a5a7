"""Multi-host scale-out tests (SURVEY §2.3 "hosts feeding their local
chips"; reference analog: N processes x -gpu ordinal, AppSelect.cpp:49-56).

The real check spawns 2 coordinated OS processes forming a CPU cluster
(gloo collectives, 4 virtual devices each) and runs one dp x tp train
step with per-host ingest — exactly what a v5e pod slice does with one
process per host.
"""
import importlib.util
import os
import sys

import pytest

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _graft():
    spec = importlib.util.spec_from_file_location(
        "graft_entry", os.path.join(REPO, "__graft_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_multihost_dryrun_2x4():
    # 2 processes x 4 devices: full train step, per-host data feeding,
    # identical loss on both hosts (the SPMD program agrees).
    _graft().dryrun_multihost(2, 4, timeout=240.0)


def test_process_batch_size_divisibility():
    import jax
    from gmat_tpu.parallel import distributed as dist
    from gmat_tpu.parallel import mesh as pmesh
    mesh = pmesh.make_mesh(4, 2, devices=jax.devices()[:8])
    # single-process here: local == global, any batch divides
    assert dist.process_batch_size(mesh, 32) == 32
    assert dist.process_batch_size(mesh, 33) == 33


def test_feed_process_local_single_process_matches_device_put():
    # in a 1-process cluster feed_process_local == sharded device_put;
    # validates the ingest call the multi-host path uses
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from gmat_tpu.parallel import distributed as dist
    from gmat_tpu.parallel import mesh as pmesh
    mesh = pmesh.make_mesh(8, 1, devices=jax.devices()[:8])
    x = np.arange(8 * 4, dtype=np.float32).reshape(8, 4)
    arr = dist.feed_process_local(mesh, x)
    assert arr.shape == (8, 4)
    np.testing.assert_array_equal(np.asarray(arr), x)
    ref = jax.device_put(x, NamedSharding(mesh, P(dist.DATA_AXIS)))
    np.testing.assert_array_equal(np.asarray(arr), np.asarray(ref))


def test_global_mesh_model_axis_host_local():
    from gmat_tpu.parallel import distributed as dist
    mesh = dist.global_mesh(n_model=2)
    assert mesh.shape[dist.MODEL_AXIS] == 2
    # model-axis neighbors must belong to the same process
    devs = mesh.devices
    for row in devs:
        assert len({d.process_index for d in row}) == 1


def test_shard_batch_global_roundtrip():
    from gmat_tpu.core.frame import FrameBatch
    from gmat_tpu.parallel import distributed as dist
    mesh = dist.global_mesh(n_model=1)
    n = mesh.shape[dist.DATA_AXIS]
    rng = np.random.default_rng(0)
    fb = FrameBatch({"y": rng.integers(0, 256, (n, 16, 32)).astype(np.uint8),
                     "u": rng.integers(0, 256, (n, 8, 16)).astype(np.uint8),
                     "v": rng.integers(0, 256, (n, 8, 16)).astype(np.uint8)},
                    "yuv420p", 32, 16, "bt709")
    out = dist.shard_batch_global(fb, mesh)
    for k in ("y", "u", "v"):
        np.testing.assert_array_equal(np.asarray(out.planes[k]),
                                      np.asarray(fb.planes[k]))


def test_multihost_ladder_workload_2x4():
    """Production shape across 2 host processes: per-host frame feeding
    into ONE global ladder; each host verifies its addressable output
    shards against a local single-device recompute."""
    _graft().dryrun_multihost(2, 4, timeout=240.0, workload="ladder")


def test_init_distributed_validates_partial_cluster_args():
    from gmat_tpu.parallel.distributed import init_distributed
    with pytest.raises(ValueError):
        init_distributed(coordinator_address="localhost:9999")


def test_global_mesh_validates_actual_device_list():
    # subset layouts validate against the DEVICES GIVEN, not the global
    # local-device count: 6-of-8 with n_model=3 is host-local and legal
    import jax
    from gmat_tpu.parallel.distributed import global_mesh
    devs = jax.devices()[:6]
    m = global_mesh(n_model=3, devices=devs)
    assert m.devices.shape == (2, 3)
    with pytest.raises(ValueError):
        global_mesh(n_model=3, devices=jax.devices()[:8])
