"""Multi-chip sharding tests on the forced 8-device CPU mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from gmat_tpu.core.frame import FrameBatch, from_numpy_yuv420
from gmat_tpu.ops import fused
from gmat_tpu.parallel import mesh as pm
from gmat_tpu.parallel.pipeline import ShardedPipeline


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
    return pm.make_mesh(4, 2)


def yuv(rng, n=8, h=64, w=96):
    y = rng.integers(0, 256, (n, h, w)).astype(np.uint8)
    u = rng.integers(0, 256, (n, h // 2, w // 2)).astype(np.uint8)
    v = rng.integers(0, 256, (n, h // 2, w // 2)).astype(np.uint8)
    return from_numpy_yuv420(y, u, v)


def test_mesh_shapes(mesh8):
    assert mesh8.shape == {"data": 4, "model": 2}


def test_sharded_preprocess_matches_single(rng, mesh8):
    fb = yuv(rng)
    pipe = ShardedPipeline(lambda fb: fused.preprocess_nchw(fb, 32, 32),
                           mesh=mesh8)
    out = np.asarray(pipe(fb))
    want = np.asarray(fused.preprocess_nchw(fb, 32, 32))
    np.testing.assert_allclose(out, want, atol=1e-5)


def test_sharded_pads_ragged_batch(rng, mesh8):
    fb = yuv(rng, n=6)   # not divisible by 4
    pipe = ShardedPipeline(lambda fb: fused.preprocess_nchw(fb, 16, 16),
                           mesh=mesh8)
    out = np.asarray(pipe(fb))
    assert out.shape[0] == 8   # padded
    want = np.asarray(fused.preprocess_nchw(fb, 16, 16))
    np.testing.assert_allclose(out[:6], want, atol=1e-5)


def test_tensor_parallel_sr(rng, mesh8):
    from gmat_tpu.models import sr
    params = sr.init_params(jax.random.PRNGKey(0), scale=2, hidden=16)
    sharded = pm.shard_sr_params(params, mesh8)
    x = jnp.asarray(rng.uniform(0, 1, (4, 3, 16, 16)), jnp.float32)
    xs = jax.device_put(x, NamedSharding(mesh8, P(pm.DATA_AXIS)))
    with mesh8:
        got = np.asarray(jax.jit(sr.apply)(sharded, xs))
    want = np.asarray(sr.apply(params, x))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_scene_scores_sharded(rng, mesh8):
    from gmat_tpu.ops.scene import scene_scores
    fb = yuv(rng, n=8)
    sh = NamedSharding(mesh8, P(pm.DATA_AXIS))
    fb2 = fb.with_planes({k: jax.device_put(v, sh)
                          for k, v in fb.planes.items()})
    with mesh8:
        s2, m2 = jax.jit(lambda fb: scene_scores(fb))(fb2)
    s1, m1 = scene_scores(fb)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s1), atol=1e-5)


def test_dp_scaling_shape_flops(rng):
    """Serialization canary (VERDICT-r4 item 6): the compiled PER-DEVICE
    ladder program must shrink ~linearly with the dp mesh size.  An
    accidentally-serialized sharded pipeline (e.g. an all-gather pulling
    the whole batch onto one device before the ladder) keeps per-device
    flops ~constant — wall-clock can't catch that on a 1-core host, the
    partitioned program cost can.  tools/scaling_shape.py records the
    full 1/2/4/8 table into SCALING.json."""
    fb = yuv(rng, n=8, h=32, w=48)

    def ladder(y, u, v):
        b = FrameBatch({"y": y, "u": u, "v": v}, "yuv420p",
                       y.shape[2], y.shape[1], "bt709")
        return fused.preprocess_nchw(b, 16, 16, use_pallas="never")

    flops = {}
    for n in (1, 8):
        mesh = pm.make_mesh(n, 1, devices=jax.devices()[:n])
        sh = NamedSharding(mesh, P(pm.DATA_AXIS))
        args = [jax.device_put(fb.planes[k], sh) for k in ("y", "u", "v")]
        with mesh:
            cost = jax.jit(ladder).lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops[n] = float(cost["flops"])
    assert flops[8] <= 1.35 * flops[1] / 8, flops
