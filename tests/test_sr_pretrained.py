"""Bundled ESPCN x2 checkpoint: real super-resolution, not noise
(VERDICT r2 #7).  Golden test: on held-out procedural content the model
must beat bicubic upsampling in PSNR."""
import importlib.util
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NPZ = os.path.join(REPO, "gmat_tpu", "models", "weights", "espcn_x2.npz")


def _trainer():
    spec = importlib.util.spec_from_file_location(
        "train_sr", os.path.join(REPO, "tools", "train_sr.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.skipif(not os.path.exists(NPZ), reason="checkpoint not built")
def test_bundled_sr2x_beats_bicubic():
    from gmat_tpu.filters.infer import InferFilter
    from gmat_tpu.models import sr
    from gmat_tpu.ops.resize import resize_plane
    t = _trainer()
    hr = t.make_dataset(8, 96, seed=123456)       # held-out seed
    lr = t.area_down(hr, 2)
    filt = InferFilter(model="sr2x", precision="fp32")
    # auto-loaded bundled weights, not random init
    rnd = sr.init_params(jax.random.PRNGKey(0), scale=2)
    assert not np.allclose(np.asarray(filt.params["w1"]),
                           np.asarray(rnd["w1"]))
    pred = np.asarray(jax.jit(sr.apply)(filt.params, jnp.asarray(lr)))
    flat = lr.reshape(-1, lr.shape[2], lr.shape[3])
    bic = np.asarray(resize_plane(jnp.asarray(flat) * 255.0, 96, 96,
                                  "bicubic")) / 255.0
    bic = np.clip(bic.reshape(hr.shape), 0, 1)

    def psnr(a, b):
        return -10 * np.log10(max(float(np.mean((a - b) ** 2)), 1e-12))

    p_model, p_bic = psnr(pred, hr), psnr(bic, hr)
    assert p_model > p_bic, (p_model, p_bic)


@pytest.mark.skipif(not os.path.exists(NPZ), reason="checkpoint not built")
def test_bundled_weights_opt_out():
    from gmat_tpu.filters.infer import InferFilter
    from gmat_tpu.models import sr
    rnd = sr.init_params(jax.random.PRNGKey(0), scale=2)
    filt = InferFilter(model="sr2x", weights="random")
    np.testing.assert_array_equal(np.asarray(filt.params["w1"]),
                                  np.asarray(rnd["w1"]))


def test_checkpoint_exists_and_small():
    # the checkpoint is part of the repo (batteries included); keep it
    # comfortably under a MB
    assert os.path.exists(NPZ), "espcn_x2.npz must ship with the repo"
    assert os.path.getsize(NPZ) < 1 << 20


DNCNN = os.path.join(REPO, "gmat_tpu", "models", "weights", "dncnn.npz")


@pytest.mark.skipif(not os.path.exists(DNCNN), reason="checkpoint not built")
def test_bundled_denoise_removes_noise():
    from gmat_tpu.filters.infer import InferFilter
    from gmat_tpu.models import denoise
    t = _trainer()
    clean = t.make_dataset(6, 64, seed=987654)    # held-out seed
    rng = np.random.default_rng(11)
    noisy = np.clip(clean + rng.normal(0, 25.0 / 255, clean.shape)
                    .astype(np.float32), 0, 1)
    filt = InferFilter(model="denoise", precision="fp32")
    pred = np.asarray(jax.jit(denoise.apply)(filt.params,
                                             jnp.asarray(noisy)))

    def psnr(a, b):
        return -10 * np.log10(max(float(np.mean((a - b) ** 2)), 1e-12))

    p_noisy, p_model = psnr(noisy, clean), psnr(pred, clean)
    assert p_model > p_noisy + 3.0, (p_noisy, p_model)


def test_denoise_checkpoint_exists_and_small():
    assert os.path.exists(DNCNN), "dncnn.npz must ship with the repo"
    assert os.path.getsize(DNCNN) < 1 << 20


H128 = os.path.join(REPO, "gmat_tpu", "models", "weights",
                    "espcn_x2_h128.npz")


@pytest.mark.skipif(not os.path.exists(H128), reason="checkpoint not built")
def test_bundled_sr2x_h128_beats_h64():
    """hidden=128 runs at the same MXU wall time as 64 (BENCHMARKS) and
    must land strictly better held-out PSNR — quality for free."""
    from gmat_tpu.filters.infer import InferFilter
    from gmat_tpu.models import sr
    t = _trainer()
    hr = t.make_dataset(8, 96, seed=123456)
    lr = t.area_down(hr, 2)

    def psnr_of(hidden):
        filt = InferFilter(model="sr2x", precision="fp32", hidden=hidden)
        pred = np.asarray(jax.jit(sr.apply)(filt.params, jnp.asarray(lr)))
        return -10 * np.log10(max(float(np.mean((pred - hr) ** 2)), 1e-12))

    p64, p128 = psnr_of(0), psnr_of(128)
    assert p128 > p64, (p64, p128)


X3 = os.path.join(REPO, "gmat_tpu", "models", "weights", "espcn_x3.npz")


@pytest.mark.skipif(not os.path.exists(X3), reason="checkpoint not built")
def test_bundled_sr3x_beats_bicubic():
    from gmat_tpu.filters.infer import InferFilter
    from gmat_tpu.models import sr
    from gmat_tpu.ops.resize import resize_plane
    t = _trainer()
    hr = t.make_dataset(8, 96, seed=123456)       # held-out seed
    lr = t.area_down(hr, 3)
    filt = InferFilter(model="sr3x", precision="fp32")
    rnd = sr.init_params(jax.random.PRNGKey(0), scale=3)
    assert not np.allclose(np.asarray(filt.params["w1"]),
                           np.asarray(rnd["w1"]))
    assert filt.scale == 3
    pred = np.asarray(jax.jit(sr.apply)(filt.params, jnp.asarray(lr)))
    assert pred.shape == hr.shape
    flat = lr.reshape(-1, lr.shape[2], lr.shape[3])
    bic = np.asarray(resize_plane(jnp.asarray(flat) * 255.0, 96, 96,
                                  "bicubic")) / 255.0
    bic = np.clip(bic.reshape(hr.shape), 0, 1)

    def psnr(a, b):
        return -10 * np.log10(max(float(np.mean((a - b) ** 2)), 1e-12))

    p_model, p_bic = psnr(pred, hr), psnr(bic, hr)
    assert p_model > p_bic, (p_model, p_bic)


def test_sr3x_checkpoint_exists_and_small():
    assert os.path.exists(X3), "espcn_x3.npz must ship with the repo"
    assert os.path.getsize(X3) < 1 << 20
