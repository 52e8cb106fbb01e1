"""Spatial-sharding tests: H-sharded execution matches replicated
execution bit-for-bit (XLA inserts halo exchanges)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from lgteun_tpu.models.classical import sfim_fuse, wavelet_fuse
from lgteun_tpu.parallel.spatial import run_spatially_sharded


@pytest.fixture
def space_mesh():
    devs = np.asarray(jax.devices()[:4])
    return Mesh(devs, ("space",))


def test_classical_spatially_sharded_matches(rng, space_mesh):
    lrms = rng.uniform(0.1, 0.9, (2, 16, 16, 4)).astype(np.float32)
    pan = rng.uniform(0.1, 0.9, (2, 64, 64, 1)).astype(np.float32)
    batch = {"input_lr": lrms, "input_pan": pan}

    def fn(b):
        return sfim_fuse(b["input_lr"], b["input_pan"])

    want = np.asarray(fn(batch))
    got = np.asarray(run_spatially_sharded(fn, batch, space_mesh))
    np.testing.assert_allclose(got, want, atol=1e-5)

    def fn2(b):
        return wavelet_fuse(b["input_lr"], b["input_pan"])

    want = np.asarray(fn2(batch))
    got = np.asarray(run_spatially_sharded(fn2, batch, space_mesh))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_lgteun_spatially_sharded_matches(rng, space_mesh):
    from lgteun_tpu.models.lgteun import LGTEUN

    model = LGTEUN(ms_chans=4, stage=1)
    lrms = jnp.asarray(rng.uniform(0.1, 0.9, (1, 16, 16, 4)), jnp.float32)
    pan = jnp.asarray(rng.uniform(0.1, 0.9, (1, 64, 64, 1)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), lrms, pan)

    def fn(b):
        return model.apply(params, b["input_lr"], b["input_pan"])

    want = np.asarray(fn({"input_lr": lrms, "input_pan": pan}))
    got = np.asarray(run_spatially_sharded(
        fn, {"input_lr": lrms, "input_pan": pan}, space_mesh))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_lgteun_hybrid_data_space_mesh_matches(rng):
    """Hybrid 2x4 mesh: batch over 'data' AND image height over
    'space' simultaneously (the composition spatial.py documents) —
    must match replicated execution."""
    from lgteun_tpu.models.lgteun import LGTEUN

    devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("data", "space"))
    model = LGTEUN(ms_chans=4, stage=1)
    lrms = jnp.asarray(rng.uniform(0.1, 0.9, (2, 16, 16, 4)), jnp.float32)
    pan = jnp.asarray(rng.uniform(0.1, 0.9, (2, 64, 64, 1)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), lrms[:1], pan[:1])

    def fn(b):
        return model.apply(params, b["input_lr"], b["input_pan"])

    want = np.asarray(fn({"input_lr": lrms, "input_pan": pan}))
    got = np.asarray(run_spatially_sharded(
        fn, {"input_lr": lrms, "input_pan": pan}, mesh,
        batch_axis="data"))
    np.testing.assert_allclose(got, want, atol=1e-5)
