"""Tiled whole-scene fusion engine (`parallel/scene.py`).

Correctness model: with halo=0 and an exactly-tiling scene the engine
must equal per-tile batched inference stitched by reshape; with a halo,
every output sample in a tile's non-overlapped core must equal the
single-tile forward bit-for-bit (only seam bands are blends); the blend
weights must sum to exactly 1 everywhere; and a mesh-sharded tile batch
must match the unsharded result.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

import lgteun_tpu.models  # noqa: F401
from lgteun_tpu.config import Config, LossCfg
from lgteun_tpu.parallel.scene import (
    _overlap_add_x,
    _overlap_add_y,
    cosine_ramp_weights,
    fuse_scene,
)
from lgteun_tpu.registry import build_model


@pytest.fixture(scope="module")
def method_and_params():
    cfg = Config(model_type="UnlgFormer", ms_chans=4,
                 loss_cfg={"rec_loss": LossCfg()},
                 model_cfg={"core_module": {"stage": 1}})
    method = build_model("UnlgFormer", cfg)
    params = method.init_params(jax.random.PRNGKey(0), (8, 32))
    return method, params


def _scene(rng, h, w, c=4):
    ms = rng.uniform(0.1, 0.9, (h // 4, w // 4, c)).astype(np.float32)
    pan = rng.uniform(0.1, 0.9, (h, w, 1)).astype(np.float32)
    return ms, pan


def test_weights_partition_of_unity():
    for n, t, s in [(1, 32, 16), (2, 32, 16), (5, 32, 24), (3, 128, 96),
                    (4, 16, 16)]:
        ws = cosine_ramp_weights(n, t, s)
        acc = np.zeros((n - 1) * s + t, np.float64)
        for i in range(n):
            acc[i * s:i * s + t] += ws[i]
        np.testing.assert_allclose(acc, 1.0, atol=1e-6)


def test_overlap_add_reshape_matches_loop(rng):
    ny, nx, t, s, c = 3, 5, 8, 6, 2
    tiles = jnp.asarray(rng.normal(size=(ny, nx, t, t, c)).astype(np.float32))
    wp, hp = (nx - 1) * s + t, (ny - 1) * s + t
    got = np.asarray(_overlap_add_y(_overlap_add_x(tiles, s, wp), s, hp))
    want = np.zeros((hp, wp, c), np.float32)
    for i in range(ny):
        for j in range(nx):
            want[i * s:i * s + t, j * s:j * s + t] += np.asarray(
                tiles[i, j])
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_halo0_exact_tiling_matches_batched(rng, method_and_params):
    method, params = method_and_params
    ms, pan = _scene(rng, 96, 64)
    got = np.asarray(fuse_scene(method, params, ms, pan, tile=32, halo=0,
                                batch=4))
    # direct: every 32px tile through one batched apply
    mst = ms.reshape(3, 8, 2, 8, 4).transpose(0, 2, 1, 3, 4).reshape(
        6, 8, 8, 4)
    pant = pan.reshape(3, 32, 2, 32, 1).transpose(0, 2, 1, 3, 4).reshape(
        6, 32, 32, 1)
    out = np.asarray(method.apply(params, {"input_lr": jnp.asarray(mst),
                                           "input_pan": jnp.asarray(pant)}))
    want = out.reshape(3, 2, 32, 32, 4).transpose(0, 2, 1, 3, 4).reshape(
        96, 64, 4)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_halo_core_matches_single_tile(rng, method_and_params):
    method, params = method_and_params
    t, halo = 32, 8
    s = t - 2 * halo  # 16
    ms, pan = _scene(rng, 80, 80)
    got = np.asarray(fuse_scene(method, params, ms, pan, tile=t, halo=halo,
                                batch=4))
    assert got.shape == (80, 80, 4)
    # interior tile (1, 2): PAN offset (16, 32); its non-overlapped core
    # [o, t-o) (o = t - s = 2*halo) is written by this tile alone
    y, x = 1 * s, 2 * s
    tile_out = np.asarray(method.apply(params, {
        "input_lr": jnp.asarray(ms[y // 4:(y + t) // 4,
                                   x // 4:(x + t) // 4][None]),
        "input_pan": jnp.asarray(pan[y:y + t, x:x + t][None]),
    }))[0]
    o = t - s
    np.testing.assert_allclose(got[y + o:y + t - o, x + o:x + t - o],
                               tile_out[o:t - o, o:t - o],
                               rtol=1e-5, atol=1e-6)


def test_non_divisible_scene_pads_and_crops(rng, method_and_params):
    method, params = method_and_params
    ms, pan = _scene(rng, 84, 68)  # not a multiple of the 16px stride
    got = np.asarray(fuse_scene(method, params, ms, pan, tile=32, halo=8,
                                batch=4))
    assert got.shape == (84, 68, 4)
    assert np.isfinite(got).all()


def test_mesh_sharded_tiles_match(rng, method_and_params):
    method, params = method_and_params
    ms, pan = _scene(rng, 96, 96)
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("data",))
    want = np.asarray(fuse_scene(method, params, ms, pan, tile=32, halo=8,
                                 batch=8))
    got = np.asarray(fuse_scene(method, params, ms, pan, tile=32, halo=8,
                                batch=8, mesh=mesh))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_validation_errors(rng, method_and_params):
    method, params = method_and_params
    ms, pan = _scene(rng, 64, 64)
    with pytest.raises(ValueError, match="halo"):
        fuse_scene(method, params, ms, pan, tile=32, halo=12)
    with pytest.raises(ValueError, match="smaller"):
        fuse_scene(method, params, ms, pan, tile=128)
    with pytest.raises(ValueError, match="does not match"):
        fuse_scene(method, params, ms[:-1], pan, tile=32, halo=8)
