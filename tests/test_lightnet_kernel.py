"""Parity of the whole-network fused LightNet kernel
(ops/lightnet_kernel.py) vs the flax module, interpret mode (CPU).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lgteun_tpu.models.lightnet import LightNetModule, lightnet_fast_forward
from lgteun_tpu.ops.lightnet_kernel import (
    lightnet_fused_forward,
    lightnet_layers,
)


@pytest.mark.parametrize("ms_chans", [4, 8])
def test_fused_matches_module(ms_chans):
    m = LightNetModule(ms_chans=ms_chans)
    rng = jax.random.PRNGKey(3)
    ms = jax.random.uniform(rng, (2, 32, 32, ms_chans), jnp.float32)
    pan = jax.random.uniform(jax.random.fold_in(rng, 1),
                             (2, 128, 128, 1), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), ms, pan)["params"]
    want = m.apply({"params": params}, ms, pan)
    got = lightnet_fused_forward(params, ms, pan, interpret=True)
    assert got.shape == want.shape
    # interpret mode is exact f32 arithmetic; only op-order differs
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=0)


def test_fused_matches_nchw_fast_path():
    """The kernel and the NCHW XLA fast path express the same math."""
    m = LightNetModule(ms_chans=4)
    rng = jax.random.PRNGKey(11)
    ms = jax.random.uniform(rng, (1, 32, 32, 4), jnp.float32)
    pan = jax.random.uniform(jax.random.fold_in(rng, 2),
                             (1, 128, 128, 1), jnp.float32)
    params = m.init(jax.random.PRNGKey(5), ms, pan)["params"]
    a = lightnet_fast_forward(params, ms, pan, jnp.float32)
    b = lightnet_fused_forward(params, ms, pan, interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=2e-5, rtol=0)


def test_layer_table_matches_module_structure():
    """Every (cin, cout) in the packing table matches the actual param
    shapes — a structure change in LightNetModule must break this."""
    m = LightNetModule(ms_chans=4)
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)),
                    jnp.zeros((1, 32, 32, 1)))["params"]

    def sub(name):
        return (params[name] if isinstance(name, str)
                else params[name[0]][name[1]])

    for name, cin, cout, _relu in lightnet_layers(4):
        k = sub(name)["pw1"]["kernel"]
        assert k.shape == (1, 1, cin, cout), (name, k.shape)


def test_unsupported_width_raises():
    m = LightNetModule(ms_chans=4)
    ms = jnp.zeros((1, 16, 16, 4))
    pan = jnp.zeros((1, 64, 64, 1))
    params = m.init(jax.random.PRNGKey(0), ms, pan)["params"]
    with pytest.raises(ValueError, match="unsupported"):
        lightnet_fused_forward(params, ms, pan, interpret=True)
