"""LGTEUN model tests: shapes, param count parity, grads, overfit smoke."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from lgteun_tpu.models.lgteun import LGTEUN


def _init(c=8, stage=2, h=8):
    model = LGTEUN(ms_chans=c, stage=stage)
    ms = jnp.zeros((1, h, h, c))
    pan = jnp.zeros((1, 4 * h, 4 * h, 1))
    params = model.init(jax.random.PRNGKey(0), ms, pan)
    return model, params


def test_forward_shape(rng):
    model, params = _init(c=4, h=8)
    ms = jnp.asarray(rng.uniform(0, 1, (2, 8, 8, 4)), jnp.float32)
    pan = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 1)), jnp.float32)
    out = model.apply(params, ms, pan)
    assert out.shape == (2, 32, 32, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_param_count_matches_reference():
    """Paper Table 4: WV-3 (C=8, K=2) = 540.0 K params; GF-2/WV-2
    (C=4, K=2) = 202.2 K params (reference paper Table 4, and
    SURVEY.md §6)."""
    _, p8 = _init(c=8)
    n8 = sum(x.size for x in jax.tree.leaves(p8))
    assert abs(n8 - 540_000) / 540_000 < 0.005, n8

    _, p4 = _init(c=4)
    n4 = sum(x.size for x in jax.tree.leaves(p4))
    assert abs(n4 - 202_200) / 202_200 < 0.005, n4


@pytest.mark.slow
def test_gradients_flow(rng):
    model, params = _init(c=4, h=8)
    ms = jnp.asarray(rng.uniform(0, 1, (1, 8, 8, 4)), jnp.float32)
    pan = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 1)), jnp.float32)
    tgt = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 4)), jnp.float32)

    def loss_fn(p):
        out = model.apply(p, ms, pan)
        return jnp.mean(jnp.abs(out - tgt))

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
    gp = g["params"]
    # Reference semantics (unlg_former.py:61-67): only the FINAL prior
    # contributes to the output, so intermediate priors receive zero
    # gradient; everything else (D/DT/R/RT, both etas, final prior)
    # must receive gradient.
    final = max(k for k in gp if k.startswith("prior_"))
    for name, sub in gp.items():
        sub_leaves = jax.tree.leaves(sub)
        nonzero = [float(jnp.abs(x).max()) > 0 for x in sub_leaves]
        if name.startswith("prior_") and name != final:
            assert not any(nonzero), f"{name} should be gradient-dead"
        else:
            assert np.mean(nonzero) > 0.95, name


@pytest.mark.slow
def test_overfits_single_batch(rng):
    """A few hundred Adam steps on one tiny batch must drive L1 down
    sharply — the end-to-end trainability smoke test."""
    model, params = _init(c=4, h=8)
    ms = jnp.asarray(rng.uniform(0, 1, (2, 8, 8, 4)), jnp.float32)
    pan = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 1)), jnp.float32)
    tgt = jnp.asarray(rng.uniform(0.4, 0.6, (2, 32, 32, 4)), jnp.float32)

    tx = optax.adam(1.5e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(p, s):
        def loss_fn(pp):
            return jnp.mean(jnp.abs(model.apply(pp, ms, pan) - tgt))
        l, g = jax.value_and_grad(loss_fn)(p)
        updates, s = tx.update(g, s, p)
        return optax.apply_updates(p, updates), s, l

    params2, opt_state, l0 = step(params, opt_state)
    for _ in range(60):
        params2, opt_state, l = step(params2, opt_state)
    assert float(l) < 0.3 * float(l0), (float(l0), float(l))


@pytest.mark.slow
def test_fast_forward_matches_module(rng):
    """The channel-major fast path (models/lgteun_fast.py) is a layout
    change, not a different model: f32 CPU outputs must match the flax
    module to float tolerance for both band counts and stages."""
    import jax
    import jax.numpy as jnp

    from lgteun_tpu.models.lgteun import LGTEUN
    from lgteun_tpu.models.lgteun_fast import lgteun_fast_forward

    for c, stage in ((4, 1), (8, 2)):
        model = LGTEUN(ms_chans=c, stage=stage)
        ms = jnp.asarray(rng.uniform(0, 1, (2, 8, 8, c)).astype(np.float32))
        pan = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 1)).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), ms, pan)["params"]
        want = model.apply({"params": params}, ms, pan, deterministic=True)
        got = lgteun_fast_forward(params, ms, pan, stage=stage)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-5)


@pytest.mark.slow
def test_fast_forward_bf16_storage_drift_bounded(rng, monkeypatch):
    """LGTEUN_EVAL_DTYPE=bf16 = selective bf16 STORAGE on the fast
    path (kernel-internal math stays f32). Output must stay f32 and
    within a bf16-rounding-class envelope of the f32 path (measured
    CPU: mean ~1.8e-3, max ~1.4e-2 on a fresh init with outputs
    spanning ~[-1.2, 2.2])."""
    import jax
    import jax.numpy as jnp

    from lgteun_tpu.models.lgteun import LGTEUN
    from lgteun_tpu.models.lgteun_fast import lgteun_fast_forward

    model = LGTEUN(ms_chans=4, stage=2)
    ms = jnp.asarray(rng.uniform(0, 1, (2, 8, 8, 4)).astype(np.float32))
    pan = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 1)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), ms, pan)["params"]
    monkeypatch.delenv("LGTEUN_EVAL_DTYPE", raising=False)
    f32 = np.asarray(lgteun_fast_forward(params, ms, pan, stage=2))
    scale = np.abs(f32).max()
    drift = {}
    for mode in ("bf16", "bf16res"):
        monkeypatch.setenv("LGTEUN_EVAL_DTYPE", mode)
        b16 = lgteun_fast_forward(params, ms, pan, stage=2)
        assert b16.dtype == jnp.float32  # output precision is f32
        d = np.abs(np.asarray(b16) - f32)
        assert d.mean() <= 5e-3 * scale, (mode, d.mean(), scale)
        assert d.max() <= 5e-2 * scale, (mode, d.max(), scale)
        drift[mode] = d.mean()
    # bf16res rounds strictly less state (branch tensors only, f32
    # residual stream) so its drift must not exceed full bf16 storage
    assert drift["bf16res"] <= drift["bf16"] * 1.25, drift
