"""Whole-chain fused texture match vs the XLA composition.

The kernel runs in interpret mode on CPU, so these tests prove the
in-VMEM unfold/norm/search/transfer/fold restructuring is semantics-
preserving (incl. torch-first-max tie handling and the /9 fold), not
just shape-compatible. Reference chain: models/INNT.py:100-143.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lgteun_tpu.ops.texture_match_kernel import (
    _fused_tm_impl,
    fused_texture_match,
    texture_match_xla,
)


def _run_fused(lr, ref):
    return _fused_tm_impl(jnp.asarray(lr), jnp.asarray(ref),
                          interpret=True)


@pytest.mark.parametrize("side,c,n", [(8, 4, 8), (24, 4, 2), (8, 6, 4)])
def test_matches_xla_chain(rng, side, c, n):
    lr = rng.normal(size=(n, c, side * side)).astype(np.float32)
    ref = rng.normal(size=(n, c, side * side)).astype(np.float32)
    t_want, s_want = texture_match_xla(jnp.asarray(lr), jnp.asarray(ref),
                                       side)
    t_got, s_got = _run_fused(lr, ref)
    np.testing.assert_allclose(np.asarray(s_got), np.asarray(s_want),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(t_got), np.asarray(t_want),
                               atol=2e-4, rtol=2e-4)


def test_exact_ties_pick_first_ref(rng):
    """Constant ref -> every ref sub-patch identical -> R has exact
    column ties; torch.max takes the FIRST max, and the transfer must
    not sum several tied patches."""
    side, c, n = 8, 4, 3
    lr = rng.normal(size=(n, c, side * side)).astype(np.float32)
    ref = np.ones((n, c, side * side), np.float32) * 0.37
    t_want, s_want = texture_match_xla(jnp.asarray(lr), jnp.asarray(ref),
                                       side)
    t_got, s_got = _run_fused(lr, ref)
    np.testing.assert_allclose(np.asarray(t_got), np.asarray(t_want),
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(s_got), np.asarray(s_want),
                               atol=1e-5)


def test_gradients_flow(rng):
    """custom_vjp backward (XLA-composition vjp) produces finite grads
    matching the XLA chain's."""
    side, c, n = 8, 4, 2
    lr = rng.normal(size=(n, c, side * side)).astype(np.float32)
    ref = rng.normal(size=(n, c, side * side)).astype(np.float32)

    def loss_fused(a, b):
        t, s = fused_texture_match(a, b)
        return jnp.sum(t ** 2) + jnp.sum(s)

    def loss_xla(a, b):
        t, s = texture_match_xla(a, b, side)
        return jnp.sum(t ** 2) + jnp.sum(s)

    g_f = jax.grad(loss_fused, argnums=(0, 1))(jnp.asarray(lr),
                                               jnp.asarray(ref))
    g_x = jax.grad(loss_xla, argnums=(0, 1))(jnp.asarray(lr),
                                             jnp.asarray(ref))
    for gf, gx in zip(g_f, g_x):
        assert np.isfinite(np.asarray(gf)).all()
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gx),
                                   atol=1e-3, rtol=1e-3)


def test_innt_module_routes_and_matches(rng, monkeypatch):
    """TransformerFusion with the whole-chain path off vs on (interpret
    fused kernel is exercised by forcing backend-independent call) —
    here we just check the XLA path is unchanged and finite on CPU."""
    from lgteun_tpu.models.innt import TransformerFusion

    monkeypatch.setenv("LGTEUN_FUSED_TM", "0")
    x = rng.uniform(0.1, 0.9, (4, 24, 24, 4)).astype(np.float32)
    r = rng.uniform(0.1, 0.9, (4, 24, 24, 4)).astype(np.float32)
    tf = TransformerFusion(4)
    p = tf.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(r))
    out = tf.apply(p, jnp.asarray(x), jnp.asarray(r))
    assert out.shape == (4, 24, 24, 4)
    assert np.isfinite(np.asarray(out)).all()
