"""Fused neighborhood attention (MDCUN blockNL) vs the XLA path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lgteun_tpu.ops.nonlocal_kernel import (
    _fused_na_impl,
    fused_neighborhood_attention,
    neighborhood_attention_xla,
)


def _weights(rng, c):
    g = lambda: jnp.asarray((rng.standard_normal((c, c)) * 0.2).astype(np.float32))
    return g(), g(), g(), g()


@pytest.mark.parametrize("h,w,c,fs", [(32, 128, 4, 15), (16, 128, 8, 7)])
def test_fused_matches_xla(rng, h, w, c, fs):
    x = jnp.asarray(rng.standard_normal((1, h, w, c)).astype(np.float32))
    wt, wp, wg, ww = _weights(rng, c)
    want = np.asarray(neighborhood_attention_xla(x, wt, wp, wg, ww, fs))
    got = np.asarray(_fused_na_impl(x, wt, wp, wg, ww, fs=fs, tile_rows=8,
                                    interpret=True))
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=5e-5)


def test_fused_differentiable(rng):
    x = jnp.asarray(rng.standard_normal((1, 16, 128, 4)).astype(np.float32))
    wt, wp, wg, ww = _weights(rng, 4)

    g_fused = jax.grad(lambda a: jnp.sum(
        fused_neighborhood_attention(a, wt, wp, wg, ww, 7) ** 2))(x)
    g_xla = jax.grad(lambda a: jnp.sum(
        neighborhood_attention_xla(a, wt, wp, wg, ww, 7) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_xla),
                               atol=2e-3, rtol=2e-3)


def test_awkward_height_falls_back_correctly(rng):
    """H=20 forces tile_rows below the halo (8); the impl must fall
    back to the XLA path instead of reading tile 0's halo rows for
    every grid program (silent corruption)."""
    x = jnp.asarray(rng.standard_normal((1, 20, 128, 4)).astype(np.float32))
    wt, wp, wg, ww = _weights(rng, 4)
    want = np.asarray(neighborhood_attention_xla(x, wt, wp, wg, ww, 15))
    got = np.asarray(_fused_na_impl(x, wt, wp, wg, ww, fs=15, interpret=True))
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=5e-5)


def test_large_fs_falls_back_correctly(rng):
    """fs // 2 > halo (fs=19) must route to the XLA path."""
    x = jnp.asarray(rng.standard_normal((1, 16, 128, 4)).astype(np.float32))
    wt, wp, wg, ww = _weights(rng, 4)
    want = np.asarray(neighborhood_attention_xla(x, wt, wp, wg, ww, 19))
    got = np.asarray(_fused_na_impl(x, wt, wp, wg, ww, fs=19, interpret=True))
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=5e-5)
