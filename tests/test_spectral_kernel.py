"""Fused global-mixer kernel vs the XLA mixer (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lgteun_tpu.ops.spectral_kernel import (fused_global_mixer_cm,
                                            global_mixer_xla_cm)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _mixer_oracle_f64(x, asc, abi, psc, pbi):
    """numpy f64 reference of the mixer chain (same epsilons)."""
    fre = np.fft.rfft2(np.asarray(x, np.float64), axes=(-2, -1))
    re, im = fre.real, fre.imag
    zero = (re == 0.0) & (im == 0.0)
    amp = np.where(zero, 0.0, np.hypot(np.where(zero, 1.0, re),
                                       np.where(zero, 0.0, im)))
    pha = np.where(zero, 0.0, np.arctan2(np.where(zero, 0.0, im),
                                         np.where(zero, 1.0, re)))
    col = lambda v: np.asarray(v, np.float64)[None, :, None, None]
    amp = amp * col(asc) + col(abi)
    pha = pha * col(psc) + col(pbi)
    spec = amp * np.cos(pha) + 2e-8 + 1j * (amp * np.sin(pha) + 1e-8)
    return np.abs(np.fft.irfft2(spec, s=x.shape[-2:], axes=(-2, -1)))


@pytest.mark.parametrize("trig", ["native", "poly"])
@pytest.mark.parametrize("shape", [(2, 16, 128, 128), (3, 8, 64, 64)])
def test_fused_matches_oracle(rng, shape, trig):
    """Fused kernel vs an f64 oracle. The fused and XLA paths are two
    equivalent f32 evaluation orders of the same chain — the forward
    DFT's ~5e-5 f32 rounding accumulates over the inverse's ~1e4-term
    sums to ~5e-3 output differences between ANY two orderings, so both
    are asserted against f64 within the same envelope rather than
    against each other at f32 tolerance."""
    b, c, h, w = shape
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    asc = jnp.asarray(rng.standard_normal(c), jnp.float32)
    abi = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)
    psc = jnp.asarray(rng.standard_normal(c), jnp.float32)
    pbi = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)
    oracle = _mixer_oracle_f64(x, asc, abi, psc, pbi)
    xla = np.asarray(global_mixer_xla_cm(x, asc, abi, psc, pbi))
    got = np.asarray(fused_global_mixer_cm(x, asc, abi, psc, pbi,
                                           interpret=True, trig=trig))
    xla_env = np.abs(xla - oracle).max()
    fused_env = np.abs(got - oracle).max()
    assert fused_env <= max(3.0 * xla_env, 1e-4), (fused_env, xla_env)


def test_zero_bin_convention(rng):
    """An all-zero input hits the zero-bin path in every frequency bin:
    output = |irfft2 of (amp_bias*cos/sin(pha_bias) + eps)| — must
    match the XLA path exactly in structure."""
    c = 8
    x = jnp.zeros((1, c, 64, 64), jnp.float32)
    asc = jnp.ones(c, jnp.float32)
    abi = jnp.asarray(rng.standard_normal(c), jnp.float32)
    psc = jnp.ones(c, jnp.float32)
    pbi = jnp.asarray(rng.standard_normal(c), jnp.float32)
    want = global_mixer_xla_cm(x, asc, abi, psc, pbi)
    got = fused_global_mixer_cm(x, asc, abi, psc, pbi, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("shape", [(2, 32, 64, 64), (1, 16, 128, 128)])
def test_ln_mixer_head_matches_xla(rng, shape):
    """Fused LN+split+mixer head vs the XLA composition: the LN'd
    local half must match tightly (pure elementwise); the mixed global
    half within the same f64-envelope logic as the mixer test."""
    from lgteun_tpu.ops.spectral_kernel import (fused_ln_mixer_head_cm,
                                                ln_mixer_head_xla_cm)

    b, c, h, w = shape
    c2 = c // 2
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    lng = jnp.asarray(1 + 0.1 * rng.standard_normal(c), jnp.float32)
    lnb = jnp.asarray(0.1 * rng.standard_normal(c), jnp.float32)
    asc = jnp.asarray(rng.standard_normal(c2), jnp.float32)
    abi = jnp.asarray(rng.standard_normal(c2) * 0.1, jnp.float32)
    psc = jnp.asarray(rng.standard_normal(c2), jnp.float32)
    pbi = jnp.asarray(rng.standard_normal(c2) * 0.1, jnp.float32)

    want_y1, want_x2 = ln_mixer_head_xla_cm(x, lng, lnb, asc, abi, psc, pbi)
    got_y1, got_x2 = fused_ln_mixer_head_cm(x, lng, lnb, asc, abi, psc, pbi,
                                            interpret=True)
    np.testing.assert_allclose(np.asarray(got_y1), np.asarray(want_y1),
                               atol=1e-5, rtol=1e-5)
    # mixer half: compare both to the f64 oracle of the LN'd input
    mu = np.mean(np.asarray(x, np.float64), axis=1, keepdims=True)
    var = np.var(np.asarray(x, np.float64), axis=1, keepdims=True)
    yo = (np.asarray(x, np.float64) - mu) / np.sqrt(var + 1e-5)
    yo = (yo * np.asarray(lng, np.float64)[None, :, None, None]
          + np.asarray(lnb, np.float64)[None, :, None, None])
    oracle = _mixer_oracle_f64(yo[:, c2:], asc, abi, psc, pbi)
    xla_env = np.abs(np.asarray(want_x2) - oracle).max()
    fused_env = np.abs(np.asarray(got_x2) - oracle).max()
    assert fused_env <= max(3.0 * xla_env, 1e-4), (fused_env, xla_env)


def test_atan2_poly_accuracy(rng):
    from lgteun_tpu.ops.spectral_kernel import _atan2

    y = jnp.asarray(rng.standard_normal(4096) * 10, jnp.float32)
    x = jnp.asarray(rng.standard_normal(4096) * 10, jnp.float32)
    want = np.arctan2(np.asarray(y), np.asarray(x))
    got = np.asarray(_atan2(y, x))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_sincos_poly_accuracy(rng):
    """Range-reduced Horner sin/cos vs numpy over the phase-affine
    range (|x| up to ~100: pha in [-pi, pi] times learned scales)."""
    from lgteun_tpu.ops.spectral_kernel import _sincos_poly

    x = jnp.asarray(rng.uniform(-100, 100, 8192), jnp.float32)
    sin_p, cos_p = _sincos_poly(x)
    xf = np.asarray(x, np.float64)
    np.testing.assert_allclose(np.asarray(sin_p), np.sin(xf), atol=3e-5)
    np.testing.assert_allclose(np.asarray(cos_p), np.cos(xf), atol=3e-5)
    # tight accuracy inside the primary range
    r = jnp.asarray(rng.uniform(-np.pi, np.pi, 8192), jnp.float32)
    sin_p, cos_p = _sincos_poly(r)
    rf = np.asarray(r, np.float64)
    np.testing.assert_allclose(np.asarray(sin_p), np.sin(rf), atol=2e-6)
    np.testing.assert_allclose(np.asarray(cos_p), np.cos(rf), atol=2e-6)
