"""Matmul-DFT rfft2/irfft2 vs numpy FFT (the TPU fallback for backends
without an FFT op)."""

import numpy as np
import pytest

from lgteun_tpu.ops import fft as F


@pytest.mark.parametrize("h,w", [(8, 8), (16, 12), (64, 64), (128, 128),
                                 (9, 7)])
def test_rfft2_matches_numpy(rng, h, w, monkeypatch):
    monkeypatch.setenv("LGTEUN_MATMUL_DFT", "1")
    x = rng.standard_normal((2, h, w, 3)).astype(np.float32)
    got = np.asarray(F.rfft2(x, axes=(-3, -2)))
    want = np.fft.rfft2(x, axes=(1, 2))
    scale = max(np.abs(want).max(), 1.0)
    np.testing.assert_allclose(got, want.astype(np.complex64),
                               atol=2e-5 * scale)


@pytest.mark.parametrize("h,w", [(8, 8), (16, 12), (64, 64), (128, 128),
                                 (9, 7)])
def test_irfft2_roundtrip(rng, h, w, monkeypatch):
    monkeypatch.setenv("LGTEUN_MATMUL_DFT", "1")
    x = rng.standard_normal((2, h, w, 3)).astype(np.float32)
    fre = np.fft.rfft2(x, axes=(1, 2)).astype(np.complex64)
    got = np.asarray(F.irfft2(fre, s=(h, w), axes=(-3, -2)))
    np.testing.assert_allclose(got, x, atol=3e-5)


def test_irfft2_matches_numpy_on_modified_spectrum(rng, monkeypatch):
    """The models modify amp/phase before inverting — verify the
    inverse matches numpy for a non-hermitian-consistent spectrum."""
    monkeypatch.setenv("LGTEUN_MATMUL_DFT", "1")
    h, w = 32, 32
    fre = (rng.standard_normal((1, h, w // 2 + 1, 4))
           + 1j * rng.standard_normal((1, h, w // 2 + 1, 4))).astype(np.complex64)
    got = np.asarray(F.irfft2(fre, s=(h, w), axes=(-3, -2)))
    want = np.fft.irfft2(fre, s=(h, w), axes=(1, 2))
    np.testing.assert_allclose(got, want, atol=3e-5)


def test_backend_fallback_uses_jnp(monkeypatch, rng):
    monkeypatch.setenv("LGTEUN_MATMUL_DFT", "0")
    x = rng.standard_normal((1, 16, 16, 2)).astype(np.float32)
    got = np.asarray(F.rfft2(x, axes=(-3, -2)))
    want = np.fft.rfft2(x, axes=(1, 2))
    np.testing.assert_allclose(got, want.astype(np.complex64), atol=1e-4)
