"""2-D real FFTs as MXU matmuls.

The LGT global mixer and SFIIN's frequency branch need
``rfft2``/``irfft2`` (reference: models/common/LGT.py:162-180,
models/SFIIN.py:210-237). XLA's FFT op is NOT implemented on every TPU
runtime (the axon v5e backend in this environment raises UNIMPLEMENTED),
and at the framework's image sizes (<=128 per axis) a dense DFT is a
*better* TPU program anyway: the transform becomes two [N, N]-ish
matmuls that run on the MXU at full utilisation instead of a
bandwidth-bound butterfly custom call.

`rfft2` / `irfft2` here are drop-in replacements for
``jnp.fft.rfft2/irfft2`` with ``norm='backward'`` over two trailing
axes conventions used in the models (NHWC images, axes=(-3, -2)):

- forward: real FFT along W (half spectrum, W//2+1 bins), full complex
  FFT along H — returned as a complex64 array for API compatibility
- inverse: exact adjoint with hermitian weighting and 1/(H*W) scaling

DFT matrices are built at trace time in float64 and applied as float32
einsums at HIGH precision (3-pass bf16; LGTEUN_MATMUL_PRECISION=highest
selects 6-pass HIGHEST); max abs error vs numpy's FFT is ~1e-5 at
128x128 either way (validated in tests/test_fft.py).

Backend selection: `USE_MATMUL_DFT` defaults to True on TPU and False
elsewhere (XLA CPU/GPU FFT is available and exact); models call
`rfft2`/`irfft2` from this module exclusively.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["rfft2", "irfft2", "rfft2_pair", "irfft2_pair", "use_matmul_dft"]

def _dft_precision():
    """DFT matmul precision. HIGH (3-pass bf16, ~1e-6 rel) is the
    default — the DFT's documented accuracy budget vs numpy is ~1e-5 at
    128x128, so the extra 3 passes of HIGHEST buy nothing but ~2x MXU
    time on the mixer's hot path. LGTEUN_MATMUL_PRECISION=highest (the
    parity-grade flag the models already honour) restores 6-pass."""
    if os.environ.get("LGTEUN_MATMUL_PRECISION", "").lower() == "highest":
        return jax.lax.Precision.HIGHEST
    return jax.lax.Precision.HIGH


def use_matmul_dft() -> bool:
    env = os.environ.get("LGTEUN_MATMUL_DFT")
    if env is not None:
        return env == "1"
    return jax.default_backend() == "tpu"




def _snap(m: np.ndarray) -> np.ndarray:
    """Zero the matrix entries that are exactly 0 in exact arithmetic
    (sin/cos of integer multiples of pi evaluated through floating
    2*pi*k*w/n land at ~1e-13 noise of either sign). Snapping makes the
    spectrum's exactly-zero imaginary bins exactly zero, so the phase's
    atan2 branch cut at +-pi is deterministic (+pi, numpy/torch
    convention) instead of a rounding coin flip — the amp/phase mixers
    scale the phase, so a 2*pi ambiguity is a real value change."""
    out = m.copy()
    out[np.abs(out) < 1e-9] = 0.0
    return out


@functools.lru_cache(maxsize=None)
def _dft_mats(n: int):
    """Full-DFT cos/sin matrices [n, n]: X_k = sum_w x_w e^{-2pi i k w / n}."""
    k = np.arange(n)[:, None]
    w = np.arange(n)[None, :]
    ang = 2.0 * np.pi * k * w / n
    return _snap(np.cos(ang)), _snap(-np.sin(ang))


@functools.lru_cache(maxsize=None)
def _rdft_mats(n: int):
    """Half-spectrum DFT matrices [n//2+1, n]."""
    k = np.arange(n // 2 + 1)[:, None]
    w = np.arange(n)[None, :]
    ang = 2.0 * np.pi * k * w / n
    return _snap(np.cos(ang)), _snap(-np.sin(ang))


@functools.lru_cache(maxsize=None)
def _irdft_mats(n: int):
    """Inverse half-spectrum matrices [n, n//2+1] with hermitian
    weights (1/n applied here)."""
    nk = n // 2 + 1
    w = np.arange(n)[:, None]
    k = np.arange(nk)[None, :]
    ang = 2.0 * np.pi * w * k / n
    weight = np.full(nk, 2.0)
    weight[0] = 1.0
    if n % 2 == 0:
        weight[-1] = 1.0
    cos = _snap(np.cos(ang)) * weight / n
    sin = _snap(-np.sin(ang)) * weight / n
    return cos, sin


def _mm(mat: np.ndarray, x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Apply [K, N] matrix along `axis` (-3 or -2) of [..., H, W, C]."""
    m = jnp.asarray(mat, jnp.float32)
    if axis == -3:
        return jnp.einsum("kh,...hwc->...kwc", m, x,
                          precision=_dft_precision())
    return jnp.einsum("kw,...hwc->...hkc", m, x,
                      precision=_dft_precision())


def rfft2_pair(x: jnp.ndarray, axes=(-3, -2),
               norm: str = "backward") -> tuple[jnp.ndarray, jnp.ndarray]:
    """rfft2 returning (real, imag) float arrays — complex dtypes are
    UNIMPLEMENTED on some TPU runtimes (this environment's axon v5e),
    so the models consume this pair API exclusively."""
    assert tuple(axes) == (-3, -2) and norm == "backward"
    if not use_matmul_dft():
        fre = jnp.fft.rfft2(x, axes=axes, norm=norm)
        return jnp.real(fre), jnp.imag(fre)
    h, w = x.shape[-3], x.shape[-2]
    xf = x.astype(jnp.float32)
    # real FFT along W (the last transformed axis)
    wc, ws = _rdft_mats(w)
    re = _mm(wc, xf, -2)
    im = _mm(ws, xf, -2)
    # full FFT along H on the complex intermediate (real arithmetic)
    hc, hs = _dft_mats(h)
    out_re = _mm(hc, re, -3) - _mm(hs, im, -3)
    out_im = _mm(hc, im, -3) + _mm(hs, re, -3)
    return out_re, out_im


def irfft2_pair(re: jnp.ndarray, im: jnp.ndarray, s, axes=(-3, -2),
                norm: str = "backward") -> jnp.ndarray:
    """Inverse of `rfft2_pair` (matches jnp.fft.irfft2 semantics)."""
    assert tuple(axes) == (-3, -2) and norm == "backward"
    if not use_matmul_dft():
        return jnp.fft.irfft2(jax.lax.complex(re, im), s=s, axes=axes,
                              norm=norm)
    h, w = s
    re = re.astype(jnp.float32)
    im = im.astype(jnp.float32)
    # inverse full FFT along H: x_h = (1/h) sum_k X_k e^{+2pi i k h / n}
    hc, hs = _dft_mats(h)  # cos, -sin of forward
    inv_c = hc.T / h       # cos(2pi h k / n) / n
    inv_s = -hs.T / h      # +sin(2pi h k / n) / n
    mid_re = _mm(inv_c, re, -3) - _mm(inv_s, im, -3)
    mid_im = _mm(inv_c, im, -3) + _mm(inv_s, re, -3)
    # inverse real FFT along W with hermitian weighting:
    # x_w = sum_k (c_k/n)(re_k cos - im_k sin)
    wc, ws = _irdft_mats(w)
    return _mm(wc, mid_re, -2) + _mm(ws, mid_im, -2)


def _mm_cm(mat: np.ndarray, x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Apply [K, N] matrix along `axis` (-2 or -1) of channel-major
    [..., H, W] arrays."""
    m = jnp.asarray(mat, jnp.float32)
    if axis == -2:
        return jnp.einsum("kh,...hw->...kw", m, x,
                          precision=_dft_precision())
    return jnp.einsum("kw,...hw->...hk", m, x,
                      precision=_dft_precision())


def rfft2_pair_cm(x: jnp.ndarray,
                  norm: str = "backward") -> tuple[jnp.ndarray, jnp.ndarray]:
    """`rfft2_pair` for channel-major [..., H, W] arrays (transform
    axes (-2, -1)); same matmul-DFT real-pair semantics."""
    assert norm == "backward"
    if not use_matmul_dft():
        fre = jnp.fft.rfft2(x, axes=(-2, -1), norm=norm)
        return jnp.real(fre), jnp.imag(fre)
    h, w = x.shape[-2], x.shape[-1]
    xf = x.astype(jnp.float32)
    wc, ws = _rdft_mats(w)
    re = _mm_cm(wc, xf, -1)
    im = _mm_cm(ws, xf, -1)
    hc, hs = _dft_mats(h)
    out_re = _mm_cm(hc, re, -2) - _mm_cm(hs, im, -2)
    out_im = _mm_cm(hc, im, -2) + _mm_cm(hs, re, -2)
    return out_re, out_im


def irfft2_pair_cm(re: jnp.ndarray, im: jnp.ndarray, s,
                   norm: str = "backward") -> jnp.ndarray:
    """Inverse of `rfft2_pair_cm` (channel-major [..., H, W])."""
    assert norm == "backward"
    if not use_matmul_dft():
        return jnp.fft.irfft2(jax.lax.complex(re, im), s=s, axes=(-2, -1),
                              norm=norm)
    h, w = s
    re = re.astype(jnp.float32)
    im = im.astype(jnp.float32)
    hc, hs = _dft_mats(h)
    inv_c = hc.T / h
    inv_s = -hs.T / h
    mid_re = _mm_cm(inv_c, re, -2) - _mm_cm(inv_s, im, -2)
    mid_im = _mm_cm(inv_c, im, -2) + _mm_cm(inv_s, re, -2)
    wc, ws = _irdft_mats(w)
    return _mm_cm(wc, mid_re, -1) + _mm_cm(ws, mid_im, -1)


def rfft2(x: jnp.ndarray, axes=(-3, -2), norm: str = "backward") -> jnp.ndarray:
    """Complex-returning wrapper (CPU/GPU convenience; avoid on TPU)."""
    re, im = rfft2_pair(x, axes, norm)
    return jax.lax.complex(re, im)


def irfft2(fre: jnp.ndarray, s, axes=(-3, -2),
           norm: str = "backward") -> jnp.ndarray:
    """Complex-accepting wrapper (CPU/GPU convenience; avoid on TPU)."""
    return irfft2_pair(jnp.real(fre), jnp.imag(fre), s, axes, norm)
