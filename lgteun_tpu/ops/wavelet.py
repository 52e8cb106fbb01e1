"""Haar 2-D discrete wavelet transform (pywt-compatible).

Replaces the reference's pywt dependency (reference:
models/Wavelet.py:38-46 uses `pywt.wavedec2(..., 'haar', level=2)` and
`waverec2`). Haar analysis uses the orthonormal pair
(lo = [1/sqrt2, 1/sqrt2], hi = [1/sqrt2, -1/sqrt2]) applied to
non-overlapping pairs — i.e. a reshape + butterfly, which XLA compiles
to pure vector ops. Even input sizes only (the 128x128 use case).

Coefficient convention matches pywt: wavedec2 returns
[cA_n, (cH_n, cV_n, cD_n), ..., (cH_1, cV_1, cD_1)] where cH captures
*row*-direction detail.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

__all__ = ["haar_dwt2", "haar_idwt2", "haar_wavedec2", "haar_waverec2"]

_S = 1.0 / math.sqrt(2.0)


def haar_dwt2(x: jnp.ndarray):
    """One Haar level on [..., H, W] -> (cA, (cH, cV, cD)), halving H/W."""
    a = x[..., 0::2, :]
    b = x[..., 1::2, :]
    lo_r = (a + b) * _S
    hi_r = (a - b) * _S
    ll = (lo_r[..., 0::2] + lo_r[..., 1::2]) * _S
    lh = (lo_r[..., 0::2] - lo_r[..., 1::2]) * _S
    hl = (hi_r[..., 0::2] + hi_r[..., 1::2]) * _S
    hh = (hi_r[..., 0::2] - hi_r[..., 1::2]) * _S
    # pywt: cH = detail in rows (vertical freq), cV = columns
    return ll, (lh, hl, hh)


def haar_idwt2(ca: jnp.ndarray, details) -> jnp.ndarray:
    """Inverse of `haar_dwt2`."""
    lh, hl, hh = details
    lo_r_e = (ca + lh) * _S
    lo_r_o = (ca - lh) * _S
    hi_r_e = (hl + hh) * _S
    hi_r_o = (hl - hh) * _S
    h2, w2 = ca.shape[-2], ca.shape[-1]
    lo_r = jnp.stack([lo_r_e, lo_r_o], axis=-1).reshape(*ca.shape[:-1], w2 * 2)
    hi_r = jnp.stack([hi_r_e, hi_r_o], axis=-1).reshape(*ca.shape[:-1], w2 * 2)
    a = (lo_r + hi_r) * _S
    b = (lo_r - hi_r) * _S
    out = jnp.stack([a, b], axis=-2)
    return out.reshape(*ca.shape[:-2], h2 * 2, w2 * 2)


def haar_wavedec2(x: jnp.ndarray, level: int = 2):
    """pywt.wavedec2-compatible coefficient list for [..., H, W]."""
    coeffs = []
    ca = x
    for _ in range(level):
        ca, det = haar_dwt2(ca)
        coeffs.append(det)
    return [ca] + coeffs[::-1]


def haar_waverec2(coeffs) -> jnp.ndarray:
    """Inverse of `haar_wavedec2`."""
    ca = coeffs[0]
    for det in coeffs[1:]:
        ca = haar_idwt2(ca, det)
    return ca
