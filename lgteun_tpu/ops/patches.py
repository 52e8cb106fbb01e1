"""torch F.unfold / F.fold equivalents for NHWC arrays.

INNT's texture transformer and MDCUN's non-local block are built on
overlapping patch extraction (reference: models/INNT.py:120-163 uses
unfold/fold at 3x3 and 24x24/stride 8; models/MDCUN.py:85-107 at 15x15).

`extract_patches` matches torch's channel-major (c, kh, kw) patch
layout; `fold_patches` is the exact adjoint (overlapping contributions
are SUMMED, like torch F.fold) obtained via jax.vjp of the extraction —
guaranteed-consistent semantics with zero extra code.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["extract_patches", "fold_patches"]


def extract_patches(x: jnp.ndarray, kernel: int, stride: int = 1,
                    padding: int = 0) -> jnp.ndarray:
    """NHWC [B,H,W,C] -> [B, L, C*k*k] with torch F.unfold's (c, kh,
    kw) feature ordering and row-major L over output positions."""
    b, h, w, c = x.shape
    patches = jax.lax.conv_general_dilated_patches(
        jnp.moveaxis(x, -1, 1),  # NCHW
        filter_shape=(kernel, kernel),
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
    )  # [B, C*k*k, oh, ow], feature dim ordered (c, kh, kw)
    b_, ckk, oh, ow = patches.shape
    return patches.reshape(b_, ckk, oh * ow).transpose(0, 2, 1)


def fold_patches(patches: jnp.ndarray, out_hw: tuple[int, int], channels: int,
                 kernel: int, stride: int = 1, padding: int = 0) -> jnp.ndarray:
    """[B, L, C*k*k] -> NHWC [B,H,W,C]; overlaps are summed
    (torch F.fold semantics)."""
    b = patches.shape[0]
    h, w = out_hw

    def extract(img):
        return extract_patches(img, kernel, stride, padding)

    zero = jnp.zeros((b, h, w, channels), patches.dtype)
    _, vjp = jax.vjp(extract, zero)
    return vjp(patches)[0]
