"""Visualisation helpers (reference: dataset/utils.py:97-152).

- `linear_stretch` — the reference's percentile stretch to uint8 is its
  single numba-jitted kernel (`@jit(nopython=True)`, reference
  dataset/utils.py:97-129: per-band histogram over [0, 5000), clip to
  the [20%, 98%] cumulative-probability window, scale to [0, 255]).
  Re-expressed here as vectorised numpy (np.quantile over the same
  histogram semantics) — no numba needed and ~100x less code.
- `save_preview_png` — the `save_pang` RGB preview with the (2, 1, 0)
  band reorder (reference dataset/utils.py:132-152), via PIL.
"""

from __future__ import annotations

import os

import numpy as np

__all__ = ["linear_stretch", "save_preview_png"]


def linear_stretch(data_chw: np.ndarray, lo_prob: float = 0.2,
                   hi_prob: float = 0.98, max_value: int = 5000) -> np.ndarray:
    """Per-band cumulative-histogram stretch to uint8-range floats.

    Matches the reference's integer-histogram algorithm: min_val is the
    smallest intensity whose CDF reaches `lo_prob`, max_val the smallest
    whose CDF reaches `hi_prob` (reference dataset/utils.py:107-120),
    then linear scale with clipping.
    """
    data = np.asarray(data_chw)
    out = np.zeros(data.shape, np.float64)
    for b in range(data.shape[0]):
        band = data[b].astype(np.int64)
        hist = np.bincount(band.ravel(), minlength=max_value)[:max_value]
        cdf = np.cumsum(hist) / band.size
        min_val = int(np.searchsorted(cdf, lo_prob) + 1)
        max_val = int(np.searchsorted(cdf, hi_prob) + 1)
        scaled = (data[b] - min_val) / max(max_val - min_val, 1) * 255.0
        scaled = np.where(data[b] > max_val, 255.0, scaled)
        scaled = np.where(data[b] < min_val, 0.0, scaled)
        out[b] = scaled
    return out


def save_preview_png(img_chw: np.ndarray, path: str,
                     stretch: bool = False) -> str:
    """Write an RGB/gray PNG preview with the reference's band order
    (bands (2,1,0) for 4/8-band images; reference dataset/utils.py:142-147)."""
    from PIL import Image

    img = np.asarray(img_chw)
    if img.ndim == 2:
        img = img[None]
    if stretch:
        img = linear_stretch(img)
    if img.shape[0] in (4, 8):
        img = img[(2, 1, 0), :, :].transpose(1, 2, 0)
    elif img.shape[0] == 1:
        img = img[0]
    else:
        img = img.transpose(1, 2, 0)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(np.asarray(img, np.uint8)).save(path)
    return path
