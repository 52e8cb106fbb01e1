"""Wald-protocol synthetic dataset generator.

The real GF-2/WV-2/WV-3 splits live on the authors' Google Drive and are
not redistributable; every test and benchmark in this framework instead
runs on synthetic scenes constructed with the same Wald protocol the
reference used to build its training pairs (reference:
models/common/model_based_utils.py:144-234 `downgrade_images`):

1. render a full-resolution multispectral scene HrMS [H, W, C]
   (smooth random Gaussian blobs + band-correlated structure, 11-bit)
2. PAN = spectral average of HrMS bands + mild high-frequency detail
3. LrMS = MTF-style Gaussian lowpass of HrMS, decimated x4 (the
   protocol's sensor simulation; we use the default Gaussian branch,
   reference model_based_utils.py:182-197)
4. write `{id}_lr.tif`, `{id}_pan.tif`, `{id}_mul.tif` as uint16 TIFFs

This yields train/test splits with the exact shapes and value ranges of
the real data (LrMS 32x32xC, PAN 128x128, GT 128x128xC, values in
[0, 2047]).
"""

from __future__ import annotations

import os

import numpy as np
from scipy import ndimage, signal

from lgteun_tpu.data.tiff import write_tiff

__all__ = ["make_synthetic_scene", "make_synthetic_dataset"]


def _smooth_field(rng: np.random.Generator, h: int, w: int, sigma: float) -> np.ndarray:
    x = rng.standard_normal((h, w))
    x = ndimage.gaussian_filter(x, sigma, mode="wrap")
    x -= x.min()
    x /= max(x.max(), 1e-9)
    return x


def make_synthetic_scene(rng: np.random.Generator, size: int = 128,
                         bands: int = 4, ratio: int = 4):
    """Returns (lrms [s/r, s/r, C], pan [s, s], hrms [s, s, C]) uint16."""
    base = _smooth_field(rng, size, size, sigma=8.0)
    detail = _smooth_field(rng, size, size, sigma=1.5)
    hrms = np.zeros((size, size, bands))
    for b in range(bands):
        band_tint = _smooth_field(rng, size, size, sigma=16.0)
        w_base, w_tint, w_det = 0.55, 0.3, 0.15
        hrms[..., b] = w_base * base + w_tint * band_tint + w_det * detail
    hrms = np.clip(hrms, 0, 1) * 1800.0 + 100.0  # keep inside 11-bit range

    pan = hrms.mean(axis=-1) * 0.9 + 0.1 * detail * 1800.0

    # Wald degradation, default Gaussian branch
    # (reference model_based_utils.py:182-197): 9x9 Gaussian with
    # sig = (1/(2*2.772587/ratio^2))^0.5, wrap boundary, decimate from 0.
    sig = (1.0 / (2.0 * 2.772587 / ratio**2)) ** 0.5
    x = np.arange(9) - 4.0
    g = np.exp(-(x * x) / (2 * sig * sig))
    g /= g.sum()
    kernel = np.outer(g, g)
    lr = np.stack([
        signal.convolve2d(hrms[..., b], kernel, mode="same",
                          boundary="wrap")[::ratio, ::ratio]
        for b in range(bands)
    ], axis=-1)

    to_u16 = lambda a: np.clip(np.round(a), 0, 2047).astype(np.uint16)
    return to_u16(lr), to_u16(pan), to_u16(hrms)


def make_synthetic_dataset(root: str, n_train: int = 8, n_test: int = 4,
                           bands: int = 4, size: int = 128,
                           seed: int = 19971118) -> dict:
    """Write train/ and test/ splits of synthetic TIFF triples; returns
    {'train': dir, 'test': dir}. File naming matches the reference
    contract ({id}_lr/_pan/_mul .tif)."""
    rng = np.random.default_rng(seed)
    dirs = {}
    for split, n in (("train", n_train), ("test", n_test)):
        d = os.path.join(root, split)
        os.makedirs(d, exist_ok=True)
        for i in range(n):
            lr, pan, hr = make_synthetic_scene(rng, size, bands)
            write_tiff(os.path.join(d, f"{split}{i:03d}_lr.tif"), lr)
            write_tiff(os.path.join(d, f"{split}{i:03d}_pan.tif"), pan)
            write_tiff(os.path.join(d, f"{split}{i:03d}_mul.tif"), hr)
        dirs[split] = d
    return dirs
