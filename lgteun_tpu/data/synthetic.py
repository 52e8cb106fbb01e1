"""Wald-protocol synthetic dataset generator.

The real GF-2/WV-2/WV-3 splits live on the authors' Google Drive and are
not redistributable; every test and benchmark in this framework instead
runs on synthetic scenes constructed with the same Wald protocol the
reference used to build its training pairs (reference:
models/common/model_based_utils.py:144-234 `downgrade_images`):

1. render a full-resolution multispectral scene HrMS [H, W, C]
   (smooth random Gaussian blobs + band-correlated structure, 11-bit)
2. PAN = spectral average of HrMS bands + mild high-frequency detail
3. LrMS = sensor simulation, decimated x4. Two protocol branches, both
   reproduced from the reference (model_based_utils.py:144-234
   `downgrade_images`):
   - `sensor=None`: the default 9x9 Gaussian lowpass (wrap boundary,
     decimate from offset 0, reference :182-197)
   - `sensor` in QB/IKONOS/GeoEye1/WV2/WV3: the per-band MTF branch —
     a 41-tap windowed-FIR lowpass designed from each band's Nyquist
     gain, `nearest` boundary, decimated from offset ratio//2
     (reference :157-181, :199-230). This is the recipe the real
     GF-2/WV-2/WV-3 training pairs were built with.
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

__all__ = ["downgrade_images", "make_synthetic_scene",
           "make_synthetic_dataset", "SENSOR_GNYQ"]

# Per-sensor MTF gains at Nyquist (band array, PAN), reference
# model_based_utils.py:157-181. Band order B,G,R,NIR for the 4-band
# sensors. Dtypes matter and are kept verbatim: the reference builds
# the QB/IKONOS/GeoEye1 tables as float32 arrays and WV2/WV3 as
# float64, and the FIR design's alpha inherits that precision.
SENSOR_GNYQ = {
    "QB": (np.asarray([0.34, 0.32, 0.30, 0.22], dtype="float32"), 0.15),
    "IKONOS": (np.asarray([0.26, 0.28, 0.29, 0.28], dtype="float32"), 0.17),
    "GeoEye1": (np.asarray([0.23, 0.23, 0.23, 0.23], dtype="float32"), 0.16),
    "WV2": (np.asarray([0.35] * 7 + [0.27]), 0.11),
    "WV3": (0.29 * np.ones(8), 0.15),
}


def _mtf_fir(gnyq, ratio: int, n: int = 41) -> np.ndarray:
    """41-tap windowed-FIR MTF lowpass for one Nyquist gain.

    The construction is the reference's `GNyq2win` (metrics.py:223-236,
    already implemented + parity-tested as `numpy_ref.mtf_kernel`), but
    alpha is computed with `downgrade_images`' own arithmetic
    (reference model_based_utils.py:153,206): `ratio` is cast to
    np.double, so `fcut` is a strong float64 scalar and the division
    against `-2*log(GNyq[j])` runs in float64 even when the gain table
    is float32 (QB/IKONOS/GeoEye1) — whereas the log itself DOES round
    to float32 for those sensors. Reproduced exactly; the resulting
    kernels differ from `mtf_kernel(float(gnyq))` at the 1e-8 level.

    NOTE the reference's dataset copy of the window machinery
    (model_based_utils.py:108-141 gaussian2d/kaiser2d) carries
    Python-2 integer-division grids (`-(N-1)/2`) that under Python 3
    build a 42-point grid against a 41-point Kaiser window — its
    sensor branch crashes in np.interp (verified;
    tests/test_synthetic_sensor.py::test_reference_sensor_branch_is_
    broken_on_py3). The intended — Python-2-era — semantics is the
    41-tap GNyq2win construction used here."""
    from lgteun_tpu.metrics.numpy_ref import mtf_kernel_from_alpha

    fcut = 1 / np.double(ratio)
    alpha = np.sqrt(((n - 1) * (fcut / 2)) ** 2 / (-2 * np.log(gnyq)))
    return mtf_kernel_from_alpha(float(alpha), n)


def _default_gaussian_kernel(ratio: int) -> np.ndarray:
    """9x9 separable Gaussian of the default branch (reference
    model_based_utils.py:184-186; sigma chosen so the kernel's MTF is
    0.5 at 1/ratio of Nyquist)."""
    sig = (1.0 / (2.0 * 2.772587 / ratio**2)) ** 0.5
    x = np.arange(9) - 4.0
    g = np.exp(-(x * x) / (2 * sig * sig))
    g /= g.sum()
    return np.outer(g, g)


def _pil_imresize_bicubic(img: np.ndarray, scale: float) -> np.ndarray:
    """`scipy.misc.imresize(img, scale, 'bicubic', mode='F')` —
    removed from scipy years ago; it was a thin wrapper over PIL
    float-mode bicubic resize with `int(scale*dim)` output sizing."""
    from PIL import Image

    h, w = img.shape
    oh, ow = int(h * scale), int(w * scale)
    im = Image.fromarray(img.astype(np.float32), mode="F")
    return np.asarray(im.resize((ow, oh), Image.BICUBIC), np.float64)


def downgrade_images(ms: np.ndarray, pan: np.ndarray, ratio: int = 4,
                     sensor: str | None = None, pan_mtf: bool = False):
    """Wald-protocol degradation of an (MS [H,W,C], PAN [H,W] or
    [H,W,1]) pair — behavioral port of reference
    model_based_utils.py:144-234 `downgrade_images`.

    sensor=None        -> default branch: 9x9 Gaussian (wrap), both
                          images decimated from offset 0.
    sensor in
    SENSOR_GNYQ        -> MTF branch: per-band 41-tap FIR (`nearest`
                          boundary), MS decimated from ratio//2 with
                          the reference's `:-1` stop; PAN via
                          symmetric-pad bicubic resize (the shipped
                          path) or, with pan_mtf=True, the reference's
                          flag_PAN_MTF kernel branch (dead code there
                          — flag hard-coded 0 — implemented for
                          completeness).

    Returns (ms_lr [h,w,C], pan_lr [h,w,1]) float64.
    """
    ms = np.double(ms)
    pan = np.double(np.squeeze(pan))
    if sensor is None:
        kernel = _default_gaussian_kernel(ratio)
        ms_lr = np.stack([
            signal.convolve2d(ms[..., b], kernel, mode="same",
                              boundary="wrap")[::ratio, ::ratio]
            for b in range(ms.shape[-1])
        ], axis=-1)
        pan_lr = signal.convolve2d(pan, kernel, mode="same",
                                   boundary="wrap")[::ratio, ::ratio]
        return ms_lr, pan_lr[..., None]

    if sensor not in SENSOR_GNYQ:
        raise KeyError(f"unknown sensor {sensor!r}; known: "
                       f"{sorted(SENSOR_GNYQ)} (or None for the default "
                       f"Gaussian branch)")
    gnyq, gnyq_pan = SENSOR_GNYQ[sensor]
    if len(gnyq) < ms.shape[-1]:
        raise ValueError(f"sensor {sensor} has {len(gnyq)} bands; "
                         f"MS has {ms.shape[-1]}")
    start = ratio // 2
    ms_lp = np.stack([
        ndimage.correlate(ms[..., b], _mtf_fir(gnyq[b], ratio),
                          mode="nearest")
        for b in range(ms.shape[-1])
    ], axis=-1)
    ms_lr = ms_lp[start:-1:ratio, start:-1:ratio]
    if pan_mtf:
        pan_lp = ndimage.correlate(pan, _mtf_fir(gnyq_pan, ratio),
                                   mode="nearest")
        pan_lr = pan_lp[start:-1:ratio, start:-1:ratio]
    else:
        pan_pad = np.pad(pan, 2 * ratio, "symmetric")
        pan_lr = _pil_imresize_bicubic(pan_pad, 1.0 / ratio)[2:-2, 2:-2]
    return ms_lr, pan_lr[..., None]


def _smooth_field(rng: np.random.Generator, h: int, w: int, sigma: float) -> np.ndarray:
    x = rng.standard_normal((h, w))
    x = ndimage.gaussian_filter(x, sigma, mode="wrap")
    x -= x.min()
    x /= max(x.max(), 1e-9)
    return x


def make_synthetic_scene(rng: np.random.Generator, size: int = 128,
                         bands: int = 4, ratio: int = 4,
                         sensor: str | None = None):
    """Returns (lrms [s/r, s/r, C], pan [s, s], hrms [s, s, C]) uint16.

    `sensor=None` degrades with the default Gaussian branch; a sensor
    name (e.g. 'WV3' for 8-band) uses that sensor's per-band MTF
    recipe — the one the reference's real training pairs were built
    with (see `downgrade_images`)."""
    base = _smooth_field(rng, size, size, sigma=8.0)
    detail = _smooth_field(rng, size, size, sigma=1.5)
    hrms = np.zeros((size, size, bands))
    for b in range(bands):
        band_tint = _smooth_field(rng, size, size, sigma=16.0)
        w_base, w_tint, w_det = 0.55, 0.3, 0.15
        hrms[..., b] = w_base * base + w_tint * band_tint + w_det * detail
    hrms = np.clip(hrms, 0, 1) * 1800.0 + 100.0  # keep inside 11-bit range

    pan = hrms.mean(axis=-1) * 0.9 + 0.1 * detail * 1800.0

    lr, _ = downgrade_images(hrms, pan, ratio, sensor=sensor)

    to_u16 = lambda a: np.clip(np.round(a), 0, 2047).astype(np.uint16)
    return to_u16(lr), to_u16(pan), to_u16(hrms)


def make_synthetic_dataset(root: str, n_train: int = 8, n_test: int = 4,
                           bands: int = 4, size: int = 128,
                           seed: int = 19971118,
                           sensor: str | None = None) -> dict:
    """Write train/ and test/ splits of synthetic TIFF triples; returns
    {'train': dir, 'test': dir}. File naming matches the reference
    contract ({id}_lr/_pan/_mul .tif)."""
    rng = np.random.default_rng(seed)
    dirs = {}
    for split, n in (("train", n_train), ("test", n_test)):
        d = os.path.join(root, split)
        os.makedirs(d, exist_ok=True)
        for i in range(n):
            lr, pan, hr = make_synthetic_scene(rng, size, bands,
                                               sensor=sensor)
            write_tiff(os.path.join(d, f"{split}{i:03d}_lr.tif"), lr)
            write_tiff(os.path.join(d, f"{split}{i:03d}_pan.tif"), pan)
            write_tiff(os.path.join(d, f"{split}{i:03d}_mul.tif"), hr)
        dirs[split] = d
    return dirs
