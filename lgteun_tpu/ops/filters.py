"""2-D filtering primitives with OpenCV-compatible semantics, in JAX.

cv2 is not a dependency of this framework; the handful of cv2 behaviors
the reference relies on are reimplemented here:

- ``cv2.pyrDown`` — Gaussian pyramid downsample used to build the
  low-res PAN input (reference: dataset/ps_dataset.py:57 applies it
  twice: 128->64->... only once per level needed; config uses 64).
- ``cv2.filter2D`` with the default BORDER_REFLECT_101 border — used by
  every windowed metric (reference: models/base/metrics.py:87-98 Q-index
  box filter, :139-146 SSIM Gaussian filter).
- ``cv2.getGaussianKernel(11, 1.5)`` — the SSIM window (reference:
  models/base/metrics.py:136).

All filters are expressed as depthwise `lax.conv_general_dilated` in
NHWC; XLA lowers small depthwise convs to fused VPU/MXU code on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "gaussian_kernel_1d",
    "filter2d_reflect101",
    "pyr_down",
    "box_filter",
    "depthwise_conv2d",
]


@functools.lru_cache(maxsize=None)
def gaussian_kernel_1d(ksize: int, sigma: float) -> np.ndarray:
    """Match ``cv2.getGaussianKernel(ksize, sigma)`` (float64).

    For sigma <= 0 cv2 uses sigma = 0.3*((ksize-1)*0.5 - 1) + 0.8.
    """
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    x = np.arange(ksize, dtype=np.float64) - (ksize - 1) * 0.5
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return k / k.sum()


def _reflect101_pad(x: jnp.ndarray, pad_h: int, pad_w: int) -> jnp.ndarray:
    """cv2 BORDER_REFLECT_101 == numpy/jnp 'reflect' (edge not repeated)."""
    pads = [(0, 0)] * (x.ndim - 3) + [(pad_h, pad_h), (pad_w, pad_w), (0, 0)]
    return jnp.pad(x, pads, mode="reflect")


def depthwise_conv2d(x: jnp.ndarray, kernel: jnp.ndarray,
                     stride: int = 1, padding="VALID") -> jnp.ndarray:
    """Depthwise *correlation* of NHWC ``x`` with a [kh, kw] kernel
    shared across channels (what cv2.filter2D computes per channel)."""
    c = x.shape[-1]
    kh, kw = kernel.shape
    k = jnp.broadcast_to(kernel.astype(x.dtype)[:, :, None, None], (kh, kw, 1, c))
    return jax.lax.conv_general_dilated(
        x, k,
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def filter2d_reflect101(x: jnp.ndarray, kernel: np.ndarray) -> jnp.ndarray:
    """``cv2.filter2D(x, -1, kernel)`` with default border, on NHWC.

    cv2.filter2D correlates (does not flip) and anchors at the kernel
    center ((k-1)//2 for odd, k//2 rounding consistent with cv2 anchor
    (-1,-1) == center). Supports even kernels (the metrics use an 8x8
    box: anchor at (4,4), i.e. pad (4, 3)).
    """
    kh, kw = kernel.shape
    anchor_h, anchor_w = kh // 2, kw // 2
    pad_top, pad_bottom = anchor_h, kh - 1 - anchor_h
    pad_left, pad_right = anchor_w, kw - 1 - anchor_w
    pads = [(0, 0)] * (x.ndim - 3) + [
        (pad_top, pad_bottom), (pad_left, pad_right), (0, 0)]
    xp = jnp.pad(x, pads, mode="reflect")
    return depthwise_conv2d(xp, jnp.asarray(kernel), padding="VALID")


@functools.lru_cache(maxsize=None)
def _pyr_kernel() -> np.ndarray:
    k = np.array([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0
    return np.outer(k, k)


def pyr_down(x: jnp.ndarray) -> jnp.ndarray:
    """``cv2.pyrDown``: blur with the 5x5 [1,4,6,4,1]/16 kernel under
    BORDER_REFLECT_101, then keep even rows/cols. NHWC in/out.

    Reference call site: dataset/ps_dataset.py:57 (PAN 128² -> 64²).
    """
    xp = _reflect101_pad(x, 2, 2)
    y = depthwise_conv2d(xp, jnp.asarray(_pyr_kernel()), padding="VALID")
    return y[..., ::2, ::2, :]


def box_filter(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """Mean filter (the Q-index window, reference metrics.py:82) with
    cv2.filter2D border semantics."""
    kernel = np.ones((size, size), dtype=np.float64) / (size * size)
    return filter2d_reflect101(x, kernel)


def get_lp(x: jnp.ndarray, ksize: int = 5) -> jnp.ndarray:
    """Low-frequency part: 5x5 average filter with zero 'SAME' padding
    (torch F.avg_pool2d(k=5, s=1, p=2) semantics — zero-padded borders
    divide by the full k*k; reference models/base/utils.py:70-80).
    NHWC."""
    kernel = np.full((ksize, ksize), 1.0 / (ksize * ksize))
    return depthwise_conv2d(
        jnp.pad(x, [(0, 0)] * (x.ndim - 3)
                + [(ksize // 2, ksize // 2)] * 2 + [(0, 0)]),
        jnp.asarray(kernel, x.dtype), padding="VALID")


def get_hp(x: jnp.ndarray, ksize: int = 5) -> jnp.ndarray:
    """High-frequency part: x - avg_filter(x) (reference
    models/base/utils.py:83-95)."""
    return x - get_lp(x, ksize)


def channel_pooling(x: jnp.ndarray, mode: str = "avg") -> jnp.ndarray:
    """Channel-dim avg/max pooling to 1 channel (reference
    models/base/utils.py:141-156). NHWC."""
    if mode == "avg":
        return jnp.mean(x, axis=-1, keepdims=True)
    if mode == "max":
        return jnp.max(x, axis=-1, keepdims=True)
    raise ValueError(f"no such pooling mode {mode!r}")


def calc_img_grad(x: jnp.ndarray) -> jnp.ndarray:
    """Mean absolute row/column forward differences (reference
    models/base/utils.py:159-168). NHWC in/out, spatial dims shrink
    by 1."""
    d_row = jnp.abs(x[..., :-1, :-1, :] - x[..., 1:, :-1, :])
    d_col = jnp.abs(x[..., :-1, :-1, :] - x[..., :-1, 1:, :])
    return (d_row + d_col) / 2.0
