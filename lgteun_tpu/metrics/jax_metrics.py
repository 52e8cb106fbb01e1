"""Batched, jit-compiled IQA metrics for on-device evaluation.

TPU-first rework of the reference's per-image CPU metric loop
(reference: models/base/base_model.py:318-334 calls numpy metrics one
image at a time; D_lambda alone is O(C^2) cv2 filter pairs). Here the
whole eval batch is scored in one jitted call:

- every windowed statistic is a depthwise conv over NHWC stacks
- band-pair Q-indices (D_lambda) are vectorised by stacking all pairs
  into the channel axis — one conv instead of C*(C-1) filter calls
- everything returns per-image values [B]; means/stds happen host-side

Also provides the *differentiable, global-statistics* Q-index family
used by the QNR training loss (reference: models/base/metrics.py:336-397
`QIndex_torch`/`D_lambda_torch`/`D_s_torch`), with the same eps=1e-8.

Numerical note: computations run in float32 on TPU; unit tests compare
against the float64 host oracle (numpy_ref.py) with appropriate
tolerances.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from lgteun_tpu.metrics.numpy_ref import DYNAMIC_RANGE, mtf_kernel
from lgteun_tpu.ops.filters import depthwise_conv2d

__all__ = [
    "psnr_batch", "ssim_batch", "qindex_batch", "sam_batch", "ergas_batch",
    "d_lambda_batch", "d_s_batch",
    "ref_evaluate_batch", "no_ref_evaluate_batch",
    "qindex_global", "d_lambda_global", "d_s_global",
]

_EPS64 = float(np.finfo(np.float64).eps)


# ---------------------------------------------------------------------------
# full-reference, batched
# ---------------------------------------------------------------------------

def psnr_batch(pred: jnp.ndarray, gt: jnp.ndarray,
               dynamic_range: float = DYNAMIC_RANGE) -> jnp.ndarray:
    """[B,H,W,C] -> [B]; inf-free variant returns large dB on zero mse."""
    mse = jnp.mean((pred - gt) ** 2, axis=(1, 2, 3))
    mse = jnp.maximum(mse, 1e-10)
    return 20.0 * jnp.log10(dynamic_range / (jnp.sqrt(mse) + _EPS64))


def sam_batch(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    dot = jnp.sum(pred * gt, axis=-1)
    na = jnp.sqrt(jnp.sum(pred * pred, axis=-1))
    nb = jnp.sqrt(jnp.sum(gt * gt, axis=-1))
    cos = jnp.clip(dot / (na * nb + _EPS64), 0.0, 1.0)
    return jnp.mean(jnp.arccos(cos), axis=(1, 2))


def ergas_batch(pred: jnp.ndarray, gt: jnp.ndarray, scale: int = 4) -> jnp.ndarray:
    means = jnp.mean(gt, axis=(1, 2))
    mses = jnp.mean((pred - gt) ** 2, axis=(1, 2))
    return 100.0 / scale * jnp.sqrt(jnp.mean(mses / (means**2 + _EPS64), axis=-1))


def _filter_valid_nhwc(x: jnp.ndarray, window: np.ndarray,
                       c0: int, c1: int) -> jnp.ndarray:
    """reflect-101 correlate + the reference's valid crop, on NHWC."""
    kh, kw = window.shape
    anchor_h, anchor_w = kh // 2, kw // 2
    pads = [(0, 0), (anchor_h, kh - 1 - anchor_h), (anchor_w, kw - 1 - anchor_w), (0, 0)]
    xp = jnp.pad(x, pads, mode="reflect")
    y = depthwise_conv2d(xp, jnp.asarray(window, x.dtype), padding="VALID")
    return y[:, c0:-c1, c0:-c1, :]


def _windowed_stats(a, b, window, c0, c1):
    mu1 = _filter_valid_nhwc(a, window, c0, c1)
    mu2 = _filter_valid_nhwc(b, window, c0, c1)
    s1 = _filter_valid_nhwc(a * a, window, c0, c1) - mu1 * mu1
    s2 = _filter_valid_nhwc(b * b, window, c0, c1) - mu2 * mu2
    s12 = _filter_valid_nhwc(a * b, window, c0, c1) - mu1 * mu2
    return mu1, mu2, s1, s2, s12


def _uqi_map(mu1, mu2, s1, s2, s12):
    """Piecewise universal-quality-index map (reference metrics.py:101-112)."""
    mu12 = mu1 * mu2
    mu_sum = mu1 * mu1 + mu2 * mu2
    var_sum = s1 + s2
    qmap = jnp.ones_like(s12)
    qmap = jnp.where((var_sum < 1e-8) & (mu_sum > 1e-8), 2 * mu12 / mu_sum, qmap)
    qmap = jnp.where((var_sum > 1e-8) & (mu_sum < 1e-8), 2 * s12 / var_sum, qmap)
    qmap = jnp.where((var_sum > 1e-8) & (mu_sum > 1e-8),
                     (4 * mu12 * s12) / (mu_sum * var_sum), qmap)
    return qmap


def qindex_pairs(a: jnp.ndarray, b: jnp.ndarray, block_size: int = 8) -> jnp.ndarray:
    """Per-channel Q-index of paired NHWC stacks -> [B, C]."""
    window = np.ones((block_size, block_size), np.float64) / block_size**2
    c0 = block_size // 2
    c1 = block_size - 1 - c0
    stats = _windowed_stats(a, b, window, c0, c1)
    return jnp.mean(_uqi_map(*stats), axis=(1, 2))


def qindex_batch(pred: jnp.ndarray, gt: jnp.ndarray,
                 block_size: int = 8) -> jnp.ndarray:
    """[B,H,W,C] -> [B] (mean over bands; reference metrics.py:116-126)."""
    return jnp.mean(qindex_pairs(pred, gt, block_size), axis=-1)


@functools.lru_cache(maxsize=None)
def _ssim_window_np() -> np.ndarray:
    x = np.arange(11, dtype=np.float64) - 5.0
    k = np.exp(-(x * x) / (2.0 * 1.5 * 1.5))
    k /= k.sum()
    return np.outer(k, k)


def ssim_batch(pred: jnp.ndarray, gt: jnp.ndarray,
               dynamic_range: float = DYNAMIC_RANGE) -> jnp.ndarray:
    """[B,H,W,C] -> [B] Gaussian SSIM, valid crop [5:-5]
    (reference metrics.py:129-163)."""
    c1 = (0.01 * dynamic_range) ** 2
    c2 = (0.03 * dynamic_range) ** 2
    mu1, mu2, s1, s2, s12 = _windowed_stats(pred, gt, _ssim_window_np(), 5, 5)
    num = (2 * mu1 * mu2 + c1) * (2 * s12 + c2)
    den = (mu1 * mu1 + mu2 * mu2 + c1) * (s1 + s2 + c2)
    return jnp.mean(num / den, axis=(1, 2, 3))


def ref_evaluate_batch(pred: jnp.ndarray, gt: jnp.ndarray,
                       dynamic_range: float = DYNAMIC_RANGE) -> dict:
    """Batched [PSNR, SSIM, Q, SAM, ERGAS]; inputs in the denormalised
    [0, dynamic_range] domain like the reference's eval loop
    (reference base_model.py:311-334)."""
    return {
        "psnr": psnr_batch(pred, gt, dynamic_range),
        "ssim": ssim_batch(pred, gt, dynamic_range),
        "qindex": qindex_batch(pred, gt),
        "sam": sam_batch(pred, gt),
        "ergas": ergas_batch(pred, gt),
    }


# ---------------------------------------------------------------------------
# no-reference, batched
# ---------------------------------------------------------------------------

def _pair_indices(c: int) -> tuple[np.ndarray, np.ndarray]:
    iu = np.triu_indices(c, k=1)
    return iu[0], iu[1]


def d_lambda_batch(pred: jnp.ndarray, lrms: jnp.ndarray,
                   block_size: int = 32, p: int = 1) -> jnp.ndarray:
    """Spectral distortion [B] (reference metrics.py:271-295). All
    C*(C-1)/2 band pairs are evaluated in one conv by stacking pairs
    into the channel axis."""
    c = pred.shape[-1]
    ii, jj = _pair_indices(c)
    q_f = qindex_pairs(pred[..., ii], pred[..., jj], block_size)
    q_l = qindex_pairs(lrms[..., ii], lrms[..., jj], block_size)
    d = jnp.mean(jnp.abs(q_f - q_l) ** p, axis=-1)
    return d ** (1.0 / p)


def d_s_batch(pred: jnp.ndarray, lrms: jnp.ndarray, pan: jnp.ndarray,
              satellite: str = "QuickBird", scale: int = 4,
              block_size: int = 32, q: int = 1) -> jnp.ndarray:
    """Spatial distortion [B] (reference metrics.py:298-333). pan is
    [B,H,W,1]; its MTF degradation (QuickBird GNyqPan, edge-replicate
    correlate + nearest decimation) runs on device."""
    from lgteun_tpu.metrics.numpy_ref import _SAT_GNYQ

    gnyq_pan = _SAT_GNYQ[satellite][1]
    lowpass = mtf_kernel(gnyq_pan, scale, 41)
    # 'nearest' border == edge-replicate padding
    pads = [(0, 0), (20, 20), (20, 20), (0, 0)]
    pan_pad = jnp.pad(pan, pads, mode="edge")
    pan_lp = depthwise_conv2d(pan_pad, jnp.asarray(lowpass, pan.dtype),
                              padding="VALID")
    pan_lr = pan_lp[:, ::scale, ::scale, :]

    c = pred.shape[-1]
    pan_rep = jnp.broadcast_to(pan, pan.shape[:-1] + (c,))
    pan_lr_rep = jnp.broadcast_to(pan_lr, pan_lr.shape[:-1] + (c,))
    q_hr = qindex_pairs(pred, pan_rep, block_size)
    q_lr = qindex_pairs(lrms, pan_lr_rep, block_size)
    d = jnp.mean(jnp.abs(q_hr - q_lr) ** q, axis=-1)
    return d ** (1.0 / q)


def no_ref_evaluate_batch(pred: jnp.ndarray, lrms: jnp.ndarray,
                          pan: jnp.ndarray) -> dict:
    """Batched [D_lambda, D_s, QNR] (reference metrics.py:420-425)."""
    dl = d_lambda_batch(pred, lrms)
    ds = d_s_batch(pred, lrms, pan)
    return {"d_lambda": dl, "d_s": ds, "qnr": (1.0 - dl) * (1.0 - ds)}


# ---------------------------------------------------------------------------
# differentiable global-statistics variants (QNR loss support)
# ---------------------------------------------------------------------------

def qindex_global(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Whole-image Q index of [B,H,W] pairs -> scalar (mean over batch);
    matches `QIndex_torch` (reference metrics.py:336-355)."""
    ea = jnp.mean(a, axis=(1, 2))
    eb = jnp.mean(b, axis=(1, 2))
    ea2 = jnp.mean(a * a, axis=(1, 2))
    eb2 = jnp.mean(b * b, axis=(1, 2))
    eab = jnp.mean(a * b, axis=(1, 2))
    var_a = ea2 - ea * ea
    var_b = eb2 - eb * eb
    cov = eab - ea * eb
    return jnp.mean(4 * cov * ea * eb / ((var_a + var_b) * (ea**2 + eb**2) + eps))


def d_lambda_global(lrms: jnp.ndarray, pred: jnp.ndarray) -> jnp.ndarray:
    """Differentiable D_lambda over NHWC batches; matches
    `D_lambda_torch`'s double loop over ordered pairs
    (reference metrics.py:358-376)."""
    c = pred.shape[-1]
    total = 0.0
    for i in range(c):
        for j in range(c):
            if i != j:
                total = total + jnp.abs(
                    qindex_global(pred[..., i], pred[..., j])
                    - qindex_global(lrms[..., i], lrms[..., j]))
    return total / c / (c - 1)


def d_s_global(lrms: jnp.ndarray, pan: jnp.ndarray, lpan: jnp.ndarray,
               pred: jnp.ndarray) -> jnp.ndarray:
    """Differentiable D_s; matches `D_s_torch`
    (reference metrics.py:379-397). All inputs NHWC; pan/lpan have 1
    channel."""
    c = pred.shape[-1]
    total = 0.0
    for i in range(c):
        total = total + jnp.abs(
            qindex_global(pred[..., i], pan[..., 0])
            - qindex_global(lrms[..., i], lpan[..., 0]))
    return total / c
