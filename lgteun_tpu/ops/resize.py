"""Separable image resizing with exact torch semantics, as MXU matmuls.

The reference mixes three resize conventions (SURVEY.md §7 "hard parts"):

- ``align_corners=False`` bicubic — used by LGTEUN's sampling units
  (reference: models/common/basic_module_unformer_v2.py:21-34) and
  MDCUN's bilinear resamplers (reference: models/MDCUN.py:348-360)
- ``align_corners=True`` bicubic — used by `up_sample`/`down_sample`
  (reference: models/base/utils.py:113-138) and by INNT/SFIIN/MutInf
- ``cv2.pyrDown`` Gaussian pyramid (see lgteun_tpu/ops/filters.py)

`jax.image.resize` matches *neither* torch convention (different cubic
``a`` coefficient and no index clamping), so we build the interpolation
weights ourselves.

TPU-first design: a separable resize of an ``[..., H, W]`` image is two
small dense matrix products ``out = M_h @ img @ M_w.T``. The weight
matrices are computed *at trace time* in float64 numpy (shapes are
static under jit), embedded as constants, and the application runs on
the MXU via einsum — there is no gather, no dynamic indexing, and XLA
fuses the pair of matmuls with surrounding elementwise work.

Torch parity details implemented here:
- cubic convolution kernel with ``a = -0.75`` (torch's value; cv2 uses
  the same, while jax.image uses a = -0.5)
- source coordinate for output pixel ``i``:
  * align_corners=False: ``(i + 0.5) / scale - 0.5``
  * align_corners=True:  ``i * (in - 1) / (out - 1)``
- 4-tap window ``floor(src)-1 .. floor(src)+2`` with indices clamped to
  the valid range (torch's border handling)
- no antialiasing (torch default for `F.interpolate`)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "resize_matrix",
    "resize_bicubic",
    "resize_bilinear",
    "upsample",
    "downsample",
]


def _cubic_kernel(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Cubic convolution kernel (Keys); torch/cv2 use a=-0.75."""
    ax = np.abs(x)
    ax2 = ax * ax
    ax3 = ax2 * ax
    w = np.where(
        ax <= 1.0,
        (a + 2.0) * ax3 - (a + 3.0) * ax2 + 1.0,
        np.where(ax < 2.0, a * ax3 - 5.0 * a * ax2 + 8.0 * a * ax - 4.0 * a, 0.0),
    )
    return w


def _linear_kernel(x: np.ndarray) -> np.ndarray:
    ax = np.abs(x)
    return np.where(ax < 1.0, 1.0 - ax, 0.0)


@functools.lru_cache(maxsize=None)
def resize_matrix(
    in_size: int,
    out_size: int,
    mode: str = "bicubic",
    align_corners: bool = False,
) -> np.ndarray:
    """Dense ``[out_size, in_size]`` interpolation matrix (float32).

    ``out = M @ signal`` reproduces torch ``F.interpolate`` along one
    axis. Cached per (in, out, mode, align) so repeated traces reuse it.
    """
    if mode == "bicubic":
        kernel, support = _cubic_kernel, 2
    elif mode == "bilinear":
        kernel, support = _linear_kernel, 1
    else:
        raise ValueError(f"unsupported mode {mode!r}")

    i = np.arange(out_size, dtype=np.float64)
    if align_corners:
        if out_size == 1:
            src = np.zeros(1, dtype=np.float64)
        else:
            src = i * (in_size - 1) / (out_size - 1)
    else:
        scale = out_size / in_size
        src = (i + 0.5) / scale - 0.5

    left = np.floor(src).astype(np.int64) - (support - 1)
    m = np.zeros((out_size, in_size), dtype=np.float64)
    for tap in range(2 * support):
        idx = left + tap
        w = kernel(src - idx)
        np.add.at(m, (np.arange(out_size), np.clip(idx, 0, in_size - 1)), w)
    # torch normalises the 4-tap cubic weights implicitly (they sum to 1
    # by construction); clamping duplicates border taps which preserves
    # the sum, so no renormalisation is required.
    return m.astype(np.float32)


def _apply_separable(x: jnp.ndarray, mh: np.ndarray, mw: np.ndarray) -> jnp.ndarray:
    """Apply per-axis matrices to [..., H, W, C] (NHWC) arrays."""
    dt = x.dtype
    mh_ = jnp.asarray(mh, dtype=jnp.float32)
    mw_ = jnp.asarray(mw, dtype=jnp.float32)
    # HIGHEST precision: these matmuls are parity-critical (0.05 dB PSNR
    # budget); on TPU the default bf16 MXU pass would cost ~2 decimal
    # digits. The matrices are tiny, so full-f32 passes are cheap.
    hp = jax.lax.Precision.HIGHEST
    y = jnp.einsum("oh,...hwc->...owc", mh_, x.astype(jnp.float32), precision=hp)
    y = jnp.einsum("pw,...owc->...opc", mw_, y, precision=hp)
    return y.astype(dt)


def resize_bicubic(
    x: jnp.ndarray,
    out_hw: tuple[int, int],
    align_corners: bool = False,
) -> jnp.ndarray:
    """Bicubic resize of NHWC (or HWC) image to ``out_hw``.

    Matches ``torch.nn.functional.interpolate(mode='bicubic')`` with the
    given align_corners (reference resize call sites cited in module
    docstring).
    """
    h, w = x.shape[-3], x.shape[-2]
    mh = resize_matrix(h, out_hw[0], "bicubic", align_corners)
    mw = resize_matrix(w, out_hw[1], "bicubic", align_corners)
    return _apply_separable(x, mh, mw)


def resize_bilinear(
    x: jnp.ndarray,
    out_hw: tuple[int, int],
    align_corners: bool = False,
) -> jnp.ndarray:
    """Bilinear resize of NHWC (or HWC) image to ``out_hw``."""
    h, w = x.shape[-3], x.shape[-2]
    mh = resize_matrix(h, out_hw[0], "bilinear", align_corners)
    mw = resize_matrix(w, out_hw[1], "bilinear", align_corners)
    return _apply_separable(x, mh, mw)


def upsample(x: jnp.ndarray, factor: int = 4, mode: str = "bicubic",
             align_corners: bool = True) -> jnp.ndarray:
    """×factor upsample; default matches `up_sample` (reference:
    models/base/utils.py:113-124: bicubic, align_corners=True)."""
    h, w = x.shape[-3], x.shape[-2]
    fn = resize_bicubic if mode == "bicubic" else resize_bilinear
    return fn(x, (h * factor, w * factor), align_corners)


def downsample(x: jnp.ndarray, factor: int = 4, mode: str = "bicubic",
               align_corners: bool = True) -> jnp.ndarray:
    """÷factor downsample; default matches `down_sample` (reference:
    models/base/utils.py:127-138: bicubic, align_corners=True)."""
    h, w = x.shape[-3], x.shape[-2]
    fn = resize_bicubic if mode == "bicubic" else resize_bilinear
    return fn(x, (h // factor, w // factor), align_corners)


def sample_scale_cm(x: jnp.ndarray, s_factor: float,
                    mode: str = "bicubic") -> jnp.ndarray:
    """`sample_scale` for channel-major [..., H, W] arrays."""
    h, w = x.shape[-2], x.shape[-1]
    out_hw = (int(np.floor(h * s_factor)), int(np.floor(w * s_factor)))
    mh = resize_matrix(h, out_hw[0], mode, False)
    mw = resize_matrix(w, out_hw[1], mode, False)
    dt = x.dtype
    hp = jax.lax.Precision.HIGHEST
    y = jnp.einsum("oh,...hw->...ow", jnp.asarray(mh, jnp.float32),
                   x.astype(jnp.float32), precision=hp)
    y = jnp.einsum("pw,...ow->...op", jnp.asarray(mw, jnp.float32), y,
                   precision=hp)
    return y.astype(dt)


def sample_scale(x: jnp.ndarray, s_factor: float, mode: str = "bicubic") -> jnp.ndarray:
    """LGTEUN's `sampling_` / `sampling_unit_`: scale-factor resize with
    align_corners=False (reference:
    models/common/basic_module_unformer_v2.py:21-34).

    Output size follows torch: floor(in * s_factor).
    """
    h, w = x.shape[-3], x.shape[-2]
    out_hw = (int(np.floor(h * s_factor)), int(np.floor(w * s_factor)))
    fn = resize_bicubic if mode == "bicubic" else resize_bilinear
    return fn(x, out_hw, align_corners=False)
