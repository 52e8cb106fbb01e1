"""Classical-method parity tests against independent float64 oracles.

The oracles below re-derive the reference behavior with scipy/numpy
(reference: models/SFIM.py, models/GSA.py, models/Wavelet.py,
models/common/model_based_utils.py:36-68) so the JAX implementations
are validated end-to-end without cv2/pywt.
"""

import numpy as np
import pytest
from scipy import ndimage, signal

from lgteun_tpu.models.classical import gsa_fuse, sfim_fuse, wavelet_fuse
from lgteun_tpu.ops.interp23 import interp23_upsample
from lgteun_tpu.ops.wavelet import haar_dwt2, haar_waverec2, haar_wavedec2


# ---------------------------------------------------------------- oracles

_CDF23_HALF = 2.0 * np.array([
    0.5, 0.305334091185, 0.0, -0.072698593239, 0.0, 0.021809577942,
    0.0, -0.005192756653, 0.0, 0.000807762146, 0.0, -0.000060081482,
])
_CDF23 = np.concatenate([_CDF23_HALF[:0:-1], _CDF23_HALF])


def oracle_interp23(image_hwc, ratio):
    """Direct scipy transcription of the reference upsampler
    (model_based_utils.py:36-68)."""
    img = np.transpose(image_hwc, (2, 0, 1)).astype(np.float64)
    first = True
    for _ in range(int(np.log2(ratio))):
        b, r, c = img.shape
        up = np.zeros((b, 2 * r, 2 * c))
        if first:
            up[:, 1::2, 1::2] = img
            first = False
        else:
            up[:, 0::2, 0::2] = img
        for bb in range(b):
            t = up[bb]
            for j in range(t.shape[0]):
                t[j, :] = ndimage.correlate(t[j, :], _CDF23, mode="wrap")
            for k in range(t.shape[1]):
                t[:, k] = ndimage.correlate(t[:, k], _CDF23, mode="wrap")
            up[bb] = t
        img = up
    return np.transpose(img, (1, 2, 0))


def oracle_haar_dwt2(x):
    s = 1 / np.sqrt(2)
    a, b = x[0::2, :], x[1::2, :]
    lo, hi = (a + b) * s, (a - b) * s
    ll = (lo[:, 0::2] + lo[:, 1::2]) * s
    lh = (lo[:, 0::2] - lo[:, 1::2]) * s
    hl = (hi[:, 0::2] + hi[:, 1::2]) * s
    hh = (hi[:, 0::2] - hi[:, 1::2]) * s
    return ll, (lh, hl, hh)


def oracle_sfim(hs, pan):
    """Reference SFIM math (models/SFIM.py:21-58)."""
    M, N, _ = pan.shape
    m, n, C = hs.shape
    ratio = M // m
    u_hs = oracle_interp23(hs, ratio)
    k = ratio + 1 if ratio % 2 == 0 else ratio
    pan_t = np.tile(pan, (1, 1, C))
    pan_t = (pan_t - pan_t.mean(axis=(0, 1))) * (
        u_hs.std(axis=(0, 1), ddof=1) / pan_t.std(axis=(0, 1), ddof=1)
    ) + u_hs.mean(axis=(0, 1))
    kernel = np.ones((k, k)) / k**2
    out = np.zeros((M, N, C))
    for i in range(C):
        lrpan = signal.convolve2d(pan_t[:, :, i], kernel, mode="same",
                                  boundary="wrap")
        out[:, :, i] = u_hs[:, :, i] * pan_t[:, :, i] / (lrpan + 1e-8)
    return np.clip(out, 0, 1)


def oracle_gsa(hs, pan, image_hr0):
    """Reference GSA math (models/GSA.py:49-119); `image_hr0` (the
    downsampled centred PAN) is injected so the resize convention is
    tested separately."""
    M, N, _ = pan.shape
    m, n, C = hs.shape
    ratio = M // m
    u_hs = oracle_interp23(hs, ratio)
    means = u_hs.mean(axis=(0, 1))
    image_lr = u_hs - means
    image_lr_lp = hs - hs.mean(axis=(0, 1))
    image_hr = pan - pan.mean()
    design = np.concatenate([image_lr_lp.reshape(-1, C), np.ones((m * n, 1))], 1)
    alpha = np.linalg.lstsq(design, image_hr0.reshape(-1, 1), rcond=None)[0]
    I = np.concatenate([image_lr.reshape(-1, C), np.ones((M * N, 1))], 1) @ alpha
    I = I.reshape(M, N, 1)
    I0 = I - I.mean()
    g = []
    for i in range(C):
        cov = np.cov(I0.ravel(), image_lr[:, :, i].ravel(), ddof=1)[0, 1]
        g.append(cov / np.var(I0))
    g = np.array(g)
    delta = image_hr - I0
    fused = image_lr + g[None, None, :] * delta
    fused = fused - fused.mean(axis=(0, 1)) + means
    return np.clip(fused, 0, 1)


# ----------------------------------------------------------------- tests

def test_interp23_matches_oracle(rng):
    x = rng.uniform(0, 1, size=(8, 8, 3))
    got = np.asarray(interp23_upsample(x, 4))
    want = oracle_interp23(x, 4)
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_haar_level1_matches_oracle(rng):
    x = rng.standard_normal((16, 16))
    ll, (lh, hl, hh) = haar_dwt2(x)
    oll, (olh, ohl, ohh) = oracle_haar_dwt2(x)
    np.testing.assert_allclose(np.asarray(ll), oll, atol=1e-12)
    np.testing.assert_allclose(np.asarray(lh), olh, atol=1e-12)
    np.testing.assert_allclose(np.asarray(hl), ohl, atol=1e-12)
    np.testing.assert_allclose(np.asarray(hh), ohh, atol=1e-12)


def test_haar_perfect_reconstruction(rng):
    x = rng.standard_normal((1, 3, 32, 32))
    coeffs = haar_wavedec2(x, level=2)
    rec = haar_waverec2(coeffs)
    np.testing.assert_allclose(np.asarray(rec), x, atol=1e-10)


def test_sfim_matches_oracle(rng):
    hs = rng.uniform(0.1, 0.9, size=(8, 8, 4))
    pan = rng.uniform(0.1, 0.9, size=(32, 32, 1))
    got = np.asarray(sfim_fuse(hs[None], pan[None]))[0]
    want = oracle_sfim(hs, pan)
    np.testing.assert_allclose(got, want, atol=1e-8)


def test_gsa_matches_oracle(rng):
    hs = rng.uniform(0.1, 0.9, size=(8, 8, 4))
    pan = rng.uniform(0.1, 0.9, size=(32, 32, 1))
    got = np.asarray(gsa_fuse(hs[None], pan[None]))[0]
    # oracle with the same bicubic downsample convention as the impl
    from lgteun_tpu.ops.resize import resize_bicubic
    image_hr = pan - pan.mean()
    image_hr0 = np.asarray(resize_bicubic(image_hr, (8, 8), align_corners=False))
    want = oracle_gsa(hs, pan, image_hr0)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_wavelet_fuse_properties(rng):
    """Wavelet substitution: if PAN == a band's own interp23 upsample,
    that band reconstructs to the upsample exactly."""
    hs = rng.uniform(0.2, 0.8, size=(8, 8, 1))
    u = oracle_interp23(hs, 4)
    pan = u[:, :, :1]
    got = np.asarray(wavelet_fuse(hs[None], pan[None]))[0]
    np.testing.assert_allclose(got, np.clip(u, 0, 1), atol=1e-8)


def test_wavelet_fuse_matches_manual_substitution(rng):
    hs = rng.uniform(0.1, 0.9, size=(8, 8, 2))
    pan = rng.uniform(0.1, 0.9, size=(32, 32, 1))
    got = np.asarray(wavelet_fuse(hs[None], pan[None]))[0]
    u_hs = oracle_interp23(hs, 4)
    # manual: pan details + band approximation, per band
    for b in range(2):
        pc = haar_wavedec2(pan[None, :, :, 0][None], level=2)
        bc = haar_wavedec2(u_hs[None, :, :, b][None], level=2)
        rec = np.asarray(haar_waverec2([bc[0]] + pc[1:]))[0, 0]
        np.testing.assert_allclose(got[..., b], np.clip(rec, 0, 1), atol=1e-8)


def test_classical_shapes_and_ranges(rng):
    hs = rng.uniform(0, 1, size=(2, 8, 8, 4)).astype(np.float32)
    pan = rng.uniform(0, 1, size=(2, 32, 32, 1)).astype(np.float32)
    for fn in (sfim_fuse, gsa_fuse, wavelet_fuse):
        out = np.asarray(fn(hs, pan))
        assert out.shape == (2, 32, 32, 4)
        assert out.min() >= 0.0 and out.max() <= 1.0
