"""cv2-semantics filter tests.

cv2 itself is not installed; oracles are scipy.ndimage (mode='mirror'
== BORDER_REFLECT_101) and hand-checked constants. pyr_down is compared
against scipy correlate + decimation, the documented definition of
cv2.pyrDown.
"""

import numpy as np
from scipy import ndimage

from lgteun_tpu.ops.filters import (
    box_filter,
    filter2d_reflect101,
    gaussian_kernel_1d,
    pyr_down,
)


def test_gaussian_kernel_values():
    # cv2.getGaussianKernel(11, 1.5) canonical values (symmetric,
    # normalized); spot-check center and symmetry.
    k = gaussian_kernel_1d(11, 1.5)
    assert abs(k.sum() - 1.0) < 1e-12
    np.testing.assert_allclose(k, k[::-1])
    x = np.arange(11) - 5.0
    ref = np.exp(-(x**2) / (2 * 1.5**2))
    ref /= ref.sum()
    np.testing.assert_allclose(k, ref, atol=1e-12)


def test_filter2d_odd_kernel_matches_scipy_mirror(rng):
    img = rng.standard_normal((16, 16), dtype=np.float64)
    k1 = gaussian_kernel_1d(11, 1.5)
    kernel = np.outer(k1, k1)
    got = np.asarray(filter2d_reflect101(img[None, :, :, None], kernel))[0, :, :, 0]
    want = ndimage.correlate(img, kernel, mode="mirror")
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_box_filter_even_kernel_interior(rng):
    """8x8 box filter: interior values must equal plain local means with
    cv2's even-kernel anchor (pad 4 before, 3 after)."""
    img = rng.standard_normal((20, 20), dtype=np.float64)
    got = np.asarray(box_filter(img[None, :, :, None], 8))[0, :, :, 0]
    # interior pixel (i, j) covers img[i-4:i+4, j-4:j+4]
    for i, j in [(8, 8), (10, 5), (6, 12)]:
        want = img[i - 4:i + 4, j - 4:j + 4].mean()
        np.testing.assert_allclose(got[i, j], want, atol=1e-6)


def test_pyr_down_matches_definition(rng):
    img = rng.standard_normal((32, 32), dtype=np.float64)
    got = np.asarray(pyr_down(img[None, :, :, None]))[0, :, :, 0]
    k = np.array([1, 4, 6, 4, 1]) / 16.0
    kernel = np.outer(k, k)
    blurred = ndimage.correlate(img, kernel, mode="mirror")
    want = blurred[::2, ::2]
    np.testing.assert_allclose(got, want, atol=1e-6)
    assert got.shape == (16, 16)


def test_get_lp_hp_matches_torch(rng):
    import torch
    import torch.nn.functional as F
    from lgteun_tpu.ops.filters import get_hp, get_lp

    x = rng.standard_normal((2, 16, 16, 3)).astype(np.float64)
    t = torch.from_numpy(np.moveaxis(x, -1, 1).copy())
    want_lp = np.moveaxis(F.avg_pool2d(t, 5, stride=1, padding=2).numpy(), 1, -1)
    got_lp = np.asarray(get_lp(x))
    np.testing.assert_allclose(got_lp, want_lp, atol=1e-10)
    np.testing.assert_allclose(np.asarray(get_hp(x)), x - want_lp, atol=1e-10)


def test_channel_pooling_and_grad(rng):
    from lgteun_tpu.ops.filters import calc_img_grad, channel_pooling

    x = rng.standard_normal((2, 8, 8, 4))
    np.testing.assert_allclose(np.asarray(channel_pooling(x, "avg")),
                               x.mean(-1, keepdims=True))
    np.testing.assert_allclose(np.asarray(channel_pooling(x, "max")),
                               x.max(-1, keepdims=True))
    g = np.asarray(calc_img_grad(x))
    want = (np.abs(x[:, :-1, :-1] - x[:, 1:, :-1])
            + np.abs(x[:, :-1, :-1] - x[:, :-1, 1:])) / 2
    np.testing.assert_allclose(g, want)
