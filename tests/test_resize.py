"""Torch-parity tests for the matmul-based resize ops.

These are the load-bearing parity tests (SURVEY.md §7 names resize the
single largest numerical-parity risk). Oracle: torch CPU
F.interpolate, which is what the reference uses at every resize site.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from lgteun_tpu.ops.resize import (
    downsample,
    resize_bicubic,
    resize_bilinear,
    sample_scale,
    upsample,
)


def _torch_resize(x_nhwc, out_hw, mode, align):
    t = torch.from_numpy(np.moveaxis(x_nhwc, -1, 1).copy())
    y = F.interpolate(t, size=out_hw, mode=mode, align_corners=align)
    return np.moveaxis(y.numpy(), 1, -1)


@pytest.mark.parametrize("align", [False, True])
@pytest.mark.parametrize(
    "in_hw,out_hw",
    [((32, 32), (128, 128)), ((128, 128), (32, 32)), ((64, 64), (128, 128)),
     ((128, 128), (64, 64)), ((17, 23), (40, 51))],
)
def test_bicubic_matches_torch(rng, align, in_hw, out_hw):
    x = rng.standard_normal((2, *in_hw, 3), dtype=np.float32)
    got = np.asarray(resize_bicubic(x, out_hw, align_corners=align))
    want = _torch_resize(x, out_hw, "bicubic", align)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("align", [False, True])
@pytest.mark.parametrize(
    "in_hw,out_hw", [((32, 32), (64, 64)), ((128, 128), (64, 64)), ((9, 11), (30, 14))]
)
def test_bilinear_matches_torch(rng, align, in_hw, out_hw):
    x = rng.standard_normal((2, *in_hw, 3), dtype=np.float32)
    got = np.asarray(resize_bilinear(x, out_hw, align_corners=align))
    want = _torch_resize(x, out_hw, "bilinear", align)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_up_down_sample_defaults(rng):
    """up_sample/down_sample parity: bicubic align_corners=True x4
    (reference models/base/utils.py:113-138)."""
    x = rng.standard_normal((1, 32, 32, 4), dtype=np.float32)
    got = np.asarray(upsample(x, 4))
    want = _torch_resize(x, (128, 128), "bicubic", True)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)

    y = rng.standard_normal((1, 128, 128, 4), dtype=np.float32)
    got = np.asarray(downsample(y, 4))
    want = _torch_resize(y, (32, 32), "bicubic", True)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("s", [4, 2, 0.5])
def test_sample_scale_matches_lgteun_sampling(rng, s):
    """`sampling_` parity: scale-factor bicubic align_corners=False
    (reference models/common/basic_module_unformer_v2.py:21-23)."""
    x = rng.standard_normal((2, 32, 32, 8), dtype=np.float32)
    got = np.asarray(sample_scale(x, s))
    t = torch.from_numpy(np.moveaxis(x, -1, 1).copy())
    y = F.interpolate(t, scale_factor=s, mode="bicubic", align_corners=False,
                      recompute_scale_factor=False)
    want = np.moveaxis(y.numpy(), 1, -1)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
