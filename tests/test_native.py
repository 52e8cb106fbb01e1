"""Native (C++) TIFF codec vs the pure-Python format authority."""

import numpy as np
import pytest

from lgteun_tpu.data.tiff import read_tiff, write_tiff
from lgteun_tpu.native import (
    get_lib,
    read_batch_native,
    read_tiff_native,
    write_tiff_native,
)

needs_native = pytest.mark.skipif(get_lib() is None,
                                  reason="native toolchain unavailable")


@needs_native
@pytest.mark.parametrize("shape", [(16, 16), (16, 16, 4), (8, 8, 8)])
def test_native_reads_python_written(tmp_path, rng, shape):
    arr = rng.integers(0, 2047, size=shape).astype(np.uint16)
    p = str(tmp_path / "x.tif")
    write_tiff(p, arr)
    back = read_tiff_native(p)
    np.testing.assert_array_equal(back.reshape(shape), arr.reshape(shape))


@needs_native
@pytest.mark.parametrize("shape", [(16, 16), (12, 10, 4)])
def test_python_reads_native_written(tmp_path, rng, shape):
    arr = rng.integers(0, 2047, size=shape).astype(np.uint16)
    p = str(tmp_path / "y.tif")
    assert write_tiff_native(p, arr)
    back = read_tiff(p)
    np.testing.assert_array_equal(back.reshape(shape), arr.reshape(shape))


@needs_native
def test_native_batch_decode_normalised(tmp_path, rng):
    paths = []
    arrays = []
    for i in range(6):
        arr = rng.integers(0, 2047, size=(8, 8, 4)).astype(np.uint16)
        p = str(tmp_path / f"t{i}.tif")
        write_tiff(p, arr)
        paths.append(p)
        arrays.append(arr)
    scale = 1.0 / 2047.5
    out = read_batch_native(paths, (8, 8, 4), scale=scale, threads=4)
    assert out is not None and out.shape == (6, 8, 8, 4)
    for i, arr in enumerate(arrays):
        np.testing.assert_allclose(out[i], arr.astype(np.float32) * scale,
                                   rtol=1e-6)
