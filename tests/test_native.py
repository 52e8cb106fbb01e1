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


def _tag_offset(blob: bytes, tag: int) -> int:
    """Byte offset of an IFD entry for `tag` in a little-endian TIFF."""
    ifd = int.from_bytes(blob[4:8], "little")
    n = int.from_bytes(blob[ifd:ifd + 2], "little")
    for i in range(n):
        e = ifd + 2 + 12 * i
        if int.from_bytes(blob[e:e + 2], "little") == tag:
            return e
    raise AssertionError(f"tag {tag} not found")


@needs_native
def test_native_rejects_oversized_strip_count(tmp_path, rng):
    """strip_counts > h*w*c used to overflow the caller's heap buffer."""
    arr = rng.integers(0, 2047, size=(4, 4, 1)).astype(np.uint16)
    p = tmp_path / "evil.tif"
    write_tiff(str(p), arr)
    blob = bytearray(p.read_bytes())
    e = _tag_offset(bytes(blob), 279)  # StripByteCounts, inline value
    blob[e + 8:e + 12] = (2 ** 20).to_bytes(4, "little")
    p.write_bytes(bytes(blob))
    # Must fail or return the clamped image; must never crash.
    out = read_tiff_native(str(p))
    assert out is None or out.shape == (4, 4)


@needs_native
def test_native_rejects_out_of_line_offset_past_eof(tmp_path, rng):
    """IFD out-of-line value offsets beyond EOF used to be OOB reads."""
    arr = rng.integers(0, 2047, size=(8, 8, 8)).astype(np.uint16)
    p = tmp_path / "evil2.tif"
    write_tiff(str(p), arr)
    blob = bytearray(p.read_bytes())
    # BitsPerSample for c=8 is out-of-line (8 shorts): point it past EOF.
    e = _tag_offset(bytes(blob), 258)
    blob[e + 8:e + 12] = (len(blob) + 4096).to_bytes(4, "little")
    p.write_bytes(bytes(blob))
    assert read_tiff_native(str(p)) is None


@needs_native
def test_native_rejects_truncated_file(tmp_path, rng):
    arr = rng.integers(0, 2047, size=(16, 16, 4)).astype(np.uint16)
    p = tmp_path / "trunc.tif"
    write_tiff(str(p), arr)
    blob = p.read_bytes()
    p.write_bytes(blob[: len(blob) // 3])
    assert read_tiff_native(str(p)) is None


@needs_native
def test_native_batch_rejects_shape_mismatch(tmp_path, rng):
    """A tile bigger than the declared batch shape must error, not
    overflow the worker's temp buffer."""
    small = rng.integers(0, 2047, size=(8, 8, 4)).astype(np.uint16)
    big = rng.integers(0, 2047, size=(32, 32, 4)).astype(np.uint16)
    p0 = str(tmp_path / "a.tif")
    p1 = str(tmp_path / "b.tif")
    write_tiff(p0, small)
    write_tiff(p1, big)
    assert read_batch_native([p0, p1], (8, 8, 4), threads=2) is None


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
