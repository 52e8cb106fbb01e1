"""Self-contained baseline-TIFF codec (uint8/uint16/float, no deps).

The reference reads `.tif` rasters with tifffile and writes uint16
GTiffs through GDAL with a fake georeference (reference:
dataset/utils.py:29-39 `load_image`, :42-86 `save_image`). Neither
library exists in this environment, and the data contract is simple —
small uncompressed multispectral tiles — so the framework carries its
own codec:

- read: baseline TIFF, little/big endian, uncompressed (compression 1),
  contiguous planar config, single or multiple strips, 8/16/32-bit
  unsigned or 32-bit float samples. Returns [H, W] or [H, W, C] numpy.
- write: little-endian, uncompressed, single-strip, contiguous,
  uint16 by default (the reference's GDT_UInt16 convention), with
  [H, W] or [H, W, C] input.

A C++ fast path (lgteun_tpu/native) can decode batches in parallel for
the input pipeline; this module is the always-available fallback and
the format authority for tests.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["read_tiff", "write_tiff"]

_II = b"II"  # little-endian magic
_MM = b"MM"

# tag ids
_IMAGE_WIDTH = 256
_IMAGE_LENGTH = 257
_BITS_PER_SAMPLE = 258
_COMPRESSION = 259
_PHOTOMETRIC = 262
_STRIP_OFFSETS = 273
_SAMPLES_PER_PIXEL = 277
_ROWS_PER_STRIP = 278
_STRIP_BYTE_COUNTS = 279
_PLANAR_CONFIG = 284
_SAMPLE_FORMAT = 339

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8,
               11: 4, 12: 8}


def _read_entry_values(data: bytes, entry: bytes, bo: str):
    tag, typ, count = struct.unpack(bo + "HHI", entry[:8])
    size = _TYPE_SIZES.get(typ, 1) * count
    if size <= 4:
        raw = entry[8:8 + size]
    else:
        (offset,) = struct.unpack(bo + "I", entry[8:12])
        raw = data[offset:offset + size]
    fmt = {1: "B", 3: "H", 4: "I", 8: "h", 9: "i", 11: "f", 12: "d"}.get(typ)
    if fmt is None:
        return tag, ()
    values = struct.unpack(bo + fmt * count, raw)
    return tag, values


def read_tiff(path: str) -> np.ndarray:
    """Decode the first IFD of a baseline TIFF into [H,W] or [H,W,C]."""
    with open(path, "rb") as f:
        data = f.read()
    magic = data[:2]
    if magic == _II:
        bo = "<"
    elif magic == _MM:
        bo = ">"
    else:
        raise ValueError(f"{path}: not a TIFF file")
    (version,) = struct.unpack(bo + "H", data[2:4])
    if version != 42:
        raise ValueError(f"{path}: unsupported TIFF version {version}")
    (ifd_offset,) = struct.unpack(bo + "I", data[4:8])

    (n_entries,) = struct.unpack(bo + "H", data[ifd_offset:ifd_offset + 2])
    tags: dict[int, tuple] = {}
    for i in range(n_entries):
        off = ifd_offset + 2 + 12 * i
        tag, values = _read_entry_values(data, data[off:off + 12], bo)
        tags[tag] = values

    width = tags[_IMAGE_WIDTH][0]
    height = tags[_IMAGE_LENGTH][0]
    spp = tags.get(_SAMPLES_PER_PIXEL, (1,))[0]
    bits = tags.get(_BITS_PER_SAMPLE, (1,) * spp)
    compression = tags.get(_COMPRESSION, (1,))[0]
    planar = tags.get(_PLANAR_CONFIG, (1,))[0]
    sample_format = tags.get(_SAMPLE_FORMAT, (1,) * spp)

    if compression != 1:
        raise ValueError(f"{path}: only uncompressed TIFF supported "
                         f"(compression={compression})")
    if planar != 1:
        raise ValueError(f"{path}: only contiguous planar config supported")
    if len(set(bits)) != 1:
        raise ValueError(f"{path}: mixed bits-per-sample unsupported")
    bps = bits[0]
    sf = sample_format[0]
    dtype = {
        (1, 8): np.uint8, (1, 16): np.uint16, (1, 32): np.uint32,
        (2, 8): np.int8, (2, 16): np.int16, (2, 32): np.int32,
        (3, 32): np.float32, (3, 64): np.float64,
    }.get((sf, bps))
    if dtype is None:
        raise ValueError(f"{path}: unsupported sample format {sf}/{bps}bit")

    offsets = tags[_STRIP_OFFSETS]
    counts = tags[_STRIP_BYTE_COUNTS]
    raw = b"".join(data[o:o + c] for o, c in zip(offsets, counts))
    arr = np.frombuffer(raw, dtype=np.dtype(dtype).newbyteorder(bo))
    arr = arr.reshape(height, width, spp) if spp > 1 else arr.reshape(height, width)
    return np.ascontiguousarray(arr.astype(dtype))


def write_tiff(path: str, array: np.ndarray, dtype=np.uint16) -> None:
    """Encode [H,W] or [H,W,C] as a single-strip little-endian TIFF.

    Default uint16 matches the reference's output convention
    (reference dataset/utils.py:63 GDT_UInt16); float32 is also
    supported for lossless intermediate storage.
    """
    arr = np.asarray(array)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.ndim != 3:
        raise ValueError("array must be [H,W] or [H,W,C]")
    arr = arr.astype(dtype)
    h, w, c = arr.shape
    bps = arr.dtype.itemsize * 8
    sample_format = 3 if np.issubdtype(arr.dtype, np.floating) else 1
    payload = arr.tobytes()

    entries = []

    def entry(tag, typ, count, value_bytes):
        entries.append((tag, typ, count, value_bytes))

    def short(v):
        return struct.pack("<H", v) + b"\0\0"

    def long_(v):
        return struct.pack("<I", v)

    header_size = 8
    # layout: header | payload | bits-per-sample array (if c > 2) | IFD
    data_offset = header_size
    extra_offset = data_offset + len(payload)
    extra = b""
    if c > 2:
        bits_offset = extra_offset
        extra = struct.pack("<" + "H" * c, *([bps] * c))
        ifd_offset = extra_offset + len(extra)
        if ifd_offset % 2:
            extra += b"\0"
            ifd_offset += 1
        bits_value = long_(bits_offset)
        bits_count = c
        bits_inline = False
    else:
        ifd_offset = extra_offset
        bits_value = (struct.pack("<" + "H" * c, *([bps] * c)) + b"\0\0")[:4]
        bits_count = c
        bits_inline = True
    del bits_inline

    entry(_IMAGE_WIDTH, 4, 1, long_(w))
    entry(_IMAGE_LENGTH, 4, 1, long_(h))
    entry(_BITS_PER_SAMPLE, 3, bits_count, bits_value)
    entry(_COMPRESSION, 3, 1, short(1))
    entry(_PHOTOMETRIC, 3, 1, short(1))  # BlackIsZero
    entry(_STRIP_OFFSETS, 4, 1, long_(data_offset))
    entry(_SAMPLES_PER_PIXEL, 3, 1, short(c))
    entry(_ROWS_PER_STRIP, 4, 1, long_(h))
    entry(_STRIP_BYTE_COUNTS, 4, 1, long_(len(payload)))
    entry(_PLANAR_CONFIG, 3, 1, short(1))
    entry(_SAMPLE_FORMAT, 3, 1, short(sample_format))
    entries.sort(key=lambda e: e[0])

    ifd = struct.pack("<H", len(entries))
    for tag, typ, count, value in entries:
        ifd += struct.pack("<HHI", tag, typ, count) + value
    ifd += struct.pack("<I", 0)  # no next IFD

    with open(path, "wb") as f:
        f.write(_II + struct.pack("<H", 42) + struct.pack("<I", ifd_offset))
        f.write(payload)
        f.write(extra)
        f.write(ifd)
