"""Data layer tests: TIFF codec round-trips, synthetic generator
contract, dataset scanning, pipeline batching/normalisation."""

import numpy as np
import pytest

from lgteun_tpu.data.dataset import PSDataset
from lgteun_tpu.data.pipeline import (
    data_denormalize,
    data_normalize,
    eval_batches,
    train_iterator,
)
from lgteun_tpu.data.synthetic import make_synthetic_dataset, make_synthetic_scene
from lgteun_tpu.data.tiff import read_tiff, write_tiff


@pytest.mark.parametrize("shape,dtype", [
    ((16, 16), np.uint16),
    ((16, 16, 4), np.uint16),
    ((8, 8, 8), np.uint16),
    ((16, 16, 3), np.uint8),
    ((16, 16, 2), np.float32),
])
def test_tiff_roundtrip(tmp_path, rng, shape, dtype):
    if np.issubdtype(dtype, np.floating):
        arr = rng.uniform(0, 1, size=shape).astype(dtype)
    else:
        arr = rng.integers(0, np.iinfo(dtype).max, size=shape).astype(dtype)
    p = str(tmp_path / "t.tif")
    write_tiff(p, arr, dtype=dtype)
    back = read_tiff(p)
    if len(shape) == 3 and shape[2] == 1:
        back = back[:, :, None]
    np.testing.assert_array_equal(back.reshape(shape), arr)
    assert back.dtype == dtype


def test_geotiff_tags(tmp_path, rng):
    """geo=REFERENCE_GEO must write the reference's fake georeference
    (dataset/utils.py:42-72): a ModelTransformationTag holding the
    south-up geotransform and a GeoKeyDirectoryTag declaring
    geographic EPSG:4326 — while the pixel payload and every reader
    (python + native) stay unaffected."""
    import struct

    from lgteun_tpu.data.tiff import REFERENCE_GEO
    from lgteun_tpu.data.tiff import _read_entry_values

    arr = rng.integers(0, 2047, size=(16, 16, 4)).astype(np.uint16)
    p = str(tmp_path / "geo.tif")
    write_tiff(p, arr, geo=REFERENCE_GEO)
    np.testing.assert_array_equal(read_tiff(p), arr)

    with open(p, "rb") as f:
        data = f.read()
    (ifd_offset,) = struct.unpack("<I", data[4:8])
    (n,) = struct.unpack("<H", data[ifd_offset:ifd_offset + 2])
    tags = {}
    for i in range(n):
        off = ifd_offset + 2 + 12 * i
        tag, values = _read_entry_values(data, data[off:off + 12], "<")
        tags[tag] = values

    gt, epsg = REFERENCE_GEO
    mat = tags[34264]  # ModelTransformationTag
    assert len(mat) == 16
    assert mat[0] == gt[1] and mat[3] == gt[0]   # pixel width, origin x
    assert mat[5] == gt[5] and mat[7] == gt[3]   # pixel height, origin y
    keys = tags[34735]  # GeoKeyDirectoryTag
    kv = {keys[4 + 4 * i]: keys[7 + 4 * i] for i in range(keys[3])}
    assert kv[1024] == 2      # geographic model
    assert kv[2048] == epsg   # EPSG:4326

    # native C++ batch decoder must skip the geo tags transparently
    from lgteun_tpu.native import read_tiff_native
    native = read_tiff_native(p)
    if native is not None:
        np.testing.assert_array_equal(native, arr)


def test_synthetic_scene_contract(rng):
    lr, pan, hr = make_synthetic_scene(rng, size=128, bands=4)
    assert lr.shape == (32, 32, 4)
    assert pan.shape == (128, 128)
    assert hr.shape == (128, 128, 4)
    for a in (lr, pan, hr):
        assert a.dtype == np.uint16
        assert a.max() <= 2047


def test_dataset_loading(tmp_path):
    dirs = make_synthetic_dataset(str(tmp_path), n_train=3, n_test=2, bands=4)
    ds = PSDataset([dirs["train"]], bit_depth=11, norm_input=True)
    assert len(ds) == 3
    s = ds[0]
    assert s["input_lr"].shape == (32, 32, 4)
    assert s["input_pan"].shape == (128, 128, 1)
    assert s["input_pan_l"].shape == (32, 32, 1)  # two pyrDowns: 128->32
    assert s["target"].shape == (128, 128, 4)
    assert 0.0 <= s["input_lr"].min() and s["input_lr"].max() <= 1.0
    assert ds.ms_chans == 4


def test_normalize_roundtrip(rng):
    x = rng.uniform(0, 2047, size=(2, 4, 4, 1)).astype(np.float32)
    b = data_normalize({"input_pan": x}, 11)
    assert b["input_pan"].max() <= 1.0
    back = data_denormalize(b["input_pan"], 11)
    np.testing.assert_allclose(back, x, rtol=1e-6)


def test_train_iterator_batches(tmp_path):
    dirs = make_synthetic_dataset(str(tmp_path), n_train=5, n_test=2, bands=4)
    ds = PSDataset([dirs["train"]], bit_depth=11)
    it = train_iterator(ds, batch_size=2, aug_dict={"ud_flip": 0.5, "lr_flip": 0.5})
    for _ in range(6):  # crosses an epoch boundary (5 samples, batch 2)
        batch = next(it)
        assert batch["input_lr"].shape == (2, 32, 32, 4)
        assert batch["target"].shape == (2, 128, 128, 4)
        assert batch["input_lr"].max() <= 1.0


def test_eval_batches_padding(tmp_path):
    dirs = make_synthetic_dataset(str(tmp_path), n_train=2, n_test=3, bands=4)
    ds = PSDataset([dirs["test"]], bit_depth=11)
    batches = list(eval_batches(ds, batch_size=2))
    assert len(batches) == 2
    (b0, n0), (b1, n1) = batches
    assert n0 == 2 and n1 == 1
    assert b1["input_lr"].shape[0] == 2  # padded to full batch
