"""Per-sensor Wald-protocol degradation parity DIRECTLY against the
reference implementation.

Imports /root/reference/models/common/model_based_utils.py (via
tests/reference_shim) and asserts `lgteun_tpu.data.synthetic
.downgrade_images` reproduces `downgrade_images` (reference
model_based_utils.py:144-234) on every branch:

- default Gaussian branch (sensor=None)
- the 5-sensor MTF branch (QB / IKONOS / GeoEye1 / WV2 / WV3)
- the flag_PAN_MTF kernel branch (dead code in the reference — the
  flag is hard-coded 0 at :155 — exercised here by flipping the module
  global, vs our pan_mtf=True)

Two patches are required to RUN the reference's sensor branch at all:

1. `scipy.misc.imresize` (PAN bicubic path) was removed from scipy
   years ago; the test injects the historically-equivalent PIL
   float-mode bicubic (the same function our port uses — for that one
   sub-path the test proves "both sides call PIL identically").
2. model_based_utils' gaussian2d/kaiser2d carry Python-2 integer
   division (`-(N-1)/2`); under Python 3 they build a 42-point grid
   against np.kaiser's 41 points and crash in np.interp
   (`test_reference_sensor_branch_is_broken_on_py3` documents this).
   The reference's own metrics.py ships the corrected `//` versions
   (GNyq2win, metrics.py:190-236) — the test injects those, so the
   MS MTF path (the actual round-4 gap) is proven against the
   reference's own intended window construction.
"""

import sys
import types

import numpy as np
import pytest

sys.path.insert(0, "tests")

pytest.importorskip("cv2")

from reference_shim import install_stubs  # noqa: E402

from lgteun_tpu.data.synthetic import (  # noqa: E402
    SENSOR_GNYQ,
    _pil_imresize_bicubic,
    downgrade_images,
    make_synthetic_dataset,
    make_synthetic_scene,
)

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def ref_mbu():
    install_stubs()
    from models.base import metrics as RM
    from models.common import model_based_utils as MBU

    # scipy.misc.imresize is gone; give the reference the PIL-bicubic
    # it historically wrapped (signature: imresize(arr, scale, interp,
    # mode))
    MBU.misc = types.SimpleNamespace(
        imresize=lambda a, scale, interp, mode: _pil_imresize_bicubic(
            a, scale))
    # Python-3 break (see module docstring): swap in the reference's
    # own corrected window constructors from metrics.py
    MBU.gaussian2d = RM.gaussian2d
    MBU.kaiser2d = RM.kaiser2d
    return MBU


def test_reference_sensor_branch_is_broken_on_py3():
    """Documents the reference bug: unpatched, its sensor branch
    crashes under Python 3 (42-point grid vs 41-point Kaiser window in
    kaiser2d, model_based_utils.py:116-125). Loaded as an isolated
    module instance so the patched fixture copy is untouched."""
    import importlib.util
    import os

    install_stubs()
    from reference_shim import REFERENCE_ROOT

    spec = importlib.util.spec_from_file_location(
        "mbu_fresh_unpatched",
        os.path.join(REFERENCE_ROOT, "models", "common",
                     "model_based_utils.py"))
    fresh = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(fresh)
    rng = np.random.default_rng(0)
    ms, pan = _scene(rng, 64, 4)
    with pytest.raises(ValueError, match="same length"):
        fresh.downgrade_images(ms, pan, 4, sensor="QB")


def _scene(rng, size, bands):
    ms = rng.uniform(0, 2047.5, (size, size, bands))
    pan = rng.uniform(0, 2047.5, (size, size))
    return ms, pan


@pytest.mark.parametrize("sensor,bands", [
    (None, 4), (None, 8),
    ("QB", 4), ("IKONOS", 4), ("GeoEye1", 4), ("WV2", 8), ("WV3", 8),
])
def test_downgrade_matches_reference(ref_mbu, sensor, bands):
    rng = np.random.default_rng(hash((sensor, bands)) % 2**31)
    ms, pan = _scene(rng, 128, bands)
    ref_lr, ref_pan = ref_mbu.downgrade_images(ms, pan, 4, sensor=sensor)
    got_lr, got_pan = downgrade_images(ms, pan, 4, sensor=sensor)
    assert got_lr.shape == ref_lr.shape
    assert got_pan.shape == ref_pan.shape
    np.testing.assert_allclose(got_lr, ref_lr, rtol=0, atol=1e-9)
    np.testing.assert_allclose(got_pan, ref_pan, rtol=0, atol=1e-9)


def test_pan_mtf_branch_matches_reference(ref_mbu):
    """The reference's flag_PAN_MTF=1 kernel path (dead code there),
    exercised by rewriting the module constant."""
    import inspect
    import textwrap

    src = inspect.getsource(ref_mbu.downgrade_images)
    src = src.replace("flag_PAN_MTF = 0", "flag_PAN_MTF = 1")
    ns = dict(ref_mbu.__dict__)
    exec(textwrap.dedent(src), ns)  # noqa: S102 (test-only)
    ref_fn = ns["downgrade_images"]

    rng = np.random.default_rng(7)
    ms, pan = _scene(rng, 128, 8)
    ref_lr, ref_pan = ref_fn(ms, pan, 4, sensor="WV3")
    got_lr, got_pan = downgrade_images(ms, pan, 4, sensor="WV3",
                                       pan_mtf=True)
    np.testing.assert_allclose(got_lr, ref_lr, rtol=0, atol=1e-9)
    np.testing.assert_allclose(got_pan, ref_pan, rtol=0, atol=1e-9)


def test_unknown_sensor_raises():
    rng = np.random.default_rng(0)
    ms, pan = _scene(rng, 16, 4)
    with pytest.raises(KeyError, match="unknown sensor"):
        downgrade_images(ms, pan, 4, sensor="SPOT")
    with pytest.raises(ValueError, match="bands"):
        downgrade_images(np.zeros((16, 16, 8)), pan, 4, sensor="QB")


def test_sensor_scene_lr_matches_recipe():
    """make_synthetic_scene(sensor='WV3') must produce LrMS that is
    exactly the sensor-MTF degradation of its HrMS (uint16-rounded)."""
    rng = np.random.default_rng(42)
    lr, pan, hr = make_synthetic_scene(rng, 128, 8, sensor="WV3")
    assert lr.shape == (32, 32, 8) and hr.shape == (128, 128, 8)
    redo, _ = downgrade_images(hr.astype(np.float64), pan, 4, sensor="WV3")
    # hr was rounded to uint16 after lr was computed from the float
    # scene, so re-degrading the rounded hr differs by <= the rounding
    # amplification of a unit-sum kernel (~0.5)
    assert np.max(np.abs(redo - lr.astype(np.float64))) <= 1.0


def test_sensor_dataset_roundtrip(tmp_path):
    from lgteun_tpu.data.tiff import read_tiff

    dirs = make_synthetic_dataset(str(tmp_path), n_train=1, n_test=1,
                                  bands=8, sensor="WV3")
    lr = read_tiff(f"{dirs['train']}/train000_lr.tif")
    assert lr.shape == (32, 32, 8)
    assert lr.dtype == np.uint16
    assert 0 < lr.max() <= 2047


def test_gnyq_tables_match_reference_source():
    """The five GNyq tables, value- and dtype-exact vs the reference
    constants (model_based_utils.py:157-181; QB/IKONOS/GeoEye1 are
    float32 arrays there, WV2/WV3 float64)."""
    expected = {
        "QB": (np.asarray([0.34, 0.32, 0.30, 0.22], "float32"), 0.15),
        "IKONOS": (np.asarray([0.26, 0.28, 0.29, 0.28], "float32"), 0.17),
        "GeoEye1": (np.asarray([0.23] * 4, "float32"), 0.16),
        "WV2": (np.asarray([0.35] * 7 + [0.27]), 0.11),
        "WV3": (0.29 * np.ones(8), 0.15),
    }
    assert set(SENSOR_GNYQ) == set(expected)
    for name, (bands, pan) in expected.items():
        got_bands, got_pan = SENSOR_GNYQ[name]
        assert got_bands.dtype == bands.dtype, name
        np.testing.assert_array_equal(got_bands, bands, err_msg=name)
        assert got_pan == pan, name
