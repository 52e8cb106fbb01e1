"""Metric suite tests.

Layer 1: the float64 host oracle against analytic values and torch
reimplementations of the reference's differentiable metrics.
Layer 2: the batched on-device JAX metrics against the host oracle.
"""

import numpy as np
import pytest
import torch

from lgteun_tpu.metrics import numpy_ref as M
from lgteun_tpu.metrics import jax_metrics as JM


def _fake_pair(rng, c=4, h=64, w=64):
    gt = rng.uniform(0.0, 2047.5, size=(h, w, c))
    pred = np.clip(gt + rng.normal(0, 40.0, size=(h, w, c)), 0, 2047.5)
    return pred, gt


# ---------------------------------------------------------------- oracle

def test_identical_images_are_perfect(rng):
    img = rng.uniform(0, 2047.5, size=(32, 32, 4))
    assert M.psnr(img, img) == float("inf")
    assert abs(M.ssim(img, img) - 1.0) < 1e-9
    assert abs(M.qindex(img, img) - 1.0) < 1e-9
    assert M.sam(img, img) < 1e-6
    assert M.ergas(img, img) < 1e-9
    assert abs(M.scc(img, img) - 1.0) < 1e-9


def test_psnr_analytic(rng):
    gt = rng.uniform(0, 2047.5, size=(16, 16, 3))
    pred = gt + 10.0  # constant offset -> mse=100
    want = 20 * np.log10(2047.5 / 10.0)
    assert abs(M.psnr(pred, gt) - want) < 1e-9


def test_sam_analytic():
    # pred = gt scaled per-pixel -> angle 0; orthogonal vectors -> pi/2
    gt = np.zeros((2, 2, 2))
    gt[..., 0] = 1.0
    pred = np.zeros((2, 2, 2))
    pred[..., 1] = 1.0
    assert abs(M.sam(pred, gt) - np.pi / 2) < 1e-6
    assert M.sam(3.0 * gt, gt) < 1e-6


def test_ergas_analytic():
    gt = np.full((8, 8, 2), 100.0)
    pred = gt + 5.0
    # per-band: mse=25, mean=100 -> 100/4*sqrt(25/10000)=100/4*0.05
    assert abs(M.ergas(pred, gt) - 100 / 4 * 0.05) < 1e-9


def test_global_qindex_matches_torch_reference(rng):
    """qindex_global == the reference's QIndex_torch formula
    (reference metrics.py:336-355), evaluated here with torch as a
    cross-implementation check."""
    a = rng.uniform(0, 1, size=(3, 32, 32)).astype(np.float32)
    b = rng.uniform(0, 1, size=(3, 32, 32)).astype(np.float32)

    ta, tb = torch.from_numpy(a), torch.from_numpy(b)
    ea, eb = ta.mean(dim=(1, 2)), tb.mean(dim=(1, 2))
    ea2, eb2 = (ta * ta).mean(dim=(1, 2)), (tb * tb).mean(dim=(1, 2))
    eab = (ta * tb).mean(dim=(1, 2))
    va, vb, cab = ea2 - ea * ea, eb2 - eb * eb, eab - ea * eb
    want = float(torch.mean(4 * cab * ea * eb / ((va + vb) * (ea**2 + eb**2) + 1e-8)))

    got = float(JM.qindex_global(a, b))
    assert abs(got - want) < 1e-5


# ------------------------------------------------------- jax vs oracle

def test_ref_evaluate_batch_matches_oracle(rng):
    preds, gts = [], []
    for _ in range(3):
        p, g = _fake_pair(rng)
        preds.append(p)
        gts.append(g)
    pred_b = np.stack(preds).astype(np.float32)
    gt_b = np.stack(gts).astype(np.float32)

    out = {k: np.asarray(v) for k, v in JM.ref_evaluate_batch(pred_b, gt_b).items()}
    for i in range(3):
        want = M.ref_evaluate(preds[i], gts[i])
        np.testing.assert_allclose(out["psnr"][i], want[0], rtol=1e-4)
        np.testing.assert_allclose(out["ssim"][i], want[1], rtol=1e-4)
        np.testing.assert_allclose(out["qindex"][i], want[2], rtol=1e-3)
        np.testing.assert_allclose(out["sam"][i], want[3], rtol=1e-3)
        np.testing.assert_allclose(out["ergas"][i], want[4], rtol=1e-4)


@pytest.mark.slow
def test_no_ref_evaluate_batch_matches_oracle(rng):
    h, c = 128, 4
    pred = rng.uniform(0, 1, size=(2, h, h, c))
    lrms = rng.uniform(0, 1, size=(2, h // 4, h // 4, c))
    pan = rng.uniform(0, 1, size=(2, h, h, 1))
    # smooth the data so the metric is not at a piecewise threshold
    out = {k: np.asarray(v)
           for k, v in JM.no_ref_evaluate_batch(
               pred.astype(np.float32), lrms.astype(np.float32),
               pan.astype(np.float32)).items()}
    for i in range(2):
        want = M.no_ref_evaluate(pred[i], pan[i, ..., 0], lrms[i])
        np.testing.assert_allclose(out["d_lambda"][i], want[0], atol=2e-4)
        np.testing.assert_allclose(out["d_s"][i], want[1], atol=2e-4)
        np.testing.assert_allclose(out["qnr"][i], want[2], atol=4e-4)


def test_mtf_kernel_properties():
    k = M.mtf_kernel(0.15, 4, 41)
    assert k.shape == (41, 41)
    assert abs(k.sum() - 1.0) < 1e-12
    # symmetric lowpass
    np.testing.assert_allclose(k, k[::-1, :], atol=1e-12)
    np.testing.assert_allclose(k, k[:, ::-1], atol=1e-12)
