"""Whole-LGB-block megakernel vs the XLA composition.

The megakernel (ops/lgb_block_kernel.py) must reproduce the exact
block semantics of the three-kernel fast path: LN -> window MHSA +
spectral mixer -> proj + residual -> LN + FFN + residual (reference
models/common/LGT.py:222-248). The XLA reference `lgb_block_xla_cm`
is composed from the already-parity-tested per-stage XLA references.
Kernels run in interpreter mode on CPU (same code path Mosaic
compiles on TPU); tolerance covers the kernel's polynomial engines
(atan2/sincos/gelu/tanh-form exp, each <= ~5e-7).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lgteun_tpu.ops.lgb_block_kernel import (
    fused_lgb_block_cm,
    lgb_block_xla_cm,
    pack_mats,
)


def _blk_params(rng, c, heads=2, win=8):
    c2 = c // 2
    c4 = 4 * c
    n = lambda *s: jnp.asarray(rng.normal(size=s, scale=0.2), jnp.float32)
    conv = lambda ci, co: {"Conv_0": {"Conv_0": {
        "kernel": n(1, 1, ci, co), "bias": n(co)}}}
    return {
        "norm": {"scale": 1.0 + 0.1 * n(c), "bias": n(c)},
        "local": {
            "to_qkv_kernel": n(1, 1, c2, 3 * c2),
            "to_qkv_bias": n(3 * c2),
            "pos_emb": n(heads, win * win, win * win),
        },
        "global": {
            "amp_scale": n(1, 1, 1, c2), "amp_bias": n(c2),
            "pha_scale": n(1, 1, 1, c2), "pha_bias": n(c2),
        },
        "proj": conv(c, c),
        "ffn": {
            "ln_gamma": 1.0 + 0.1 * n(c), "ln_beta": n(c),
            "w1": n(c, c4), "b1": n(c4),
            "w2": n(c4, c4), "b2": n(c4),
            "dw": n(3, 3, c4), "bdw": n(c4),
            "w3": n(c4, c), "b3": n(c),
        },
    }


def test_pack_mats_permutation():
    """P is a permutation matrix and Pinv its exact inverse; the packed
    layout matches the v3 kernel's pair-major contract."""
    P, Pinv = pack_mats(8, 128)
    assert P.shape == (1024, 1024)
    np.testing.assert_array_equal(P.sum(0), np.ones(1024))
    np.testing.assert_array_equal(P.sum(1), np.ones(1024))
    np.testing.assert_array_equal(P @ Pinv, np.eye(1024))
    # token (r=0, col=0) of window 0 lands at pair 0, lane 0
    assert P[0, 0] == 1.0
    # token (r=0, col=8) (window 1 of pair 0) lands at lane 64
    assert P[8, 64] == 1.0


@pytest.mark.parametrize("c,h", [(8, 64), (16, 128)])
def test_megakernel_matches_xla_composition(rng, c, h):
    w = 128
    x = jnp.asarray(rng.normal(size=(2, c, h, w)), jnp.float32)
    blk = _blk_params(rng, c)
    want = np.asarray(lgb_block_xla_cm(x, blk))
    got = np.asarray(fused_lgb_block_cm(x, blk, interpret=True))
    err = np.max(np.abs(got - want))
    assert err < 3e-5, f"megakernel vs XLA composition: {err:.2e}"


def test_megakernel_bf16_storage(rng):
    """bf16 in/out refs: the kernel upcasts on load, computes f32, and
    rounds once on store — drift stays at the single-rounding level."""
    c, h, w = 8, 64, 128
    xf = jnp.asarray(rng.normal(size=(1, c, h, w)), jnp.float32)
    blk = _blk_params(rng, c)
    xb = xf.astype(jnp.bfloat16)
    # semantic contract: f32 math on the upcast input, one rounding at
    # the output store — so the oracle is the XLA composition fed the
    # SAME bf16-rounded input, and only the final store rounds.
    want = np.asarray(lgb_block_xla_cm(xb.astype(jnp.float32), blk))
    got = np.asarray(fused_lgb_block_cm(xb, blk,
                                        interpret=True)).astype(np.float32)
    err = np.max(np.abs(got - want))
    # one bf16 output rounding (~0.4% of magnitude) + kernel poly noise
    bound = 0.004 * np.max(np.abs(want)) + 3e-5
    assert err < bound, f"bf16-storage drift {err:.2e} > {bound:.2e}"


def test_megakernel_rejects_unaligned():
    x = jnp.zeros((1, 8, 64, 64), jnp.float32)
    blk = _blk_params(np.random.default_rng(0), 8)
    with pytest.raises(ValueError):
        fused_lgb_block_cm(x, blk, interpret=True)
