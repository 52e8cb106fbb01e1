"""Pallas fused window attention vs the XLA reference path
(interpreter mode on CPU)."""

import jax
import numpy as np
import pytest

from lgteun_tpu.ops.window_attention import (
    fused_window_attention,
    window_attention_xla,
)


@pytest.mark.parametrize("n,s,c,heads", [(16, 64, 16, 2), (8, 64, 32, 2),
                                         (4, 16, 8, 2)])
def test_fused_matches_xla(rng, n, s, c, heads):
    xw = rng.standard_normal((n, s, c)).astype(np.float32)
    wqkv = (rng.standard_normal((c, 3 * c)) * 0.1).astype(np.float32)
    bqkv = (rng.standard_normal((3 * c,)) * 0.1).astype(np.float32)
    pos = rng.standard_normal((heads, s, s)).astype(np.float32)
    scale = (c // heads) ** -0.5

    want = np.asarray(window_attention_xla(xw, wqkv, bqkv, pos, heads, scale))
    got = np.asarray(fused_window_attention(
        xw, wqkv, bqkv, pos, heads=heads, scale=scale, interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)
