"""Central-difference convolutions (reference: models/common/CDC.py).

`Conv2d_Hori_Veri_Cross` / `Conv2d_Diag_Cross` hold 5 learnable taps
scattered into a 3x3 cross / diagonal pattern; the output subtracts
theta times a 1x1 conv whose weight is the sum of the taps (the
"central difference" term). `cdcconv` blends the two with a
sigmoid-gated scalar (reference CDC.py:77-93; the gate parameter is
*uninitialised memory* in the reference — we initialise it to 0, i.e.
an even 0.5/0.5 blend). The reference hard-codes `.cuda()` for its
zero-padding tensor (CDC.py:131,158); here the scatter is a trace-time
constant assembly, device-agnostic by construction.

All NHWC; conv weights follow torch's default Conv2d init (the
reference does not re-init these), bias absent.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from lgteun_tpu.models.common.layers import torch_conv_kernel_init

__all__ = ["CDCConv"]

# positions of the 5 taps inside the 3x3 kernel, row-major
_CROSS_POS = [(0, 1), (1, 0), (1, 1), (1, 2), (2, 1)]
_DIAG_POS = [(0, 0), (0, 2), (1, 1), (2, 0), (2, 2)]


class _FiveTapConv(nn.Module):
    """5 taps -> 3x3 scatter conv with central-difference subtraction
    (reference CDC.py:121-185)."""

    features: int
    positions: tuple
    theta: float = 0.8

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        # torch stores (1,5) kernels; same fan_in = 5
        taps = self.param("taps", torch_conv_kernel_init,
                          (1, 5, in_ch, self.features))[0]  # [5, in, out]
        kernel = jnp.zeros((3, 3, in_ch, self.features), taps.dtype)
        for t, (r, c) in enumerate(self.positions):
            kernel = kernel.at[r, c].set(taps[t])
        out = jax.lax.conv_general_dilated(
            x, kernel, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        kernel_diff = jnp.sum(taps, axis=0)[None, None]  # [1,1,in,out]
        out_diff = jax.lax.conv_general_dilated(
            x, kernel_diff, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return out - self.theta * out_diff


class CDCConv(nn.Module):
    """sigmoid-gated blend of cross and diag CDC convs + identity
    (reference CDC.py:77-93)."""

    features: int
    theta: float = 0.8

    @nn.compact
    def __call__(self, x):
        gate = self.param("hp_branch", nn.initializers.zeros, (1,), jnp.float32)
        h = _FiveTapConv(self.features, tuple(_CROSS_POS), self.theta,
                         name="h_conv")(x)
        d = _FiveTapConv(self.features, tuple(_DIAG_POS), self.theta,
                         name="d_conv")(x)
        g = jax.nn.sigmoid(gate[0])
        return g * h + (1.0 - g) * d + x
