"""LGTEUN — Local-Global Transformer Enhanced Unfolding Network.

The flagship deep-unfolding method (IJCAI'23; reference:
models/unlg_former.py:21-67 `Pansharpening`). Proximal-gradient
unfolding with K stages:

    Z_0 = bicubic_up4(ms)                       (align_corners=False)
    for i in 0..K-1:
        ms_term  = DT(D(Z) - ms)     # D/DT: 2x [resize 1/2 or 2 + dw3x3]
        pan_term = RT(R(Z) - pan)    # R/RT: 1x1 convs C<->1
        Z <- Z - eta_i * (ms_term + pan_term)   # learnable scalar eta
        out_i = LGT_i(Z)                        # transformer prior
    return out_{K-1}

NOTE the prior output is NOT fed back into Z — the reference appends
`Z_ = prior_module[i](Z)` to an output list and keeps iterating on the
un-denoised Z, returning only the final element (reference
unlg_former.py:56-67: `Z` is never reassigned from `Z_`). Forward
parity for K >= 2 requires reproducing this exactly. Consequences this
framework inherits deliberately: intermediate priors receive no
gradient (their outputs are discarded), and under XLA their forward is
dead code — so K-stage inference costs K gradient steps + ONE prior,
which is why our K=2 runtime is close to the reference's K=1.

Shipped config: K=2, embed = 4*ms_chans, window 8, num_block (2,1),
2 heads (reference configs/unlg_former.py:92-94 and
models/unlg_former.py:44-48).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from lgteun_tpu.models.common.layers import DepConv, PointConv, sampling
from lgteun_tpu.models.common.lgt import LGT

__all__ = ["LGTEUN"]


class _Down(nn.Module):
    """D: two (bicubic 1/2 + depthwise 3x3) stages
    (reference unlg_former.py:29-30)."""

    @nn.compact
    def __call__(self, x):
        x = sampling(x, 0.5)
        x = DepConv(3, name="dw0")(x)
        x = sampling(x, 0.5)
        return DepConv(3, name="dw1")(x)


class _Up(nn.Module):
    """DT: two (bicubic 2x + depthwise 3x3) stages
    (reference unlg_former.py:32-33)."""

    @nn.compact
    def __call__(self, x):
        x = sampling(x, 2)
        x = DepConv(3, name="dw0")(x)
        x = sampling(x, 2)
        return DepConv(3, name="dw1")(x)


class LGTEUN(nn.Module):
    """ms [B,h,w,C] + pan [B,4h,4w,1] -> HrMS [B,4h,4w,C]."""

    ms_chans: int
    stage: int = 2
    window_size: int = 8
    num_heads: int = 2
    drop_rate: float = 0.1  # reference hard-codes 0.1 (LGT.py:198)
    # bf16 = selective mixed-precision training: the LGT priors run
    # their matmuls/convs in bf16 (f32 LN/softmax/spectral path, see
    # common/lgt.py); the unfolding gradient step (D/DT/R/RT, eta)
    # stays f32 — it carries the data-fidelity residual whose
    # precision bounds final PSNR
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, ms, pan, *, deterministic: bool = True):
        c = self.ms_chans
        down = _Down(name="D")
        up = _Up(name="DT")
        r = PointConv(1, name="R")
        rt = PointConv(c, name="RT")

        z = sampling(ms, 4)
        out = z
        for i in range(self.stage):
            eta = self.param(f"eta_{i}", lambda *_: jnp.asarray(0.1, jnp.float32))
            ms_term = up(down(z) - ms)
            pan_term = rt(r(z) - pan)
            z = z - eta * (ms_term + pan_term)
            # Reference semantics: the prior's output is recorded but
            # NOT fed back (reference unlg_former.py:61-67). All prior
            # modules are still *called* so their params exist for
            # checkpoint/transplant parity; XLA dead-code-eliminates
            # every call but the last.
            out = LGT(in_channels=c, embed_channels=c * 4, patch_size=1,
                      window_size=self.window_size, num_block=(2, 1),
                      num_heads=self.num_heads, drop_rate=self.drop_rate,
                      dtype=self.dtype, name=f"prior_{i}")(
                          z, deterministic=deterministic)
        return out
