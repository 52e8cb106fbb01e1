"""Channel-attention refinement tails (reference:
models/common/mz_refine.py, byte-duplicated as INNT_refine.py — built
once here). All NHWC, torch-default conv init.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from lgteun_tpu.models.common.layers import Conv

__all__ = ["CALayer", "Refine", "Refine2", "DenseModule"]


class CALayer(nn.Module):
    """conv3x3-relu-conv3x3 -> GAP -> squeeze/excite -> z*y + x
    (reference mz_refine.py:34-56; note the residual adds the *pooled*
    z*y, a per-channel bias — reproduced exactly)."""

    reduction: int = 4

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        y = Conv(c, (3, 3), name="process0")(x)
        y = nn.relu(y)
        y = Conv(c, (3, 3), name="process1")(y)
        y = jnp.mean(y, axis=(1, 2), keepdims=True)  # [B,1,1,C]
        z = Conv(c // self.reduction, (1, 1), name="du0")(y)
        z = nn.relu(z)
        z = Conv(c, (1, 1), name="du1")(z)
        z = nn.sigmoid(z)
        return z * y + x


class Refine(nn.Module):
    """conv_in -> 1x CALayer -> conv_last (reference mz_refine.py:59-77;
    Refine1 is identical up to ctor arithmetic)."""

    out_channels: int
    n_ca: int = 1

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        out = Conv(c, (3, 3), name="conv_in")(x)
        for i in range(self.n_ca):
            out = CALayer(4, name=f"ca_{i}")(out)
        return Conv(self.out_channels, (3, 3), name="conv_last")(out)


class Refine2(Refine):
    """Two CALayers (reference mz_refine.py:100-117)."""

    n_ca: int = 2


class DenseModule(nn.Module):
    """3 chained 3x3 convs + 1x1 fuse over dense concat
    (reference mz_refine.py:16-31)."""

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        a = nn.leaky_relu(Conv(c, (3, 3), name="conv1")(x), 0.2)
        b = nn.leaky_relu(Conv(c, (3, 3), name="conv2")(a), 0.2)
        d = nn.leaky_relu(Conv(c, (3, 3), name="conv3")(b), 0.2)
        return Conv(c, (1, 1), name="conv4")(
            jnp.concatenate([x, a, b, d], axis=-1))
