"""Invertible-network machinery shared by SFIIN / MutInf / INNT.

The reference duplicates these in three files (models/SFIIN.py:26-207,
models/MutInf.py, models/INNT.py:27-95 + thops); built once here.

- `InvertibleConv1x1` — LU-parameterised invertible 1x1 conv
  (reference SFIIN.py:26-94): at init an orthogonal matrix (QR of a
  standard normal) is LU-factorised; P and sign(s) are frozen buffers,
  L (strict lower), log|s| and U (strict upper) are trainable. Stored
  as one pytree param with stop_gradient on the frozen parts.
- `UNetConvBlock` / `DenseBlock` — the affine-coupling subnets
  (reference SFIIN.py:137-173) with xavier_normal * 0.1 init.
- `InvBlock` — affine coupling y1 = x1 + F(x2);
  y2 = x2 * exp(clamp*(2*sigmoid(H(y1))-1)) + G(y1), preceded by the
  invertible 1x1 mixing conv (reference SFIIN.py:176-207).

All NHWC.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["InvertibleConv1x1", "UNetConvBlock", "DenseBlock", "InvBlock"]


def _lu_init(key, num_channels: int):
    """Orthogonal (QR of a standard normal) -> LU factors, all in
    traceable JAX ops (flax jits param initialisers)."""
    w = jax.random.normal(key, (num_channels, num_channels))
    q = jnp.linalg.qr(w)[0]
    p, l, u = jax.scipy.linalg.lu(q)
    s = jnp.diag(u)
    # P and sign(s) are frozen buffers. They live in the param pytree
    # (checkpoint/transplant-friendly) under a `frozen_` prefix that
    # the optimizer factory masks out (runner.make_optimizer) — a
    # stop_gradient alone zeroes gradients but not adamw's decoupled
    # weight decay, which would silently corrupt the permutation.
    return {
        "frozen_p": p.astype(jnp.float32),
        "frozen_sign_s": jnp.sign(s).astype(jnp.float32),
        "l": l.astype(jnp.float32),
        "log_s": jnp.log(jnp.abs(s)).astype(jnp.float32),
        "u": jnp.triu(u, k=1).astype(jnp.float32),
    }


class InvertibleConv1x1(nn.Module):
    num_channels: int

    @nn.compact
    def __call__(self, x):
        lu = self.param("lu", _lu_init, self.num_channels)
        c = self.num_channels
        p = jax.lax.stop_gradient(lu["frozen_p"])
        sign_s = jax.lax.stop_gradient(lu["frozen_sign_s"])
        l_mask = jnp.asarray(np.tril(np.ones((c, c), np.float32), -1))
        l = lu["l"] * l_mask + jnp.eye(c, dtype=x.dtype)
        u = lu["u"] * l_mask.T + jnp.diag(sign_s * jnp.exp(lu["log_s"]))
        w = p @ l @ u  # [C, C]
        # 1x1 conv on NHWC == matmul over the channel axis
        return jnp.einsum("...c,dc->...d", x, w)


def _xavier_normal_scaled(scale: float):
    def init(key, shape, dtype=jnp.float32):
        kh, kw, fan_in_pg, fan_out = shape
        fan_in = kh * kw * fan_in_pg
        fan_out_t = kh * kw * fan_out
        std = float(np.sqrt(2.0 / (fan_in + fan_out_t)))
        return jax.random.normal(key, shape, dtype) * std * scale

    return init


class _XConv(nn.Module):
    """Conv with xavier_normal*0.1 weights and zero bias (the
    `initialize_weights_xavier(..., 0.1)` convention,
    reference SFIIN.py:117-134)."""

    features: int
    kernel_size: int = 3
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        pad = self.dilation * (k - 1) // 2
        return nn.Conv(self.features, (k, k),
                       kernel_dilation=(self.dilation, self.dilation),
                       padding=((pad, pad), (pad, pad)),
                       kernel_init=_xavier_normal_scaled(0.1),
                       bias_init=nn.initializers.zeros)(x)


class UNetConvBlock(nn.Module):
    """conv-lrelu-conv-lrelu + 1x1 identity (reference SFIIN.py:137-152)."""

    features: int
    dilation: int = 1
    relu_slope: float = 0.1

    @nn.compact
    def __call__(self, x):
        out = nn.leaky_relu(_XConv(self.features, 3, self.dilation,
                                   name="conv_1")(x), self.relu_slope)
        out = nn.leaky_relu(_XConv(self.features, 3, self.dilation,
                                   name="conv_2")(out), self.relu_slope)
        return out + _XConv(self.features, 1, name="identity")(x)


class DenseBlock(nn.Module):
    """Two UNetConvBlocks + dense concat conv (reference SFIIN.py:155-173)."""

    features: int
    dilation: int = 1
    gc: int = 8

    @nn.compact
    def __call__(self, x):
        x1 = nn.leaky_relu(UNetConvBlock(self.gc, self.dilation,
                                         name="conv1")(x), 0.2)
        x2 = nn.leaky_relu(UNetConvBlock(self.gc, self.dilation,
                                         name="conv2")(x1), 0.2)
        x3 = nn.leaky_relu(_XConv(self.features, 3, name="conv3")(
            jnp.concatenate([x, x1, x2], axis=-1)), 0.2)
        return x3


class InvBlock(nn.Module):
    """Affine coupling + invertible 1x1 (reference SFIIN.py:176-207)."""

    channel_num: int
    channel_split_num: int
    dilation: int = 1
    clamp: float = 0.8

    @nn.compact
    def __call__(self, x):
        s1 = self.channel_split_num
        s2 = self.channel_num - s1
        x = InvertibleConv1x1(self.channel_num, name="invconv")(x)
        x1, x2 = x[..., :s1], x[..., s1:]
        y1 = x1 + DenseBlock(s1, self.dilation, name="F")(x2)
        s = self.clamp * (jax.nn.sigmoid(
            DenseBlock(s2, self.dilation, name="H")(y1)) * 2 - 1)
        y2 = x2 * jnp.exp(s) + DenseBlock(s2, self.dilation, name="G")(y1)
        return jnp.concatenate([y1, y2], axis=-1)
