"""Shared NN building blocks (flax.linen, NHWC).

Covers the reference's conv/resample primitives (reference:
models/common/basic_module_unformer_v2.py:13-82) with torch-compatible
default initialisation so from-scratch training matches the reference's
optimisation landscape:

- torch Conv2d default init = kaiming_uniform(a=sqrt(5)) on weights and
  uniform(+-1/sqrt(fan_in)) on bias; both reduce to U(+-1/sqrt(fan_in))
  for the weight bound sqrt(6 / ((1 + 5) * fan_in)).
- trunc_normal(std=.02 or 1.0) for transformer position embeddings
  (reference: models/common/LGT.py:21-42,127-128).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from lgteun_tpu.nn_init import (  # noqa: F401  (re-exported)
    torch_conv_bias_init,
    torch_conv_kernel_init,
    trunc_normal_init,
)
from lgteun_tpu.ops.resize import sample_scale

__all__ = [
    "torch_conv_kernel_init", "torch_conv_bias_init", "trunc_normal_init",
    "Conv", "PointConv", "DepConv", "PointDepConv", "SpanConv",
    "sampling", "LayerNorm",
]


class Conv(nn.Module):
    """nn.Conv with torch-default init and optional grouping.

    `dtype` = computation dtype (flax semantics: inputs and params are
    cast to it; params are STORED f32) — the selective-mixed-precision
    hook: bf16 compute in heavy branches, f32 master params."""

    features: int
    kernel_size: Sequence[int] = (3, 3)
    strides: Sequence[int] = (1, 1)
    padding: str | Sequence = "SAME"
    feature_group_count: int = 1
    use_bias: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        kh, kw = self.kernel_size
        fan_in = kh * kw * (in_ch // self.feature_group_count)
        return nn.Conv(
            features=self.features,
            kernel_size=tuple(self.kernel_size),
            strides=tuple(self.strides),
            padding=self.padding,
            feature_group_count=self.feature_group_count,
            use_bias=self.use_bias,
            dtype=self.dtype,
            kernel_init=torch_conv_kernel_init,
            bias_init=torch_conv_bias_init(fan_in),
        )(x)


class PointConv(nn.Module):
    """1x1 conv (reference basic_module_unformer_v2.py:13-14)."""

    features: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        return Conv(self.features, kernel_size=(1, 1), dtype=self.dtype)(x)


class DepConv(nn.Module):
    """Depthwise kxk conv, padding k//2 (reference
    basic_module_unformer_v2.py:17-18)."""

    kernel_size: int = 3

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        return Conv(c, kernel_size=(self.kernel_size, self.kernel_size),
                    feature_group_count=c)(x)


class PointDepConv(nn.Module):
    """point conv then depthwise conv (reference `depthwise_conv`,
    basic_module_unformer_v2.py:37-53)."""

    features: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x):
        x = PointConv(self.features)(x)
        return DepConv(self.kernel_size)(x)


class SpanConv(nn.Module):
    """Two parallel point->depthwise branches, summed (reference
    `span_conv`, basic_module_unformer_v2.py:56-81; also the core op of
    LightNet, reference models/lightnet.py:19-67)."""

    features: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x):
        a = PointDepConv(self.features, self.kernel_size, name="branch1")(x)
        b = PointDepConv(self.features, self.kernel_size, name="branch2")(x)
        return a + b


def sampling(x, s_factor: float, mode: str = "bicubic"):
    """Scale-factor resize, align_corners=False (reference
    basic_module_unformer_v2.py:21-34). No-op when s_factor == 1."""
    if s_factor == 1:
        return x
    return sample_scale(x, s_factor, mode)


class LayerNorm(nn.Module):
    """Channel-last LayerNorm matching torch nn.LayerNorm(channels)."""

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=1e-5)(x)
