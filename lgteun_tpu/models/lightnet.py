"""LightNet — SpanConv lightweight CNN (IJCAI'22).

Reference: models/lightnet.py:85-135. Upsample LrMS x2 twice (bicubic,
align_corners=False), concat PAN, then head (SpanConv C+1->C+1->20->32
+ ReLU), belly (2x residual-free SpanConv blocks with inner ReLU), tail
(SpanConv 32->16->8->C), residual add of the upsampled MS.

Init: kaiming_normal fan_out on conv weights, zero bias (reference
lightnet.py:113-117), reproduced here.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from lgteun_tpu.config import Config
from lgteun_tpu.models.base import FlaxMethod
from lgteun_tpu.models.common.layers import sampling
from lgteun_tpu.registry import MODELS

__all__ = ["LightNetModule", "lightnet"]


def _kaiming_normal_fan_out(key, shape, dtype=jnp.float32):
    """torch kaiming_normal_(mode='fan_out') for HWIO kernels: std =
    sqrt(2 / fan_out), fan_out = kh*kw*out_ch."""
    kh, kw, _, out_ch = shape
    std = jnp.sqrt(2.0 / (kh * kw * out_ch))
    return jax.random.normal(key, shape, dtype) * std


class _SpanConv(nn.Module):
    """Two parallel point->depthwise branches summed (reference
    lightnet.py:19-67), with LightNet's kaiming/zeros init."""

    features: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x):
        def conv(feats, ksize, groups, name):
            return nn.Conv(feats, (ksize, ksize), padding="SAME",
                           feature_group_count=groups,
                           kernel_init=_kaiming_normal_fan_out,
                           bias_init=nn.initializers.zeros, name=name)

        a = conv(self.features, 1, 1, "pw1")(x)
        a = conv(self.features, self.kernel_size, self.features, "dw1")(a)
        b = conv(self.features, 1, 1, "pw2")(x)
        b = conv(self.features, self.kernel_size, self.features, "dw2")(b)
        return a + b


class _Belly(nn.Module):
    """SpanConv -> ReLU -> SpanConv (reference lightnet.py:71-82)."""

    features: int = 32

    @nn.compact
    def __call__(self, x):
        y = _SpanConv(self.features, name="conv1")(x)
        y = nn.relu(y)
        return _SpanConv(self.features, name="conv2")(y)


class LightNetModule(nn.Module):
    ms_chans: int

    @nn.compact
    def __call__(self, ms, pan, *, deterministic: bool = True):
        lms = sampling(sampling(ms, 2), 2)
        x = jnp.concatenate([pan, lms], axis=-1)
        x = _SpanConv(self.ms_chans + 1, name="head0")(x)
        x = _SpanConv(20, name="head1")(x)
        x = _SpanConv(32, name="head2")(x)
        x = nn.relu(x)
        x = _Belly(32, name="belly0")(x)
        x = _Belly(32, name="belly1")(x)
        x = _SpanConv(16, name="tail0")(x)
        x = _SpanConv(8, name="tail1")(x)
        x = _SpanConv(self.ms_chans, name="tail2")(x)
        return lms + x


@MODELS.register()
class lightnet(FlaxMethod):
    """Registered under the reference's lowercase name
    (reference models/lightnet.py:138-139)."""

    def make_module(self):
        return LightNetModule(ms_chans=self.cfg.ms_chans)
