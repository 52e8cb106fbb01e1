"""MutInf — Mutual-Information-driven pan-sharpening (CVPR'22).

Reference: models/MutInf.py. `GPPNN` core: CDC-edge feature extractors
for PAN and upsampled MS (each to n_feat/2 channels); concat; 4
InvBlocks whose coupling subnets are 3-scale shared DenseBlocks with
SE-style per-scale gates (`DenseBlockMscale`); fuse of blocks 1..3;
Refine2 tail; residual add. The whole `FeatureInteract` stack is
re-initialised with xavier_normal scale 1.0 (reference
MutInf.py:279-293 — overriding the DenseBlock-level 0.1 scaling), which
we reproduce by parameterising the init scale.

A second module `mi` (Mutual_info_reg, see lgteun_tpu.losses) regularises
the PAN/MS features; its loss is clipped to [-1, 1], turned into an L1
(|mi|) via the reference's rec-loss-on-(x, 2x) trick, and ramped from 0
to its weight over training (reference MutInf.py:470-505, adjust at
:348-353).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from lgteun_tpu.losses import (
    MutualInfoReg,
    build_loss_weights,
    reconstruction_loss,
)
from lgteun_tpu.models.base import FlaxMethod
from lgteun_tpu.models.common.cdc import CDCConv
from lgteun_tpu.models.common.inv_blocks import InvertibleConv1x1
from lgteun_tpu.models.common.layers import Conv
from lgteun_tpu.models.common.refine import Refine2
from lgteun_tpu.ops.resize import resize_bicubic, resize_bilinear
from lgteun_tpu.registry import MODELS

__all__ = ["GPPNNMutInf", "MutInf"]


def _xavier_normal(key, shape, dtype=jnp.float32):
    kh, kw, fan_in_pg, fan_out = shape
    fan_in = kh * kw * fan_in_pg
    fan_out_t = kh * kw * fan_out
    std = float(np.sqrt(2.0 / (fan_in + fan_out_t)))
    return jax.random.normal(key, shape, dtype) * std


class _XConv1(nn.Module):
    """Conv with xavier_normal (scale 1) weights + zero bias — the
    effective init after FeatureInteract.initialize()
    (reference MutInf.py:279-293)."""

    features: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        return nn.Conv(self.features, (k, k), padding="SAME",
                       kernel_init=_xavier_normal,
                       bias_init=nn.initializers.zeros)(x)


class _HINConvBlock(nn.Module):
    """UNetConvBlock with half-instance-norm (reference MutInf.py:138-160)."""

    features: int
    relu_slope: float = 0.1

    @nn.compact
    def __call__(self, x):
        out = _XConv1(self.features, 3, name="conv_1")(x)
        half = self.features // 2
        a, b = out[..., :half], out[..., half:]
        # InstanceNorm2d(affine=True): per-sample, per-channel spatial norm
        mu = jnp.mean(a, axis=(1, 2), keepdims=True)
        var = jnp.var(a, axis=(1, 2), keepdims=True)
        a = (a - mu) / jnp.sqrt(var + 1e-5)
        gamma = self.param("in_gamma", nn.initializers.ones, (half,), jnp.float32)
        beta = self.param("in_beta", nn.initializers.zeros, (half,), jnp.float32)
        a = a * gamma + beta
        out = jnp.concatenate([a, b], axis=-1)
        out = nn.leaky_relu(out, self.relu_slope)
        out = nn.leaky_relu(_XConv1(self.features, 3, name="conv_2")(out),
                            self.relu_slope)
        return out + _XConv1(self.features, 1, name="identity")(x)


class _DenseBlockHIN(nn.Module):
    """gc=16 dense block over HIN conv blocks (reference MutInf.py:163-181)."""

    features: int
    gc: int = 16

    @nn.compact
    def __call__(self, x):
        x1 = nn.leaky_relu(_HINConvBlock(self.gc, name="conv1")(x), 0.2)
        x2 = nn.leaky_relu(_HINConvBlock(self.gc, name="conv2")(x1), 0.2)
        return nn.leaky_relu(_XConv1(self.features, 3, name="conv3")(
            jnp.concatenate([x, x1, x2], axis=-1)), 0.2)


class _DenseBlockMscale(nn.Module):
    """Shared dense block applied at 1x/0.5x/0.25x with SE-style gates
    (reference MutInf.py:184-211). Bilinear resizes use torch's
    align_corners=False default."""

    features: int

    @nn.compact
    def __call__(self, x):
        h, w = x.shape[-3], x.shape[-2]
        ops = _DenseBlockHIN(self.features, name="ops")
        x1 = ops(x)
        x2 = ops(resize_bilinear(x, (h // 2, w // 2), align_corners=False))
        x3 = ops(resize_bilinear(x, (h // 4, w // 4), align_corners=False))
        x2 = resize_bilinear(x2, (h, w), align_corners=False)
        x3 = resize_bilinear(x3, (h, w), align_corners=False)

        att = jnp.mean(x1 + x2 + x3, axis=(1, 2), keepdims=True)
        att = nn.leaky_relu(_XConv1(self.features, 1, name="fusepool")(att), 0.1)
        w1 = nn.leaky_relu(_XConv1(self.features, 1, name="fc1")(att), 0.1)
        w2 = nn.leaky_relu(_XConv1(self.features, 1, name="fc2")(att), 0.1)
        w3 = nn.leaky_relu(_XConv1(self.features, 1, name="fc3")(att), 0.1)
        return _XConv1(self.features, 1, name="fuse")(
            jnp.concatenate([x1 * w1, x2 * w2, x3 * w3], axis=-1))


class _InvBlockMscale(nn.Module):
    """InvBlock with DenseBlockMscale subnets (reference MutInf.py:228-259)."""

    channel_num: int
    channel_split_num: int
    clamp: float = 0.8

    @nn.compact
    def __call__(self, x):
        s1 = self.channel_split_num
        s2 = self.channel_num - s1
        x = InvertibleConv1x1(self.channel_num, name="invconv")(x)
        x1, x2 = x[..., :s1], x[..., s1:]
        y1 = x1 + _DenseBlockMscale(s1, name="F")(x2)
        s = self.clamp * (jax.nn.sigmoid(
            _DenseBlockMscale(s2, name="H")(y1)) * 2 - 1)
        y2 = x2 * jnp.exp(s) + _DenseBlockMscale(s2, name="G")(y1)
        return jnp.concatenate([y1, y2], axis=-1)


class _EdgeBlock(nn.Module):
    """conv + (residual conv stack + CDC) (reference MutInf.py:356-368)."""

    features: int

    @nn.compact
    def __call__(self, x):
        x = Conv(self.features, (3, 3), name="process")(x)
        res = Conv(self.features, (3, 3), name="res0")(x)
        res = nn.relu(res)
        res = Conv(self.features, (3, 3), name="res1")(res)
        return res + CDCConv(self.features, name="cdc")(x)


class _FeatureExtract(nn.Module):
    """1x1 conv + two edge blocks (reference MutInf.py:371-383)."""

    features: int

    @nn.compact
    def __call__(self, x):
        xf = Conv(self.features, (1, 1), name="conv")(x)
        xf = _EdgeBlock(self.features, name="block1")(xf)
        return _EdgeBlock(self.features, name="block2")(xf)


class GPPNNMutInf(nn.Module):
    """Reference MutInf.py:313-345; returns (HR, panf, mHRf)."""

    ms_chans: int
    n_feat: int = 8
    block_num: int = 4

    @nn.compact
    def __call__(self, ms, pan, *, deterministic: bool = True):
        big_h, big_w = pan.shape[-3], pan.shape[-2]
        m_hr = resize_bicubic(ms, (big_h, big_w), align_corners=True)
        panf = _FeatureExtract(self.n_feat // 2, name="extract_pan")(pan)
        mhrf = _FeatureExtract(self.n_feat // 2, name="extract_ms")(m_hr)

        out = jnp.concatenate([panf, mhrf], axis=-1)
        outs = []
        for i in range(self.block_num):
            out = _InvBlockMscale(self.n_feat, self.n_feat // 2,
                                  name=f"inv_{i}")(out)
            if i >= 1:
                outs.append(out)
        fused = _XConv1(self.n_feat, 1, name="interact_fuse")(
            jnp.concatenate(outs, axis=-1))
        hr = Refine2(self.ms_chans, name="refine")(fused) + m_hr
        return hr, panf, mhrf


@MODELS.register()
class MutInf(FlaxMethod):
    """Reference MutInf.py:452-505: two modules (core_module + mi) and
    the ramped MI loss."""

    module_names = ("core_module", "mi")

    def make_module(self):
        g = dict(self.cfg.model_cfg.get("core_module", {}))
        return GPPNNMutInf(ms_chans=self.cfg.ms_chans,
                           n_feat=g.get("n_feat", 8))

    def __init__(self, cfg):
        super().__init__(cfg)
        self.mi_module = MutualInfoReg(input_channels=4, channels=4,
                                       latent_size=4)

    def init_params(self, rng, sample_hw=None):
        c = self.cfg.ms_chans
        ms_size, pan_size = sample_hw or (32, 128)
        k1, k2 = jax.random.split(rng)
        ms = jnp.zeros((1, ms_size, ms_size, c), jnp.float32)
        pan = jnp.zeros((1, pan_size, pan_size, 1), jnp.float32)
        core = self.module.init(k1, ms, pan)["params"]
        # MI encoder flattens pan_size/4-sized maps into its Dense
        # layers (the reference hard-codes 128 -> 32*32,
        # reference losses.py:175-178)
        feat = jnp.zeros((1, pan_size, pan_size, 4), jnp.float32)
        mi = self.mi_module.init(k2, feat, feat, rng=k2)["params"]
        return {"core_module": core, "mi": mi}

    def apply(self, params, batch, *, train=False, rng=None):
        hr, _, _ = self.module.apply({"params": params["core_module"]},
                                     batch["input_lr"], batch["input_pan"],
                                     deterministic=not train)
        return hr

    def losses(self, params, batch, *, rng, iter_id=0, with_output=False):
        hr, panf, mhrf = self.module.apply(
            {"params": params["core_module"]},
            batch["input_lr"], batch["input_pan"], deterministic=False)
        total = jnp.asarray(0.0, jnp.float32)
        parts = {}
        weights = build_loss_weights(self.cfg.loss_cfg)
        if "rec_loss" in weights:
            lcfg = weights["rec_loss"]
            value = reconstruction_loss(hr, batch["target"], lcfg.type)
            total = total + lcfg.w * value
            parts["rec_loss"] = value
        if "MI_rec_loss" in weights:
            lcfg = weights["MI_rec_loss"]
            mi_raw = self.mi_module.apply({"params": params["mi"]},
                                          panf, mhrf, rng=rng)
            mi_loss = jnp.clip(mi_raw, -1.0, 1.0)
            # rec_loss(out=mi, gt=2*mi) == |mi| for L1
            value = reconstruction_loss(mi_loss, 2.0 * mi_loss, lcfg.type)
            ramp = jnp.minimum(
                jnp.asarray(iter_id, jnp.float32) / max(self.cfg.max_iter, 1),
                1.0)
            total = total + lcfg.w * ramp * value
            parts["MI_rec_loss"] = value
        parts["full_loss"] = total
        return (total, parts, hr) if with_output else (total, parts)
