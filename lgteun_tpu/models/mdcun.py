"""MDCUN — Memory-augmented Deep Conditional Unfolding Network (CVPR'22).

Reference: models/MDCUN.py `pan_unfolding`. T=4 stages:

- multi-scale PAN high-pass pyramid: pan - up(down(pan, 1/s), s) for
  s in {2, 4, 8} (bicubic, align_corners=False), 1x1 conv to one
  channel (reference MDCUN.py:348-357)
- memory: uk = conv_u[i](cat(all previous uk, x)); same conv applied to
  the non-local branch vk (shared weights per stage,
  reference MDCUN.py:367-394)
- per-band spatial-attention denoising: the shared `att_spatial` module
  is applied to (band, pan) pairs of the FIRST FOUR bands only (the
  reference hard-codes 4; >4-band inputs go through a 1x1 conv back to
  C — quirk preserved; reference MDCUN.py:369-388)
- 15x15 neighborhood non-local attention `blockNL`
  (reference MDCUN.py:64-107)
- learned resamplers Conv_up (nearest x4 + convs) / Conv_down
  (maxpool 4 + convs) (reference MDCUN.py:110-175)
- iteration update with learnable scalars u/eta/gama (0.5) and delta
  (0.1) (reference MDCUN.py:325-332,413-415)
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from lgteun_tpu.models.base import FlaxMethod
from lgteun_tpu.models.common.layers import Conv
from lgteun_tpu.ops.resize import resize_bicubic, resize_bilinear
from lgteun_tpu.registry import MODELS

__all__ = ["PanUnfolding", "MDCUN"]


class _PReLU(nn.Module):
    """torch nn.PReLU(init=0.5): one shared learnable slope."""

    init: float = 0.5

    @nn.compact
    def __call__(self, x):
        a = self.param("alpha", lambda *_: jnp.asarray(self.init, jnp.float32))
        return jnp.maximum(x, 0) + a * jnp.minimum(x, 0)


class _ResnetBlock(nn.Module):
    """conv-prelu-conv-prelu residual (reference MDCUN.py:254-311;
    norm=None, shared PReLU). NOTE the reference instantiates it as
    `ResnetBlock(32, 3, 1, 1, 0.1, ...)` (MDCUN.py:185) where the 0.1
    lands positionally on *bias* (truthy -> biased convs), NOT on
    scale — so the residual scale is the default 1.0. Verified by
    weight-transplant parity (tests/test_torch_parity.py)."""

    features: int = 32
    scale: float = 1.0

    @nn.compact
    def __call__(self, x):
        act = _PReLU(name="act")
        y = Conv(self.features, (3, 3), name="conv1")(x)
        y = act(y)
        y = Conv(self.features, (3, 3), name="conv2")(y)
        y = act(y)
        return y * self.scale + x


class AttSpatial(nn.Module):
    """Spatial attention over (band, pan) pairs
    (reference MDCUN.py:178-196; res_num=3)."""

    res_num: int = 3

    @nn.compact
    def __call__(self, x):
        y = Conv(32, (3, 3), use_bias=False, name="head")(x)
        y = _PReLU(name="head_act")(y)
        for i in range(self.res_num):
            y = _ResnetBlock(32, name=f"res_{i}")(y)
        compress = jnp.concatenate(
            [jnp.max(y, axis=-1, keepdims=True),
             jnp.mean(y, axis=-1, keepdims=True)], axis=-1)
        z = Conv(1, (3, 3), use_bias=False, name="spatial")(compress)
        z = _PReLU(name="spatial_act")(z)
        return jax.nn.sigmoid(z)


class BlockNL(nn.Module):
    """15x15 neighborhood non-local attention
    (reference MDCUN.py:64-107). NHWC.

    On TPU the whole block (four 1x1 projections + fs² neighborhood
    attention + residual) runs as one fused Pallas kernel
    (ops/nonlocal_kernel.py, measured 34x over the unfold-based XLA
    path); other backends use the identical-math XLA expression."""

    fs: int = 15
    use_fused: bool | None = None

    @nn.compact
    def __call__(self, x):
        from lgteun_tpu.models.common.layers import torch_conv_kernel_init
        from lgteun_tpu.ops.nonlocal_kernel import (
            fused_neighborhood_attention,
            neighborhood_attention_xla,
        )

        c = x.shape[-1]
        wt = self.param("t", torch_conv_kernel_init, (1, 1, c, c))[0, 0]
        wp = self.param("p", torch_conv_kernel_init, (1, 1, c, c))[0, 0]
        wg = self.param("g", torch_conv_kernel_init, (1, 1, c, c))[0, 0]
        ww = self.param("w", torch_conv_kernel_init, (1, 1, c, c))[0, 0]

        if self.use_fused is None:
            import os

            fused = (os.environ.get("LGTEUN_FUSED_NL", "1") == "1"
                     and jax.default_backend() == "tpu"
                     and x.shape[-2] % 128 == 0)
        else:
            fused = self.use_fused
        if fused:
            return fused_neighborhood_attention(x, wt, wp, wg, ww, self.fs)
        return neighborhood_attention_xla(x, wt, wp, wg, ww, self.fs)


class _ConvUp(nn.Module):
    """conv-relu -> nearest x4 -> conv -> conv (reference MDCUN.py:110-141)."""

    c_in: int
    mid: int = 64

    @nn.compact
    def __call__(self, x):
        y = nn.relu(Conv(self.mid, (3, 3), name="body")(x))
        # torch nn.Upsample default mode='nearest'
        y = jnp.repeat(jnp.repeat(y, 4, axis=1), 4, axis=2)
        y = Conv(self.c_in, (3, 3), name="tail0")(y)
        return Conv(self.c_in, (3, 3), name="tail1")(y)


class _ConvDown(nn.Module):
    """conv-relu -> maxpool 4 -> conv -> conv (reference MDCUN.py:144-175)."""

    c_in: int
    mid: int = 64

    @nn.compact
    def __call__(self, x):
        y = nn.relu(Conv(self.mid, (3, 3), name="body")(x))
        y = nn.max_pool(y, (4, 4), strides=(4, 4))
        y = Conv(self.c_in, (3, 3), name="tail0")(y)
        return Conv(self.c_in, (3, 3), name="tail1")(y)


class PanUnfolding(nn.Module):
    """Reference MDCUN.py:311-419."""

    ms_chans: int
    mid_channels: int = 64
    stages: int = 4

    @nn.compact
    def __call__(self, ms, pan, *, deterministic: bool = True):
        big_h, big_w = pan.shape[-3], pan.shape[-2]

        def highpass(s):
            down = resize_bicubic(pan, (big_h // s, big_w // s),
                                  align_corners=False)
            return pan - resize_bicubic(down, (big_h, big_w),
                                        align_corners=False)

        pan_hp = Conv(1, (1, 1), name="hf_pan")(
            jnp.concatenate([highpass(2), highpass(4), highpass(8)], axis=-1))

        x = resize_bilinear(ms, (big_h, big_w), align_corners=False)

        rm1 = AttSpatial(name="rm1")
        nl_block = BlockNL(name="nl")
        conv_up = _ConvUp(self.ms_chans, self.mid_channels, name="conv_up")
        conv_down = _ConvDown(self.ms_chans, self.mid_channels,
                              name="conv_down")
        conv1x1 = (Conv(self.ms_chans, (1, 1), name="conv1x1")
                   if self.ms_chans > 4 else None)

        def denoise(feat):
            """Per-band (first 4) spatial attention + highpass injection
            (reference MDCUN.py:369-388). The four per-band calls share
            weights and are independent per sample, so they run as ONE
            att_spatial call with bands folded into the batch axis —
            identical math, 4x fewer op launches."""
            b = feat.shape[0]
            bands = jnp.concatenate(
                [feat[..., band:band + 1] for band in range(4)], axis=0)
            pan4 = jnp.tile(pan, (4, 1, 1, 1))
            gates = rm1(jnp.concatenate([bands, pan4], axis=-1))  # [4B,H,W,1]
            decoded = jnp.concatenate(
                [pan_hp + gates[band * b:(band + 1) * b] * pan_hp
                 for band in range(4)], axis=-1)
            if conv1x1 is not None:
                decoded = conv1x1(decoded)
            return decoded

        lms = ms
        uk_list: list = []
        vk_list: list = []
        for i in range(self.stages):
            conv_u = [
                Conv(64, (3, 3), name=f"conv_u_{i}_0"),
                Conv(self.ms_chans, (3, 3), name=f"conv_u_{i}_1"),
            ]

            def apply_conv_u(t):
                return conv_u[1](conv_u[0](t))

            uk = apply_conv_u(jnp.concatenate(uk_list + [x], axis=-1))
            decode_u = denoise(uk) + uk
            uk_list.append(decode_u)

            nl = nl_block(x)
            vk = apply_conv_u(jnp.concatenate(vk_list + [nl], axis=-1))
            decode_v = denoise(vk) + vk
            vk_list.append(decode_v)

            u = self.param(f"u_{i}", lambda *_: jnp.asarray(0.5, jnp.float32))
            eta = self.param(f"eta_{i}", lambda *_: jnp.asarray(0.5, jnp.float32))
            gama = self.param(f"gama_{i}", lambda *_: jnp.asarray(0.5, jnp.float32))
            delta = self.param(f"delta_{i}", lambda *_: jnp.asarray(0.1, jnp.float32))

            x = x - delta * (
                conv_up(conv_down(x) - lms + u * (conv_down(nl) - lms))
                + eta * (x - decode_u) + gama * (nl - decode_v))
        return x


@MODELS.register()
class MDCUN(FlaxMethod):
    """Reference models/MDCUN.py:422-464."""

    def make_module(self):
        g = dict(self.cfg.model_cfg.get("core_module", {}))
        return PanUnfolding(ms_chans=self.cfg.ms_chans,
                            mid_channels=g.get("mid_channels", 64),
                            stages=g.get("T", 4))
