"""Local-Global Transformer (LGT) — LGTEUN's prior module.

TPU-native redesign of the reference U-shaped transformer (reference:
models/common/LGT.py:251-344):

  patch_embed -> [LGB, down x2ch]* -> bottleneck LGB
              -> [up /2ch, skip-fuse, LGB]* -> tail + residual

where each LGB block is `x += LGMixer(LN(x)); x += FFN(LN(x))`
(reference LGT.py:222-248) and LGMixer splits channels in half:

- local branch: non-overlapping win x win window MHSA with a learned
  [heads, win², win²] position bias (reference LGT.py:112-146). Here
  the window partition is a reshape/transpose and the attention is
  batched einsum over all windows — MXU-shaped; a Pallas fused kernel
  can be swapped in via `ops.window_attention`.
- global branch: FFT mixer — rfft2, depthwise 1x1 convs on amplitude
  and phase, recombine amp*cos/sin(pha) (+1e-8 epsilons, reproduced
  exactly), irfft2, abs (reference LGT.py:149-180).

All tensors are NHWC. Dropout(0.1) after the mixer projection matches
the reference (LGT.py:198).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from lgteun_tpu.models.common.layers import (
    Conv,
    DepConv,
    PointConv,
    PointDepConv,
    sampling,
    trunc_normal_init,
)

__all__ = ["LGT", "LGB", "LGMixer", "window_attention_reference"]


def window_partition(x: jnp.ndarray, win: int) -> jnp.ndarray:
    """[B,H,W,C] -> [B*nH*nW, win*win, C]."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // win, win, w // win, win, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b * (h // win) * (w // win), win * win, c)


def window_unpartition(x: jnp.ndarray, win: int, hw: tuple[int, int],
                       b: int) -> jnp.ndarray:
    """Inverse of `window_partition`."""
    h, w = hw
    c = x.shape[-1]
    x = x.reshape(b, h // win, w // win, win, win, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


def window_attention_reference(q, k, v, pos_bias, scale):
    """Plain-XLA window MHSA: q,k,v [N, heads, seq, hd]; pos_bias
    [heads, seq, seq]. Returns [N, heads, seq, hd]."""
    sim = jnp.einsum("nhic,nhjc->nhij", q * scale, k)
    sim = sim + pos_bias[None]
    attn = jax.nn.softmax(sim, axis=-1)
    return jnp.einsum("nhij,nhjc->nhic", attn, v)


class LocalMixer(nn.Module):
    """Windowed MHSA half of LGMixer (reference LGT.py:112-146).

    On TPU the whole qkv-projection + attention + head-merge pipeline
    runs as one fused Pallas kernel (ops/window_attention.py); other
    backends use the identical-math XLA path. `use_fused` overrides the
    auto backend detection (tests)."""

    win_size: int = 8
    num_heads: int = 2
    use_fused: bool | None = None
    dtype: jnp.dtype | None = None  # bf16 = mixed-precision training

    @nn.compact
    def __call__(self, x):
        from lgteun_tpu.models.common.layers import (
            torch_conv_bias_init,
            torch_conv_kernel_init,
        )
        from lgteun_tpu.ops.window_attention import (
            fused_window_attention_v2,
            fused_window_attention_v3,
            window_attention_xla,
        )

        b, h, w, c = x.shape
        heads = self.num_heads
        hd = c // heads
        scale = hd ** -0.5
        seq = self.win_size * self.win_size

        pos = self.param("pos_emb", trunc_normal_init(std=1.0),
                         (heads, seq, seq))
        # 1x1-conv qkv projection, held as raw params so both paths
        # share them (torch Conv2d default init, fan_in = c)
        wqkv = self.param("to_qkv_kernel", torch_conv_kernel_init,
                          (1, 1, c, 3 * c))[0, 0]
        bqkv = self.param("to_qkv_bias", torch_conv_bias_init(c),
                          (3 * c,), jnp.float32)

        xw = window_partition(x, self.win_size)  # [N, seq, c]
        if self.dtype is not None:
            # mixed precision: XLA path with bf16 matmul operands, f32
            # softmax/accumulation (the fused kernel is f32-only)
            out = window_attention_xla(xw, wqkv, bqkv, pos, heads, scale,
                                       dtype=self.dtype)
            return window_unpartition(out, self.win_size, (h, w), b)
        if self.use_fused is None:
            # default on for TPU (measured ~1.7x over the XLA path on
            # v5e); LGTEUN_FUSED_ATTENTION=0 disables, =v2 pins the
            # unpacked kernel (the packed v3 fills all 128 lanes with
            # two windows per row and is used whenever N is even; both
            # are differentiable — XLA-recompute backward)
            import os

            flag = os.environ.get("LGTEUN_FUSED_ATTENTION", "1")
            fused = flag != "0" and jax.default_backend() == "tpu"
        else:
            flag = "1"
            fused = self.use_fused
        if fused and flag != "v2" and xw.shape[0] % 2 == 0:
            out = fused_window_attention_v3(xw, wqkv, bqkv, pos, heads, scale)
        elif fused:
            out = fused_window_attention_v2(xw, wqkv, bqkv, pos, heads, scale)
        else:
            out = window_attention_xla(xw, wqkv, bqkv, pos, heads, scale)
        return window_unpartition(out, self.win_size, (h, w), b)


class GlobalMixer(nn.Module):
    """FFT amplitude/phase mixer half of LGMixer (reference
    LGT.py:149-180), epsilons included.

    The reference's `dep_conv(kernel_size=1)` on amplitude and phase is
    mathematically a per-channel scale + bias; holding it as raw
    parameters (same init distribution as a torch 1x1 depthwise conv)
    lets XLA fuse the entire spectral elementwise chain between the two
    DFT matmuls instead of lowering two convolutions."""

    @nn.compact
    def __call__(self, x):
        from lgteun_tpu.models.common.layers import (
            torch_conv_bias_init,
            torch_conv_kernel_init,
        )
        from lgteun_tpu.ops.fft import irfft2_pair, rfft2_pair

        h, w = x.shape[-3], x.shape[-2]
        c = x.shape[-1]
        amp_w = self.param("amp_scale", torch_conv_kernel_init,
                           (1, 1, 1, c))[0, 0, 0]
        amp_b = self.param("amp_bias", torch_conv_bias_init(1), (c,),
                           jnp.float32)
        pha_w = self.param("pha_scale", torch_conv_kernel_init,
                           (1, 1, 1, c))[0, 0, 0]
        pha_b = self.param("pha_bias", torch_conv_bias_init(1), (c,),
                           jnp.float32)

        # real-pair FFT: complex dtypes are unavailable on some TPU
        # runtimes; all spectral math below is real arithmetic
        re, im = rfft2_pair(x, axes=(-3, -2), norm="backward")
        # |z| and angle(z) have NaN gradients at z == 0 (conj(z)/|z|);
        # exactly-zero bins occur for constant windows. The double-where
        # pattern keeps forward values identical (amp=0, pha=0, matching
        # torch.abs/angle at 0) while zeroing the gradient there.
        zero = (re == 0.0) & (im == 0.0)
        re_safe = jnp.where(zero, 1.0, re)
        im_safe = jnp.where(zero, 0.0, im)
        amp = jnp.where(zero, 0.0, jnp.sqrt(re_safe**2 + im_safe**2))
        pha = jnp.where(zero, 0.0, jnp.arctan2(im_safe, re_safe))
        amp = amp * amp_w + amp_b
        pha = pha * pha_w + pha_b
        # the reference's complex +1e-8 adds to the real part only
        # (reference LGT.py:174-177)
        real = amp * jnp.cos(pha) + 1e-8 + 1e-8
        imag = amp * jnp.sin(pha) + 1e-8
        out = irfft2_pair(real, imag, s=(h, w), axes=(-3, -2),
                          norm="backward")
        return jnp.abs(out)


class LGMixer(nn.Module):
    """Half-channel local/global split mixer (reference LGT.py:183-219)."""

    win_size: int = 8
    num_heads: int = 2
    drop_rate: float = 0.1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        c = x.shape[-1]
        half = c // 2
        x1 = LocalMixer(self.win_size, self.num_heads, dtype=self.dtype,
                        name="local")(x[..., :half])
        # GlobalMixer stays f32 under mixed precision: its DFT path is
        # f32 by construction (ops/fft.py) and the 1/amp-scaled phase
        # gradient is precision-critical
        x2 = GlobalMixer(name="global")(x[..., half:])
        out = jnp.concatenate([x1.astype(x2.dtype), x2], axis=-1)
        out = PointConv(c, dtype=self.dtype, name="proj")(out)
        out = nn.Dropout(self.drop_rate, deterministic=deterministic)(out)
        return out


class FeedForward(nn.Module):
    """Conv-MLP: point(4x) -> GELU -> point+depthwise -> GELU -> point
    (reference LGT.py:91-109)."""

    ratio: int = 4

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        y = PointConv(c * self.ratio)(x)
        y = jax.nn.gelu(y, approximate=False)
        y = PointDepConv(c * self.ratio)(y)
        y = jax.nn.gelu(y, approximate=False)
        return PointConv(c)(y)


class LNFFNBlock(nn.Module):
    """x + FFN(LN(x)) holding raw parameters so the TPU path can run the
    fused Pallas kernel (ops/ffn_kernel.py); other backends use the
    identical-math XLA expression. torch-default inits throughout."""

    ratio: int = 4
    use_fused: bool | None = None
    dtype: jnp.dtype | None = None  # bf16 = mixed-precision training

    @nn.compact
    def __call__(self, x):
        from lgteun_tpu.models.common.layers import (
            torch_conv_bias_init,
            torch_conv_kernel_init,
        )
        from lgteun_tpu.ops.ffn_kernel import fused_ln_ffn, ln_ffn_xla

        c = x.shape[-1]
        c4 = c * self.ratio
        params = {
            "ln_gamma": self.param("ln_gamma", nn.initializers.ones, (c,),
                                   jnp.float32),
            "ln_beta": self.param("ln_beta", nn.initializers.zeros, (c,),
                                  jnp.float32),
            "w1": self.param("w1", torch_conv_kernel_init, (1, 1, c, c4))[0, 0],
            "b1": self.param("b1", torch_conv_bias_init(c), (c4,), jnp.float32),
            "w2": self.param("w2", torch_conv_kernel_init, (1, 1, c4, c4))[0, 0],
            "b2": self.param("b2", torch_conv_bias_init(c4), (c4,), jnp.float32),
            "dw": self.param("dw", torch_conv_kernel_init, (3, 3, 1, c4))[:, :, 0],
            "bdw": self.param("bdw", torch_conv_bias_init(9), (c4,), jnp.float32),
            "w3": self.param("w3", torch_conv_kernel_init, (1, 1, c4, c))[0, 0],
            "b3": self.param("b3", torch_conv_bias_init(c4), (c,), jnp.float32),
        }
        if self.dtype is not None:
            # mixed precision: f32 LN statistics + residual, bf16
            # matmul/conv operands with f32 accumulation
            return ln_ffn_xla(x, params, dtype=self.dtype)
        if self.use_fused is None:
            import os

            fused = (os.environ.get("LGTEUN_FUSED_FFN", "1") == "1"
                     and jax.default_backend() == "tpu"
                     and x.shape[-2] % 128 == 0)
        else:
            fused = self.use_fused
        if fused:
            return fused_ln_ffn(x, params)
        return ln_ffn_xla(x, params)


class LGB(nn.Module):
    """num_blocks x [x += mixer(LN(x)); x += ffn(LN(x))]
    (reference LGT.py:222-248)."""

    num_blocks: int
    win_size: int = 8
    num_heads: int = 2
    drop_rate: float = 0.1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        for i in range(self.num_blocks):
            # LN + residual adds stay f32 under mixed precision
            y = nn.LayerNorm(epsilon=1e-5, name=f"norm_mix_{i}")(x)
            x = x + LGMixer(self.win_size, self.num_heads, self.drop_rate,
                            dtype=self.dtype, name=f"mixer_{i}")(
                y, deterministic=deterministic).astype(x.dtype)
            x = LNFFNBlock(dtype=self.dtype, name=f"ffn_{i}")(x)
        return x


class LGT(nn.Module):
    """U-shaped local-global transformer (reference LGT.py:251-344).

    in/out: NHWC [B,H,W,in_channels]; residual add at the end.
    """

    in_channels: int
    embed_channels: int
    patch_size: int = 1
    window_size: int = 8
    num_block: Sequence[int] = (2, 1)
    num_heads: int = 2
    patch_norm: bool = True
    drop_rate: float = 0.1  # reference hard-codes Dropout(0.1) (LGT.py:198)
    # bf16 = selective mixed-precision training: branch matmuls/convs
    # in bf16 (f32 master params), LN stats / spectral path / softmax /
    # residual trunk in f32
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        scales = len(self.num_block)

        # patch embed: depthwise kxk stride k + point conv (+ LN)
        c_in = x.shape[-1]
        fea = Conv(c_in, kernel_size=(self.patch_size, self.patch_size),
                   strides=(self.patch_size, self.patch_size), padding="VALID",
                   feature_group_count=c_in, name="patch_dw")(x)
        fea = PointConv(self.embed_channels, name="patch_pw")(fea)
        if self.patch_norm:
            fea = nn.LayerNorm(epsilon=1e-5, name="patch_norm_ln")(fea)

        ch = self.embed_channels
        skips = []
        for i in range(scales - 1):
            fea = LGB(self.num_block[i], self.window_size, self.num_heads,
                      self.drop_rate, dtype=self.dtype,
                      name=f"enc_lgb_{i}")(fea, deterministic=deterministic)
            skips.append(fea)
            fea = sampling(fea, 0.5)
            fea = PointConv(ch * 2, name=f"enc_down_{i}")(fea)
            ch *= 2

        fea = LGB(self.num_block[-1], self.window_size, self.num_heads,
                  self.drop_rate, dtype=self.dtype,
                  name="bottleneck")(fea, deterministic=deterministic)

        for i in range(scales - 1):
            fea = sampling(fea, 2)
            fea = PointConv(ch // 2, name=f"dec_up_{i}")(fea)
            fea = jnp.concatenate([fea, skips[scales - 2 - i]], axis=-1)
            fea = PointConv(ch // 2, name=f"dec_fuse_{i}")(fea)
            fea = LGB(self.num_block[scales - 2 - i], self.window_size,
                      self.num_heads, self.drop_rate, dtype=self.dtype,
                      name=f"dec_lgb_{i}")(
                          fea, deterministic=deterministic)
            ch //= 2

        out = sampling(fea, self.patch_size)
        out = PointConv(self.in_channels, name="tail")(out)
        # residual in the INPUT precision (f32 under mixed training)
        return out.astype(x.dtype) + x
