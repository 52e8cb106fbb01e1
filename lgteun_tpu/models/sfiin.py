"""SFIIN — Spatial-Frequency Information Integration Network (ECCV'22).

Reference: models/SFIIN.py. Bicubic(align_corners=True) upsample of MS
to PAN size; 5 chained `SpaFre` blocks (spatial branch: InvBlock over
the concat + 1x1; frequency branch: rfft2 amp/phase fusion of ms/pan
features; spatial-attention cross gating; contrast+GAP channel
attention), dense fusion of the 5 block outputs, channel-attention
refine tail, residual add.

Training adds frequency-domain L1 losses on the rfft2 amplitude and
phase of output vs target (reference SFIIN.py:359-408; shipped weights
0.1 each, reference configs/SFIIN.py loss_cfg).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from lgteun_tpu.losses import build_loss_weights, reconstruction_loss
from lgteun_tpu.models.base import FlaxMethod
from lgteun_tpu.models.common.inv_blocks import InvBlock
from lgteun_tpu.models.common.layers import Conv
from lgteun_tpu.models.common.refine import Refine
from lgteun_tpu.ops.fft import irfft2_pair, rfft2_pair
from lgteun_tpu.ops.resize import resize_bicubic
from lgteun_tpu.registry import MODELS

__all__ = ["SFIINNet", "SFIIN"]


def _safe_amp_pha(re, im):
    """Forward-exact amp/phase of a (re, im) spectrum pair with
    NaN-free grads at zero bins (same pattern as lgt.GlobalMixer)."""
    zero = (re == 0.0) & (im == 0.0)
    re_s = jnp.where(zero, 1.0, re)
    im_s = jnp.where(zero, 0.0, im)
    amp = jnp.where(zero, 0.0, jnp.sqrt(re_s**2 + im_s**2))
    pha = jnp.where(zero, 0.0, jnp.arctan2(im_s, re_s))
    return amp, pha


class FreProcess(nn.Module):
    """Frequency fusion branch (reference SFIIN.py:210-237), epsilons
    reproduced."""

    channels: int

    @nn.compact
    def __call__(self, msf, panf):
        h, w = msf.shape[-3], msf.shape[-2]
        ms_in = Conv(self.channels, (1, 1), name="pre1")(msf) + 1e-8
        pan_in = Conv(self.channels, (1, 1), name="pre2")(panf) + 1e-8
        ms_re, ms_im = rfft2_pair(ms_in, axes=(-3, -2), norm="backward")
        pan_re, pan_im = rfft2_pair(pan_in, axes=(-3, -2), norm="backward")
        ms_amp, ms_pha = _safe_amp_pha(ms_re, ms_im)
        pan_amp, pan_pha = _safe_amp_pha(pan_re, pan_im)

        def fuse(x, name):
            y = Conv(self.channels, (1, 1), name=f"{name}0")(x)
            y = nn.leaky_relu(y, 0.1)
            return Conv(self.channels, (1, 1), name=f"{name}1")(y)

        amp = fuse(jnp.concatenate([ms_amp, pan_amp], -1), "amp_fuse")
        pha = fuse(jnp.concatenate([ms_pha, pan_pha], -1), "pha_fuse")
        # reference's complex +1e-8 adds to the real part only
        real = amp * jnp.cos(pha) + 1e-8 + 1e-8
        imag = amp * jnp.sin(pha) + 1e-8
        out = jnp.abs(irfft2_pair(real, imag, s=(h, w), axes=(-3, -2),
                                  norm="backward"))
        return Conv(self.channels, (1, 1), name="post")(out)


class SpaFre(nn.Module):
    """One spatial/frequency fusion block (reference SFIIN.py:240-271)."""

    channels: int

    @nn.compact
    def __call__(self, msf, pan):
        c = self.channels
        panpre = Conv(c, (3, 3), name="panprocess")(pan)
        panf = Conv(c, (1, 1), name="panpre")(panpre)
        spa = InvBlock(2 * c, c, name="spa_inv")(
            jnp.concatenate([msf, panf], axis=-1))
        spa = Conv(c, (1, 1), name="spa_out")(spa)
        fre = FreProcess(c, name="fre_process")(msf, panf)

        att = Conv(c // 2, (3, 3), name="spa_att0")(spa - fre)
        att = nn.leaky_relu(att, 0.1)
        att = nn.sigmoid(Conv(c, (3, 3), name="spa_att1")(att))
        spa_res = fre * att + spa

        cat_f = jnp.concatenate([spa_res, fre], axis=-1)
        mean = jnp.mean(cat_f, axis=(1, 2), keepdims=True)
        contrast = jnp.sqrt(
            jnp.mean((cat_f - mean) ** 2, axis=(1, 2), keepdims=True))
        ca = Conv(c // 2, (1, 1), name="cha_att0")(contrast + mean)
        ca = nn.leaky_relu(ca, 0.1)
        ca = nn.sigmoid(Conv(2 * c, (1, 1), name="cha_att1")(ca))
        cha_res = Conv(c, (3, 3), name="post")(ca * cat_f)
        return cha_res + msf, panpre


class SFIINNet(nn.Module):
    """Reference SFIIN.py:317-340 `Net` (channels=8 fixed)."""

    ms_chans: int
    channels: int = 8

    @nn.compact
    def __call__(self, ms, pan, *, deterministic: bool = True):
        big_h, big_w = pan.shape[-3], pan.shape[-2]
        m_hr = resize_bicubic(ms, (big_h, big_w), align_corners=True)
        msf = Conv(self.channels, (3, 3), name="conv_p")(m_hr)
        panf = Conv(self.channels, (3, 3), name="conv_p1")(pan)
        feats = []
        for i in range(5):
            msf, panf = SpaFre(self.channels, name=f"block{i}")(msf, panf)
            feats.append(msf)
        fused = Conv(self.channels, (1, 1), name="fuse")(
            jnp.concatenate(feats, axis=-1))
        return Refine(self.ms_chans, name="refine")(fused) + m_hr


@MODELS.register()
class SFIIN(FlaxMethod):
    """Reference models/SFIIN.py:343-408, incl. the frequency losses."""

    def make_module(self):
        return SFIINNet(ms_chans=self.cfg.ms_chans)

    def losses(self, params, batch, *, rng, iter_id=0, with_output=False):
        out = self.apply(params, batch, train=True, rng=rng)
        target = batch["target"]
        total = jnp.asarray(0.0, jnp.float32)
        parts = {}
        weights = build_loss_weights(self.cfg.loss_cfg)
        need_freq = any("fre_" in n for n in weights)
        if need_freq:
            out_re, out_im = rfft2_pair(out, axes=(-3, -2), norm="backward")
            tgt_re, tgt_im = rfft2_pair(target, axes=(-3, -2), norm="backward")
            out_amp, out_pha = _safe_amp_pha(out_re, out_im)
            tgt_amp, tgt_pha = _safe_amp_pha(tgt_re, tgt_im)
        for name, lcfg in weights.items():
            if name == "rec_loss":
                value = reconstruction_loss(out, target, lcfg.type)
            elif name == "fre_amp_rec_loss":
                value = reconstruction_loss(out_amp, tgt_amp, lcfg.type)
            elif name == "fre_pha_rec_loss":
                value = reconstruction_loss(out_pha, tgt_pha, lcfg.type)
            else:
                continue
            total = total + lcfg.w * value
            parts[name] = value
        parts["full_loss"] = total
        return (total, parts, out) if with_output else (total, parts)
