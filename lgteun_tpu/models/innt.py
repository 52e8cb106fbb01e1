"""INNT (CTINN) — invertible NN + texture transformer (AAAI'22).

Reference: models/INNT.py. Pipeline: bicubic(align_corners=True)
upsample of MS; 3x3 conv feature heads for PAN and MS (n_feat/2 each);
a conv fusion branch and a patch-transformer fusion branch
(`PatchFusion`); concat; 3 InvBlocks over HIN dense subnets with the
invertible 1x1 mixing conv; fuse of the last block outputs; Refine1
tail; residual add.

Reference quirks reproduced bit-for-bit:
- `PatchFusion` reshapes the torch-unfold output [B, C*24*24, L]
  straight to [B*L, C, 24, 24] *without* permuting the feature and
  location axes first (reference INNT.py:152-162) — a layout scramble
  the trained model bakes in. We mirror the exact reshape semantics on
  torch-layout (NCHW/unfold) arrays.
- overlapping 24x24/stride-8 patches are folded back by summation with
  no overlap normalisation (torch F.fold semantics).
- `FeatureExtract.initialize()` re-inits every conv with xavier_normal
  scale 1.0, overriding subnet-level scaling (reference INNT.py:319-333).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from lgteun_tpu.models.base import FlaxMethod
from lgteun_tpu.models.common.inv_blocks import InvertibleConv1x1
from lgteun_tpu.models.common.layers import Conv
from lgteun_tpu.models.common.refine import Refine
from lgteun_tpu.models.mutinf import _HINConvBlock, _XConv1
from lgteun_tpu.ops.patches import extract_patches, fold_patches
from lgteun_tpu.ops.resize import resize_bicubic
from lgteun_tpu.registry import MODELS

__all__ = ["GPPNNINNT", "INNT"]


class TransformerFusion(nn.Module):
    """Normalised cross-correlation patch search + hard-attention
    transfer (reference INNT.py:100-143). Inputs NHWC [N,24,24,C]."""

    features: int

    @nn.compact
    def __call__(self, lrsr, ref):
        import os

        from lgteun_tpu.models.lgteun_fast import _parity_grade

        n, h, w, c = lrsr.shape
        # LGTEUN_MATMUL_PRECISION=highest (the only_test default) keeps
        # the whole chain on HIGHEST-precision XLA ops: inside the
        # Pallas kernels the MXU rounds the R dot's operands to bf16,
        # which can flip near-tie argmax picks vs the exact similarity.
        whole = (os.environ.get("LGTEUN_FUSED_TM", "1") == "1"
                 and not _parity_grade()
                 and jax.default_backend() == "tpu" and h == w)
        if whole:
            # whole-chain kernel: unfold + norm + search + transfer +
            # fold in one VMEM pass per patch-image — the XLA chain
            # around the search alone moved ~5x [N,576,36] unfold
            # tensors through HBM (ops/texture_match_kernel.py)
            from lgteun_tpu.ops.texture_match_kernel import (
                fused_texture_match,
            )

            lr_cm = jnp.moveaxis(lrsr, -1, 1).reshape(n, c, h * w)
            ref_cm = jnp.moveaxis(ref, -1, 1).reshape(n, c, h * w)
            t_cm, s_flat = fused_texture_match(lr_cm, ref_cm)
            t = jnp.moveaxis(t_cm.reshape(n, c, h, w), 1, -1)
            s = s_flat.reshape(n, h, w, 1)
        else:
            from lgteun_tpu.ops.patch_match_kernel import (
                fused_patch_match,
                patch_match_xla,
            )

            lr_unf = extract_patches(lrsr, 3, 1, 1)  # [N, L, C*9]
            ref_unf = extract_patches(ref, 3, 1, 1)  # [N, L, C*9]

            ref_n = ref_unf / (jnp.linalg.norm(ref_unf, axis=2,
                                               keepdims=True) + 1e-12)
            lr_n = lr_unf / (jnp.linalg.norm(lr_unf, axis=2,
                                             keepdims=True) + 1e-12)

            fused = (os.environ.get("LGTEUN_FUSED_PM", "1") == "1"
                     and not _parity_grade()
                     and jax.default_backend() == "tpu")
            if fused:
                # fused kernel never materialises the [N, L, L] similarity
                t_km, r_star = fused_patch_match(
                    lr_n, ref_n, ref_unf.transpose(0, 2, 1))
                t_unf = t_km.transpose(0, 2, 1)
            else:
                t_km, r_star = patch_match_xla(
                    lr_n, ref_n, ref_unf.transpose(0, 2, 1))
                t_unf = t_km.transpose(0, 2, 1)
            t = fold_patches(t_unf, (h, w), c, 3, 1, 1) / 9.0
            s = r_star.reshape(n, h, w, 1)

        y = Conv(self.features, (3, 3), name="trans0")(
            jnp.concatenate([t, lrsr], axis=-1))
        y = nn.relu(y)
        y = Conv(self.features, (3, 3), name="trans1")(y)
        return y * s + lrsr


class PatchFusion(nn.Module):
    """24x24/stride-8 patch decomposition around TransformerFusion with
    the reference's exact (scrambling) reshapes (INNT.py:148-163)."""

    features: int

    @nn.compact
    def __call__(self, msf, panf):
        b, h, w, c = msf.shape
        k, s, p = 24, 8, 8
        ms_u = extract_patches(msf, k, s, p)  # [B, L, C*k*k] torch layout^T
        pan_u = extract_patches(panf, k, s, p)
        length = ms_u.shape[1]
        # torch: [B, C*k*k, L].view(-1, c, 24, 24) — flatten in (ckk, L)
        # order then regroup; mirror exactly:
        def scramble(u):
            t = u.transpose(0, 2, 1)  # [B, C*k*k, L] (torch memory order)
            return t.reshape(b * length, c, k, k)

        ms_p = scramble(ms_u)
        pan_p = scramble(pan_u)
        fused = TransformerFusion(self.features, name="fuse")(
            jnp.moveaxis(ms_p, 1, -1), jnp.moveaxis(pan_p, 1, -1))
        fused = jnp.moveaxis(fused, -1, 1)  # back to [B*L, C, 24, 24]
        # torch: view(b, c*24*24, -1) then fold
        f = fused.reshape(b, c * k * k, length).transpose(0, 2, 1)
        return fold_patches(f, (h, w), c, k, s, p)


class _DenseBlockINNT(nn.Module):
    """Two chained HIN conv blocks, gc=16 (reference INNT.py:235-253)."""

    features: int
    gc: int = 16

    @nn.compact
    def __call__(self, x):
        x1 = nn.leaky_relu(_HINConvBlock(self.gc, name="conv1")(x), 0.2)
        return nn.leaky_relu(_HINConvBlock(self.features, name="conv2")(x1), 0.2)


class _InvBlockINNT(nn.Module):
    channel_num: int
    channel_split_num: int
    clamp: float = 0.8

    @nn.compact
    def __call__(self, x):
        s1 = self.channel_split_num
        s2 = self.channel_num - s1
        x = InvertibleConv1x1(self.channel_num, name="invconv")(x)
        x1, x2 = x[..., :s1], x[..., s1:]
        y1 = x1 + _DenseBlockINNT(s1, name="F")(x2)
        s = self.clamp * (jax.nn.sigmoid(
            _DenseBlockINNT(s2, name="H")(y1)) * 2 - 1)
        y2 = x2 * jnp.exp(s) + _DenseBlockINNT(s2, name="G")(y1)
        return jnp.concatenate([y1, y2], axis=-1)


class GPPNNINNT(nn.Module):
    """Reference INNT.py:370-404."""

    ms_chans: int
    n_feat: int = 8
    block_num: int = 3

    @nn.compact
    def __call__(self, ms, pan, *, deterministic: bool = True):
        big_h, big_w = pan.shape[-3], pan.shape[-2]
        m_hr = resize_bicubic(ms, (big_h, big_w), align_corners=True)
        half = self.n_feat // 2
        panf = Conv(half, (3, 3), name="convpan")(pan)
        mhrf = Conv(half, (3, 3), name="convms")(m_hr)
        conv_f = Conv(half, (3, 3), name="conv_fusion")(
            jnp.concatenate([mhrf, panf], axis=-1))
        trans_f = PatchFusion(half, name="transform_fusion")(mhrf, panf)
        out = jnp.concatenate([conv_f, trans_f], axis=-1)

        # outfuse starts as the stack *input* and concatenates block
        # outputs only for i > 1 (reference INNT.py:335-341: with
        # block_num=3 that is [input, block_2_output] -> 1x1 fuse)
        outs = [out]
        for i in range(self.block_num):
            out = _InvBlockINNT(self.n_feat, half, name=f"inv_{i}")(out)
            if i > 1:
                outs.append(out)
        hr = _XConv1(self.n_feat, 1, name="extract_fuse")(
            jnp.concatenate(outs, axis=-1))
        hr = Refine(self.ms_chans, name="refine")(hr) + m_hr
        return hr


@MODELS.register()
class INNT(FlaxMethod):
    """Reference models/INNT.py:393-450."""

    def make_module(self):
        g = dict(self.cfg.model_cfg.get("core_module", {}))
        return GPPNNINNT(ms_chans=self.cfg.ms_chans,
                        n_feat=g.get("n_feat", 8))
