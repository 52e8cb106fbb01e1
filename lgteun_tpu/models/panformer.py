"""PanFormer — cross Swin transformer (ICME'22).

Reference: models/panformer.py:21-108 `CrossSwinTransformer`. Separate
PAN encoder (two Swin stages, each downscale x2: 128 -> 32) and MS
encoder (two stages at x1: stays 32); n_blocks bidirectional
cross-attention Swin modules exchanging pan<->ms features (query comes
from the *other* stream, reference modules.py:383-386); HR tail of
conv3x3 + 2x PixelShuffle up to full resolution; output clamped to
[0, 1] (norm_input) or the bit range.

Shipped hyperparameters (reference configs/PanFormer.py): n_feats 64,
8 heads, head_dim 8, window 4, 3 cross blocks.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from lgteun_tpu.config import Config
from lgteun_tpu.models.base import FlaxMethod
from lgteun_tpu.models.common.layers import Conv
from lgteun_tpu.models.common.swin import SwinModule, pixel_shuffle
from lgteun_tpu.registry import MODELS

__all__ = ["CrossSwinTransformer", "PanFormer"]


class CrossSwinTransformer(nn.Module):
    ms_chans: int
    n_feats: int = 64
    n_heads: int = 4
    head_dim: int = 16
    win_size: int = 4
    n_blocks: int = 3
    norm_input: bool = True
    bit_depth: int = 11

    @nn.compact
    def __call__(self, ms, pan, *, deterministic: bool = True):
        kw = dict(hidden_dimension=self.n_feats, layers=2,
                  num_heads=self.n_heads, head_dim=self.head_dim,
                  window_size=self.win_size, relative_pos_embedding=True)

        pan_feat = SwinModule(downscaling_factor=2, cross_attn=False,
                              name="pan_enc_0", **kw)(pan)
        pan_feat = SwinModule(downscaling_factor=2, cross_attn=False,
                              name="pan_enc_1", **kw)(pan_feat)
        ms_feat = SwinModule(downscaling_factor=1, cross_attn=False,
                             name="ms_enc_0", **kw)(ms)
        ms_feat = SwinModule(downscaling_factor=1, cross_attn=False,
                             name="ms_enc_1", **kw)(ms_feat)

        for i in range(self.n_blocks):
            # x supplies k/v, y supplies q (reference panformer.py:85-93)
            new_pan = SwinModule(downscaling_factor=1, cross_attn=True,
                                 name=f"pan_cross_ms_{i}", **kw)(pan_feat, ms_feat)
            new_ms = SwinModule(downscaling_factor=1, cross_attn=True,
                                name=f"ms_cross_pan_{i}", **kw)(ms_feat, pan_feat)
            pan_feat, ms_feat = new_pan, new_ms

        x = jnp.concatenate([pan_feat, ms_feat], axis=-1)
        x = Conv(self.n_feats * 4, (3, 3), name="tail_conv0")(x)
        x = nn.relu(pixel_shuffle(x, 2))
        x = Conv(self.n_feats * 4, (3, 3), name="tail_conv1")(x)
        x = nn.relu(pixel_shuffle(x, 2))
        x = Conv(self.n_feats, (3, 3), name="tail_conv2")(x)
        x = nn.relu(x)
        x = Conv(self.ms_chans, (3, 3), name="tail_conv3")(x)

        hi = 1.0 if self.norm_input else 2.0 ** self.bit_depth - 0.5
        return jnp.clip(x, 0.0, hi)


@MODELS.register()
class PanFormer(FlaxMethod):
    """Reference models/panformer.py:111-153."""

    def make_module(self):
        g = dict(self.cfg.model_cfg.get("core_module", {}))
        return CrossSwinTransformer(
            ms_chans=self.cfg.ms_chans,
            n_feats=g.get("n_feats", 64),
            n_heads=g.get("n_heads", 4),
            head_dim=g.get("head_dim", 16),
            win_size=g.get("win_size", 4),
            n_blocks=g.get("n_blocks", 3),
            norm_input=self.cfg.norm_input,
            bit_depth=self.cfg.bit_depth)
