"""GAN infrastructure and auxiliary blocks (reference:
models/common/modules.py:50-276 — present in the reference for its
AdversarialLoss but unused by the shipped configs; implemented here for
component parity so adv_loss configs work end-to-end).

- `PixelDiscriminator` / `PatchDiscriminator` (reference
  modules.py:111-160): per-pixel and PatchGAN (n_layers-deep, rf up to
  574) discriminators with BN/IN/None norm.
- `ResBlock` / `ResChAttnBlock` (reference modules.py:50-108).
- `MeanShift` (reference modules.py:169-180) as a pure function.
- `SFTLayer` (reference modules.py:263-276).

- `VGGDiscriminator` (reference modules.py:225-262) — trained from
  scratch, fully functional.
- `VGGFeat` (reference modules.py:182-223) — the module structure with
  random init; real torchvision vgg19 weights transplant via
  `convert.torch_import.convert_vgg_feat` when available (none ship in
  this environment).

Norm delta vs reference: the reference defaults discriminators to
BatchNorm; stateful batch stats don't fit the jitted two-optimiser GAN
step, so norm_type='BN' is rejected with a clear error and the default
is the stateless instance norm ('IN') — the standard PatchGAN choice.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from lgteun_tpu.models.common.layers import Conv

__all__ = ["PixelDiscriminator", "PatchDiscriminator", "VGGDiscriminator",
           "VGGFeat", "ResBlock", "ResChAttnBlock", "SFTLayer",
           "mean_shift"]


def _norm(norm_type: str | None, name: str):
    if norm_type is None:
        return None
    if norm_type == "BN":
        # BatchNorm needs a mutable batch_stats collection that the
        # jitted two-optimiser GAN step does not thread (and the
        # reference's shipped configs never use a BN discriminator,
        # reference modules.py:111-164). Fail at construction with a
        # clear message instead of a cryptic apply-time error
        # (round-2 advisory).
        raise ValueError(
            "norm_type='BN' is not supported for discriminators "
            "(stateful batch stats don't fit the jitted GAN step); "
            "use norm_type='IN' (stateless instance norm) or None")
    if norm_type == "IN":
        # instance norm == GroupNorm with one channel per group
        return nn.GroupNorm(num_groups=None, group_size=1, name=name)
    raise ValueError(f"no such norm layer: {norm_type!r}")


class PixelDiscriminator(nn.Module):
    """1x1-conv per-pixel discriminator (reference modules.py:111-126)."""

    n_feats: int = 64
    norm_type: str | None = "IN"  # reference defaults BN (modules.py); BN rejected here — see _norm

    @nn.compact
    def __call__(self, x):
        y = Conv(self.n_feats, (1, 1), name="conv0")(x)
        y = nn.leaky_relu(y, 0.2)
        y = Conv(self.n_feats * 2, (1, 1), name="conv1")(y)
        norm = _norm(self.norm_type, "norm1")
        if norm is not None:
            y = norm(y)
        y = nn.leaky_relu(y, 0.2)
        return Conv(1, (1, 1), name="conv2")(y)


class PatchDiscriminator(nn.Module):
    """PatchGAN discriminator (reference modules.py:129-160)."""

    n_feats: int = 64
    n_layers: int = 3
    norm_type: str | None = "IN"  # reference defaults BN (modules.py); BN rejected here — see _norm

    @nn.compact
    def __call__(self, x):
        y = Conv(self.n_feats, (4, 4), strides=(2, 2),
                 padding=((1, 1), (1, 1)), name="conv0")(x)
        y = nn.leaky_relu(y, 0.2)
        mult = 1
        for n in range(1, self.n_layers):
            mult = min(2 ** n, 8)
            y = Conv(self.n_feats * mult, (4, 4), strides=(2, 2),
                     padding=((1, 1), (1, 1)), name=f"conv{n}")(y)
            norm = _norm(self.norm_type, f"norm{n}")
            if norm is not None:
                y = norm(y)
            y = nn.leaky_relu(y, 0.2)
        mult = min(2 ** self.n_layers, 8)
        y = Conv(self.n_feats * mult, (4, 4), strides=(1, 1),
                 padding=((1, 1), (1, 1)), name="conv_pen")(y)
        norm = _norm(self.norm_type, "norm_pen")
        if norm is not None:
            y = norm(y)
        y = nn.leaky_relu(y, 0.2)
        return Conv(1, (4, 4), strides=(1, 1), padding=((1, 1), (1, 1)),
                    name="conv_out")(y)


class ResBlock(nn.Module):
    """conv-norm-relu-conv-norm + residual (reference modules.py:50-66)."""

    n_feats: int
    norm_type: str | None = "IN"  # reference defaults BN (modules.py); BN rejected here — see _norm

    @nn.compact
    def __call__(self, x):
        y = Conv(self.n_feats, (3, 3), name="conv0")(x)
        norm = _norm(self.norm_type, "norm0")
        if norm is not None:
            y = norm(y)
        y = nn.relu(y)
        y = Conv(self.n_feats, (3, 3), name="conv1")(y)
        norm = _norm(self.norm_type, "norm1")
        if norm is not None:
            y = norm(y)
        return y + x


class ResChAttnBlock(nn.Module):
    """Residual channel-attention block (reference modules.py:69-108)."""

    n_feats: int
    norm_type: str | None = "IN"  # reference defaults BN (modules.py); BN rejected here — see _norm

    @nn.compact
    def __call__(self, x):
        y = Conv(self.n_feats, (3, 3), name="c1a")(x)
        norm = _norm(self.norm_type, "n1a")
        if norm is not None:
            y = norm(y)
        y = nn.relu(y)
        y = Conv(self.n_feats, (3, 3), name="c1b")(y)
        norm = _norm(self.norm_type, "n1b")
        if norm is not None:
            y = norm(y)

        attn = jnp.mean(y, axis=(1, 2))  # GAP
        attn = nn.Dense(self.n_feats // 2, name="fc0")(attn)
        attn = nn.relu(attn)
        attn = nn.Dense(self.n_feats, name="fc1")(attn)
        attn = nn.sigmoid(attn)[:, None, None, :]

        z = Conv(self.n_feats, (3, 3), name="c2")(
            jnp.concatenate([attn * y, y], axis=-1))
        norm = _norm(self.norm_type, "n2")
        if norm is not None:
            z = norm(z)
        return z + x


class SFTLayer(nn.Module):
    """Spatial feature transform (reference modules.py:263-276)."""

    n_feats: int = 32

    @nn.compact
    def __call__(self, features, conditions):
        s = Conv(self.n_feats // 2, (1, 1), name="scale0")(conditions)
        s = Conv(self.n_feats, (1, 1), name="scale1")(nn.leaky_relu(s, 0.1))
        t = Conv(self.n_feats // 2, (1, 1), name="shift0")(conditions)
        t = Conv(self.n_feats, (1, 1), name="shift1")(nn.leaky_relu(t, 0.1))
        return features * (s + 1.0) + t


def mean_shift(x, rgb_range, rgb_mean, rgb_std, sign=-1):
    """Frozen per-channel affine (reference modules.py:169-180)."""
    mean = jnp.asarray(rgb_mean, x.dtype)
    std = jnp.asarray(rgb_std, x.dtype)
    return x / std + sign * rgb_range * mean / std


class VGGDiscriminator(nn.Module):
    """VGG-style discriminator (reference modules.py:225-262). Trained
    from scratch in the reference too — no pretrained weights involved;
    10 stride-alternating 3x3 convs then a 2-layer MLP head. `in_size`
    must match the (square) input so the flatten is static."""

    in_size: int = 160

    @nn.compact
    def __call__(self, x):
        feats = [32, 32, 64, 64, 128, 128, 256, 256, 512, 512]
        for i, f in enumerate(feats):
            stride = 2 if i % 2 == 1 else 1
            x = Conv(f, (3, 3), strides=(stride, stride),
                     name=f"conv{i}")(x)
            x = nn.leaky_relu(x, 0.2)
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(1024, name="fc0")(x)
        x = nn.leaky_relu(x, 0.2)
        return nn.Dense(1, name="fc1")(x)


class VGGFeat(nn.Module):
    """VGG19 feature slices for perceptual losses (reference
    modules.py:182-223: torchvision vgg19 `features[0:12]` split at
    relu1_1 / relu2_1 / relu3_1, preceded by the ImageNet MeanShift).

    The reference loads torchvision's pretrained weights; none ship in
    this environment, so parameters initialise randomly (torch conv
    default) and real VGG19 weights can be transplanted with
    `lgteun_tpu.convert.torch_import.convert_vgg_feat` from any
    torchvision `vgg19().features.state_dict()`. Returns the three
    feature levels (x_lv1, x_lv2, x_lv3)."""

    rgb_range: float = 1.0
    shift_enable: bool = True

    @nn.compact
    def __call__(self, x):
        if self.shift_enable:
            vgg_mean = (0.485, 0.456, 0.406)
            vgg_std = tuple(s * self.rgb_range
                            for s in (0.229, 0.224, 0.225))
            x = mean_shift(x, self.rgb_range, vgg_mean, vgg_std)
        # torchvision vgg19.features indices: 0,2 conv64; 5 conv128;
        # 7 conv128; 10 conv256 (maxpools at 4 and 9)
        x = nn.relu(Conv(64, (3, 3), name="conv0")(x))
        lv1 = x
        x = nn.relu(Conv(64, (3, 3), name="conv2")(x))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.relu(Conv(128, (3, 3), name="conv5")(x))
        lv2 = x
        x = nn.relu(Conv(128, (3, 3), name="conv7")(x))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.relu(Conv(256, (3, 3), name="conv10")(x))
        lv3 = x
        return lv1, lv2, lv3
