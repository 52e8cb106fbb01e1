"""Training losses (reference: models/base/losses.py).

Functional JAX redesign of the reference loss classes:

- `reconstruction_loss` — mean L1/L2 (reference losses.py:19-40)
- `qnr_loss` — 1 - (1-D_lambda)(1-D_s), differentiable, built on the
  global-statistics Q-index (reference losses.py:141-153)
- `MutualInfoReg` — conv+fc VAE-style latent with bidirectional KL and
  cross BCE (reference losses.py:162-219); a flax module with explicit
  PRNG for the reparameterisation
- GAN losses — the reference runs the discriminator's optimiser *inside*
  the loss forward (reference losses.py:68-127); functionally that is
  two losses (`gan_d_loss`, `gan_g_loss`) consumed by an explicit
  two-optimiser train step in the runner. GAN/LSGAN/WGAN-GP variants
  with the WGAN-GP gradient penalty expressed via jax.grad.

`build_loss_weights` mirrors `get_loss_module`'s zero-weight skipping
(reference losses.py:222-249).
"""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

from lgteun_tpu.metrics.jax_metrics import d_lambda_global, d_s_global
from lgteun_tpu.nn_init import torch_conv_bias_init, torch_conv_kernel_init
from lgteun_tpu.ops.resize import downsample

__all__ = [
    "reconstruction_loss", "qnr_loss", "MutualInfoReg",
    "gan_d_loss", "gan_g_loss", "build_loss_weights",
]


def reconstruction_loss(out: jnp.ndarray, gt: jnp.ndarray,
                        loss_type: str = "l1") -> jnp.ndarray:
    if loss_type == "l1":
        return jnp.mean(jnp.abs(out - gt))
    if loss_type == "l2":
        return jnp.mean((out - gt) ** 2)
    raise ValueError(f"unknown reconstruction loss {loss_type!r}")


def qnr_loss(pan: jnp.ndarray, ms: jnp.ndarray, out: jnp.ndarray,
             pan_l: jnp.ndarray | None = None) -> jnp.ndarray:
    """1 - QNR on NHWC batches (reference losses.py:141-153). When
    ``pan_l`` is absent, PAN is bicubic-downsampled x4 with
    align_corners=True like the reference's `down_sample` fallback."""
    if pan_l is None:
        pan_l = downsample(pan, 4)
    dl = d_lambda_global(ms, out)
    ds = d_s_global(ms, pan, pan_l, out)
    return 1.0 - (1.0 - dl) * (1.0 - ds)


class MutualInfoReg(nn.Module):
    """Mutual-information regulariser (reference losses.py:162-219).

    Two conv stacks (k4 s2 p1, LeakyReLU between) encode each feature
    map to [B, channels*32*32]; four linear heads give tanh-squashed
    (mu, logvar) pairs; the loss is
    CE(sig(z_a), sig(z_b).detach()) + CE(sig(z_b), sig(z_a).detach())
    - KL(a||b) - KL(b||a),
    with the reference's quirk that the KL distributions use scale =
    exp(logvar) while the reparameterisation uses exp(0.5*logvar).
    Input features are [B, 128, 128, C_in] NHWC.
    """

    input_channels: int = 4
    channels: int = 4
    latent_size: int = 4

    @nn.compact
    def __call__(self, feat_a, feat_b, *, rng=None, noise=None):
        def conv_s2(feats, in_ch, name):
            return nn.Conv(feats, (4, 4), strides=(2, 2),
                           padding=((1, 1), (1, 1)),
                           kernel_init=torch_conv_kernel_init,
                           bias_init=torch_conv_bias_init(16 * in_ch),
                           name=name)

        def encode(x, l1, l2):
            y = conv_s2(self.channels, x.shape[-1], l1)(x)
            y = nn.leaky_relu(y, negative_slope=0.01)
            y = conv_s2(self.channels, self.channels, l2)(y)
            return y.reshape(y.shape[0], -1)

        fa = encode(feat_a, "layer1", "layer3")
        fb = encode(feat_b, "layer2", "layer4")

        def linear(x, name):
            fan_in = x.shape[-1]
            return nn.Dense(self.latent_size, name=name,
                            kernel_init=nn.initializers.variance_scaling(
                                1.0 / 3.0, "fan_in", "uniform"),
                            bias_init=torch_conv_bias_init(fan_in))(x)

        mu_a = jnp.tanh(linear(fa, "fc1_rgb3"))
        logvar_a = jnp.tanh(linear(fa, "fc2_rgb3"))
        mu_b = jnp.tanh(linear(fb, "fc1_depth3"))
        logvar_b = jnp.tanh(linear(fb, "fc2_depth3"))

        if noise is None:
            ka, kb = jax.random.split(rng)
            eps_a = jax.random.normal(ka, mu_a.shape)
            eps_b = jax.random.normal(kb, mu_b.shape)
        else:  # injectable for cross-framework parity tests
            eps_a, eps_b = noise
        z_a = mu_a + jnp.exp(0.5 * logvar_a) * eps_a
        z_b = mu_b + jnp.exp(0.5 * logvar_b) * eps_b

        def kl_normal(mu1, s1, mu2, s2):
            # KL(N(mu1,s1) || N(mu2,s2)) summed over latent dims
            return jnp.sum(
                jnp.log(s2 / s1) + (s1**2 + (mu1 - mu2) ** 2) / (2 * s2**2) - 0.5,
                axis=-1)

        sa, sb = jnp.exp(logvar_a), jnp.exp(logvar_b)
        bi_kld = jnp.mean(kl_normal(mu_a, sa, mu_b, sb)) + jnp.mean(
            kl_normal(mu_b, sb, mu_a, sa))

        pa = jax.nn.sigmoid(z_a)
        pb = jax.nn.sigmoid(z_b)

        def bce_sum(p, q):
            p = jnp.clip(p, 1e-7, 1 - 1e-7)
            return -jnp.sum(q * jnp.log(p) + (1 - q) * jnp.log(1 - p))

        ce_ab = bce_sum(pa, jax.lax.stop_gradient(pb))
        ce_ba = bce_sum(pb, jax.lax.stop_gradient(pa))
        return ce_ab + ce_ba - bi_kld


# ---------------------------------------------------------------------------
# GAN losses (explicit two-optimiser form of reference losses.py:43-138)
# ---------------------------------------------------------------------------

def _bce_with_logits_flipped(logits, target):
    p = jnp.clip(jax.nn.sigmoid(logits), 1e-7, 1 - 1e-7)
    return -jnp.mean(target * jnp.log(p) + (1 - target) * jnp.log(1 - p))


def gan_d_loss(d_apply: Callable, d_params, fake, real, gan_type: str = "GAN",
               *, rng=None, gp_w: float = 10.0) -> jnp.ndarray:
    """Discriminator loss; inputs are detached by the caller taking
    grads only w.r.t. d_params. Reproduces the reference variants,
    including the GAN branch's inverted-label quirk
    (reference losses.py:86-91 scores real against zeros and fake
    against ones, then negates)."""
    fake = jax.lax.stop_gradient(fake)
    real = jax.lax.stop_gradient(real)
    d_fake = d_apply(d_params, fake)
    d_real = d_apply(d_params, real)
    if gan_type == "GAN":
        real_loss = _bce_with_logits_flipped(d_real, jnp.zeros_like(d_real))
        fake_loss = _bce_with_logits_flipped(d_fake, jnp.ones_like(d_fake))
        return -(real_loss + fake_loss)
    if gan_type == "LSGAN":
        return (jnp.mean((d_real - 1.0) ** 2) + jnp.mean(d_fake**2)) / 2.0
    if gan_type == "WGAN-GP":
        loss_d = jnp.mean(d_fake - d_real)
        eps = jax.random.uniform(rng, (real.shape[0], 1, 1, 1))
        hat = fake * (1 - eps) + real * eps

        def d_sum(x):
            return jnp.sum(d_apply(d_params, x))

        grads = jax.grad(d_sum)(hat)
        gnorm = jnp.sqrt(jnp.sum(grads.reshape(grads.shape[0], -1) ** 2, axis=1)
                         + 1e-12)
        return loss_d + gp_w * jnp.mean((gnorm - 1.0) ** 2)
    raise ValueError(f"unknown gan type {gan_type!r}")


def gan_g_loss(d_apply: Callable, d_params, fake,
               gan_type: str = "GAN") -> jnp.ndarray:
    """Generator adversarial loss (reference losses.py:129-137)."""
    d_fake = d_apply(jax.lax.stop_gradient(d_params), fake)
    if gan_type == "GAN":
        return _bce_with_logits_flipped(d_fake, jnp.ones_like(d_fake))
    if gan_type == "LSGAN":
        return jnp.mean((d_fake - 1.0) ** 2)
    if gan_type == "WGAN-GP":
        return -jnp.mean(d_fake)
    raise ValueError(f"unknown gan type {gan_type!r}")


def build_loss_weights(loss_cfg: dict) -> dict:
    """{name: cfg} for losses with |w| > 1e-8 (reference
    losses.py:234-247)."""
    return {name: cfg for name, cfg in (loss_cfg or {}).items()
            if abs(getattr(cfg, "w", cfg.get("w", 0.0) if isinstance(cfg, dict) else 0.0)) > 1e-8}
