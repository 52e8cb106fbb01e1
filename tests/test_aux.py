"""Auxiliary-surface tests: viz stretch, previews, .mat IO,
discriminators, GAN losses, augmentation crops."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lgteun_tpu.losses import gan_d_loss, gan_g_loss, qnr_loss
from lgteun_tpu.models.common.discriminators import (
    PatchDiscriminator,
    PixelDiscriminator,
)
from lgteun_tpu.utils.io import load_mat, save_mat
from lgteun_tpu.utils.viz import linear_stretch, save_preview_png


def test_linear_stretch_range(rng):
    img = rng.integers(0, 2048, size=(4, 32, 32)).astype(np.float64)
    out = linear_stretch(img)
    assert out.shape == img.shape
    assert out.min() >= 0.0 and out.max() <= 255.0
    # monotone: higher input -> higher (or saturated) output per band
    b = img[0].ravel()
    o = out[0].ravel()
    order = np.argsort(b)
    assert (np.diff(o[order]) >= -1e-9).all()


def test_engine_flag_parsing(monkeypatch):
    """Env-driven engine selectors must fall back to their defaults on
    garbage values (bench subprocesses set these; a typo must degrade
    gracefully, not crash a trace)."""
    from lgteun_tpu.ops import fuse_level
    from lgteun_tpu.ops.ffn_kernel import _gelu_mode, _taps_mode
    from lgteun_tpu.ops.spectral_kernel import _trig_mode

    for env, fn, good, default in [
        ("LGTEUN_FUSE_LEVEL", fuse_level, ("0", 0), 2),
        ("LGTEUN_FFN_TAPS", _taps_mode, ("mxu", "mxu"), "vpu"),
        ("LGTEUN_MIXER_TRIG", _trig_mode, ("native", "native"), "poly"),
        ("LGTEUN_GELU", _gelu_mode, ("rational", "rational"), "tanh"),
    ]:
        monkeypatch.delenv(env, raising=False)
        assert fn() == default
        monkeypatch.setenv(env, good[0])
        assert fn() == good[1]
        monkeypatch.setenv(env, "garbage")
        assert fn() == default


def test_save_preview_png(tmp_path, rng):
    img = rng.integers(0, 255, size=(4, 16, 16)).astype(np.float64)
    p = save_preview_png(img, str(tmp_path / "x.png"))
    assert os.path.exists(p)


def test_mat_roundtrip(tmp_path, rng):
    data = rng.standard_normal((5, 5))
    save_mat(str(tmp_path / "a.mat"), "x", data)
    back = load_mat(str(tmp_path / "a.mat"), "x")
    np.testing.assert_allclose(back, data)


def test_discriminators_shapes(rng):
    x = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 4)), jnp.float32)
    pix = PixelDiscriminator(n_feats=8)
    vars_ = pix.init(jax.random.PRNGKey(0), x)
    out = pix.apply(vars_, x)
    assert out.shape == (2, 32, 32, 1)

    patch = PatchDiscriminator(n_feats=8, n_layers=3)
    vars_ = patch.init(jax.random.PRNGKey(0), x)
    out = patch.apply(vars_, x)
    assert out.shape[0] == 2 and out.shape[-1] == 1
    assert out.shape[1] < 8  # receptive-field downscaling happened


def test_discriminator_bn_rejected(rng):
    """norm_type='BN' must fail loudly at init, not with a cryptic
    missing-batch_stats apply error (round-2 advisory)."""
    x = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 4)), jnp.float32)
    with pytest.raises(ValueError, match="BN"):
        PixelDiscriminator(n_feats=4, norm_type="BN").init(
            jax.random.PRNGKey(0), x)


def test_gan_losses_all_variants(rng):
    x = jnp.asarray(rng.uniform(0, 1, (2, 16, 16, 4)), jnp.float32)
    fake = x + 0.1
    pix = PixelDiscriminator(n_feats=4, norm_type=None)
    params = pix.init(jax.random.PRNGKey(0), x)

    def d_apply(p, inp):
        return pix.apply(p, inp)

    for gan_type in ("GAN", "LSGAN", "WGAN-GP"):
        d = gan_d_loss(d_apply, params, fake, x, gan_type,
                       rng=jax.random.PRNGKey(1))
        g = gan_g_loss(d_apply, params, fake, gan_type)
        assert np.isfinite(float(d)) and np.isfinite(float(g)), gan_type


def test_qnr_loss_zero_for_perfect(rng):
    """QNR loss of an output equal in structure to inputs is small and
    differentiable."""
    ms = jnp.asarray(rng.uniform(0.2, 0.8, (2, 8, 8, 4)), jnp.float32)
    pan = jnp.asarray(rng.uniform(0.2, 0.8, (2, 32, 32, 1)), jnp.float32)
    out = jnp.asarray(rng.uniform(0.2, 0.8, (2, 32, 32, 4)), jnp.float32)
    val = qnr_loss(pan, ms, out)
    assert np.isfinite(float(val))
    g = jax.grad(lambda o: qnr_loss(pan, ms, o))(out)
    assert np.isfinite(np.asarray(g)).all()


def test_augmentation_crops(tmp_path, rng):
    from lgteun_tpu.data.pipeline import _augment, _draw_aug

    batch = {
        "input_lr": rng.uniform(0, 1, (2, 8, 8, 4)).astype(np.float32),
        "input_pan": rng.uniform(0, 1, (2, 32, 32, 1)).astype(np.float32),
        "input_pan_l": rng.uniform(0, 1, (2, 8, 8, 1)).astype(np.float32),
        "target": rng.uniform(0, 1, (2, 32, 32, 4)).astype(np.float32),
    }
    gen = np.random.default_rng(0)
    out = _augment(batch, _draw_aug(gen, {"r4_crop": 1.0, "r2_crop": 1.0,
                                          "ud_flip": 1.0, "lr_flip": 1.0}))
    for k, v in out.items():
        assert v.shape == batch[k].shape
        assert not np.allclose(v, batch[k])
