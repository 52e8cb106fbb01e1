"""End-to-end adversarial (GAN) training through the Runner.

The reference's `AdversarialLoss` optimises the discriminator inside
the loss forward (reference losses.py:68-137) so any config can turn on
GAN training via a `*adv_loss*` entry. Here the Runner builds an
explicit alternating two-optimiser step
(runner._build_adversarial_train_step); these tests prove a
discriminator is instantiated as a second optimised module and that
both G and D actually move.
"""

import logging

import jax
import numpy as np
import pytest

from lgteun_tpu.config import Config, LoaderCfg, LossCfg, OptimCfg
from lgteun_tpu.registry import build_model
from lgteun_tpu.runner import Runner


class _ArrayDS:
    def __init__(self, n=4, c=4, ms=8, pan=32, seed=0):
        rng = np.random.default_rng(seed)
        self.items = [{
            "input_lr": rng.uniform(0, 1, (ms, ms, c)).astype(np.float32),
            "input_pan": rng.uniform(0, 1, (pan, pan, 1)).astype(np.float32),
            "input_pan_l": rng.uniform(0, 1, (pan // 2, pan // 2, 1)).astype(np.float32),
            "target": rng.uniform(0, 1, (pan, pan, c)).astype(np.float32),
            "image_id": f"t{i:03d}",
        } for i in range(n)]

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


def _gan_config(gan_type: str, **model_extra) -> Config:
    return Config(
        name="gan_test", model_type="lightnet", datas="synthetic",
        ms_chans=4, max_iter=3, save_freq=0, test_freq=0, eval_freq=0,
        log_freq=1, norm_input=True,
        train_set_cfg=LoaderCfg(batch_size=2),
        optim_cfg={"core_module": OptimCfg(type="Adam", lr=1e-3),
                   "discriminator": OptimCfg(type="Adam", lr=2e-4)},
        loss_cfg={"rec_loss": LossCfg(type="l1", w=1.0),
                  "adv_loss": LossCfg(type=gan_type, w=1e-3)},
        model_cfg={"discriminator": dict(type="PatchDiscriminator",
                                         n_feats=8, n_layers=2,
                                         norm_type="IN"),
                   **model_extra},
    )


@pytest.mark.parametrize("gan_type", ["LSGAN", "GAN", "WGAN-GP"])
def test_gan_training_moves_both_networks(gan_type):
    cfg = _gan_config(gan_type)
    method = build_model(cfg.model_type, cfg)
    assert "discriminator" in method.module_names
    runner = Runner(cfg, method, train_ds=_ArrayDS(),
                    logger=logging.getLogger("gan_test"))
    runner.init().set_optim()

    d0 = jax.tree.map(np.array, runner.params["discriminator"])
    g0 = jax.tree.map(np.array, runner.params["core_module"])
    runner.train()
    d1 = runner.params["discriminator"]
    g1 = runner.params["core_module"]

    d_delta = max(float(np.max(np.abs(a - b))) for a, b in zip(
        jax.tree.leaves(d0), jax.tree.leaves(d1)))
    g_delta = max(float(np.max(np.abs(a - b))) for a, b in zip(
        jax.tree.leaves(g0), jax.tree.leaves(g1)))
    assert d_delta > 1e-7, f"{gan_type}: discriminator did not train"
    assert g_delta > 1e-7, f"{gan_type}: generator did not train"


def test_gan_checkpoint_roundtrip(tmp_path):
    """Both optimiser states (G + D) survive save/load."""
    cfg = _gan_config("LSGAN")
    cfg.work_dir = str(tmp_path)
    method = build_model(cfg.model_type, cfg)
    runner = Runner(cfg, method, train_ds=_ArrayDS(),
                    logger=logging.getLogger("gan_test"))
    runner.init().set_optim().train()
    runner.save(iter_id=3)

    method2 = build_model(cfg.model_type, cfg)
    runner2 = Runner(cfg, method2, train_ds=_ArrayDS(),
                     logger=logging.getLogger("gan_test"))
    runner2.init()
    import os

    ckpt = os.path.join(runner._ckpt_dir(), "model_iter_3")
    runner2.load_checkpoint(ckpt)
    runner2.set_optim()
    for a, b in zip(jax.tree.leaves(runner.params["discriminator"]),
                    jax.tree.leaves(runner2.params["discriminator"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pixel_discriminator_variant():
    cfg = _gan_config("LSGAN")
    cfg.model_cfg["discriminator"] = dict(type="PixelDiscriminator",
                                          n_feats=8, norm_type="IN")
    method = build_model(cfg.model_type, cfg)
    params = method.init_params(jax.random.PRNGKey(0))
    assert "discriminator" in params
    import jax.numpy as jnp

    logits = method.d_apply(params["discriminator"],
                            jnp.zeros((1, 32, 32, 4)))
    assert logits.shape == (1, 32, 32, 1)


def test_vgg_discriminator_and_feat():
    """VGGDiscriminator (reference modules.py:225-262) is trainable from
    scratch; VGGFeat (modules.py:182-223) has the vgg19-slice structure
    and accepts transplanted torchvision weights via convert_vgg_feat."""
    import jax.numpy as jnp

    from lgteun_tpu.convert.torch_import import convert_vgg_feat
    from lgteun_tpu.models.common.discriminators import (
        VGGDiscriminator,
        VGGFeat,
    )

    d = VGGDiscriminator(in_size=32)
    p = d.init(jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 3)))
    out = d.apply(p, jnp.ones((2, 32, 32, 3)))
    assert out.shape == (2, 1)

    f = VGGFeat()
    pf = f.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3)))
    lv1, lv2, lv3 = f.apply(pf, jnp.ones((1, 32, 32, 3)))
    assert lv1.shape == (1, 32, 32, 64)
    assert lv2.shape == (1, 16, 16, 128)
    assert lv3.shape == (1, 8, 8, 256)

    # loader hook: fabricate a torchvision-layout features state_dict
    rng = np.random.default_rng(0)
    sd = {}
    for idx, (cin, cout) in zip((0, 2, 5, 7, 10),
                                ((3, 64), (64, 64), (64, 128),
                                 (128, 128), (128, 256))):
        sd[f"{idx}.weight"] = rng.normal(size=(cout, cin, 3, 3)).astype(np.float32)
        sd[f"{idx}.bias"] = rng.normal(size=(cout,)).astype(np.float32)
    loaded = convert_vgg_feat(sd)
    assert (jax.tree_util.tree_structure(pf["params"])
            == jax.tree_util.tree_structure(
                jax.tree.map(jnp.asarray, loaded)))
    f.apply({"params": loaded}, jnp.ones((1, 32, 32, 3)))


def test_qnr_loss_trains_through_runner():
    """A config with a QNR_loss entry (reference losses.py:141-153 —
    enableable in any config) trains without GT supervision weight on
    that term and both losses appear in the breakdown."""
    cfg = Config(
        name="qnr_test", model_type="lightnet", datas="synthetic",
        ms_chans=4, max_iter=2, save_freq=0, test_freq=0, eval_freq=0,
        log_freq=1, norm_input=True,
        train_set_cfg=LoaderCfg(batch_size=2),
        optim_cfg={"core_module": OptimCfg(type="Adam", lr=1e-3)},
        loss_cfg={"rec_loss": LossCfg(type="l1", w=1.0),
                  "QNR_loss": LossCfg(type="qnr", w=0.1)},
    )
    method = build_model(cfg.model_type, cfg)
    import jax.numpy as jnp

    ds = _ArrayDS()
    batch = {k: jnp.asarray(np.stack([ds[0][k], ds[1][k]]))
             for k in ("input_lr", "input_pan", "input_pan_l", "target")}
    params = method.init_params(jax.random.PRNGKey(0), (8, 32))
    total, parts = method.losses(params, batch,
                                 rng=jax.random.PRNGKey(1))
    assert "QNR_loss" in parts and "rec_loss" in parts
    assert np.isfinite(float(total))
    # gradient flows through the QNR term alone
    qnr_only = Config(**{**cfg.__dict__,
                         "loss_cfg": {"QNR_loss": LossCfg(type="qnr", w=1.0)}})
    m2 = build_model(cfg.model_type, qnr_only)
    g = jax.grad(lambda p: m2.losses(p, batch,
                                     rng=jax.random.PRNGKey(1))[0])(params)
    gmax = max(float(np.max(np.abs(x))) for x in jax.tree.leaves(g))
    assert gmax > 0
