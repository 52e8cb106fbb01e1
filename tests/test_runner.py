"""End-to-end runner tests on synthetic data: train a few iterations,
evaluate, checkpoint round-trip, classical-method eval, multi-device
batch sharding."""

import logging

import numpy as np
import pytest

from lgteun_tpu.config import (
    Config, DatasetCfg, LoaderCfg, LossCfg, OptimCfg, SchedCfg,
)
from lgteun_tpu.data.dataset import PSDataset
from lgteun_tpu.data.synthetic import make_synthetic_dataset
from lgteun_tpu.registry import build_model
from lgteun_tpu.runner import Runner


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    # 64px scenes keep CPU jit compiles fast while exercising every path
    root = tmp_path_factory.mktemp("synth")
    dirs = make_synthetic_dataset(str(root), n_train=4, n_test=3, bands=4,
                                  size=64)
    train = PSDataset([dirs["train"]], bit_depth=11)
    test = PSDataset([dirs["test"]], bit_depth=11)
    return train, test


def _cfg(model_type, tmp_path, **kw):
    cfg = Config(
        name="t", model_type=model_type, datas="synthetic", ms_chans=4,
        work_dir=str(tmp_path), max_iter=kw.pop("max_iter", 4),
        save_freq=0, test_freq=0, eval_freq=0, log_freq=2,
        eval_batch_size=2,
        optim_cfg={"core_module": OptimCfg(type="Adam", lr=1.5e-3)},
        sched_cfg=SchedCfg(step_size=2, gamma=0.85),
        loss_cfg={"rec_loss": LossCfg(type="l1", w=1.0)},
        model_cfg={"core_module": {"stage": 1}},
        train_set_cfg=LoaderCfg(batch_size=2),
        **kw,
    )
    return cfg


@pytest.mark.slow
def test_lgteun_train_eval_checkpoint(tmp_path, synth):
    train_ds, test_ds = synth
    cfg = _cfg("UnlgFormer", tmp_path)
    method = build_model(cfg.model_type, cfg)
    runner = Runner(cfg, method, train_ds, None, test_ds,
                    logger=logging.getLogger("test"))
    runner.init().set_optim()
    runner.train()
    res = runner.test(iter_id=cfg.max_iter, ref=True)
    assert "psnr" in res and np.isfinite(res["psnr"][0])

    # checkpoint round-trip restores identical params
    path = runner.save(cfg.max_iter)
    before = jax_tree_flat(runner.params)
    runner2 = Runner(cfg, method, train_ds, None, test_ds,
                     logger=logging.getLogger("test"))
    runner2.init()
    runner2.load_checkpoint(path)
    after = jax_tree_flat(runner2.params)
    for a, b in zip(before, after):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert runner2.last_iter == cfg.max_iter


def jax_tree_flat(tree):
    import jax

    return jax.tree.leaves(tree)


@pytest.mark.parametrize("model_type", ["GSA", "SFIM", "Wavelet"])
def test_classical_through_runner(tmp_path, synth, model_type):
    _, test_ds = synth
    cfg = _cfg(model_type, tmp_path, max_iter=0)
    method = build_model(cfg.model_type, cfg)
    runner = Runner(cfg, method, None, None, test_ds,
                    logger=logging.getLogger("test"))
    runner.init()
    res = runner.test(iter_id=0, ref=True)
    # classical fusion of a Wald-degraded synthetic scene should beat
    # 20 dB PSNR comfortably
    assert res["psnr"][0] > 20.0, res


def test_multi_device_data_parallel_sharding(tmp_path, synth):
    """Batch sharded over the 8 virtual devices; params replicated; one
    train step runs and improves loss determinism unaffected."""
    import jax

    assert len(jax.devices()) == 8
    train_ds, test_ds = synth
    cfg = _cfg("UnlgFormer", tmp_path, max_iter=2)
    cfg.train_set_cfg.batch_size = 8
    method = build_model(cfg.model_type, cfg)
    runner = Runner(cfg, method, train_ds, None, test_ds,
                    logger=logging.getLogger("test"))
    runner.init().set_optim()
    runner.train()
    # params remained replicated across devices
    leaf = jax.tree.leaves(runner.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_frozen_lu_buffers_survive_adamw():
    """InvertibleConv1x1's LU permutation/sign buffers (`frozen_*`
    leaves) must receive zero updates even under adamw's decoupled
    weight decay (a forward stop_gradient can't block decay)."""
    import jax
    import jax.numpy as jnp

    from lgteun_tpu.config import OptimCfg
    from lgteun_tpu.models.common.inv_blocks import InvertibleConv1x1
    from lgteun_tpu.runner import make_optimizer

    mod = InvertibleConv1x1(num_channels=8)
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((2, 4, 4, 8)).astype(np.float32))
    params = mod.init(jax.random.PRNGKey(0), x)["params"]

    tx = make_optimizer(OptimCfg(type="AdamW", lr=1e-2, weight_decay=0.1),
                        1e-2)
    state = tx.init(params)
    grads = jax.grad(lambda p: jnp.sum(
        mod.apply({"params": p}, x) ** 2))(params)
    updates, state = tx.update(grads, state, params)
    new = jax.tree.map(lambda p, u: p + u, params, updates)

    lu0, lu1 = params["lu"], new["lu"]
    np.testing.assert_array_equal(np.asarray(lu0["frozen_p"]),
                                  np.asarray(lu1["frozen_p"]))
    np.testing.assert_array_equal(np.asarray(lu0["frozen_sign_s"]),
                                  np.asarray(lu1["frozen_sign_s"]))
    # trainable factors DID move
    assert not np.allclose(np.asarray(lu0["log_s"]), np.asarray(lu1["log_s"]))


@pytest.mark.slow
def test_interrupt_resume_bit_identical(tmp_path, synth):
    """Full-state checkpointing: stopping at iter 3 and resuming must
    produce bit-identical params at iter 6 vs an uninterrupted run
    (Adam moments + schedule position + data/RNG streams all resume)."""
    train_ds, test_ds = synth

    def fresh(workdir, max_iter):
        cfg = _cfg("UnlgFormer", tmp_path / workdir, max_iter=max_iter)
        method = build_model(cfg.model_type, cfg)
        return cfg, Runner(cfg, method, train_ds, None, test_ds,
                           logger=logging.getLogger("test"))

    # uninterrupted: 6 iters straight
    _, r_full = fresh("full", 6)
    r_full.init().set_optim()
    r_full.train()

    # interrupted: 3 iters, checkpoint, new runner, resume to 6
    _, r_a = fresh("parts", 3)
    r_a.init().set_optim()
    r_a.train()
    path = r_a.save(3)

    cfg_b, r_b = fresh("parts2", 6)
    r_b.init()
    r_b.load_checkpoint(path)
    r_b.set_optim()  # must keep the restored opt state
    assert r_b.last_iter == 3
    r_b.train()

    want = jax_tree_flat(r_full.params)
    got = jax_tree_flat(r_b.params)
    assert len(want) == len(got)
    for a, b in zip(want, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_mixed_precision_training(tmp_path):
    """cfg.mixed_precision=True: bf16 compute with f32 master params —
    loss decreases and params stay float32."""
    import logging

    import jax
    import numpy as np

    from lgteun_tpu.config import Config, LoaderCfg, LossCfg, OptimCfg
    from lgteun_tpu.data.synthetic import make_synthetic_dataset
    from lgteun_tpu.data.dataset import PSDataset
    from lgteun_tpu.registry import build_model
    from lgteun_tpu.runner import Runner

    dirs = make_synthetic_dataset(str(tmp_path / "d"), n_train=4, n_test=0,
                                  bands=4, size=64)
    ds = PSDataset(image_dirs=[dirs["train"]], bit_depth=11)
    cfg = Config(model_type="lightnet", ms_chans=4, max_iter=8,
                 save_freq=0, test_freq=0, eval_freq=0, log_freq=4,
                 norm_input=True, mixed_precision=True,
                 work_dir=str(tmp_path / "out"),
                 train_set_cfg=LoaderCfg(batch_size=2),
                 optim_cfg={"core_module": OptimCfg(type="Adam", lr=2e-3)},
                 loss_cfg={"rec_loss": LossCfg(type="l1", w=1.0)})
    method = build_model(cfg.model_type, cfg)
    runner = Runner(cfg, method, train_ds=ds,
                    logger=logging.getLogger("mp_test"))
    runner.init().set_optim()
    p0 = jax.tree.map(np.array, runner.params)
    runner.train()
    # master params remain f32 and moved
    for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(runner.params)):
        assert np.asarray(b).dtype == np.float32
    delta = max(float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
                for a, b in zip(jax.tree.leaves(p0),
                                jax.tree.leaves(runner.params)))
    assert delta > 1e-6


@pytest.mark.slow
def test_steps_per_dispatch_bit_identical(tmp_path):
    """steps_per_dispatch=3 must reproduce single-step dispatch (same
    batches, same fold_in rng keys) up to compilation-variant float
    rounding — XLA fuses the scanned step body differently, so exact
    bit equality is not guaranteed."""
    import logging

    import jax
    import numpy as np

    from lgteun_tpu.config import Config, LoaderCfg, LossCfg, OptimCfg
    from lgteun_tpu.data.dataset import PSDataset
    from lgteun_tpu.data.synthetic import make_synthetic_dataset
    from lgteun_tpu.registry import build_model
    from lgteun_tpu.runner import Runner

    dirs = make_synthetic_dataset(str(tmp_path / "d"), n_train=4, n_test=0,
                                  bands=4, size=64)
    ds = PSDataset(image_dirs=[dirs["train"]], bit_depth=11)

    def run(sdp):
        cfg = Config(model_type="lightnet", ms_chans=4, max_iter=6,
                     save_freq=0, test_freq=0, eval_freq=0, log_freq=3,
                     norm_input=True, steps_per_dispatch=sdp,
                     work_dir=str(tmp_path / f"out{sdp}"),
                     train_set_cfg=LoaderCfg(batch_size=2),
                     optim_cfg={"core_module": OptimCfg(type="Adam",
                                                        lr=2e-3)},
                     loss_cfg={"rec_loss": LossCfg(type="l1", w=1.0)})
        method = build_model(cfg.model_type, cfg)
        runner = Runner(cfg, method, train_ds=ds,
                        logger=logging.getLogger("sdp_test"))
        runner.init().set_optim().train()
        return runner.params

    p1 = run(1)
    p3 = run(3)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p3)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_remat_training_matches_plain(tmp_path):
    """cfg.remat=True (jax.checkpoint around the loss): the backward
    recomputes the forward instead of storing residuals — parameter
    trajectories must match the plain run to float-rounding tolerance
    (remat is semantically a no-op)."""
    import logging

    import jax
    import numpy as np

    from lgteun_tpu.config import Config, LoaderCfg, LossCfg, OptimCfg
    from lgteun_tpu.data.dataset import PSDataset
    from lgteun_tpu.data.synthetic import make_synthetic_dataset
    from lgteun_tpu.registry import build_model
    from lgteun_tpu.runner import Runner

    dirs = make_synthetic_dataset(str(tmp_path / "d"), n_train=4, n_test=0,
                                  bands=4, size=64)
    ds = PSDataset(image_dirs=[dirs["train"]], bit_depth=11)

    def run(remat):
        cfg = Config(model_type="lightnet", ms_chans=4, max_iter=6,
                     save_freq=0, test_freq=0, eval_freq=0, log_freq=3,
                     norm_input=True, remat=remat,
                     work_dir=str(tmp_path / f"out{int(remat)}"),
                     train_set_cfg=LoaderCfg(batch_size=2),
                     optim_cfg={"core_module": OptimCfg(type="Adam",
                                                        lr=2e-3)},
                     loss_cfg={"rec_loss": LossCfg(type="l1", w=1.0)})
        method = build_model(cfg.model_type, cfg)
        runner = Runner(cfg, method, train_ds=ds,
                        logger=logging.getLogger("remat_test"))
        runner.init().set_optim().train()
        return runner.params

    p0 = run(False)
    p1 = run(True)
    for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(p1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_steps_per_dispatch_freq_auto_reduce(tmp_path):
    """sdp that doesn't divide a frequency is gcd-reduced (here
    log_freq=5, sdp=4 -> effective 1) and training still completes."""
    import logging

    import numpy as np

    from lgteun_tpu.config import Config, LoaderCfg, LossCfg, OptimCfg
    from lgteun_tpu.data.dataset import PSDataset
    from lgteun_tpu.data.synthetic import make_synthetic_dataset
    from lgteun_tpu.registry import build_model
    from lgteun_tpu.runner import Runner

    dirs = make_synthetic_dataset(str(tmp_path / "d2"), n_train=2,
                                  n_test=0, bands=4, size=64)
    ds = PSDataset(image_dirs=[dirs["train"]], bit_depth=11)
    cfg = Config(model_type="lightnet", ms_chans=4, max_iter=5,
                 save_freq=0, test_freq=0, eval_freq=0, log_freq=5,
                 norm_input=True, steps_per_dispatch=4,
                 work_dir=str(tmp_path / "out_f"),
                 train_set_cfg=LoaderCfg(batch_size=2),
                 optim_cfg={"core_module": OptimCfg(type="Adam", lr=1e-3)},
                 loss_cfg={"rec_loss": LossCfg(type="l1", w=1.0)})
    method = build_model(cfg.model_type, cfg)
    runner = Runner(cfg, method, train_ds=ds,
                    logger=logging.getLogger("sdp_test2"))
    runner.init().set_optim().train()
    assert runner.last_iter == 5

@pytest.mark.slow
def test_selective_mixed_precision_unlgformer(tmp_path):
    """UnlgFormer's mixed_precision path is SELECTIVE (bf16 prior
    matmuls/convs with f32 accumulation; f32 LN/softmax/spectral and
    the whole unfolding gradient step — common/lgt.py, lgteun.py), not
    the Runner's blanket bf16 cast: on identical params/batch the
    training loss must track f32 at the per-mille level (round-2
    measured the blanket cast at a ~2 dB PSNR cost; selectivity is the
    fix), and the Runner must leave master params f32."""
    import logging

    import jax
    import numpy as np

    from lgteun_tpu.config import Config, LoaderCfg, LossCfg, OptimCfg
    from lgteun_tpu.data.dataset import PSDataset
    from lgteun_tpu.data.synthetic import make_synthetic_dataset
    from lgteun_tpu.registry import build_model
    from lgteun_tpu.runner import Runner

    dirs = make_synthetic_dataset(str(tmp_path / "d"), n_train=4, n_test=0,
                                  bands=4, size=64)
    ds = PSDataset(image_dirs=[dirs["train"]], bit_depth=11)

    def cfg_for(mixed):
        return Config(model_type="UnlgFormer", ms_chans=4, max_iter=2,
                      save_freq=0, test_freq=0, eval_freq=0, log_freq=2,
                      norm_input=True, mixed_precision=mixed,
                      work_dir=str(tmp_path / f"out_{mixed}"),
                      model_cfg={"core_module": {"stage": 1,
                                                 "drop_rate": 0.0}},
                      train_set_cfg=LoaderCfg(batch_size=2),
                      optim_cfg={"core_module": OptimCfg(type="Adam",
                                                         lr=1.5e-3)},
                      loss_cfg={"rec_loss": LossCfg(type="l1", w=1.0)})

    m16 = build_model("UnlgFormer", cfg_for(True))
    m32 = build_model("UnlgFormer", cfg_for(False))
    assert m16.handles_mixed

    params = m32.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    batch = {
        "input_lr": jax.numpy.asarray(
            rng.uniform(0, 1, (2, 16, 16, 4)), jax.numpy.float32),
        "input_pan": jax.numpy.asarray(
            rng.uniform(0, 1, (2, 64, 64, 1)), jax.numpy.float32),
        "target": jax.numpy.asarray(
            rng.uniform(0, 1, (2, 64, 64, 4)), jax.numpy.float32),
    }
    key = jax.random.PRNGKey(1)
    l32, _ = m32.losses(params, batch, rng=key)
    l16, _ = m16.losses(params, batch, rng=key)
    assert float(l16) != float(l32)  # bf16 actually engaged
    assert abs(float(l16) - float(l32)) <= 5e-3 * abs(float(l32)), (
        f"selective bf16 loss {float(l16)} strays from f32 {float(l32)}")

    g16 = jax.grad(lambda p: m16.losses(p, batch, rng=key)[0])(params)
    for leaf in jax.tree.leaves(g16):
        assert leaf.dtype == jax.numpy.float32
        assert bool(jax.numpy.all(jax.numpy.isfinite(leaf)))

    # integration: the Runner trains with it and master params stay f32
    runner = Runner(cfg_for(True), m16, train_ds=ds,
                    logger=logging.getLogger("smp_test"))
    runner.init().set_optim()
    p0 = jax.tree.map(np.array, runner.params)
    runner.train()
    moved = max(float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
                for a, b in zip(jax.tree.leaves(p0),
                                jax.tree.leaves(runner.params)))
    assert moved > 1e-6
    for leaf in jax.tree.leaves(runner.params):
        assert np.asarray(leaf).dtype == np.float32


@pytest.mark.slow
def test_wv3_sensor_mtf_end_to_end(tmp_path):
    """e2e rehearsal on WV-3 8-band data built with the PER-SENSOR MTF
    Wald branch — the recipe the reference's real WV-3 pairs were built
    with (reference model_based_utils.py:176-181,199-230). Full product
    loop: sensor-degraded TIFFs -> PSDataset -> train -> batched eval.
    """
    dirs = make_synthetic_dataset(str(tmp_path / "d"), n_train=4,
                                  n_test=2, bands=8, size=64,
                                  sensor="WV3")
    train_ds = PSDataset([dirs["train"]], bit_depth=11)
    test_ds = PSDataset([dirs["test"]], bit_depth=11)
    assert train_ds[0]["input_lr"].shape == (16, 16, 8)
    cfg = _cfg("UnlgFormer", tmp_path, max_iter=4)
    cfg.ms_chans = 8
    method = build_model(cfg.model_type, cfg)
    runner = Runner(cfg, method, train_ds, None, test_ds,
                    logger=logging.getLogger("test"))
    runner.init().set_optim()
    runner.train()
    res = runner.test(iter_id=cfg.max_iter, ref=True)
    assert "psnr" in res and np.isfinite(res["psnr"][0])
