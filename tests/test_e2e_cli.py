"""End-to-end CLI flow: config file -> main() -> train -> eval ->
checkpoint + TIFF outputs, plus determinism and no-ref eval."""

import logging
import os

import numpy as np
import pytest

from lgteun_tpu.config import load_config
from lgteun_tpu.data.dataset import PSDataset
from lgteun_tpu.data.synthetic import make_synthetic_dataset
from lgteun_tpu.main import build_runner, main
from lgteun_tpu.registry import build_model
from lgteun_tpu.runner import Runner


def _write_config(tmp_path, data_dir, work_dir):
    cfg_text = f'''
name = "e2e"
model_type = "UnlgFormer"
datas = "synthetic"
ms_chans = 4
bit_depth = 11
seed = 19971118
only_test = False
work_dir = {str(work_dir)!r}
max_iter = 2
save_freq = 0
test_freq = 0
eval_freq = 0
log_freq = 1
norm_input = True
eval_batch_size = 2
train_set_cfg = dict(
    dataset=dict(type="PSDataset", image_dirs=[{str(data_dir)!r}],
                 bit_depth=11),
    batch_size=2, shuffle=True)
test_set1_cfg = dict(
    dataset=dict(type="PSDataset", image_dirs=[{str(data_dir)!r}],
                 bit_depth=11),
    batch_size=1, shuffle=False)
optim_cfg = {{"core_module": dict(type="Adam", lr=1e-3)}}
sched_cfg = dict(step_size=10, gamma=0.9)
loss_cfg = {{"rec_loss": dict(type="l1", w=1.0)}}
model_cfg = {{"core_module": dict(stage=1)}}
'''
    p = tmp_path / "cfg.py"
    p.write_text(cfg_text)
    return str(p)


def test_cli_main_end_to_end(tmp_path):
    dirs = make_synthetic_dataset(str(tmp_path / "data"), n_train=2,
                                  n_test=0, bands=4, size=64)
    cfg_path = _write_config(tmp_path, dirs["train"], tmp_path / "out")
    cfg = load_config(cfg_path)
    runner = main(cfg, logging.getLogger("e2e"))
    # trained, saved, evaluated, wrote TIFF outputs
    ckpts = os.listdir(os.path.join(str(tmp_path / "out"), "synthetic",
                                    "train_out"))
    assert any("model_iter_2" in c for c in ckpts)
    out_root = os.path.join(str(tmp_path / "out"), "synthetic", "test_out")
    tif_count = sum(len(files) for _, _, files in os.walk(out_root))
    assert tif_count == 2
    assert runner.last_iter == 2


def test_init_determinism(tmp_path):
    """Same seed -> bit-identical parameters (the reference leans on
    seeding as its determinism story, SURVEY.md §4)."""
    import jax

    from lgteun_tpu.config import Config, LossCfg

    cfg = Config(model_type="UnlgFormer", ms_chans=4,
                 loss_cfg={"rec_loss": LossCfg()},
                 model_cfg={"core_module": {"stage": 1}})
    m = build_model("UnlgFormer", cfg)
    p1 = m.init_params(jax.random.PRNGKey(19971118))
    p2 = m.init_params(jax.random.PRNGKey(19971118))
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_no_ref_eval_through_runner(tmp_path):
    """Full-resolution (no-reference) eval path: D_lambda/D_s/QNR over
    a 128px split (block size 32 requires full-size tiles)."""
    from lgteun_tpu.config import Config, LossCfg

    dirs = make_synthetic_dataset(str(tmp_path / "d"), n_train=0, n_test=2,
                                  bands=4, size=128)
    ds = PSDataset([dirs["test"]], bit_depth=11)
    cfg = Config(model_type="SFIM", ms_chans=4, work_dir=str(tmp_path),
                 eval_batch_size=2, loss_cfg={"rec_loss": LossCfg()})
    runner = Runner(cfg, build_model("SFIM", cfg), None, ds, None,
                    logger=logging.getLogger("e2e"))
    runner.init()
    res = runner.test(iter_id=0, ref=False)
    assert set(res) == {"d_lambda", "d_s", "qnr"}
    assert 0.0 <= res["qnr"][0] <= 1.0
