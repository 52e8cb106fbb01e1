"""Config loading tests: every shipped config parses into a typed
Config with the reference's hyperparameters, and builds its method."""

import glob
import os

import pytest

import lgteun_tpu.models  # noqa: F401
from lgteun_tpu.config import load_config
from lgteun_tpu.registry import MODELS

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "lgteun_tpu",
                          "configs")
CONFIGS = sorted(glob.glob(os.path.join(CONFIG_DIR, "*.py")))


@pytest.mark.parametrize("path", CONFIGS, ids=[os.path.basename(p) for p in CONFIGS])
def test_config_loads_and_method_registered(path):
    cfg = load_config(path)
    assert cfg.model_type in MODELS
    assert cfg.bit_depth == 11
    assert cfg.seed == 19971118


def test_lgteun_config_values():
    cfg = load_config(os.path.join(CONFIG_DIR, "unlg_former.py"))
    # reference configs/unlg_former.py values at index=2 (WV-3)
    assert cfg.ms_chans == 8
    assert cfg.max_iter == 35000
    assert cfg.optim_cfg["core_module"].lr == 1.5e-3
    assert cfg.sched_cfg.gamma == 0.85
    assert cfg.sched_cfg.step_size == 22750
    assert cfg.model_cfg["core_module"]["stage"] == 2
    assert cfg.train_set_cfg.batch_size == 4
    # shipped behavior matches the reference: no augmentation (its
    # train loop comments the aug call out, base_model.py:179-180);
    # LGTEUN_AUG=1 opts in
    assert cfg.aug_dict is None


def test_config_aug_and_test_only_env_toggles(monkeypatch):
    monkeypatch.setenv("LGTEUN_AUG", "1")
    monkeypatch.setenv("LGTEUN_ONLY_TEST", "1")
    monkeypatch.setenv("LGTEUN_CHECKPOINT", "/tmp/ckpt")
    cfg = load_config(os.path.join(CONFIG_DIR, "unlg_former.py"))
    assert cfg.aug_dict == {"lr_flip": 0.5, "ud_flip": 0.5}
    assert cfg.only_test is True
    assert cfg.checkpoint == "/tmp/ckpt"


def test_sfiin_config_has_frequency_losses():
    cfg = load_config(os.path.join(CONFIG_DIR, "SFIIN.py"))
    assert set(cfg.loss_cfg) == {"rec_loss", "fre_amp_rec_loss",
                                 "fre_pha_rec_loss"}
    assert cfg.loss_cfg["fre_amp_rec_loss"].w == 0.1
