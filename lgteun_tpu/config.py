"""Config system: typed dataclasses + mmcv-style Python config files.

The reference drives every run from a plain Python module loaded with
`mmcv.Config.fromfile` (reference: main.py:148, configs/*.py; full key
inventory in SURVEY.md §5). This framework keeps the same surface —
shipped per-method configs in lgteun_tpu/configs/*.py use identical
hyperparameters — but loads them into a typed `Config` with defaults,
no mmcv.

A config file is executed as Python; its module-level names become
config attributes. Unknown keys are preserved in `extras`.
"""

from __future__ import annotations

import dataclasses
import runpy
from dataclasses import dataclass, field
from typing import Any

__all__ = [
    "DatasetCfg", "LoaderCfg", "OptimCfg", "SchedCfg", "LossCfg", "Config",
    "load_config",
]


@dataclass
class DatasetCfg:
    image_dirs: list[str] = field(default_factory=list)
    bit_depth: int = 11
    norm_input: bool = False
    type: str = "PSDataset"


@dataclass
class LoaderCfg:
    dataset: DatasetCfg = field(default_factory=DatasetCfg)
    batch_size: int = 4
    shuffle: bool = True
    num_workers: int = 0  # accepted for parity; host pipeline ignores it


@dataclass
class OptimCfg:
    """Per-module optimiser (reference base_model.py:116-135; default
    Adam lr 1e-4 when absent, base_model.py:134-135)."""

    type: str = "Adam"
    lr: float = 1e-4
    betas: tuple[float, float] = (0.9, 0.999)
    eps: float = 1e-8  # torch.optim.Adam default
    weight_decay: float = 0.0
    momentum: float = 0.0  # SGD/RMSprop


@dataclass
class SchedCfg:
    """StepLR equivalent (reference base_model.py:137-150; defaults
    step 10000 / gamma 0.99)."""

    step_size: int = 10000
    gamma: float = 0.99


@dataclass
class LossCfg:
    type: str = "l1"
    w: float = 1.0
    # adversarial extras
    soft_label: bool = False
    gp_w: float = 10.0


@dataclass
class Config:
    # general
    name: str = "run"
    model_type: str = "UnlgFormer"
    datas: str = "synthetic"
    ms_chans: int = 4
    bit_depth: int = 11
    norm_input: bool = True
    seed: int = 19971118
    only_test: bool = False
    checkpoint: str | None = None
    pretrained: str | None = None
    work_dir: str = "runs"
    log_dir: str | None = None
    log_level: str = "INFO"
    use_sewar: bool = False

    # data
    train_set_cfg: LoaderCfg = field(default_factory=LoaderCfg)
    test_set0_cfg: LoaderCfg = field(default_factory=LoaderCfg)  # full-res
    test_set1_cfg: LoaderCfg = field(default_factory=LoaderCfg)  # reduced-res
    aug_dict: dict = field(default_factory=dict)

    # schedule
    max_iter: int = 0
    save_freq: int = 10000
    test_freq: int = 10000
    eval_freq: int = 10000
    log_freq: int = 10

    # per-module optimisation
    optim_cfg: dict[str, OptimCfg] = field(default_factory=dict)
    sched_cfg: SchedCfg = field(default_factory=SchedCfg)
    loss_cfg: dict[str, LossCfg] = field(default_factory=dict)
    model_cfg: dict[str, dict] = field(default_factory=dict)

    # TPU execution
    eval_batch_size: int = 16
    mesh_shape: dict[str, int] = field(default_factory=dict)  # e.g. {"data": 8}
    # bf16 compute in the train step (f32 master params + optimiser
    # state; params/batch cast per step, gradients arrive f32 through
    # the cast). Documented caveats in README.
    mixed_precision: bool = False
    # train steps executed per device dispatch (lax.scan over stacked
    # batches): amortises host->device round-trip latency, which
    # dominates small-model steps on remote/tunneled TPUs. Auto-reduced
    # to divide the active save/eval/test/log frequencies.
    steps_per_dispatch: int = 1
    # rematerialisation (jax.checkpoint) around the loss computation:
    # the backward pass recomputes the forward instead of storing its
    # activation residuals, trading ~one extra forward's FLOPs for
    # roughly forward-peak HBM — enables much larger train batches on
    # one chip. Gradients are bit-identical (tested).
    remat: bool = False
    extras: dict[str, Any] = field(default_factory=dict)

    def get(self, key, default=None):
        if hasattr(self, key):
            return getattr(self, key)
        return self.extras.get(key, default)


def _coerce(cls, value):
    """Build dataclass `cls` from a plain dict (nested-aware)."""
    if isinstance(value, cls):
        return value
    if not isinstance(value, dict):
        return value
    kwargs = {}
    hints = {f.name: f for f in dataclasses.fields(cls)}
    for k, v in value.items():
        if k in hints:
            ftype = hints[k].type
            if ftype == "DatasetCfg" or ftype is DatasetCfg:
                v = _coerce(DatasetCfg, v)
            kwargs[k] = v
    return cls(**kwargs)


def config_from_dict(ns: dict) -> Config:
    """Assemble a Config from a config-module namespace."""
    cfg = Config()
    simple = {f.name for f in dataclasses.fields(Config)}
    for key, value in ns.items():
        if key.startswith("_") or callable(value) or key in (
                "dataclass", "field"):
            continue
        if key in ("train_set_cfg", "test_set0_cfg", "test_set1_cfg"):
            setattr(cfg, key, _coerce(LoaderCfg, value))
        elif key == "sched_cfg":
            setattr(cfg, key, _coerce(SchedCfg, value))
        elif key == "optim_cfg":
            cfg.optim_cfg = {k: _coerce(OptimCfg, v) for k, v in value.items()}
        elif key == "loss_cfg":
            cfg.loss_cfg = {k: _coerce(LossCfg, v) for k, v in value.items()}
        elif key in simple:
            setattr(cfg, key, value)
        else:
            cfg.extras[key] = value
    return cfg


def load_config(path: str) -> Config:
    """Execute a Python config file and collect its namespace
    (the mmcv.Config.fromfile equivalent; reference main.py:148)."""
    ns = runpy.run_path(path)
    return config_from_dict(ns)
