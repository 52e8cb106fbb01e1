"""Method abstraction — the zoo's common interface.

The reference couples every method to a god-class runner via subclassing
(`Base_model`, reference models/base/base_model.py:25) with mutable
module/optimiser dicts. The TPU-native design separates concerns:

- a `Method` owns pure functions: `init_params` (PyTree per module),
  `apply` (forward), and `losses` (total + per-loss breakdown)
- the Runner (lgteun_tpu/runner.py) owns the loops, optimisers,
  checkpoints, sharding and logging — methods never mutate state

The default `losses` implements the reference's default `train_iter`
(L1 reconstruction on the core module's output, reference
base_model.py:206-226); methods with extra losses (SFIIN's frequency
losses, MutInf's MI ramp) override it.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from lgteun_tpu.config import Config
from lgteun_tpu.losses import build_loss_weights, reconstruction_loss

Params = Dict[str, Any]

__all__ = ["Method", "FlaxMethod", "ClassicalMethod"]


class Method:
    """Interface every registered method implements."""

    trainable: bool = True
    module_names: tuple[str, ...] = ("core_module",)

    def __init__(self, cfg: Config):
        self.cfg = cfg

    # -- pure functions -------------------------------------------------
    def init_params(self, rng, sample_hw: tuple[int, int] | None = None) -> Params:
        """``sample_hw`` = (ms_size, pan_size) spatial sizes used to
        trace initialisation (matters for modules whose dense layers
        depend on image size, e.g. MutInf's MI encoder). Defaults to the
        reference's 32/128 contract."""
        raise NotImplementedError

    def apply(self, params: Params, batch: dict, *, train: bool = False,
              rng=None) -> jnp.ndarray:
        """batch -> fused HrMS [B, H, W, C] (the reference's
        `get_model_output`)."""
        raise NotImplementedError

    def losses(self, params: Params, batch: dict, *, rng, iter_id=0):
        """-> (total_loss, {name: value}). Default: weighted L1/L2
        reconstruction (reference base_model.py:206-226). ``iter_id``
        is a traced scalar for iteration-dependent loss schedules
        (MutInf's MI ramp, reference MutInf.py:496)."""
        out = self.apply(params, batch, train=True, rng=rng)
        total = jnp.asarray(0.0, jnp.float32)
        parts = {}
        for name, lcfg in build_loss_weights(self.cfg.loss_cfg).items():
            if "rec_loss" in name:
                value = reconstruction_loss(out, batch["target"], lcfg.type)
                total = total + lcfg.w * value
                parts[name] = value
        parts["full_loss"] = total
        return total, parts

    def param_counts(self, params: Params) -> dict[str, int]:
        return {m: sum(x.size for x in jax.tree.leaves(params[m]))
                for m in params}


class FlaxMethod(Method):
    """Method backed by a single flax core module taking (ms, pan)."""

    def make_module(self):
        raise NotImplementedError

    def __init__(self, cfg: Config):
        super().__init__(cfg)
        self.module = self.make_module()

    def init_params(self, rng, sample_hw=None) -> Params:
        c = self.cfg.ms_chans
        ms_size, pan_size = sample_hw or (8, 32)
        ms = jnp.zeros((1, ms_size, ms_size, c), jnp.float32)
        pan = jnp.zeros((1, pan_size, pan_size, 1), jnp.float32)
        variables = self.module.init(rng, ms, pan)
        return {"core_module": variables["params"]}

    def apply(self, params, batch, *, train=False, rng=None):
        kwargs = {}
        if train and rng is not None:
            kwargs["rngs"] = {"dropout": rng}
        return self.module.apply(
            {"params": params["core_module"]},
            batch["input_lr"], batch["input_pan"],
            deterministic=not train, **kwargs)


class ClassicalMethod(Method):
    """Training-free numpy-era methods, now pure XLA (reference
    models/GSA.py etc. run per-image numpy on CPU; SURVEY.md §2.3)."""

    trainable = False
    module_names: tuple[str, ...] = ()
    fuse_fn = None  # staticmethod set by subclass

    def init_params(self, rng, sample_hw=None) -> Params:
        return {}

    def apply(self, params, batch, *, train=False, rng=None):
        return type(self).fuse_fn(batch["input_lr"], batch["input_pan"])
