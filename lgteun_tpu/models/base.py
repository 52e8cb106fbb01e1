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

    def losses(self, params: Params, batch: dict, *, rng, iter_id=0,
               with_output: bool = False):
        """-> (total_loss, {name: value}); with ``with_output=True``
        -> (total_loss, parts, fused_output) so callers that also need
        the generator forward (the adversarial train step) reuse it
        instead of recomputing — one forward by construction, not by
        hoping XLA CSEs a duplicate. Default: weighted L1/L2
        reconstruction (reference base_model.py:206-226). ``iter_id``
        is a traced scalar for iteration-dependent loss schedules
        (MutInf's MI ramp, reference MutInf.py:496)."""
        out = self.apply(params, batch, train=True, rng=rng)
        total = jnp.asarray(0.0, jnp.float32)
        parts = {}
        for name, lcfg in build_loss_weights(self.cfg.loss_cfg).items():
            if "rec_loss" in name:
                value = reconstruction_loss(out, batch["target"], lcfg.type)
            elif "QNR_loss" in name:
                # no-reference QNR loss (reference losses.py:141-153).
                # pan_l=None -> bicubic x4 downsample, exactly the
                # reference's `down_sample(pan)` (losses.py:152); the
                # dataset's Gaussian-pyramid `input_pan_l` is a
                # different degradation and is NOT what the reference
                # loss uses
                from lgteun_tpu.losses import qnr_loss

                value = qnr_loss(batch["input_pan"], batch["input_lr"],
                                 out)
            else:
                continue
            total = total + lcfg.w * value
            parts[name] = value
        parts["full_loss"] = total
        return (total, parts, out) if with_output else (total, parts)

    def param_counts(self, params: Params) -> dict[str, int]:
        return {m: sum(x.size for x in jax.tree.leaves(params[m]))
                for m in params}


class FlaxMethod(Method):
    """Method backed by a single flax core module taking (ms, pan).

    Adversarial training (reference losses.py:43-138 `AdversarialLoss`
    + models/common/modules.py discriminators): any config whose
    `loss_cfg` contains an `*adv_loss*` entry with weight != 0 gets a
    `discriminator` module (type/kwargs from
    `model_cfg['discriminator']`, default a PatchGAN with instance
    norm) as a second optimised module. The Runner then builds an
    alternating two-optimiser train step (D on `gan_d_loss`, then G
    against the *updated* D — same ordering as the reference, which
    steps D inside the loss forward before computing the G term)."""

    def make_module(self):
        raise NotImplementedError

    def __init__(self, cfg: Config):
        super().__init__(cfg)
        self.module = self.make_module()
        self.adv_name = None
        self.adv_cfg = None
        self.disc_module = None
        for name, lcfg in build_loss_weights(cfg.loss_cfg).items():
            if "adv_loss" in name:
                self.adv_name, self.adv_cfg = name, lcfg
                self.disc_module = self._make_discriminator()
                self.module_names = tuple(self.module_names) + (
                    "discriminator",)
                break

    def _make_discriminator(self):
        from lgteun_tpu.models.common.discriminators import (
            PatchDiscriminator,
            PixelDiscriminator,
            VGGDiscriminator,
        )

        dcfg = dict(self.cfg.model_cfg.get("discriminator", {}))
        kind = dcfg.pop("type", "PatchDiscriminator")
        table = {"PatchDiscriminator": PatchDiscriminator,
                 "PixelDiscriminator": PixelDiscriminator,
                 "VGGDiscriminator": VGGDiscriminator}
        if kind not in table:
            raise KeyError(
                f"no such discriminator {kind!r}; available: "
                f"{sorted(table)}")
        if kind != "VGGDiscriminator":
            # default IN: stateless (no running stats), jit-friendly
            dcfg.setdefault("norm_type", "IN")
        return table[kind](**dcfg)

    def d_apply(self, d_params, x):
        """Discriminator forward on fused images [B,H,W,C] -> logits."""
        return self.disc_module.apply({"params": d_params}, x)

    def init_params(self, rng, sample_hw=None) -> Params:
        c = self.cfg.ms_chans
        ms_size, pan_size = sample_hw or (8, 32)
        ms = jnp.zeros((1, ms_size, ms_size, c), jnp.float32)
        pan = jnp.zeros((1, pan_size, pan_size, 1), jnp.float32)
        variables = self.module.init(rng, ms, pan)
        params = {"core_module": variables["params"]}
        if self.disc_module is not None:
            d_rng = jax.random.fold_in(rng, 1)
            hr = jnp.zeros((1, pan_size, pan_size, c), jnp.float32)
            params["discriminator"] = self.disc_module.init(d_rng, hr)["params"]
        return params

    @staticmethod
    def _eval_dtype():
        """Inference autocast dtype: LGTEUN_EVAL_DTYPE=bf16 runs the
        whole forward in bfloat16 (params + activations cast at entry,
        output cast back to f32) — the TPU-native mixed-precision
        serving mode. Default f32 (reference numerics)."""
        import os

        return (jnp.bfloat16
                if os.environ.get("LGTEUN_EVAL_DTYPE") == "bf16"
                else None)

    def apply(self, params, batch, *, train=False, rng=None):
        kwargs = {}
        if train and rng is not None:
            kwargs["rngs"] = {"dropout": rng}
        core = params["core_module"]
        lr, pan = batch["input_lr"], batch["input_pan"]
        dtype = None if train else self._eval_dtype()
        if dtype is not None:
            cast = lambda t: jax.tree.map(
                lambda x: x.astype(dtype)
                if jnp.issubdtype(x.dtype, jnp.floating) else x, t)
            core, lr, pan = cast(core), cast(lr), cast(pan)
        out = self.module.apply({"params": core}, lr, pan,
                                deterministic=not train, **kwargs)
        return out.astype(jnp.float32) if dtype is not None else out


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
