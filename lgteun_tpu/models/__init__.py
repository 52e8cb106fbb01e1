"""Model zoo registration.

Importing this package registers every method into the MODELS registry
(the reference does the same via models/__init__.py:10-29 importing all
model files so their decorators run).
"""

import jax

from lgteun_tpu.config import Config
from lgteun_tpu.models.base import ClassicalMethod, FlaxMethod
from lgteun_tpu.models.classical import gsa_fuse, sfim_fuse, wavelet_fuse
from lgteun_tpu.models.lgteun import LGTEUN as _LGTEUNModule
from lgteun_tpu.registry import MODELS

__all__ = ["UnlgFormer", "GSA", "SFIM", "Wavelet"]


@MODELS.register()
class UnlgFormer(FlaxMethod):
    """LGTEUN flagship (reference models/unlg_former.py:70-113).

    TPU inference uses the channel-major fast path
    (models/lgteun_fast.py; 112 -> 62 ms at the WV-3 bench shape,
    identical math — LGTEUN_FAST=0 restores the flax module).
    TPU f32 training ALSO uses the fast path (fused kernels through
    their custom_vjp wrappers, dropout as in-kernel masks —
    LGTEUN_FAST_TRAIN=0 restores the module); selective-bf16
    (`mixed_precision`) training and other backends use the module."""

    # UnlgFormer implements mixed precision SELECTIVELY inside the
    # module (bf16 prior matmuls/convs, f32 LN/softmax/spectral/
    # unfolding path — common/lgt.py) rather than via the Runner's
    # blanket bf16 cast, which round-2 measured at a ~2 dB PSNR loss.
    handles_mixed = True

    def make_module(self):
        g_cfg = dict(self.cfg.model_cfg.get("core_module", {}))
        self._stage = g_cfg.get("stage", 5)
        self._drop_rate = g_cfg.get("drop_rate", 0.1)
        import jax.numpy as jnp

        dtype = (jnp.bfloat16
                 if self.cfg.get("mixed_precision", False) else None)
        return _LGTEUNModule(ms_chans=self.cfg.ms_chans, stage=self._stage,
                             drop_rate=g_cfg.get("drop_rate", 0.1),
                             dtype=dtype)

    def apply(self, params, batch, *, train=False, rng=None):
        import os

        # LGTEUN_EVAL_DTYPE=bf16 is handled INSIDE the fast path as
        # selective bf16 STORAGE (trunk activations bf16, every
        # kernel's internal math f32 — `lgteun_fast._storage_dtype`),
        # not the blanket flax autocast (which round-2 measured at a
        # ~2 dB PSNR loss; still reachable via LGTEUN_FAST=0).
        if (jax.default_backend() == "tpu"
                and os.environ.get("LGTEUN_FAST", "1") == "1"):
            from lgteun_tpu.models.lgteun_fast import lgteun_fast_forward

            if not train:
                return lgteun_fast_forward(params["core_module"],
                                           batch["input_lr"],
                                           batch["input_pan"],
                                           stage=self._stage)
            if (os.environ.get("LGTEUN_FAST_TRAIN", "1") == "1"
                    and not self.cfg.get("mixed_precision", False)):
                return lgteun_fast_forward(params["core_module"],
                                           batch["input_lr"],
                                           batch["input_pan"],
                                           stage=self._stage, train=True,
                                           drop_rate=self._drop_rate,
                                           rng=rng)
        return super().apply(params, batch, train=train, rng=rng)


@MODELS.register()
class GSA(ClassicalMethod):
    """Component substitution (reference models/GSA.py)."""

    fuse_fn = staticmethod(gsa_fuse)


@MODELS.register()
class SFIM(ClassicalMethod):
    """Smoothing-filter intensity modulation (reference models/SFIM.py)."""

    fuse_fn = staticmethod(sfim_fuse)


@MODELS.register()
class Wavelet(ClassicalMethod):
    """Wavelet substitution (reference models/Wavelet.py)."""

    fuse_fn = staticmethod(wavelet_fuse)


def _register_optional():
    """Import the rest of the zoo; tolerate absence during bring-up."""
    import importlib

    for mod in ("lightnet", "panformer", "sfiin", "mutinf", "innt", "mdcun"):
        try:
            importlib.import_module(f"lgteun_tpu.models.{mod}")
        except ImportError:
            pass


_register_optional()
