"""Model zoo registration.

Importing this package registers every method into the MODELS registry
(the reference does the same via models/__init__.py:10-29 importing all
model files so their decorators run).
"""

from lgteun_tpu.config import Config
from lgteun_tpu.models.base import ClassicalMethod, FlaxMethod
from lgteun_tpu.models.classical import gsa_fuse, sfim_fuse, wavelet_fuse
from lgteun_tpu.models.lgteun import LGTEUN as _LGTEUNModule
from lgteun_tpu.registry import MODELS

__all__ = ["UnlgFormer", "GSA", "SFIM", "Wavelet"]


@MODELS.register()
class UnlgFormer(FlaxMethod):
    """LGTEUN flagship (reference models/unlg_former.py:70-113)."""

    def make_module(self):
        g_cfg = dict(self.cfg.model_cfg.get("core_module", {}))
        return _LGTEUNModule(ms_chans=self.cfg.ms_chans,
                             stage=g_cfg.get("stage", 5))


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
