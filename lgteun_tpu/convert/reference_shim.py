"""Import shim for the reference PyTorch code at /root/reference.

The reference depends on mmcv, gdal/osr, numba, tifffile, torchvision
and pywt, none of which are installed here. For *parity testing* we
only need the nn.Module graphs and the numpy metric functions, so this
installs minimal stubs, puts /root/reference on sys.path, and patches
`.cuda()` to a no-op (reference models/common/CDC.py hard-codes it).

Test-only helper: the framework itself never imports torch or the
reference.
"""

from __future__ import annotations

import sys
import types

import os as _os

REFERENCE_ROOT = _os.environ.get("LGTEUN_REFERENCE_ROOT",
                                "/root/reference")


def _stub(name: str, **attrs) -> types.ModuleType:
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        sys.modules[name] = mod
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


class _Registry:
    """mmcv.utils.Registry lookalike (register + getitem + contains)."""

    def __init__(self, name):
        self.name = name
        self._module_dict = {}

    def register_module(self, cls=None):
        def wrap(c):
            self._module_dict[c.__name__] = c
            return c

        return wrap(cls) if cls is not None else wrap

    def __contains__(self, key):
        return key in self._module_dict

    def get(self, key):
        return self._module_dict[key]

    def __getitem__(self, key):
        return self._module_dict[key]


class _Config(dict):
    """mmcv.Config lookalike: attribute-style access over a dict."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self[k] = v


class _Timer:
    def __init__(self):
        import time

        self._t = time.time()

    def since_last_check(self):
        import time

        now = time.time()
        dt = now - self._t
        self._t = now
        return dt


def install_stubs() -> None:
    if REFERENCE_ROOT in sys.path:
        return
    # mmcv + mmcv.utils
    mmcv = _stub("mmcv", Config=_Config, Timer=_Timer)
    utils = _stub("mmcv.utils", Registry=_Registry, Config=_Config,
                  get_logger=lambda *a, **k: __import__("logging").getLogger("ref"))
    mmcv.utils = utils

    # raster/IO libs the model graphs never touch during forward
    _stub("gdal")
    _stub("osr")
    _stub("tifffile", imread=None, imsave=None)

    def _jit(*a, **k):
        if a and callable(a[0]):
            return a[0]

        def deco(fn):
            return fn

        return deco

    _stub("numba", jit=_jit, njit=_jit)
    _stub("pywt", wavedec2=None, waverec2=None)

    # torchvision: only VGG_Feat (unused by shipped configs) needs it
    tv = _stub("torchvision")
    tvm = _stub("torchvision.models", vgg19=lambda *a, **k: None)
    tv.models = tvm

    sys.path.insert(0, REFERENCE_ROOT)

    # CPU-only torch: make the reference's hard-coded .cuda() a no-op
    # (reference models/common/CDC.py:121-185)
    import torch

    torch.Tensor.cuda = lambda self, *a, **k: self  # type: ignore
    torch.nn.Module.cuda = lambda self, *a, **k: self  # type: ignore


def load_reference():
    """-> the reference `models` package (imports all 10 methods)."""
    install_stubs()
    import models  # noqa: F401  (reference package)

    return sys.modules["models"]


def reference_config(**kw):
    """Minimal mmcv-style config for constructing reference models."""
    cfg = _Config()
    cfg.update(kw)
    return cfg
