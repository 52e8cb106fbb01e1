"""Minimal string->factory registries.

Replaces the reference's mmcv.Registry usage (reference:
models/base/builder.py:13-24, dataset/builder.py:13-26) with a tiny
dependency-free implementation. Methods self-register at import time via
the `@MODELS.register()` decorator, mirroring the reference's
`@MODELS.register_module()` pattern (reference: models/__init__.py:10-29).
"""

from __future__ import annotations

from typing import Any, Callable, Dict


class Registry:
    def __init__(self, name: str):
        self.name = name
        self._entries: Dict[str, Any] = {}

    def register(self, name: str | None = None) -> Callable:
        def deco(obj):
            key = name or obj.__name__
            if key in self._entries:
                raise KeyError(f"{key!r} already registered in {self.name}")
            self._entries[key] = obj
            return obj

        return deco

    def get(self, key: str):
        if key not in self._entries:
            raise KeyError(
                f"{key!r} not found in registry {self.name!r}; "
                f"available: {sorted(self._entries)}"
            )
        return self._entries[key]

    def __contains__(self, key: str) -> bool:
        return key in self._entries

    def keys(self):
        return sorted(self._entries)


MODELS = Registry("models")
DATASETS = Registry("datasets")


def build_model(model_type: str, *args, **kwargs):
    """Look up a registered method runner and instantiate it.

    Reference counterpart: models/base/builder.py:17-24.
    """
    import lgteun_tpu.models  # noqa: F401  (populates MODELS)

    return MODELS.get(model_type)(*args, **kwargs)
