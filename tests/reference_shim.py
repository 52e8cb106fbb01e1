"""Thin re-export; the shim lives in the package so
scripts/convert_torch_ckpt.py can unpickle reference checkpoints too."""

from lgteun_tpu.convert.reference_shim import (  # noqa: F401
    REFERENCE_ROOT,
    install_stubs,
    load_reference,
    reference_config,
)
