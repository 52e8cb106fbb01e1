"""Torch-checkpoint ingestion: reference state_dicts -> flax PyTrees.

The reference releases whole-module torch pickles (reference
main.py:107-114, configs/unlg_former.py:29-36); these converters map a
state_dict's arrays into this framework's param trees so released
weights run directly (and so parity tests can transplant weights).
"""

from lgteun_tpu.convert.torch_import import (  # noqa: F401
    AUX_CONVERTERS,
    CONVERTERS,
    convert_state_dict,
)
