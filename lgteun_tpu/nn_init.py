"""torch-compatible parameter initialisers (dependency-free leaf module).

torch Conv2d/Linear default init is kaiming_uniform(a=sqrt(5)) on
weights — which reduces to U(+-1/sqrt(fan_in)) — and
U(+-1/sqrt(fan_in)) on bias. Reproducing it keeps from-scratch training
in the reference's optimisation landscape (reference models train with
torch defaults except where they re-init explicitly).
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp

__all__ = ["torch_conv_kernel_init", "torch_conv_bias_init",
           "trunc_normal_init"]


def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """HWIO kernel init matching torch Conv2d default: fan_in =
    kh*kw*in_ch_per_group."""
    kh, kw, in_pg, _ = shape
    bound = math.sqrt(1.0 / (kh * kw * in_pg))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_conv_bias_init(fan_in: int) -> Callable:
    bound = math.sqrt(1.0 / fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def trunc_normal_init(std: float = 1.0, mean: float = 0.0,
                      a: float = -2.0, b: float = 2.0) -> Callable:
    """torch trunc_normal_ (reference models/common/LGT.py:21-42)."""

    def init(key, shape, dtype=jnp.float32):
        lower = (a - mean) / std
        upper = (b - mean) / std
        return jax.random.truncated_normal(
            key, lower, upper, shape, dtype) * std + mean

    return init
