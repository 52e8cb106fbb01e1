"""Fused window multi-head self-attention (Pallas TPU kernel).

The hot matmuls of LGTEUN's LGT prior are the 8x8-window MHSA in the
local mixer (reference: models/common/LGT.py:112-146; SURVEY.md §3.4
marks them HOTTEST). The XLA path materialises qkv, the [64, 64]
attention logits, and the per-head outputs in HBM between fusions; this
kernel keeps the whole window-attention pipeline —

    qkv projection -> per-head scaled dot-product + learned position
    bias -> softmax -> value mix -> head merge

— in VMEM, with one HBM read of the window block and one write of the
result. Each grid program processes `windows_per_block` windows
(stacked on the sublane axis) so the [rows, C] tiles stay aligned.

Used by LGT's LocalMixer when `lgteun_tpu.ops.window_attention.ENABLED`
(TPU backend only; tests run the same kernel in interpreter mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_window_attention", "window_attention_xla"]


def window_attention_xla(xw, wqkv, bqkv, pos, heads, scale):
    """Plain-XLA reference path. xw: [N, S, C] windows; wqkv [C, 3C];
    bqkv [3C]; pos [heads, S, S]."""
    n, s, c = xw.shape
    hd = c // heads
    qkv = jnp.einsum("nsc,cd->nsd", xw, wqkv) + bqkv
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads_first(t):
        return t.reshape(n, s, heads, hd).transpose(0, 2, 1, 3)

    q, k, v = map(heads_first, (q, k, v))
    sim = jnp.einsum("nhic,nhjc->nhij", q * scale, k) + pos[None]
    attn = jax.nn.softmax(sim, axis=-1)
    out = jnp.einsum("nhij,nhjc->nhic", attn, v)
    return out.transpose(0, 2, 1, 3).reshape(n, s, c)


def _kernel(x_ref, wqkv_ref, bqkv_ref, pos_ref, out_ref, *, heads, seq,
            wpb, scale):
    """One program: `wpb` windows of `seq` tokens, C channels."""
    c = x_ref.shape[-1]
    hd = c // heads
    x = x_ref[:]  # [wpb*seq, C]
    qkv = jnp.dot(x, wqkv_ref[:], preferred_element_type=jnp.float32)
    qkv = qkv + bqkv_ref[:]
    x3 = qkv.reshape(wpb, seq, 3 * c)

    outs = []
    for h in range(heads):
        q = x3[:, :, h * hd:(h + 1) * hd]
        k = x3[:, :, c + h * hd:c + (h + 1) * hd]
        v = x3[:, :, 2 * c + h * hd:2 * c + (h + 1) * hd]
        sim = jax.lax.dot_general(
            q * scale, k,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # [wpb, seq, seq]
        sim = sim + pos_ref[h][None]
        sim = sim - jnp.max(sim, axis=-1, keepdims=True)
        e = jnp.exp(sim)
        attn = e / jnp.sum(e, axis=-1, keepdims=True)
        out_h = jax.lax.dot_general(
            attn, v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # [wpb, seq, hd]
        outs.append(out_h)
    out = jnp.concatenate(outs, axis=-1)  # [wpb, seq, C]
    out_ref[:] = out.reshape(wpb * seq, c).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("heads", "scale", "interpret"))
def fused_window_attention(xw, wqkv, bqkv, pos, *, heads: int,
                           scale: float, interpret: bool = False):
    """xw [N, S, C] -> [N, S, C]; same contract as
    `window_attention_xla` but one fused VMEM pass per window block."""
    n, s, c = xw.shape
    # pick windows-per-block so rows (wpb*s) lands on a sublane-friendly
    # 512 and N divides evenly; fall back to 1
    wpb = 1
    for cand in (8, 4, 2):
        if n % cand == 0:
            wpb = cand
            break
    rows = wpb * s

    kernel = functools.partial(_kernel, heads=heads, seq=s, wpb=wpb,
                               scale=scale)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n * s, c), xw.dtype),
        grid=(n // wpb,),
        in_specs=[
            pl.BlockSpec((rows, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 3 * c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((heads, s, s), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xw.reshape(n * s, c), wqkv, bqkv.reshape(1, 3 * c), pos)
    return out.reshape(n, s, c)
