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

__all__ = ["fused_window_attention", "fused_window_attention_v2_cm",
           "fused_window_attention_v3", "window_attention_xla"]


def window_attention_xla(xw, wqkv, bqkv, pos, heads, scale, dtype=None):
    """Plain-XLA reference path. xw: [N, S, C] windows; wqkv [C, 3C];
    bqkv [3C]; pos [heads, S, S].

    `dtype=bf16` = mixed-precision training mode: matmul operands in
    bf16 with f32 accumulation, softmax and positional bias in f32."""
    n, s, c = xw.shape
    hd = c // heads
    if dtype is not None:
        xw, wqkv, bqkv = (t.astype(dtype) for t in (xw, wqkv, bqkv))
    qkv = jnp.einsum("nsc,cd->nsd", xw, wqkv) + bqkv
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads_first(t):
        return t.reshape(n, s, heads, hd).transpose(0, 2, 1, 3)

    q, k, v = map(heads_first, (q, k, v))
    sim = jnp.einsum("nhic,nhjc->nhij", (q * scale).astype(q.dtype), k,
                     preferred_element_type=jnp.float32) + pos[None]
    attn = jax.nn.softmax(sim, axis=-1)  # f32 under mixed
    if dtype is not None:
        attn = attn.astype(dtype)
    out = jnp.einsum("nhij,nhjc->nhic", attn, v,
                     preferred_element_type=jnp.float32)
    if dtype is not None:
        out = out.astype(dtype)
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


def _kernel_v2(x_ref, wqkv_ref, bqkv_ref, pos_ref, out_ref, *, heads, seq,
               wpb, scale):
    """Transposed 3-D layout: every tile keeps `seq` on the lane axis so
    the VPU/MXU lanes stay filled despite tiny channel counts, and
    windows batch on the major axis. No lane-splitting reshapes (Mosaic
    rejects those).

    x_ref: [wpb, C, S]; wqkv_ref: [wpb, 3C, C] (pre-broadcast);
    bqkv_ref: [3C, 1]; pos_ref: [heads, S, S]; out_ref: [wpb, C, S].
    """
    c = x_ref.shape[1]
    hd = c // heads
    # qkv[w, f, s] = sum_c W[f, c] x[w, c, s] — batched over windows
    qkv = jax.lax.dot_general(
        wqkv_ref[:], x_ref[:],
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # [wpb, 3C, S]
    qkv = qkv + bqkv_ref[:][None]

    outs = []
    for h in range(heads):
        q = qkv[:, h * hd:(h + 1) * hd, :]              # [W, hd, S]
        k = qkv[:, c + h * hd:c + (h + 1) * hd, :]
        v = qkv[:, 2 * c + h * hd:2 * c + (h + 1) * hd, :]
        # sim[w, i, j] = sum_d q[w, d, i] k[w, d, j] — lanes = S
        sim = jax.lax.dot_general(
            q * scale, k,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # [W, S, S]
        sim = sim + pos_ref[h][None]
        sim = sim - jnp.max(sim, axis=-1, keepdims=True)
        e = jnp.exp(sim)
        attn = e / jnp.sum(e, axis=-1, keepdims=True)
        # out[w, d, i] = sum_j v[w, d, j] attn[w, i, j]
        out_h = jax.lax.dot_general(
            v, attn,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # [W, hd, S]
        outs.append(out_h)
    out = jnp.concatenate(outs, axis=1)  # [W, C, S]
    out_ref[:] = out.astype(out_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_window_attention_v2(xw, wqkv, bqkv, pos, heads: int, scale: float):
    """Transposed-layout fused window attention (differentiable: Pallas
    forward, XLA backward via recompute); same contract as
    `fused_window_attention`."""
    return _fused_v2_impl(xw, wqkv, bqkv, pos, heads=heads, scale=scale)


def _fused_v2_fwd(xw, wqkv, bqkv, pos, heads, scale):
    return (_fused_v2_impl(xw, wqkv, bqkv, pos, heads=heads, scale=scale),
            (xw, wqkv, bqkv, pos))


def _fused_v2_bwd(heads, scale, res, g):
    xw, wqkv, bqkv, pos = res
    _, vjp = jax.vjp(
        lambda a, b, c, d: window_attention_xla(a, b, c, d, heads, scale),
        xw, wqkv, bqkv, pos)
    return vjp(g)


fused_window_attention_v2.defvjp(_fused_v2_fwd, _fused_v2_bwd)


@functools.partial(jax.jit, static_argnames=("heads", "scale", "interpret"))
def _fused_v2_impl(xw, wqkv, bqkv, pos, *, heads: int,
                   scale: float, interpret: bool = False):
    """Kernel invocation (non-differentiable inner)."""
    xt = xw.transpose(0, 2, 1)  # [N, C, S]
    out = fused_window_attention_v2_cm(xt, wqkv, bqkv, pos, heads=heads,
                                       scale=scale, interpret=interpret)
    return out.transpose(0, 2, 1)


@functools.partial(jax.jit, static_argnames=("heads", "scale", "interpret"))
def fused_window_attention_v2_cm(xt, wqkv, bqkv, pos, *, heads: int,
                                 scale: float, interpret: bool = False):
    """Channel-major entry: xt [N, C, S] windows -> [N, C, S] — the
    kernel's native layout, no transposes (used by the channel-major
    LGT trunk)."""
    n, c, s = xt.shape
    wpb = 1
    # larger window blocks amortise per-program overhead (measured
    # 3.25 -> 2.54 ms at production size going 8 -> 64); 128 exceeds VMEM
    for cand in (64, 32, 16, 8, 4, 2):
        if n % cand == 0:
            wpb = cand
            break

    w_b = jnp.broadcast_to(wqkv.T[None], (wpb, 3 * c, c))

    kernel = functools.partial(_kernel_v2, heads=heads, seq=s, wpb=wpb,
                               scale=scale)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, c, s), xt.dtype),
        grid=(n // wpb,),
        in_specs=[
            pl.BlockSpec((wpb, c, s), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wpb, 3 * c, c), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * c, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((heads, s, s), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((wpb, c, s), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret or jax.default_backend() != "tpu",
    )(xt, w_b, bqkv.reshape(3 * c, 1), pos)
    return out


def _exp_from_tanh(x):
    """exp(x) for max-subtracted logits (x <= 0) as
    (1 + t) / (1 - t) with t = tanh(x / 2). Mosaic's exp is the
    dominant VPU cost of the softmax while its tanh is ~7x cheaper
    (same finding as `_gelu_exact` in ops/ffn_kernel.py). For x <= 0,
    1 - t is in [1, 2] so the division never cancels; 1 + t -> 0 only
    where exp(x) ~ 0 (including the -1e9 packing-mask lanes, which
    come out exactly 0)."""
    t = jnp.tanh(x * 0.5)
    return (1.0 + t) / (1.0 - t)


def _kernel_v3(x_ref, wqkv_ref, bqkv_ref, pos2_ref, out_ref, *, heads,
               seq2, wpb, scale, tanh_exp):
    """Two windows packed side-by-side on the lane axis (seq2 = 2*S =
    128 lanes — v2 used only 64 of 128). The position table is
    block-diagonal with -1e9 off-diagonal blocks, so the softmax over
    the full 128 lanes is exactly the per-window softmax
    (exp(-1e9 - rowmax) == 0).

    x_ref: [wpb, C, 2S]; wqkv_ref: [wpb, 3C, C]; bqkv_ref: [3C, 1];
    pos2_ref: [heads, 2S, 2S]; out_ref: [wpb, C, 2S]. bf16 in/out refs
    upcast on load; internal math (softmax especially) is always f32.
    """
    c = x_ref.shape[1]
    hd = c // heads
    qkv = jax.lax.dot_general(
        wqkv_ref[:], x_ref[:].astype(jnp.float32),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # [wpb, 3C, 2S]
    qkv = qkv + bqkv_ref[:][None]

    outs = []
    for h in range(heads):
        q = qkv[:, h * hd:(h + 1) * hd, :]
        k = qkv[:, c + h * hd:c + (h + 1) * hd, :]
        v = qkv[:, 2 * c + h * hd:2 * c + (h + 1) * hd, :]
        sim = jax.lax.dot_general(
            q * scale, k,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # [W, 2S, 2S]
        sim = sim + pos2_ref[h][None]
        # max-subtraction makes every logit <= 0, which is what lets
        # the softmax run on the tanh-form exp (the shift costs one
        # lane-reduce + broadcast per row; the exp it buys back is the
        # kernel's dominant VPU cost)
        sim = sim - jnp.max(sim, axis=-1, keepdims=True)
        e = _exp_from_tanh(sim) if tanh_exp else jnp.exp(sim)
        # normalisation is folded PAST the value matmul: out/sum equals
        # (V @ e^T)/sum row-wise, so the divide runs on [hd, 2S] instead
        # of [2S, 2S] — 1/16th the divides (measured ~4% off the
        # attention kernel; numerically the same sum, one rounding moved)
        recip = 1.0 / jnp.sum(e, axis=-1)          # [W, 2S]
        out_h = jax.lax.dot_general(
            v, e,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # [W, hd, 2S]
        outs.append(out_h * recip[:, None, :])
    out_ref[:] = jnp.concatenate(outs, axis=1).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("heads", "scale", "interpret",
                                             "tanh_exp"))
def fused_window_attention_v3_packed(xp, wqkv, bqkv, pos, *, heads: int,
                                     scale: float,
                                     interpret: bool = False,
                                     tanh_exp: bool = True):
    """xp [N2, C, 2S]: window PAIRS packed on the lane axis (2S = 128
    for the 8x8 windows) -> [N2, C, 2S]. ~2x the MXU/VPU lane
    utilisation of the v2 kernel on S=64 windows.

    tanh_exp=False reverts the softmax to Mosaic's plain exp (the
    fuse-level-1 reliability fallback, see ops.fuse_level)."""
    n2, c, s2 = xp.shape
    wpb = 1
    for cand in (64, 32, 16, 8, 4, 2):
        if n2 % cand == 0:
            wpb = cand
            break
    # block-diagonal position bias; off-diagonal blocks masked
    s = s2 // 2
    neg = jnp.full((heads, s, s), -1e9, pos.dtype)
    pos2 = jnp.concatenate([
        jnp.concatenate([pos, neg], axis=2),
        jnp.concatenate([neg, pos], axis=2)], axis=1)  # [heads, 2S, 2S]
    w_b = jnp.broadcast_to(wqkv.T[None], (wpb, 3 * c, c))

    kernel = functools.partial(_kernel_v3, heads=heads, seq2=s2, wpb=wpb,
                               scale=scale, tanh_exp=tanh_exp)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n2, c, s2), xp.dtype),
        grid=(n2 // wpb,),
        in_specs=[
            pl.BlockSpec((wpb, c, s2), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wpb, 3 * c, c), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * c, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((heads, s2, s2), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((wpb, c, s2), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret or jax.default_backend() != "tpu",
    )(xp, w_b, bqkv.reshape(3 * c, 1), pos2)


def window_attention_xla_packed(xp, wqkv, bqkv, pos, heads, scale):
    """XLA reference with the packed channel-major [N2, C, 2S]
    contract of `fused_window_attention_v3_packed` (unpack -> plain
    window attention -> repack; reshapes only, no relayout matmuls).
    Used as the recompute backward for the packed-train wrapper."""
    n2, c, s2 = xp.shape
    s = s2 // 2
    xw = xp.reshape(n2, c, 2, s).transpose(0, 2, 3, 1).reshape(2 * n2, s, c)
    out = window_attention_xla(xw, wqkv, bqkv, pos, heads, scale)
    return (out.reshape(n2, 2, s, c).transpose(0, 3, 1, 2)
            .reshape(n2, c, s2))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_window_attention_v3_packed_train(xp, wqkv, bqkv, pos, heads: int,
                                           scale: float):
    """Differentiable packed-pair window attention on the channel-major
    [N2, C, 2S] contract: Pallas v3 forward, XLA backward via recompute
    (`window_attention_xla_packed`) — the training-path entry for the
    fast trunk's local mixer (the inference trunk calls the raw packed
    kernel)."""
    return fused_window_attention_v3_packed(xp, wqkv, bqkv, pos,
                                            heads=heads, scale=scale,
                                            tanh_exp=_v3_tanh_exp())


def _packed_train_fwd(xp, wqkv, bqkv, pos, heads, scale):
    return (fused_window_attention_v3_packed(xp, wqkv, bqkv, pos,
                                             heads=heads, scale=scale,
                                             tanh_exp=_v3_tanh_exp()),
            (xp, wqkv, bqkv, pos))


def _packed_train_bwd(heads, scale, res, g):
    xp, wqkv, bqkv, pos = res
    _, vjp = jax.vjp(
        lambda a, b, c, d: window_attention_xla_packed(a, b, c, d, heads,
                                                       scale),
        xp, wqkv, bqkv, pos)
    return vjp(g)


fused_window_attention_v3_packed_train.defvjp(_packed_train_fwd,
                                              _packed_train_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_window_attention_v3(xw, wqkv, bqkv, pos, heads: int, scale: float):
    """Differentiable packed-pair window attention on [N, S, C] windows
    (N even): Pallas v3 forward — two windows per 128-lane row — with
    XLA backward via recompute, same contract as
    `fused_window_attention_v2`. The kernel treats the two packed
    windows independently (block-diagonal position bias with -1e9
    masks), so ANY pairing of windows is exact; consecutive windows
    from `window_partition` are used for locality."""
    return _fused_v3_impl(xw, wqkv, bqkv, pos, heads=heads, scale=scale,
                          tanh_exp=_v3_tanh_exp())


def _fused_v3_fwd(xw, wqkv, bqkv, pos, heads, scale):
    return (_fused_v3_impl(xw, wqkv, bqkv, pos, heads=heads, scale=scale,
                           tanh_exp=_v3_tanh_exp()),
            (xw, wqkv, bqkv, pos))


def _fused_v3_bwd(heads, scale, res, g):
    xw, wqkv, bqkv, pos = res
    _, vjp = jax.vjp(
        lambda a, b, c, d: window_attention_xla(a, b, c, d, heads, scale),
        xw, wqkv, bqkv, pos)
    return vjp(g)


fused_window_attention_v3.defvjp(_fused_v3_fwd, _fused_v3_bwd)


def _v3_tanh_exp() -> bool:
    """The [N,S,C] wrapper's softmax form follows the fuse ladder:
    tanh-form exp at level >= 2, plain (on-chip-proven) exp below.
    Read in the custom_vjp primal/fwd bodies — those re-trace with
    every OUTER jit, and the value is then passed to `_fused_v3_impl`
    as a static arg so its jit cache keys on it (an env read inside
    the inner jit would go stale when the env changes in-process)."""
    from lgteun_tpu.ops import fuse_level

    return fuse_level() >= 2


@functools.partial(jax.jit, static_argnames=("heads", "scale", "interpret",
                                             "tanh_exp"))
def _fused_v3_impl(xw, wqkv, bqkv, pos, *, heads: int, scale: float,
                   interpret: bool = False, tanh_exp: bool = True):
    """Pack [N, S, C] windows into lane-axis pairs, run the v3 kernel,
    unpack (non-differentiable inner)."""
    n, s, c = xw.shape
    xp = (xw.reshape(n // 2, 2, s, c).transpose(0, 3, 1, 2)
          .reshape(n // 2, c, 2 * s))
    out = fused_window_attention_v3_packed(xp, wqkv, bqkv, pos, heads=heads,
                                           scale=scale, interpret=interpret,
                                           tanh_exp=tanh_exp)
    return (out.reshape(n // 2, c, 2, s).transpose(0, 2, 3, 1)
            .reshape(n, s, c))


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
        interpret=interpret or jax.default_backend() != "tpu",
    )(xw.reshape(n * s, c), wqkv, bqkv.reshape(1, 3 * c), pos)
    return out.reshape(n, s, c)
