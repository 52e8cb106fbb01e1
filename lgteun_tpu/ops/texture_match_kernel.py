"""Whole-chain fused texture match for INNT's transformer fusion.

Reference: models/INNT.py:100-143 (`Transformer_Fusion`): per 24x24
patch-image — 3x3/pad-1 unfold of both feature maps, row normalisation,
normalised cross-correlation R = ref_n @ lr_n^T ([576, 576]), hard
attention (first-max over the ref axis), transfer of the best ref
sub-patch per query, and the overlap-summed 3x3 fold divided by 9.

`ops/patch_match_kernel.py` fused only the search itself; the chain
around it still materialised five [N, 576, 36] unfold tensors
(679 MB each at eval batch 32) plus two fine-grained transposes —
measured 60 of INNT's 92 ms/batch (scripts/profile_patch_match.py:
extract+norm 6.2, search kernel 23.8, fold 6.3, transposes/glue the
rest). This kernel takes the raw channel-major patch images
[N, C, 576] (75 MB) and does the WHOLE chain in VMEM per patch-image:

    unfold   9 lane-rolls of [C, 576] + border masks, stacked on
             sublanes -> [9C, 576] (column order (ky,kx,c) — any fixed
             order works: R contracts over it, and the fold inside the
             kernel uses the same order)
    norm     f32 column norms over the 9C sublanes (+1e-12, reference
             INNT.py:118-121 semantics)
    R        one MXU dot contracting the sublane axis
    argmax   first-max tie-break exactly as patch_match_kernel.py
    transfer T^T = onehot^T-contraction — computed as
             dot(ru, onehot) over the ref axis, no transposes
    fold     9 masked lane-rolls back, summed, /9

Outputs pack as [N, C+1, 576]: folded transfer t in rows :C, the
per-query max scores s in row C.

Transfer precision: the one-hot matmul copies ref values, so operand
rounding is the only error. Mosaic dots round f32 operands to bf16;
`hilo` (default) splits ru into two bf16 words (hi + lo) and runs two
single-pass dots — max |error| ~1e-4 relative vs exact f32 at ~3x less
MXU time than HIGHEST (measured: 18.0 vs 23.9 ms for the search-only
kernel). LGTEUN_PM_TRANSFER=highest restores the exact 6-pass dot.

Backward: custom_vjp falls back to the XLA composition (same recipe as
fused_patch_match), so INNT training is unaffected.

Measured (v5e, batch 32, 4-band, scripts/bench_zoo.py): INNT whole-model
2.88 -> 1.50 ms/img = 28.8x the RTX-3090 reference (was 15.0x, the zoo
floor). LGTEUN_MATMUL_PRECISION=highest (the only_test default) routes
INNT off this kernel onto the XLA chain (models/innt.py) because the
MXU rounds the R dot's operands to bf16, which can flip near-tie argmax
picks vs the exact similarity — the same accepted trade as
patch_match_kernel.py, now with a parity-grade escape hatch.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_texture_match", "texture_match_xla"]

_OFFSETS = [(ky, kx) for ky in (-1, 0, 1) for kx in (-1, 0, 1)]


def _valid_masks(side: int) -> np.ndarray:
    """[9, side*side] f32: mask_j[q] = 1 if query q's offset-j neighbour
    is in bounds (pad-1 border -> 0, torch F.unfold zero padding)."""
    y, x = np.mgrid[0:side, 0:side]
    masks = []
    for ky, kx in _OFFSETS:
        ok = ((y + ky >= 0) & (y + ky < side)
              & (x + kx >= 0) & (x + kx < side))
        masks.append(ok.reshape(-1))
    return np.asarray(masks, np.float32)


def texture_match_xla(lr, ref, side: int):
    """XLA reference composition. lr/ref: [N, C, side*side] f32 raw
    channel-major patch images. Returns (t [N, C, side*side] folded
    transfer / 9, s [N, side*side] scores)."""
    from lgteun_tpu.ops.patches import extract_patches, fold_patches

    n, c, q = lr.shape
    to_nhwc = lambda v: jnp.moveaxis(v.reshape(n, c, side, side), 1, -1)
    lr_unf = extract_patches(to_nhwc(lr), 3, 1, 1)    # [N, L, C*9]
    ref_unf = extract_patches(to_nhwc(ref), 3, 1, 1)
    ref_n = ref_unf / (jnp.linalg.norm(ref_unf, axis=2, keepdims=True) + 1e-12)
    lr_n = lr_unf / (jnp.linalg.norm(lr_unf, axis=2, keepdims=True) + 1e-12)
    r = jnp.einsum("nik,njk->nij", ref_n, lr_n)
    s = jnp.max(r, axis=1)
    idx = jnp.argmax(r, axis=1)
    t_km = jnp.take_along_axis(ref_unf.transpose(0, 2, 1),
                               idx[:, None, :], axis=2)
    t = fold_patches(t_km.transpose(0, 2, 1), (side, side), c, 3, 1, 1) / 9.0
    return jnp.moveaxis(t, -1, 1).reshape(n, c, q), s


def _kernel(lr_ref, rf_ref, masks_ref, out_ref, *, ppb, c, side, transfer):
    q = side * side
    masks = masks_ref[:]  # [9, q] f32 border-validity masks

    def unfold(x):
        cols = []
        for j, (ky, kx) in enumerate(_OFFSETS):
            s = ky * side + kx
            sh = jnp.roll(x, -s, axis=2) if s else x
            cols.append(sh * masks[j][None, None, :])
        return jnp.concatenate(cols, axis=1)  # [ppb, 9C, q]

    lr = lr_ref[:].astype(jnp.float32)
    rf = rf_ref[:].astype(jnp.float32)
    lu = unfold(lr)
    ru = unfold(rf)

    def rown(u):
        n2 = jnp.sum(u * u, axis=1, keepdims=True)
        return u * (1.0 / (jnp.sqrt(n2) + 1e-12))

    ln = rown(lu)
    rn = rown(ru)
    # R[p, i, j] = sum_k rn[p, k, i] ln[p, k, j] (contract sublanes)
    r = jax.lax.dot_general(
        rn, ln, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # [ppb, q(i ref), q(j query)]
    col_max = jnp.max(r, axis=1, keepdims=True)  # [ppb, 1, q]
    iota = jax.lax.broadcasted_iota(jnp.int32, (ppb, q, q), 1)
    masked = jnp.where(r == col_max, iota, q)
    first = jnp.min(masked, axis=1, keepdims=True)
    onehot = (iota == first)
    # T[p, k, j] = sum_i ru[p, k, i] onehot[p, i, j]
    dn = (((2,), (1,)), ((0,), (0,)))
    if transfer == "highest":
        t = jax.lax.dot_general(ru, onehot.astype(jnp.float32),
                                dimension_numbers=dn,
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST)
    else:  # hilo: exact-ish f32 via two single-pass bf16 dots
        hi16 = ru.astype(jnp.bfloat16)
        lo16 = (ru - hi16.astype(jnp.float32)).astype(jnp.bfloat16)
        oh16 = onehot.astype(jnp.bfloat16)
        t = (jax.lax.dot_general(hi16, oh16, dimension_numbers=dn,
                                 preferred_element_type=jnp.float32)
             + jax.lax.dot_general(lo16, oh16, dimension_numbers=dn,
                                   preferred_element_type=jnp.float32))
    # fold: out[p, ci, q + s_j] += T[p, j*c + ci, q] (masked, /9)
    acc = jnp.zeros((ppb, c, q), jnp.float32)
    for j, (ky, kx) in enumerate(_OFFSETS):
        s = ky * side + kx
        blk = t[:, j * c:(j + 1) * c, :] * masks[j][None, None, :]
        acc = acc + (jnp.roll(blk, s, axis=2) if s else blk)
    out_ref[:, :c, :] = (acc * (1.0 / 9.0)).astype(out_ref.dtype)
    out_ref[:, c:c + 1, :] = col_max.astype(out_ref.dtype)


@jax.custom_vjp
def fused_texture_match(lr, ref):
    """lr/ref: [N, C, side*side] f32 channel-major patch images (side
    inferred as isqrt). Returns (t [N, C, side*side], s [N, side*side])."""
    return _fused_tm_impl(lr, ref)


def _fused_tm_fwd(lr, ref):
    return _fused_tm_impl(lr, ref), (lr, ref)


def _fused_tm_bwd(res, grads):
    lr, ref = res
    side = int(round(lr.shape[2] ** 0.5))
    _, vjp = jax.vjp(lambda a, b: texture_match_xla(a, b, side), lr, ref)
    return vjp(grads)


fused_texture_match.defvjp(_fused_tm_fwd, _fused_tm_bwd)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_tm_impl(lr, ref, *, interpret: bool = False):
    n, c, q = lr.shape
    side = int(round(q ** 0.5))
    assert side * side == q, (side, q)
    ppb = 1
    for cand in (8, 4, 2):
        if n % cand == 0:
            ppb = cand
            break
    transfer = os.environ.get("LGTEUN_PM_TRANSFER", "hilo")
    kernel = functools.partial(_kernel, ppb=ppb, c=c, side=side,
                               transfer=transfer)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, c + 1, q), lr.dtype),
        grid=(n // ppb,),
        in_specs=[
            pl.BlockSpec((ppb, c, q), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ppb, c, q), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, q), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ppb, c + 1, q), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret or jax.default_backend() != "tpu",
    )(lr, ref, jnp.asarray(_valid_masks(side)))
    return out[:, :c, :], out[:, c, :]
