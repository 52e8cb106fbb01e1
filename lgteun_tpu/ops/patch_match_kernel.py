"""Fused patch-correlation search for INNT's texture transformer.

Reference: models/INNT.py:100-143 (`Transformer_Fusion`): per 24x24
patch-image, normalised cross-correlation between every pair of 3x3
sub-patches (R = ref_n @ lr_n^T, [576, 576]), hard attention (max +
argmax over the ref axis), and transfer of the best-matching ref
sub-patch per query position.

The XLA lowering materialises R for all B*256 patch-images —
[8192, 576, 576] float32 = 10.8 GB of HBM traffic at eval batch 32,
which is INNT's entire performance problem. This kernel computes R in
VMEM per patch-image and emits only the [K, L] transferred patches and
[L] scores:

    R   = rn @ ln^T           (batched MXU matmul, K=36 contraction)
    S   = max_i R             (scores)
    F   = min_i {i : R_i = S} (first-max index — exact integer
                               reduction, matching torch.max's
                               first-max semantics even on exact ties)
    M   = (i == F)            (one-hot of the argmax, no gather needed)
    T   = ru @ M              (transfer as a matmul)

Ties are broken on the integer index directly (an epsilon bias on R is
below float32 ULP once |R| >= 0.25 and silently sums several tied ref
patches); exact-tie parity vs the XLA path is covered in
tests/test_patch_match.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_patch_match", "patch_match_xla"]


def patch_match_xla(lr_n, ref_n, ref_u):
    """XLA path. lr_n, ref_n: [N, L, K] row-normalised unfolds;
    ref_u: [N, K, L] raw ref unfold. Returns (T [N, K, L], S [N, L])."""
    r = jnp.einsum("nik,njk->nij", ref_n, lr_n)  # [N, L(ref i), L(query j)]
    s = jnp.max(r, axis=1)
    idx = jnp.argmax(r, axis=1)  # [N, L]
    t = jnp.take_along_axis(ref_u, idx[:, None, :], axis=2)
    return t, s


def _kernel(ln_ref, rn_ref, ru_ref, ts_ref, *, ppb, ll, kk):
    # R[p, i, j] = sum_k rn[p, i, k] ln[p, j, k]. Default (bf16-pass)
    # precision: near-tie argmax flips under matmul rounding are
    # symmetric with the XLA path (which also computes R at default
    # precision); exact-semantics parity is proven in interpret mode.
    r = jax.lax.dot_general(
        rn_ref[:], ln_ref[:],
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # [P, L, L]
    # scores ride in the last row of the packed [P, K+1, L] output
    col_max = jnp.max(r, axis=1, keepdims=True)  # [P, 1, L]
    ts_ref[:, kk:kk + 1, :] = col_max
    # First-max tie-break, exact: among {i : R_i == col_max} take the
    # smallest ref index via an integer min-reduction. (An epsilon bias
    # on R is below float32 ULP for |R| >= 0.25, leaving multiple
    # one-hot entries on exact ties — duplicate/flat patches are common
    # in real feature maps.)
    iota = jax.lax.broadcasted_iota(jnp.int32, (ppb, ll, ll), 1)
    masked = jnp.where(r == col_max, iota, ll)
    first = jnp.min(masked, axis=1, keepdims=True)  # [P, 1, L]
    onehot = (iota == first).astype(jnp.float32)
    # T[p, k, j] = sum_i ru[p, k, i] onehot[p, i, j]
    ts_ref[:, :kk, :] = jax.lax.dot_general(
        ru_ref[:], onehot,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST).astype(ts_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def fused_patch_match(lr_n, ref_n, ref_u):
    return _fused_pm_impl(lr_n, ref_n, ref_u)


def _fused_pm_fwd(lr_n, ref_n, ref_u):
    return _fused_pm_impl(lr_n, ref_n, ref_u), (lr_n, ref_n, ref_u)


def _fused_pm_bwd(res, grads):
    _, vjp = jax.vjp(patch_match_xla, *res)
    return vjp(grads)


fused_patch_match.defvjp(_fused_pm_fwd, _fused_pm_bwd)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_pm_impl(lr_n, ref_n, ref_u, *, interpret: bool = False):
    n, ll, kk = lr_n.shape
    ppb = 1
    for cand in (4, 2):
        if n % cand == 0:
            ppb = cand
            break
    kernel = functools.partial(_kernel, ppb=ppb, ll=ll, kk=kk)
    ts = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, kk + 1, ll), lr_n.dtype),
        grid=(n // ppb,),
        in_specs=[
            pl.BlockSpec((ppb, ll, kk), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ppb, ll, kk), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ppb, kk, ll), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ppb, kk + 1, ll), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret or jax.default_backend() != "tpu",
    )(lr_n, ref_n, ref_u)
    return ts[:, :kk, :], ts[:, kk, :]
