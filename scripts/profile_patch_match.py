"""Break INNT's patch-match chain (60 of 92 ms/batch) into pieces and
A/B kernel variants, on chip.

Pieces: 3x3 extract + row-normalise (XLA), the fused Pallas search
kernel alone, and the 3x3 fold + scale. Variants: patches-per-block,
transfer-dot precision.

Usage: python scripts/profile_patch_match.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/lgteun_jax"))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lgteun_tpu.ops.patches import extract_patches, fold_patches


def timed(fn, args, iters=8):
    @jax.jit
    def chained(n, a0, rest):
        def body(_, carry):
            x_c, acc = carry
            out = fn(x_c, *rest)
            leaf = out[0] if isinstance(out, tuple) else out
            m = jnp.mean(leaf.astype(jnp.float32))
            return x_c + (1e-12 * m).astype(x_c.dtype), acc + m

        _, acc = jax.lax.fori_loop(0, n, body, (a0, jnp.float32(0)))
        return acc

    a0, rest = args[0], tuple(args[1:])

    def run(k):
        t0 = time.perf_counter()
        float(chained(k, a0, rest))
        return time.perf_counter() - t0

    run(1)
    t1 = min(run(2) for _ in range(2))
    t2 = min(run(2 + iters) for _ in range(2))
    return (t2 - t1) / iters * 1000


def kernel_variant(ln_ref, rn_ref, ru_ref, ts_ref, *, ppb, ll, kk,
                   transfer: str):
    r = jax.lax.dot_general(
        rn_ref[:], ln_ref[:],
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    col_max = jnp.max(r, axis=1, keepdims=True)
    ts_ref[:, kk:kk + 1, :] = col_max
    iota = jax.lax.broadcasted_iota(jnp.int32, (ppb, ll, ll), 1)
    masked = jnp.where(r == col_max, iota, ll)
    first = jnp.min(masked, axis=1, keepdims=True)
    onehot = (iota == first).astype(jnp.float32)
    if transfer == "highest":
        ts_ref[:, :kk, :] = jax.lax.dot_general(
            ru_ref[:], onehot,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST).astype(ts_ref.dtype)
    elif transfer == "default":
        ts_ref[:, :kk, :] = jax.lax.dot_general(
            ru_ref[:], onehot,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(ts_ref.dtype)
    elif transfer == "hilo":
        # exact-ish f32 via two bf16 passes: ru = hi + lo
        hi = ru_ref[:].astype(jnp.bfloat16)
        lo = (ru_ref[:] - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        oh16 = onehot.astype(jnp.bfloat16)
        dn = (((2,), (1,)), ((0,), (0,)))
        t = (jax.lax.dot_general(hi, oh16, dimension_numbers=dn,
                                 preferred_element_type=jnp.float32)
             + jax.lax.dot_general(lo, oh16, dimension_numbers=dn,
                                   preferred_element_type=jnp.float32))
        ts_ref[:, :kk, :] = t.astype(ts_ref.dtype)


def run_variant(lr_n, ref_n, ref_u, ppb, transfer):
    n, ll, kk = lr_n.shape
    kern = functools.partial(kernel_variant, ppb=ppb, ll=ll, kk=kk,
                             transfer=transfer)
    return pl.pallas_call(
        kern,
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
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(lr_n, ref_n, ref_u)


def main():
    b, half = 32, 4
    L = 256
    n = b * L
    rng = np.random.default_rng(0)
    patches = jnp.asarray(rng.uniform(0, 1, (n, 24, 24, half)), jnp.float32)

    def pre(a):
        u = extract_patches(a, 3, 1, 1)
        return u / (jnp.linalg.norm(u, axis=2, keepdims=True) + 1e-12)

    print("extract+norm (x2)     %8.2f ms" % timed(
        lambda a: pre(a) + pre(a + 1e-3), (patches,)), flush=True)

    lr_u = extract_patches(patches, 3, 1, 1)
    lr_n = lr_u / (jnp.linalg.norm(lr_u, axis=2, keepdims=True) + 1e-12)
    ref_n = jnp.asarray(lr_n) * 0.99
    ref_u = lr_u.transpose(0, 2, 1)

    print("fold 3x3 + scale      %8.2f ms" % timed(
        lambda t: fold_patches(t, (24, 24), half, 3, 1, 1) / 9.0,
        (lr_u,)), flush=True)

    from lgteun_tpu.ops.patch_match_kernel import fused_patch_match

    print("fused_patch_match now %8.2f ms" % timed(
        lambda a, bb, cc: fused_patch_match(a, bb, cc)[0],
        (lr_n, ref_n, ref_u)), flush=True)

    for ppb in (4, 8, 16):
        if n % ppb:
            continue
        for transfer in ("highest", "default", "hilo"):
            try:
                t = timed(lambda a, bb, cc, p=ppb, tr=transfer:
                          run_variant(a, bb, cc, p, tr)[:, :36, :],
                          (lr_n, ref_n, ref_u))
                print(f"variant ppb={ppb:2d} transfer={transfer:8s} "
                      f"{t:8.2f} ms", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"variant ppb={ppb:2d} transfer={transfer:8s} "
                      f"FAIL {str(e)[:100]}", flush=True)


if __name__ == "__main__":
    main()
