"""Attribute the block-tail kernel's time to its VPU pieces.

Monkeypatches `_gelu_exact` / `_dw_taps` to identity inside
`lgteun_tpu.ops.ffn_kernel` and re-times the tail kernel, so each
piece's cost is the delta. Numerics are wrong under the stubs — this
is a timing probe only.

Usage: python scripts/bench_tail_internals.py [--batch 96]
"""

from __future__ import annotations

import argparse
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

from lgteun_tpu.ops import ffn_kernel as FK


def timed(fn, *args, iters=16):
    @jax.jit
    def chained(n, a0):
        def body(_, carry):
            a, acc = carry
            out = fn(a, *args[1:])
            return a + 1e-12 * jnp.mean(out), acc + jnp.mean(out)

        _, acc = jax.lax.fori_loop(0, n, body, (a0, jnp.float32(0)))
        return acc

    def run(k):
        t0 = time.perf_counter()
        float(chained(k, args[0]))
        return time.perf_counter() - t0

    run(1)
    t1 = min(run(2) for _ in range(2))
    t2 = min(run(2 + iters) for _ in range(2))
    return (t2 - t1) / iters * 1000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=96)
    args = ap.parse_args()
    b, h, w, c, c4 = args.batch, 128, 128, 32, 128
    ch = c // 2

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, c, h, w)), jnp.float32)
    x1 = jnp.asarray(rng.normal(size=(b, ch, h, w)), jnp.float32)
    x2 = jnp.asarray(rng.normal(size=(b, ch, h, w)), jnp.float32)
    pk = jnp.asarray(rng.normal(size=(c, c)), jnp.float32) * 0.1
    pb = jnp.zeros((c,), jnp.float32)
    fp = {
        "ln_gamma": jnp.ones((c,)), "ln_beta": jnp.zeros((c,)),
        "w1": jnp.asarray(rng.normal(size=(c, c4)), jnp.float32) * 0.1,
        "b1": jnp.zeros((c4,)),
        "w2": jnp.asarray(rng.normal(size=(c4, c4)), jnp.float32) * 0.1,
        "b2": jnp.zeros((c4,)),
        "dw": jnp.asarray(rng.normal(size=(3, 3, c4)), jnp.float32) * 0.1,
        "bdw": jnp.zeros((c4,)),
        "w3": jnp.asarray(rng.normal(size=(c4, c)), jnp.float32) * 0.1,
        "b3": jnp.zeros((c,)),
    }

    def tail(a):
        # interpret=False path; a fresh wrapper defeats the impl's jit
        # cache so the monkeypatched kernel body is retraced
        return FK._fused_block_tail_impl.__wrapped__(
            a, x1, x2, pk, pb, fp, eps=1e-5, tile_rows=32,
            interpret=False, taps="vpu")

    full = timed(tail, x)
    print(f"tail full          : {full:6.2f} ms")

    saved_gelu = FK._gelu_exact
    saved_taps = FK._dw_taps
    try:
        FK._gelu_exact = lambda t, **k: t
        print(f"tail - gelu        : {timed(tail, x):6.2f} ms")
        FK._gelu_exact = saved_gelu
        FK._dw_taps = (lambda h2, dw, *, th, w, c4, left_edge,
                       right_edge, mxu: h2[:, w:-w])
        print(f"tail - taps        : {timed(tail, x):6.2f} ms")
        FK._gelu_exact = lambda t, **k: t
        print(f"tail - gelu - taps : {timed(tail, x):6.2f} ms")
    finally:
        FK._gelu_exact = saved_gelu
        FK._dw_taps = saved_taps


if __name__ == "__main__":
    main()
