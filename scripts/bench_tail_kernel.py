"""Micro-bench the fused block-tail kernel against its rooflines.

Times `fused_block_tail_cm` (and `fused_ln_ffn_cm`) in isolation at the
headline shapes with the dispatch-proof two-point on-device loop, plus
a pure-matmul probe of the same FLOP mix, so the kernel's distance from
the MXU roofline is measured rather than guessed.

Usage: python scripts/bench_tail_kernel.py [--batch 96]
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
    b = args.batch
    from lgteun_tpu.ops.ffn_kernel import fused_block_tail_cm, fused_ln_ffn_cm

    rng = np.random.default_rng(0)
    for h, w in ((128, 128), (64, 64)):
        c, c4 = 32, 128
        ch = c // 2
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
        n = h * w
        gf = 2 * n * (c * c + c * c4 + c4 * c4 + c4 * c) * b / 1e9
        t = timed(lambda a: fused_block_tail_cm(a, x1, x2, pk, pb, fp), x)
        print(f"tail  {h}x{w}: {t:7.2f} ms  ({gf / t * 1000:6.1f} GF/s, "
              f"{gf:.0f} GF)")
        t = timed(lambda a: fused_ln_ffn_cm(a, fp), x)
        print(f"ffn   {h}x{w}: {t:7.2f} ms")

        # MXU probe: the same matmul mix as one tail call, no kernel
        def probe(a):
            y = a.reshape(b, c, n)
            h1 = jnp.einsum("fcn->fcn", y)  # keep a dep
            m1 = jnp.einsum("dc,bcn->bdn", fp["w1"].T, y,
                            preferred_element_type=jnp.float32)
            m2 = jnp.einsum("dc,bcn->bdn", fp["w2"].T, m1,
                            preferred_element_type=jnp.float32)
            m3 = jnp.einsum("dc,bcn->bdn", fp["w3"].T, m2,
                            preferred_element_type=jnp.float32)
            mp = jnp.einsum("dc,bcn->bdn", pk.T, y,
                            preferred_element_type=jnp.float32)
            return (m3 + mp).reshape(b, c, h, w) + 0 * h1.reshape(b, c, h, w)

        t = timed(probe, x)
        print(f"probe {h}x{w}: {t:7.2f} ms  (XLA matmul-only same FLOPs)")


if __name__ == "__main__":
    main()
