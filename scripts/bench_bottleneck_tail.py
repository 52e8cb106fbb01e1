"""Micro-bench the block-tail kernel at the REAL bottleneck shape.

`scripts/bench_tail_kernel.py` times 64x64 at c=32/c4=128, but the
model's bottleneck LGB runs c=64/c4=256 (channels double after the
encoder downsample) through the roll-based whole-image variant
(`_tail_kernel_rolls`). This probe times that exact call against the
plain-XLA composition and a same-FLOPs matmul probe, so a pathological
roll lowering shows up as a measured number instead of hiding inside
the full-path "block tail" attribution.

Usage: python scripts/bench_bottleneck_tail.py [--batch 96]
"""

from __future__ import annotations

import argparse
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

from lgteun_tpu.ops.ffn_kernel import block_tail_xla, fused_block_tail_cm


def timed(fn, *args, iters=16):
    @jax.jit
    def chained(n, a0):
        def body(_, carry):
            a, acc = carry
            out = fn(a, *args[1:])
            m = jnp.mean(out.astype(jnp.float32))
            return (a + (1e-12 * m).astype(a.dtype)), acc + m

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
    ap.add_argument("--dtype", default="f32", choices=("f32", "bf16"),
                    help="kernel in/out storage dtype (bf16 halves the "
                         "kernel's HBM DMA; internal math unchanged "
                         "class — probes whether the tail is DMA-bound)")
    args = ap.parse_args()
    b = args.batch
    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    rng = np.random.default_rng(0)

    for (h, w, c) in ((64, 64, 64), (128, 128, 32)):
        c4, ch = 4 * c, c // 2
        x = jnp.asarray(rng.normal(size=(b, c, h, w)), dt)
        x1 = jnp.asarray(rng.normal(size=(b, ch, h, w)), dt)
        x2 = jnp.asarray(rng.normal(size=(b, ch, h, w)), dt)
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
        t_fused = timed(
            functools.partial(fused_block_tail_cm, proj_kernel=pk,
                              proj_bias=pb, ffn_params=fp),
            x, x1, x2)
        t_xla = timed(
            functools.partial(block_tail_xla, proj_kernel=pk, proj_bias=pb,
                              ffn_params=fp),
            x, x1, x2)

        # same-FLOPs matmul probe: proj (2x [ch,c]) + w1 + w2 + the tap
        # chain as _tail_kernel_rolls' MXU form — 3 matmuls of
        # [3c4,c4] against a 3-way channel-stacked input (one per row
        # offset, 9*c4^2*n MACs total) + w3, all on [C, h*w] pixel
        # blocks with the batch dim kept
        wtap = jnp.asarray(rng.normal(size=(3, 3 * c4, c4)), jnp.float32)

        def probe(xf, x1f, x2f):
            mm = lambda a, wt: jnp.einsum(
                "bcn,cd->bdn", a, wt,
                preferred_element_type=jnp.float32)
            xm = xf + (mm(x1f, pk[:ch]) + mm(x2f, pk[ch:]))
            h1 = mm(xm, fp["w1"])
            h2 = mm(h1, fp["w2"])
            stacked = jnp.concatenate([h2, h2, h2], axis=1)  # [b,3c4,n]
            acc = mm(stacked, wtap[0])
            for r in (1, 2):
                acc = acc + mm(stacked, wtap[r])
            return xm + mm(acc, fp["w3"])

        n = h * w
        t_probe = timed(probe, x.reshape(b, c, n),
                        x1.reshape(b, ch, n), x2.reshape(b, ch, n))
        print(f"[{b},{c},{h},{w}] c4={c4}: fused {t_fused:7.2f} ms  "
              f"xla {t_xla:7.2f} ms  matmul-probe {t_probe:7.2f} ms")


if __name__ == "__main__":
    main()
