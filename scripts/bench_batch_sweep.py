"""Throughput vs batch size for the LGTEUN fast path (headline shape).

Usage: python scripts/bench_batch_sweep.py [--batches 64,96,128,192]
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

from lgteun_tpu.models import lgteun_fast as F
from lgteun_tpu.models.lgteun import LGTEUN


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="64,96,128,192")
    args = ap.parse_args()

    c = 8
    rng = np.random.default_rng(0)
    model = LGTEUN(ms_chans=c, stage=2)
    ms1 = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, c)), jnp.float32)
    pan1 = jnp.asarray(rng.uniform(0, 1, (1, 128, 128, 1)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), ms1, pan1)["params"]

    for b in [int(s) for s in args.batches.split(",")]:
        ms = jnp.asarray(rng.uniform(0, 1, (b, 32, 32, c)), jnp.float32)
        pan = jnp.asarray(rng.uniform(0, 1, (b, 128, 128, 1)), jnp.float32)

        @jax.jit
        def chained(n, m_, p_):
            def body(_, carry):
                mc, acc = carry
                out = F.lgteun_fast_forward(params, mc, p_)
                return mc + 1e-12 * jnp.mean(out), acc + jnp.mean(out)

            _, acc = jax.lax.fori_loop(0, n, body, (m_, jnp.float32(0)))
            return acc

        def run(k):
            t0 = time.perf_counter()
            float(chained(k, ms, pan))
            return time.perf_counter() - t0

        run(1)
        iters = 12
        t1 = min(run(2) for _ in range(2))
        t2 = min(run(2 + iters) for _ in range(2))
        dt = (t2 - t1) / iters * 1000
        mps = b * 128 * 128 / dt / 1000
        print(f"batch {b:4d}: {dt:7.2f} ms/batch  {mps:6.1f} MP/s")


if __name__ == "__main__":
    main()
