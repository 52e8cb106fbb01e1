"""On-device component profiler for tunneled TPU runtimes.

Usage: python scripts/profile_model.py [--batch 64]

Times model components with the dispatch-proof harness used throughout
this repo's perf work: the repeat loop runs on device (dynamic-bound
fori_loop, inter-iteration data dependency) and two loop lengths are
differenced so dispatch/readback latency cancels.
"""

from __future__ import annotations

import argparse
import os
import time
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/lgteun_jax"))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])


def timed_call(fn, x, iters: int = 12) -> float:
    """Milliseconds per fn(x) call, dispatch-cost-free."""

    @jax.jit
    def chained(n, xx):
        def body(_, carry):
            x_c, acc = carry
            out = fn(x_c)
            return x_c + 1e-12 * jnp.mean(out), acc + jnp.mean(out)

        _, acc = jax.lax.fori_loop(0, n, body, (xx, jnp.float32(0)))
        return acc

    def run(k):
        t0 = time.perf_counter()
        float(chained(k, x))
        return time.perf_counter() - t0

    run(1)  # compile + warmup
    t1 = min(run(2) for _ in range(2))
    t2 = min(run(2 + iters) for _ in range(2))
    return (t2 - t1) / iters * 1000


def timed_module(mod, x, iters: int = 12, **kw) -> float:
    params = mod.init(jax.random.PRNGKey(0), x, **kw)
    return timed_call(lambda xx: mod.apply(params, xx, **kw), x, iters)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    args = ap.parse_args()
    b = args.batch
    rng = np.random.default_rng(0)

    from lgteun_tpu.models.common.lgt import (
        LGB, LGMixer, LGT, LNFFNBlock, LocalMixer, GlobalMixer,
    )
    from lgteun_tpu.models.lgteun import LGTEUN

    x16 = jnp.asarray(rng.uniform(0, 1, (b, 128, 128, 16)).astype(np.float32))
    x32 = jnp.asarray(rng.uniform(0, 1, (b, 128, 128, 32)).astype(np.float32))
    print(f"batch {b} @128px  (ms/call)")
    print(f"  LocalMixer 16ch : {timed_module(LocalMixer(), x16):7.2f}")
    print(f"  GlobalMixer 16ch: {timed_module(GlobalMixer(), x16):7.2f}")
    print(f"  LGMixer 32ch    : {timed_module(LGMixer(), x32):7.2f}")
    print(f"  LNFFNBlock 32ch : {timed_module(LNFFNBlock(), x32):7.2f}")
    print(f"  LGB(1) 32ch     : {timed_module(LGB(num_blocks=1), x32):7.2f}")

    model = LGTEUN(ms_chans=8, stage=2)
    ms = jnp.asarray(rng.uniform(0, 1, (b, 32, 32, 8)).astype(np.float32))
    pan = jnp.asarray(rng.uniform(0, 1, (b, 128, 128, 1)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), ms[:1], pan[:1])

    @jax.jit
    def chained(n, m_):
        def body(_, carry):
            mc, acc = carry
            out = model.apply(params, mc, pan)
            return mc + 1e-12 * jnp.mean(out), acc + jnp.mean(out)

        _, acc = jax.lax.fori_loop(0, n, body, (m_, jnp.float32(0)))
        return acc

    def run(k):
        t0 = time.perf_counter()
        float(chained(k, ms))
        return time.perf_counter() - t0

    run(1)
    t1 = min(run(2) for _ in range(2))
    t2 = min(run(8) for _ in range(2))
    dt = (t2 - t1) / 6
    print(f"  LGTEUN K=2 fwd  : {dt * 1000:7.2f}  "
          f"({b * 16384 / dt / 1e6:.2f} MP/s)")


if __name__ == "__main__":
    main()
