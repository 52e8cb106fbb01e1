"""Ablation profiler for the LGTEUN channel-major fast path.

Times `lgteun_fast_forward` at the headline bench shape (batch 96,
WV-3 8-band) with individual components stubbed to identity, so the
per-component cost is the delta from the full path. Uses the same
dispatch-proof two-point on-device loop as bench.py.

Usage: python scripts/ablate_fast_path.py [--batch 96]
"""

from __future__ import annotations

import argparse
import contextlib
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


def timed(fn, ms, pan, iters=16):
    @jax.jit
    def chained(n, m_):
        def body(_, carry):
            mc, acc = carry
            out = fn(mc, pan)
            return mc + 1e-12 * jnp.mean(out), acc + jnp.mean(out)

        _, acc = jax.lax.fori_loop(0, n, body, (m_, jnp.float32(0)))
        return acc

    def run(k):
        t0 = time.perf_counter()
        float(chained(k, ms))
        return time.perf_counter() - t0

    run(1)
    t1 = min(run(2) for _ in range(2))
    t2 = min(run(2 + iters) for _ in range(2))
    return (t2 - t1) / iters * 1000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=96)
    args = ap.parse_args()
    b, c = args.batch, 8

    rng = np.random.default_rng(0)
    ms = jnp.asarray(rng.uniform(0, 1, (b, 32, 32, c)), jnp.float32)
    pan = jnp.asarray(rng.uniform(0, 1, (b, 128, 128, 1)), jnp.float32)
    model = LGTEUN(ms_chans=c, stage=2)
    params = model.init(jax.random.PRNGKey(0), ms[:1], pan[:1])["params"]

    def fwd(m_, p_):
        return F.lgteun_fast_forward(params, m_, p_)

    full = timed(fwd, ms, pan)
    print(f"full fast path      : {full:7.2f} ms/batch "
          f"({b * 128 * 128 / full / 1000:.1f} MP/s)")

    # the fused trunk calls three kernel seams per LGB block:
    # head (LN+split+DFT mixer), local attention, block tail
    # (proj+residual+LN+FFN) — stub each at its defining module (the
    # trunk imports them inside _lgb_cm, so patch the ops modules)
    from lgteun_tpu.ops import ffn_kernel as FK
    from lgteun_tpu.ops import spectral_kernel as SK

    id_head = lambda x, *a, **k: (x[:, :x.shape[1] // 2],
                                  x[:, x.shape[1] // 2:])
    id_tail = lambda x, x1, x2, pk, pb, fp, **k: x
    id_mix = lambda x, p, win, heads: x

    @contextlib.contextmanager
    def stubbed_at(mod, **stubs):
        saved = {k: getattr(mod, k) for k in stubs}
        try:
            for k, v in stubs.items():
                setattr(mod, k, v)
            yield
        finally:
            for k, v in saved.items():
                setattr(mod, k, v)

    for label, mod, stubs in [
        ("- mixer head kernel", SK, dict(fused_ln_mixer_head_cm=id_head)),
        ("- local attention", F, dict(_local_mixer_cm=id_mix)),
        ("- block tail kernel", FK, dict(fused_block_tail_cm=id_tail)),
    ]:
        with stubbed_at(mod, **stubs):
            t = timed(fwd, ms, pan)
        print(f"{label:20s}: {t:7.2f} ms/batch  (component ~{full - t:5.2f} ms)")

    # engine A/Bs (env read at trace time; `timed` builds a fresh outer
    # jit per call, so flipping the env here re-traces)
    for mode in ("vpu", "mxu"):
        os.environ["LGTEUN_FFN_TAPS"] = mode
        t = timed(fwd, ms, pan)
        print(f"taps={mode:15s}: {t:7.2f} ms/batch")
    os.environ.pop("LGTEUN_FFN_TAPS", None)
    for mode in ("native", "poly"):
        os.environ["LGTEUN_MIXER_TRIG"] = mode
        t = timed(fwd, ms, pan)
        print(f"trig={mode:15s}: {t:7.2f} ms/batch")
    os.environ.pop("LGTEUN_MIXER_TRIG", None)


if __name__ == "__main__":
    main()
