"""Per-block A/B: LGB megakernel vs the three-kernel fast path.

Times ONE full-resolution LGB block at the production shape
([batch, 32, 128, 128]) three ways:

  mega     ops/lgb_block_kernel.fused_lgb_block_cm (one VMEM residence)
  3kernel  fused_ln_mixer_head_cm -> XLA pack matmul -> packed v3
           attention -> XLA unpack matmul -> fused_block_tail_cm
           (the fuse-level-2 composition in models/lgteun_fast._lgb_cm)
  stages   each stage of the 3-kernel path alone (delta attribution)

Uses the dispatch-proof two-point on-device loop. A positive
mega-vs-3kernel delta means the megakernel's internal relayouts cost
more than the inter-kernel HBM spill it removes.

Usage: python scripts/bench_lgb_block.py [--batch 96] [--c 32]
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


def timed(fn, x, iters=24):
    @jax.jit
    def chained(n, x0):
        def body(_, carry):
            a, acc = carry
            out = fn(a)
            return a + 1e-12 * jnp.mean(out), acc + jnp.mean(out)

        _, acc = jax.lax.fori_loop(0, n, body, (x0, jnp.float32(0)))
        return acc

    def run(k):
        t0 = time.perf_counter()
        float(chained(k, x))
        return time.perf_counter() - t0

    run(1)
    t1 = min(run(2) for _ in range(2))
    t2 = min(run(2 + iters) for _ in range(2))
    return (t2 - t1) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=96)
    ap.add_argument("--c", type=int, default=32)
    ap.add_argument("--hw", type=int, default=128)
    args = ap.parse_args()
    b, c, hw = args.batch, args.c, args.hw
    c2, win, heads = c // 2, 8, 2

    from lgteun_tpu.models.lgteun_fast import (
        _unwindow_pairs_mm,
        _window_pairs_mm,
    )
    from lgteun_tpu.ops.ffn_kernel import fused_block_tail_cm
    from lgteun_tpu.ops.lgb_block_kernel import fused_lgb_block_cm
    from lgteun_tpu.ops.spectral_kernel import fused_ln_mixer_head_cm
    from lgteun_tpu.ops.window_attention import (
        fused_window_attention_v3_packed,
    )

    rng = np.random.default_rng(0)
    f32 = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.2, jnp.float32)
    conv = lambda ci, co: {"Conv_0": {"Conv_0": {
        "kernel": f32(1, 1, ci, co), "bias": f32(co)}}}
    blk = {
        "norm": {"scale": 1.0 + 0.1 * f32(c), "bias": f32(c)},
        "local": {"to_qkv_kernel": f32(1, 1, c2, 3 * c2),
                  "to_qkv_bias": f32(3 * c2),
                  "pos_emb": f32(heads, win * win, win * win)},
        "global": {"amp_scale": f32(1, 1, 1, c2), "amp_bias": f32(c2),
                   "pha_scale": f32(1, 1, 1, c2),
                   "pha_bias": f32(c2)},
        "proj": conv(c, c),
        "ffn": {"ln_gamma": 1.0 + 0.1 * f32(c), "ln_beta": f32(c),
                "w1": f32(c, 4 * c), "b1": f32(4 * c),
                "w2": f32(4 * c, 4 * c), "b2": f32(4 * c),
                "dw": f32(3, 3, 4 * c), "bdw": f32(4 * c),
                "w3": f32(4 * c, c), "b3": f32(c)},
    }
    x = f32(b, c, hw, hw)
    g = blk["global"]
    loc = blk["local"]
    pk = blk["proj"]["Conv_0"]["Conv_0"]["kernel"][0, 0]
    pbias = blk["proj"]["Conv_0"]["Conv_0"]["bias"]
    scale = (c2 // heads) ** -0.5

    def head(xx):
        return fused_ln_mixer_head_cm(
            xx, blk["norm"]["scale"], blk["norm"]["bias"],
            g["amp_scale"][0, 0, 0], g["amp_bias"],
            g["pha_scale"][0, 0, 0], g["pha_bias"])

    def attn_from_y1(y1):
        xp = _window_pairs_mm(y1, win).astype(y1.dtype)
        out = fused_window_attention_v3_packed(
            xp, loc["to_qkv_kernel"][0, 0], loc["to_qkv_bias"],
            loc["pos_emb"], heads=heads, scale=scale, tanh_exp=True)
        return _unwindow_pairs_mm(out, win, (hw, hw), b).astype(y1.dtype)

    def three_kernel(xx):
        y1, x2 = head(xx)
        x1 = attn_from_y1(y1)
        return fused_block_tail_cm(xx, x1, x2, pk, pbias, blk["ffn"])

    def mega(xx):
        return fused_lgb_block_cm(xx, blk)

    results = {}
    for name, fn in (("mega", mega), ("3kernel", three_kernel),
                     ("head", lambda xx: head(xx)[1]),
                     ("attn", lambda xx: attn_from_y1(xx[:, :c2])),
                     ("tail", lambda xx: fused_block_tail_cm(
                         xx, xx[:, :c2], xx[:, c2:], pk, pbias,
                         blk["ffn"]))):
        dt = timed(fn, x)
        results[name] = dt * 1e3
        print(f"{name:8s} {dt * 1e3:7.2f} ms/call", flush=True)
    print({k: round(v, 2) for k, v in results.items()})


if __name__ == "__main__":
    main()
