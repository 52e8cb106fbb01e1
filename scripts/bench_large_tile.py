"""Single-chip LARGE-TILE fusion throughput (the spatial-parallelism
story's on-chip number).

The reference fuses 128x128 tiles one at a time; real satellite
products are strips thousands of pixels on a side. This times LGTEUN
(flagship, 8-band) fusing whole large tiles on one chip: batch 1,
PAN 1024^2 and 2048^2, the channel-major fast path with the Pallas
fuse level capped at 0 (the whole-image-resident kernels are sized for
<=128px tiles; at 2048^2 one image exceeds VMEM, so the plain-XLA
channel-major trunk is the correct large-tile engine — this is a
measured statement, see README).

Usage: python scripts/bench_large_tile.py [--sizes 1024,2048]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/lgteun_jax"))
os.environ.setdefault("LGTEUN_FUSE_LEVEL", "0")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="1024,2048")
    ap.add_argument("--bands", type=int, default=8)
    ap.add_argument("--out", default=None,
                    help="optional JSON artifact path")
    args = ap.parse_args()

    import lgteun_tpu.models  # noqa: F401
    from lgteun_tpu.config import Config, LossCfg
    from lgteun_tpu.registry import build_model

    c = args.bands
    cfg = Config(model_type="UnlgFormer", ms_chans=c,
                 loss_cfg={"rec_loss": LossCfg()},
                 model_cfg={"core_module": {"stage": 2}})
    method = build_model("UnlgFormer", cfg)
    params = method.init_params(jax.random.PRNGKey(0), (32, 128))
    rng = np.random.default_rng(0)

    results = {}
    for size in (int(s) for s in args.sizes.split(",")):
        ms = jnp.asarray(rng.uniform(0, 1, (1, size // 4, size // 4, c)),
                         jnp.float32)
        pan = jnp.asarray(rng.uniform(0, 1, (1, size, size, 1)),
                          jnp.float32)

        @jax.jit
        def chained(p, ms_, pan_, n):
            def body(_, carry):
                ms_c, acc = carry
                out = method.apply(p, {"input_lr": ms_c, "input_pan": pan_})
                return ms_c + 1e-12 * jnp.mean(out), acc + jnp.mean(out)

            _, acc = jax.lax.fori_loop(0, n, body, (ms_, jnp.float32(0)))
            return acc

        def run(n):
            t0 = time.perf_counter()
            float(chained(params, ms, pan, n))
            return time.perf_counter() - t0

        run(1)
        t1 = min(run(2) for _ in range(2))
        t2 = min(run(8) for _ in range(2))
        dt = (t2 - t1) / 6
        mps = size * size / dt / 1e6
        print(f"{size}x{size} {c}-band: {dt * 1000:8.2f} ms/tile "
              f"= {mps:7.1f} MP/s", flush=True)
        results[str(size)] = {"ms_per_tile": round(dt * 1000, 2),
                              "mp_per_s": round(mps, 1)}

    if args.out:
        with open(args.out, "w") as f:
            json.dump({"bands": c, "batch": 1,
                       "fuse_level": os.environ.get("LGTEUN_FUSE_LEVEL"),
                       "tiles": results}, f, indent=1)
        print(f"-> {args.out}")


if __name__ == "__main__":
    main()
