"""Whole-scene fusion throughput: tiled-batched engine vs whole-image.

Times `parallel.scene.fuse_scene` (overlapping 128px tiles batched
through the fused Pallas engine, cosine-blended seams) on large scenes,
next to the whole-image plain-XLA number from
`scripts/bench_large_tile.py`. Single chip, batch of tiles per
dispatch; one jitted program per scene shape.

Usage: python scripts/bench_scene.py [--sizes 2048,4096] [--halos 8,16]
       [--out benchmarks/large_tile.json]
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

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="2048,4096")
    ap.add_argument("--halos", default="8,16")
    ap.add_argument("--bands", type=int, default=8)
    ap.add_argument("--tile", type=int, default=128)
    ap.add_argument("--batch", type=int, default=96)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import lgteun_tpu.models  # noqa: F401
    from lgteun_tpu.config import Config, LossCfg
    from lgteun_tpu.parallel.scene import fuse_scene
    from lgteun_tpu.registry import build_model

    c = args.bands
    cfg = Config(model_type="UnlgFormer", ms_chans=c,
                 loss_cfg={"rec_loss": LossCfg()},
                 model_cfg={"core_module": {"stage": 2}})
    method = build_model("UnlgFormer", cfg)
    params = method.init_params(jax.random.PRNGKey(0), (32, 128))
    rng = np.random.default_rng(0)

    results = {"bands": c, "tile": args.tile, "batch": args.batch,
               "fuse_level": os.environ.get("LGTEUN_FUSE_LEVEL", "2"),
               "scenes": {}}
    for size in (int(s) for s in args.sizes.split(",")):
        ms = rng.uniform(0, 1, (size // 4, size // 4, c)).astype(np.float32)
        pan = rng.uniform(0, 1, (size, size, 1)).astype(np.float32)
        for halo in (int(h) for h in args.halos.split(",")):
            out = fuse_scene(method, params, ms, pan, tile=args.tile,
                             halo=halo, batch=args.batch)
            out.block_until_ready()  # compile + warmup
            best = float("inf")
            for _ in range(args.reps):
                t0 = time.perf_counter()
                fuse_scene(method, params, ms, pan, tile=args.tile,
                           halo=halo, batch=args.batch).block_until_ready()
                best = min(best, time.perf_counter() - t0)
            mps = size * size / best / 1e6
            results["scenes"][f"{size}_halo{halo}"] = {
                "ms_per_scene": round(best * 1e3, 2),
                "mp_per_s": round(mps, 2),
            }
            print(f"{size}^2 halo={halo}: {best * 1e3:.1f} ms "
                  f"= {mps:.2f} MP/s", flush=True)

    print(json.dumps(results, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
