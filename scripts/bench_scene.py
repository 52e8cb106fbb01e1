"""Whole-scene fusion throughput: tiled-batched engine vs whole-image.

Times `parallel.scene.fuse_scene` (overlapping 128px tiles batched
through the fused Pallas engine, cosine-blended seams) on large scenes,
next to the whole-image plain-XLA number from
`scripts/bench_large_tile.py`. Single chip; one jitted program per
scene shape.

Timing methodology (same as bench.py): the TPU is reached through a
tunnel whose per-dispatch round trip and host->device scene upload
(16-72 MB per call) dwarf the on-device work, so the scene program runs
inside an on-device fori_loop with the inputs device-resident, and the
per-scene time is the difference between an n2- and an n1-iteration
call (cancels dispatch + readback exactly; inputs are device-resident
so no upload is in the loop). A single-dispatch wall-clock with
device-resident inputs (dispatch + on-device run + scalar readback
through the tunnel) is also recorded as `wall_ms_single_dispatch`.

Usage: python scripts/bench_scene.py [--sizes 2048,4096] [--halos 8,16]
       [--out benchmarks/scene.json]
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

    import jax.numpy as jnp

    import lgteun_tpu.models  # noqa: F401
    from lgteun_tpu.config import Config, LossCfg
    from lgteun_tpu.parallel.scene import _build_scene_fn, fuse_scene
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
        ms = jnp.asarray(rng.uniform(0, 1, (size // 4, size // 4, c)),
                         jnp.float32)
        pan = jnp.asarray(rng.uniform(0, 1, (size, size, 1)), jnp.float32)
        for halo in (int(h) for h in args.halos.split(",")):
            scene_fn = _build_scene_fn(method, (size, size), c, args.tile,
                                       halo, args.batch, None)

            @jax.jit
            def chained(p, ms_, pan_, n, scene_fn=scene_fn):
                def body(_, carry):
                    ms_c, acc = carry
                    out = scene_fn(p, ms_c, pan_)
                    return (ms_c + 1e-12 * jnp.mean(out),
                            acc + jnp.mean(out))

                _, acc = jax.lax.fori_loop(0, n, body,
                                           (ms_, jnp.float32(0)))
                return acc

            def run(n, chained=chained):
                t0 = time.perf_counter()
                float(chained(params, ms, pan, n))
                return time.perf_counter() - t0

            wall0 = run(1)  # compile + warmup; ~single-dispatch wall
            wall1 = min(run(1) for _ in range(2))
            n1, n2 = 1, 1 + args.reps
            t1 = min(run(n1) for _ in range(2))
            t2 = min(run(n2) for _ in range(2))
            best = max(t2 - t1, 1e-9) / (n2 - n1)
            mps = size * size / best / 1e6
            results["scenes"][f"{size}_halo{halo}"] = {
                "ms_per_scene": round(best * 1e3, 2),
                "mp_per_s": round(mps, 2),
                "wall_ms_single_dispatch": round(wall1 * 1e3, 2),
            }
            print(f"{size}^2 halo={halo}: {best * 1e3:.1f} ms on-device "
                  f"= {mps:.2f} MP/s (single-dispatch wall, device-"
                  f"resident inputs: {wall1 * 1e3:.0f} ms)", flush=True)
            del wall0

    print(json.dumps(results, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
