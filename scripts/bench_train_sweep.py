"""Training-throughput batch-scaling curve (VERDICT r3 next-step #6).

Times the REAL product train step — `Runner._build_train_step()`:
forward + loss + backward + Adam, dropout on, donated state — for
LGTEUN (flagship WV-3 shape) across batch sizes, f32 vs the selective
bf16 recipe (`mixed_precision=True`, `handles_mixed`), with the
dispatch-proof on-device measurement used throughout this repo's perf
work (the runner's multi-step chunk IS an on-device lax.scan, so the
two-point method differences two chunk lengths).

Writes benchmarks/train_throughput.json; README's training claims
regenerate from it.

Usage: python scripts/bench_train_sweep.py [--batches 4,8,16,32,64]
       [--method UnlgFormer] [--remat]
"""

from __future__ import annotations

import argparse
import json
import logging
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


def time_step(runner, batch_np, n_steps=40, reps=3):
    """ms per train step via the runner's on-device scan chunk.

    The two-point estimator differences a long and a short chunk;
    under tunnel-stall noise (observed: +-50% on single samples) the
    span must be LONG (n_steps=40) so a stall in either sample stays
    small relative to the measured window, and the min over `reps`
    repetitions of BOTH points is taken (stalls only ever add time)."""
    runner._train_step = runner._build_train_step()  # sets _step_inner
    chunk = runner._build_train_chunk()

    def stack(n):
        b = {k: jnp.stack([jnp.asarray(v)] * n) for k, v in batch_np.items()}
        rngs = jax.random.split(jax.random.PRNGKey(0), n)
        iters = jnp.arange(n, dtype=jnp.int32)
        return b, rngs, iters

    def run(n):
        b, rngs, iters = stack(n)
        params, opts = runner.params, runner.opt_states
        t0 = time.perf_counter()
        params, opts, parts = chunk(params, opts, b, rngs, iters)
        jax.block_until_ready(parts)
        float(jax.tree.leaves(parts)[0][-1])  # force readback
        dt = time.perf_counter() - t0
        runner.params, runner.opt_states = params, opts
        return dt

    run(2)  # compile + warmup
    t1 = min(run(2) for _ in range(reps))
    t2 = min(run(2 + n_steps) for _ in range(reps))
    return (t2 - t1) / n_steps * 1000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="4,8,16,32,64")
    ap.add_argument("--method", default="UnlgFormer")
    ap.add_argument("--bands", type=int, default=8)
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--out", default="benchmarks/train_throughput.json")
    args = ap.parse_args()
    c = args.bands

    import lgteun_tpu.models  # noqa: F401
    from lgteun_tpu.config import Config, LossCfg, OptimCfg, SchedCfg
    from lgteun_tpu.registry import build_model
    from lgteun_tpu.runner import Runner

    rng = np.random.default_rng(0)
    rows = {}
    # (label, mixed_precision, LGTEUN_FAST_TRAIN) — "f32" is the
    # shipped default (fast-path training: fused custom_vjp kernels,
    # models/lgteun_fast.py train=True); "f32-module" pins the flax
    # module path for comparison; the selective-bf16 recipe lives in
    # the module path
    modes = (("f32", False, "1"), ("f32-module", False, "0"),
             ("bf16-selective", True, "0"))
    for label, mixed, fast_train in modes:
        os.environ["LGTEUN_FAST_TRAIN"] = fast_train
        for b in [int(s) for s in args.batches.split(",")]:
            cfg = Config(model_type=args.method, ms_chans=c, max_iter=10,
                         mixed_precision=mixed, remat=args.remat,
                         optim_cfg={"core_module": OptimCfg(type="Adam",
                                                            lr=1.5e-3)},
                         sched_cfg=SchedCfg(step_size=10000, gamma=0.85),
                         loss_cfg={"rec_loss": LossCfg(type="l1", w=1.0)},
                         model_cfg={"core_module": {"stage": 2}
                                    if args.method == "UnlgFormer" else {}})
            method = build_model(args.method, cfg)
            runner = Runner(cfg, method,
                            logger=logging.getLogger("train_sweep"))
            runner.init().set_optim()
            batch = {
                "input_lr": rng.uniform(0, 1, (b, 32, 32, c)).astype(np.float32),
                "input_pan": rng.uniform(0, 1, (b, 128, 128, 1)).astype(np.float32),
                "target": rng.uniform(0, 1, (b, 128, 128, c)).astype(np.float32),
            }
            ms = time_step(runner, batch)
            imgs = b / (ms / 1000)
            rows.setdefault(label, {})[str(b)] = {
                "ms_per_step": round(ms, 2),
                "imgs_per_s": round(imgs, 1),
            }
            print(f"{label:15s} batch {b:3d}: {ms:8.2f} ms/step "
                  f"{imgs:8.1f} img/s", flush=True)

    os.environ.pop("LGTEUN_FAST_TRAIN", None)
    speedup = {}
    for b in rows.get("f32-module", {}):
        if b in rows.get("bf16-selective", {}):
            speedup[b] = round(rows["f32-module"][b]["ms_per_step"]
                               / rows["bf16-selective"][b]["ms_per_step"], 3)
    fast_speedup = {}
    for b in rows.get("f32-module", {}):
        if b in rows.get("f32", {}):
            fast_speedup[b] = round(rows["f32-module"][b]["ms_per_step"]
                                    / rows["f32"][b]["ms_per_step"], 3)
    out = {"method": args.method, "bands": c, "remat": args.remat,
           "backend": jax.default_backend(), "by_mode": rows,
           "bf16_speedup": speedup, "fast_train_speedup": fast_speedup}
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"-> {args.out}")


if __name__ == "__main__":
    main()
