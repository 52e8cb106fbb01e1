"""Fixed training benchmark: PSNR trajectory on synthetic WV-3 data.

Trains a method on a deterministic synthetic Wald-protocol dataset
(8-band, 64 scenes) and evaluates on a held-out synthetic split every
`--eval-every` iterations, persisting the metric curves + measured
steps/sec to benchmarks/train_curve_<method>.json. Run between rounds
to make metric regressions visible without the (Google-Drive-only)
real data — VERDICT r1 item #10; the eval-curve mechanism mirrors the
reference's dump at reference models/base/base_model.py:348-351.

Usage (defaults: UnlgFormer + lightnet, 2000 iters, TPU):
    python scripts/train_benchmark.py [--methods UnlgFormer,lightnet]
        [--iters 2000] [--eval-every 250] [--batch 4] [--cpu]
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--methods", default="UnlgFormer,lightnet")
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--eval-every", type=int, default=250)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--bands", type=int, default=8)
    ap.add_argument("--sensor", default="WV3",
                    help="Wald degradation recipe for the synthetic "
                         "data: a SENSOR_GNYQ name (default WV3 — the "
                         "per-band MTF branch the real WV-3 pairs were "
                         "built with) or 'none' for the default "
                         "Gaussian branch")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--mixed", action="store_true", help="bf16 compute train step")
    ap.add_argument("--out-dir", default="benchmarks")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])

    import lgteun_tpu.models  # noqa: F401  (register methods)
    from lgteun_tpu.config import Config, LoaderCfg, LossCfg, OptimCfg, SchedCfg
    from lgteun_tpu.data.dataset import PSDataset
    from lgteun_tpu.data.synthetic import make_synthetic_dataset
    from lgteun_tpu.registry import build_model
    from lgteun_tpu.runner import Runner

    logging.basicConfig(level=logging.INFO, format="%(message)s")
    logger = logging.getLogger("train_benchmark")

    sensor = None if args.sensor.lower() == "none" else args.sensor
    data_root = os.path.join(
        "/tmp", f"lgteun_synth_b{args.bands}_{sensor or 'gauss'}")
    if not os.path.isdir(data_root):
        make_synthetic_dataset(data_root, n_train=64, n_test=8,
                               bands=args.bands, size=128, sensor=sensor)
    train_ds = PSDataset(image_dirs=[os.path.join(data_root, "train")],
                         bit_depth=11)
    test_ds = PSDataset(image_dirs=[os.path.join(data_root, "test")],
                        bit_depth=11)

    os.makedirs(args.out_dir, exist_ok=True)
    backend = jax.default_backend()
    for name in args.methods.split(","):
        # shipped per-method hyperparameters (SURVEY §5)
        lr = {"UnlgFormer": 1.5e-3, "lightnet": 2.5e-3}.get(name, 1e-4)
        cfg = Config(
            name=f"train_benchmark_{name}", model_type=name,
            datas="synthetic-wv3", ms_chans=args.bands,
            max_iter=args.iters, save_freq=0, test_freq=0,
            eval_freq=args.eval_every, log_freq=max(args.eval_every, 1),
            norm_input=True, work_dir="/tmp/lgteun_train_benchmark",
            train_set_cfg=LoaderCfg(batch_size=args.batch),
            optim_cfg={"core_module": OptimCfg(type="Adam", lr=lr)},
            sched_cfg=SchedCfg(step_size=max(args.iters // 10, 1),
                               gamma=0.85),
            loss_cfg={"rec_loss": LossCfg(type="l1", w=1.0)},
            eval_batch_size=8,
            mixed_precision=args.mixed,
        )
        method = build_model(name, cfg)
        runner = Runner(cfg, method, train_ds=train_ds,
                        test_ds_reduced=test_ds, logger=logger)
        runner.init().set_optim()
        t0 = time.time()
        runner.train()
        wall = time.time() - t0

        curves = {k: v for k, v in runner.eval_results.items()}
        steps_per_sec = args.iters / wall
        payload = {
            "method": name, "backend": backend, "bands": args.bands,
            "iters": args.iters, "batch": args.batch,
            "wall_s": round(wall, 1),
            "steps_per_sec": round(steps_per_sec, 2),
            "curves": curves,
            "mixed_precision": args.mixed,
        }
        suffix = "_bf16" if args.mixed else ""
        out_path = os.path.join(args.out_dir, f"train_curve_{name}{suffix}.json")
        with open(out_path, "w") as f:
            json.dump(payload, f, indent=1)
        psnr_curve = curves.get("reduced-res (ref)/psnr", [])
        final = psnr_curve[-1][1] if psnr_curve else float("nan")
        logger.info(f"[{name}] {args.iters} iters in {wall:.0f}s "
                    f"({steps_per_sec:.1f} steps/s, {backend}); "
                    f"final synthetic PSNR {final:.2f} dB -> {out_path}")


if __name__ == "__main__":
    main()
