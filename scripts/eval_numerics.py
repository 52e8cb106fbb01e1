"""Eval-mode numerics study: metric-level cost of each inference mode.

VERDICT r3 weak #3: the fused TPU path accepts ~1.4e-3 mean output
drift vs f32 — on the 2047.5 DN scale that could eat the 0.05 dB PSNR
budget, and nothing measured the METRIC-level delta. This script does:

1. --prepare: build a WV-3-shaped synthetic split (8-band, sensor-MTF
   Wald degradation) and train LGTEUN on it (reference hparams, chip),
   saving params + the eval split to --work.
2. --mode X: load the params, run the batched forward in mode X, score
   every eval scene with the float64 HOST oracle (metrics/numpy_ref —
   identical scorer for all modes, so deltas isolate the forward), and
   print one JSON line. Modes:
     module    flax module path, f32 (the semantics baseline)
     fused     shipped TPU default (channel-major + Pallas kernels)
     highest   LGTEUN_MATMUL_PRECISION=highest (parity grade: no
               Pallas kernels, HIGHEST-precision XLA matmuls)
     bf16      LGTEUN_EVAL_DTYPE=bf16 (full selective bf16 storage)
     bf16res   LGTEUN_EVAL_DTYPE=bf16res (bf16 mixer branches, f32
               residual stream -- the in-budget serving mode)
     oracle64  float64 module forward on CPU (x64) — the numerics
               ceiling
3. default: orchestrate every mode as a subprocess (env flags are read
   at trace time) and write benchmarks/eval_numerics.json with the
   per-mode metrics + deltas vs `highest`.

The measurement loop mirrors the reference's test() (reference
base_model.py:299-334): normalized inputs -> forward -> denormalize ->
per-image reference metrics.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/lgteun_jax"))

MODES = ("module", "fused", "highest", "bf16", "bf16res", "oracle64")
METRICS = ("psnr", "ssim", "qindex", "sam", "ergas")


def _work_paths(work):
    return (os.path.join(work, "params.npz"), os.path.join(work, "data"))


def _save_params(params, path):
    import numpy as np

    flat = {}

    def walk(node, prefix):
        for k, v in node.items():
            kk = f"{prefix}||{k}" if prefix else k
            if isinstance(v, dict):
                walk(v, kk)
            else:
                flat[kk] = np.asarray(v)

    walk(params, "")
    np.savez(path, **flat)


def _load_params(path):
    import jax.numpy as jnp
    import numpy as np

    tree = {}
    with np.load(path) as z:
        for k in z.files:
            node, parts = tree, k.split("||")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = jnp.asarray(z[k])
    return tree


def prepare(work: str, iters: int, bands: int = 8) -> None:
    import logging

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    import lgteun_tpu.models  # noqa: F401
    from lgteun_tpu.config import Config, LoaderCfg, LossCfg, OptimCfg, SchedCfg
    from lgteun_tpu.data.dataset import PSDataset
    from lgteun_tpu.data.synthetic import make_synthetic_dataset
    from lgteun_tpu.registry import build_model
    from lgteun_tpu.runner import Runner

    ppath, droot = _work_paths(work)
    dirs = make_synthetic_dataset(droot, n_train=32, n_test=8, bands=bands,
                                  size=128, sensor="WV3")
    train_ds = PSDataset([dirs["train"]], bit_depth=11)
    cfg = Config(name="eval_numerics", model_type="UnlgFormer",
                 datas="synth-wv3", ms_chans=bands, max_iter=iters,
                 save_freq=0, test_freq=0, eval_freq=0, log_freq=200,
                 norm_input=True, work_dir=work,
                 train_set_cfg=LoaderCfg(batch_size=4),
                 optim_cfg={"core_module": OptimCfg(type="Adam", lr=1.5e-3)},
                 sched_cfg=SchedCfg(step_size=max(iters // 10, 1),
                                    gamma=0.85),
                 loss_cfg={"rec_loss": LossCfg(type="l1", w=1.0)},
                 model_cfg={"core_module": {"stage": 2}})
    method = build_model("UnlgFormer", cfg)
    runner = Runner(cfg, method, train_ds=train_ds,
                    logger=logging.getLogger("eval_numerics"))
    runner.init().set_optim()
    runner.train()
    _save_params(runner.params, ppath)
    print(f"prepared: {ppath}")


def run_mode(work: str, mode: str, bands: int = 8) -> dict:
    import jax

    if mode == "oracle64":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    else:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
    import jax.numpy as jnp
    import numpy as np

    import lgteun_tpu.models  # noqa: F401
    from lgteun_tpu.config import Config, LossCfg
    from lgteun_tpu.data.dataset import PSDataset
    from lgteun_tpu.metrics import numpy_ref as M
    from lgteun_tpu.registry import build_model

    ppath, droot = _work_paths(work)
    params = _load_params(ppath)
    ds = PSDataset([os.path.join(droot, "test")], bit_depth=11,
                   norm_input=True)
    cfg = Config(model_type="UnlgFormer", ms_chans=bands,
                 loss_cfg={"rec_loss": LossCfg()},
                 model_cfg={"core_module": {"stage": 2}})
    method = build_model("UnlgFormer", cfg)

    n = len(ds)
    lr = jnp.stack([jnp.asarray(ds[i]["input_lr"]) for i in range(n)])
    pan = jnp.stack([jnp.asarray(ds[i]["input_pan"]) for i in range(n)])
    gts = [np.asarray(ds[i]["target"], np.float64) * 2047.5
           for i in range(n)]

    if mode == "oracle64":
        params = jax.tree.map(lambda x: x.astype(jnp.float64), params)
        lr, pan = lr.astype(jnp.float64), pan.astype(jnp.float64)
        out = method.module.apply({"params": params["core_module"]},
                                  lr, pan, deterministic=True)
    elif mode == "module":
        out = jax.jit(lambda p, a, b: method.module.apply(
            {"params": p["core_module"]}, a, b, deterministic=True))(
                params, lr, pan)
    else:
        fwd = jax.jit(lambda p, b: method.apply(p, b))
        out = fwd(params, {"input_lr": lr, "input_pan": pan})
    out = np.asarray(out, np.float64) * 2047.5

    res = {k: [] for k in METRICS}
    for i in range(n):
        pred = np.clip(out[i], 0, 2047.5)
        res["psnr"].append(M.psnr(pred, gts[i]))
        res["ssim"].append(M.ssim(pred, gts[i]))
        res["qindex"].append(M.qindex(pred, gts[i]))
        res["sam"].append(M.sam(pred, gts[i]))
        res["ergas"].append(M.ergas(pred, gts[i]))
    return {k: float(np.mean(v)) for k, v in res.items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", default="/tmp/lgteun_eval_numerics")
    ap.add_argument("--iters", type=int, default=800)
    ap.add_argument("--bands", type=int, default=8)
    ap.add_argument("--prepare", action="store_true")
    ap.add_argument("--mode", choices=MODES)
    ap.add_argument("--out", default="benchmarks/eval_numerics.json")
    args = ap.parse_args()

    os.makedirs(args.work, exist_ok=True)
    if args.prepare:
        prepare(args.work, args.iters, args.bands)
        return
    if args.mode:
        print(json.dumps({"mode": args.mode,
                          **run_mode(args.work, args.mode, args.bands)}))
        return

    # orchestrate: prepare (if needed) then every mode in a subprocess
    ppath, _ = _work_paths(args.work)
    if not os.path.exists(ppath):
        subprocess.run([sys.executable, __file__, "--work", args.work,
                        "--iters", str(args.iters), "--bands",
                        str(args.bands), "--prepare"], check=True)
    results = {}
    env_for = {
        "module": {"LGTEUN_FAST": "0"},
        "fused": {},
        "highest": {"LGTEUN_MATMUL_PRECISION": "highest"},
        "bf16": {"LGTEUN_EVAL_DTYPE": "bf16"},
        "bf16res": {"LGTEUN_EVAL_DTYPE": "bf16res"},
        "oracle64": {},
    }
    for mode in MODES:
        env = dict(os.environ)
        env.pop("LGTEUN_EVAL_DTYPE", None)
        env.pop("LGTEUN_MATMUL_PRECISION", None)
        env.update(env_for[mode])
        try:
            r = subprocess.run([sys.executable, __file__, "--work",
                                args.work, "--bands", str(args.bands),
                                "--mode", mode],
                               capture_output=True, text=True, env=env,
                               timeout=1500)
        except subprocess.TimeoutExpired:
            # a hung tunnel / starved-host compile must not kill the
            # whole study — record the miss and keep going
            print(f"{mode}: TIMEOUT (1500s)", flush=True)
            continue
        line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
        if not line:
            print(f"{mode}: FAILED\n{r.stderr[-1500:]}")
            continue
        results[mode] = json.loads(line[-1])
        print(line[-1], flush=True)

    base = results.get("highest")
    deltas = {}
    if base:
        for mode, r in results.items():
            deltas[mode] = {k: round(r[k] - base[k], 6) for k in METRICS}
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"bands": args.bands, "iters": args.iters,
                   "scenes": 8, "modes": results,
                   "delta_vs_highest": deltas}, f, indent=1)
    print(f"-> {args.out}")


if __name__ == "__main__":
    main()
