"""Benchmark: LGTEUN batched fusion throughput on one TPU chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric (BASELINE.json): pan-sharpened megapixels/sec/chip on
WV-3-shaped inputs (8-band, LrMS 32x32 -> HrMS 128x128) with the
K=2-stage LGTEUN. Baseline: the reference measures 0.0133 s/img on a
RTX 3090 (paper Table 4, measurement loop reference
base_model.py:299-302), i.e. 16384 px / 0.0133 s = 1.232 MP/s.
The >=10x target therefore sits at vs_baseline >= 10.

The headline measures the documented IN-BUDGET serving mode:
LGTEUN_EVAL_DTYPE=bf16res (bf16 storage for the mixer-branch tensors,
f32 residual stream, kernel math f32 — see models/lgteun_fast.py).
On TPU its output is BIT-IDENTICAL to the fused f32 path (every
bf16-stored tensor feeds only Mosaic matmuls that round operands to
bf16 anyway), so its metric cost is the fused-path budget: -0.048 dB
vs highest-precision on the synthetic WV-3 study
(benchmarks/eval_numerics.json) — inside the repo's 0.05 dB budget
(PARITY.md "Eval-mode numerics"). Measured v5e, batch 96, same
session: bf16res 28.6 MP/s (23.2x) vs f32 27.3 (22.2x) vs full-bf16
storage 31.0 (25.2x, -0.103 dB — OUT of budget, available as an
explicit opt-in, never the scorer or the headline).
The retry ladder degrades bf16res -> f32 -> lower fuse levels, so the
JSON "mode" field says what actually ran.
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/lgteun_jax"))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REF_SECONDS_PER_IMG = 0.0133  # RTX 3090, WV-3, paper Table 4
IMG_PIXELS = 128 * 128


def _cached_init_params(method, c):
    """Initialise the benchmark params, with a disk cache.

    `Method.init_params` traces the whole flax module — a ~100 s XLA
    compile when the host has few cores (observed: a 1-vCPU session).
    The init is deterministic (fixed PRNGKey), so the flattened leaves
    are cached as an .npz keyed by the jax/flax versions and the bench
    config; any load problem falls back to a fresh init.

    The cached tree is validated against `jax.eval_shape` of the live
    init (tree structure + leaf shapes/dtypes, no XLA compile), so a
    model-structure change invalidates stale caches instead of feeding
    `method.apply` a mismatched tree."""
    import flax

    key = f"jax{jax.__version__}-flax{flax.__version__}-c{c}-stage2-v1"
    path = os.path.join(os.environ["JAX_COMPILATION_CACHE_DIR"],
                        f"bench_params_{key}.npz")
    sep = "||"
    try:
        with np.load(path) as z:
            tree = {}
            for k in z.files:
                node, parts = tree, k.split(sep)
                for p in parts[:-1]:
                    node = node.setdefault(p, {})
                node[parts[-1]] = jnp.asarray(z[k])
        if tree:
            expected = jax.eval_shape(
                lambda k: method.init_params(k, (32, 128)),
                jax.random.PRNGKey(0))
            exp_flat, exp_def = jax.tree.flatten(expected)
            got_flat, got_def = jax.tree.flatten(tree)
            if (exp_def == got_def
                    and all(e.shape == g.shape and e.dtype == g.dtype
                            for e, g in zip(exp_flat, got_flat))):
                return tree
    except Exception:
        pass
    params = method.init_params(jax.random.PRNGKey(0), (32, 128))
    flat = {}

    def walk(node, prefix):
        for k, v in node.items():
            kk = f"{prefix}{sep}{k}" if prefix else k
            if isinstance(v, dict):
                walk(v, kk)
            else:
                flat[kk] = np.asarray(v)

    walk(params, "")
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        np.savez(path + ".tmp.npz", **flat)
        os.replace(path + ".tmp.npz", path)
    except Exception:
        pass
    return params
REF_MPS = IMG_PIXELS / REF_SECONDS_PER_IMG / 1e6


def main():
    import lgteun_tpu.models  # noqa: F401  (register methods)
    from lgteun_tpu.config import Config, LossCfg
    from lgteun_tpu.registry import build_model

    batch = 96
    c = 8
    n_iters = 10
    # measure the SHIPPED inference path: the UnlgFormer Method, which
    # dispatches to the channel-major fast forward on TPU
    cfg = Config(model_type="UnlgFormer", ms_chans=c,
                 loss_cfg={"rec_loss": LossCfg()},
                 model_cfg={"core_module": {"stage": 2}})
    method = build_model("UnlgFormer", cfg)
    rng = np.random.default_rng(0)
    ms = jnp.asarray(rng.uniform(0, 1, (batch, 32, 32, c)), jnp.float32)
    pan = jnp.asarray(rng.uniform(0, 1, (batch, 128, 128, 1)), jnp.float32)
    params = _cached_init_params(method, c)

    # Honest timing on a tunneled TPU backend: per-dispatch round-trip
    # latency is large, so the iteration loop runs ON DEVICE via a
    # dynamic-bound fori_loop (one executable, one dispatch per
    # measurement), each iteration's output perturbing the next input so
    # execution is sequential; a scalar readback synchronises. Taking
    # the difference between an n2- and an n1-iteration call cancels
    # dispatch + readback latency exactly.
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

    run(1)  # compile + warmup
    n1, n2 = 2, 2 + n_iters
    t1 = min(run(n1) for _ in range(3))
    t2 = min(run(n2) for _ in range(3))
    dt = max(t2 - t1, 1e-9) / (n2 - n1)  # per-forward

    imgs_per_sec = batch / dt
    mps = imgs_per_sec * IMG_PIXELS / 1e6
    line = {
        "metric": "wv3_lgteun_fused_megapixels_per_sec_per_chip",
        "value": round(mps, 3),
        "unit": "MP/s",
        "vs_baseline": round(mps / REF_MPS, 3),
    }
    # measured metric cost of each mode vs the highest-precision
    # engine, read from the committed artifact
    # (benchmarks/eval_numerics.json, scripts/eval_numerics.py);
    # bf16res is bit-identical to the fused f32 path on TPU so both
    # carry the "fused" budget row
    edt = os.environ.get("LGTEUN_EVAL_DTYPE")
    mode, row = {"bf16": ("bf16-storage", "bf16"),
                 "bf16res": ("bf16res-storage", "bf16res")}.get(
                     edt, ("f32", "fused"))
    line["mode"] = mode
    try:
        art = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "benchmarks", "eval_numerics.json")
        with open(art) as f:
            line["psnr_delta_db"] = round(
                json.load(f)["delta_vs_highest"][row]["psnr"], 3)
    except Exception:
        pass
    print(json.dumps(line))


def _run_guarded():
    """Run main() in a subprocess with a hard timeout and retries.

    The TPU is reached through a tunnel that can hang *inside* backend
    initialization (observed: jax.devices() blocking >10 min) — an
    in-process try/except can't recover from that, so each attempt is
    a separate watchdog'd process. The last attempt's JSON line (if
    any) is relayed to stdout for the driver.

    Attempts ladder down the engine: the in-budget bf16res storage
    mode, then full f32, then the on-chip-proven kernel subset, then plain
    XLA (`LGTEUN_FUSE_LEVEL`) — so a Mosaic regression in one new
    kernel degrades the number instead of zeroing the benchmark."""
    import subprocess
    import sys

    # Cold-cache XLA compiles run minutes on a low-core host (observed
    # 1-vCPU sessions: ~100 s for the flax init alone before it was
    # disk-cached) and the tunnel adds minutes of jitter (observed: a
    # warm-cache rerun taking 9 min where the first run took 7) — so
    # the first attempts get 750 s; the ladder's worst case is ~48 min.
    budgets = (750, 750, 550, 550)
    fuse_ladder = ((2, "bf16res"), (2, None), (1, None), (0, None))
    for i, (level, edt) in enumerate(fuse_ladder):
        per_attempt_s = budgets[i]
        env = dict(os.environ, LGTEUN_FUSE_LEVEL=str(level))
        if edt is not None:
            env["LGTEUN_EVAL_DTYPE"] = edt
        else:
            env.pop("LGTEUN_EVAL_DTYPE", None)
        try:
            res = subprocess.run(
                [sys.executable, "-c", "from bench import main; main()"],
                capture_output=True, text=True, timeout=per_attempt_s,
                cwd=os.path.dirname(os.path.abspath(__file__)), env=env)
            for line in res.stdout.splitlines():
                if line.startswith("{"):
                    if i > 0:
                        sys.stderr.write(
                            f"bench: degraded to fuse level {level}, "
                            f"mode {edt or 'f32'}\n")
                    print(line)
                    return
            sys.stderr.write(res.stderr[-2000:] + "\n")
        except subprocess.TimeoutExpired:
            sys.stderr.write(
                f"bench attempt {i + 1}/{len(fuse_ladder)} (fuse level "
                f"{level}): timed out after {per_attempt_s}s (tunnel "
                f"hang?)\n")
        if i < len(fuse_ladder) - 1:
            time.sleep(45)
    raise SystemExit("bench: all attempts failed")


if __name__ == "__main__":
    _run_guarded()
