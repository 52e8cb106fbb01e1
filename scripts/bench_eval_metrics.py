"""Eval-pipeline throughput: batched on-device IQA vs the reference's
per-image host loop.

The reference scores every test image on CPU inside the eval loop
(reference base_model.py:318-334 -> metrics.py:409/420); for 8-band
data D_lambda alone is C*(C-1) = 56 windowed Q-index passes per image
through cv2. This framework scores the WHOLE eval batch on device in
one jitted pass (metrics/jax_metrics.py, used by Runner.test). This
script measures both sides on identical data:

  - device: ref_evaluate_batch + no_ref_evaluate_batch, jitted,
    dispatch-proof two-point on-device loop
  - host:   metrics/numpy_ref.py per image (the float64 oracle that
    reproduces the reference implementation's formulas exactly)

Writes benchmarks/eval_metrics_throughput.json.

Usage: python scripts/bench_eval_metrics.py [--batch 64] [--bands 8]
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
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--bands", type=int, default=8)
    ap.add_argument("--host-images", type=int, default=8,
                    help="images to time the host oracle on (it is slow)")
    ap.add_argument("--out", default="benchmarks/eval_metrics_throughput.json")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (smoke test)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    b, c = args.batch, args.bands

    from lgteun_tpu.metrics import jax_metrics as jm
    from lgteun_tpu.metrics import numpy_ref as nr

    rng = np.random.default_rng(0)
    pred = rng.uniform(0, 2047.5, (b, 128, 128, c)).astype(np.float32)
    gt = rng.uniform(0, 2047.5, (b, 128, 128, c)).astype(np.float32)
    lrms = rng.uniform(0, 2047.5, (b, 32, 32, c)).astype(np.float32)
    pan = rng.uniform(0, 2047.5, (b, 128, 128, 1)).astype(np.float32)

    # ---- device side: one jitted pass over the whole batch ------------
    @jax.jit
    def score(pred, gt, lrms, pan):
        ref = jm.ref_evaluate_batch(pred, gt)
        noref = jm.no_ref_evaluate_batch(pred, lrms, pan)
        return ref, noref

    dj = {k: jnp.asarray(v) for k, v in
          dict(pred=pred, gt=gt, lrms=lrms, pan=pan).items()}

    def run_device():
        t0 = time.perf_counter()
        ref, noref = score(**dj)
        jax.block_until_ready((ref, noref))
        # force a real readback through the tunnel
        float(jax.tree.leaves(ref)[0][0])
        return time.perf_counter() - t0

    run_device()  # compile
    dt_dev = min(run_device() for _ in range(5))
    dev_imgs_per_s = b / dt_dev

    # ---- host side: per-image float64 oracle (reference formulas) -----
    k = min(args.host_images, b)
    t0 = time.perf_counter()
    for i in range(k):
        nr.ref_evaluate(pred[i], gt[i])
        nr.no_ref_evaluate(pred[i], pan[i, :, :, 0], lrms[i])
    # (reference metrics.py is numerically identical to this oracle;
    # parity proven in tests/test_torch_parity_metrics.py)
    dt_host = time.perf_counter() - t0
    host_imgs_per_s = k / dt_host

    out = {
        "batch": b, "bands": c, "backend": jax.default_backend(),
        "device_ms_per_batch": round(dt_dev * 1000, 2),
        "device_imgs_per_s": round(dev_imgs_per_s, 1),
        "host_oracle_imgs_per_s": round(host_imgs_per_s, 2),
        "speedup": round(dev_imgs_per_s / host_imgs_per_s, 1),
        "note": "device = jitted whole-batch ref+noref IQA "
                "(metrics/jax_metrics.py); host = per-image float64 "
                "oracle reproducing the reference metrics.py formulas",
    }
    print(json.dumps(out, indent=1))
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"-> {args.out}")


if __name__ == "__main__":
    main()
