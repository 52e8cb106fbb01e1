"""Per-method inference throughput on one TPU chip.

Usage: python scripts/bench_zoo.py [--batch 32] [--ms-chans 4]

Times every registered method (classical + DL) with the dispatch-proof
on-device loop harness and prints a table plus the paper's RTX-3090
per-image times for reference (paper Table 4, GF-2 column for C=4).
"""

from __future__ import annotations

import argparse
import os
import time
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/lgteun_jax"))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

# paper Table 4 Time(s/img): GF-2 column for C=4, WV-3 column for C=8
# (BASELINE.md Table C; reference measurement loop base_model.py:299-302)
REF_S_PER_IMG_GF2 = {
    "GSA": 0.0216, "SFIM": 0.0301, "Wavelet": 0.0271,
    "PanFormer": 0.0257, "INNT": 0.0431, "lightnet": 0.0017,
    "SFIIN": 0.0528, "MutInf": 0.1141, "MDCUN": 0.1017,
    "UnlgFormer": 0.0129,
}
REF_S_PER_IMG_WV3 = {
    "GSA": 0.0482, "SFIM": 0.0591, "Wavelet": 0.0562,
    "PanFormer": 0.0160, "INNT": 0.0426, "lightnet": 0.0019,
    "SFIIN": 0.0529, "MutInf": 0.1083, "MDCUN": 0.1747,
    "UnlgFormer": 0.0133,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--ms-chans", type=int, default=4)
    ap.add_argument("--only", default=None,
                    help="comma-separated registry names to time "
                         "(default: every method)")
    ap.add_argument("--json", default=None,
                    help="merge per-method results into this JSON "
                         "artifact (e.g. ZOO_r04.json)")
    args = ap.parse_args()
    b, c = args.batch, args.ms_chans
    only = set(args.only.split(",")) if args.only else None
    ref_col = REF_S_PER_IMG_WV3 if c == 8 else REF_S_PER_IMG_GF2

    import lgteun_tpu.models
    from lgteun_tpu.config import Config, LossCfg
    from lgteun_tpu.registry import MODELS, build_model

    rng = np.random.default_rng(0)
    batch = {
        "input_lr": jnp.asarray(rng.uniform(0, 1, (b, 32, 32, c)).astype(np.float32)),
        "input_pan": jnp.asarray(rng.uniform(0, 1, (b, 128, 128, 1)).astype(np.float32)),
    }

    results = {}
    if args.json and os.path.exists(args.json):
        import json

        with open(args.json) as f:
            prior = json.load(f)
        if (prior.get("batch") == b and prior.get("ms_chans") == c):
            results = prior.get("methods", {})

    print(f"batch {b}, {c}-band, 32->128 fusion; one chip")
    print(f"{'method':12s} {'ms/img':>8s} {'MP/s':>8s} {'vs 3090':>8s}")
    for name in MODELS.keys():
        if only is not None and name not in only:
            continue
        try:
            cfg = Config(model_type=name, ms_chans=c,
                         loss_cfg={"rec_loss": LossCfg()},
                         model_cfg={"core_module": {"stage": 2}
                                    if name == "UnlgFormer" else {}})
            m = build_model(name, cfg)
            params = m.init_params(jax.random.PRNGKey(0), (32, 128))

            @jax.jit
            def chained(n, lr, pan):
                def body(_, carry):
                    lr_c, acc = carry
                    out = m.apply(params, {"input_lr": lr_c,
                                           "input_pan": pan})
                    return lr_c + 1e-12 * jnp.mean(out), acc + jnp.mean(out)

                _, acc = jax.lax.fori_loop(
                    0, n, body, (lr, jnp.float32(0)))
                return acc

            def run(k):
                t0 = time.perf_counter()
                float(chained(k, batch["input_lr"], batch["input_pan"]))
                return time.perf_counter() - t0

            run(1)
            t1 = min(run(2) for _ in range(2))
            t2 = min(run(8) for _ in range(2))
            dt = (t2 - t1) / 6 / b  # seconds per image
            if dt * b < 2e-3:
                # sub-2ms/batch methods (classical ops) are below the
                # two-point harness's resolution — rerun with a longer
                # on-device loop
                t1 = min(run(8) for _ in range(2))
                t2 = min(run(208) for _ in range(2))
                dt = (t2 - t1) / 200 / b
            mps = 16384 / dt / 1e6
            ref = ref_col.get(name)
            speedup = f"{ref / dt:7.1f}x" if ref else "      —"
            print(f"{name:12s} {dt * 1000:8.3f} {mps:8.2f} {speedup}",
                  flush=True)
            results[name] = {
                "ms_per_img": round(dt * 1000, 4),
                "mp_per_s": round(mps, 2),
                "ref_s_per_img": ref,
                "vs_3090": round(ref / dt, 1) if ref else None,
            }
            if args.json:
                import json

                with open(args.json, "w") as f:
                    json.dump({"batch": b, "ms_chans": c,
                               "backend": jax.default_backend(),
                               "methods": results}, f, indent=1)
        except Exception as e:  # noqa: BLE001
            print(f"{name:12s} FAIL {str(e)[:80]}", flush=True)


if __name__ == "__main__":
    main()
