"""On-chip kernel prover: compile + run every Pallas kernel variant on
small shapes and parity-check each against its XLA reference.

Interpret-mode tests prove the kernel MATH; this script proves the
MOSAIC LOWERING on the real chip — the part that can regress
independently (VMEM limits, layout legality, transcendental lowering).
Run it first when the TPU comes back after kernel work; it is much
faster triage than a full bench.py attempt.

Usage: python scripts/prove_kernels.py [--tol 2e-2]
Exit code: number of failing kernels (0 = all proven).

Tolerance note: Mosaic dots round operands to bf16, so fused-vs-XLA
deltas at small magnitudes sit around 1e-3..1e-2 relative; the default
tolerance is a regression gate, not a numerics claim (numerics are
pinned by the interpret-mode tests + the f64-envelope tests).
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


def _rel(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return float(np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-12))


def _cases(rng):
    """(name, fused_fn, xla_fn) thunks on tiny-but-aligned shapes."""
    from lgteun_tpu.ops.ffn_kernel import (
        _fused_ln_ffn_impl, block_tail_xla, fused_block_tail_cm, ln_ffn_xla,
    )
    from lgteun_tpu.ops.spectral_kernel import (
        fused_global_mixer_cm, fused_ln_mixer_head_cm, global_mixer_xla_cm,
        ln_mixer_head_xla_cm,
    )
    from lgteun_tpu.ops.window_attention import (
        fused_window_attention_v2, fused_window_attention_v3_packed,
        window_attention_xla,
    )

    f32 = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.2, jnp.float32)
    cases = []

    # --- window attention -------------------------------------------------
    n, s, c, heads = 8, 64, 16, 2
    scale = (c // heads) ** -0.5
    xw, wqkv, bqkv = f32(n, s, c), f32(c, 3 * c), f32(3 * c)
    pos = f32(heads, s, s)
    want_att = lambda: window_attention_xla(xw, wqkv, bqkv, pos, heads, scale)
    cases.append(("attention v2", lambda: fused_window_attention_v2(
        xw, wqkv, bqkv, pos, heads, scale), want_att))
    xp = (xw.reshape(n // 2, 2, s, c).transpose(0, 3, 1, 2)
          .reshape(n // 2, c, 2 * s))
    unpack = lambda o: (o.reshape(n // 2, c, 2, s).transpose(0, 2, 3, 1)
                        .reshape(n, s, c))
    for te in (False, True):
        cases.append((f"attention v3 packed tanh_exp={te}",
                      lambda te=te: unpack(fused_window_attention_v3_packed(
                          xp, wqkv, bqkv, pos, heads=heads, scale=scale,
                          tanh_exp=te)), want_att))

    # --- LN+FFN (row-tiled) + tap engines ----------------------------------
    cc, c4 = 16, 64
    ffn = {"ln_gamma": 1.0 + f32(cc) * 0.1, "ln_beta": f32(cc),
           "w1": f32(cc, c4), "b1": f32(c4), "w2": f32(c4, c4),
           "b2": f32(c4), "dw": f32(3, 3, c4), "bdw": f32(c4),
           "w3": f32(c4, cc), "b3": f32(cc)}
    x_nhwc = f32(2, 16, 128, cc)
    want_ffn = lambda: ln_ffn_xla(x_nhwc, ffn)
    for taps in ("vpu", "mxu"):
        cases.append((f"ln_ffn taps={taps}",
                      lambda taps=taps: _fused_ln_ffn_impl(
                          x_nhwc, ffn, tile_rows=8, taps=taps), want_ffn))

    # --- block tail: row-tiled + whole-image rolls, both tap engines -------
    xt, x1t, x2t = f32(2, cc, 16, 128), f32(2, cc // 2, 16, 128), f32(
        2, cc // 2, 16, 128)
    pk, pb = f32(cc, cc), f32(cc)
    want_tail = lambda: block_tail_xla(xt, x1t, x2t, pk, pb, ffn)
    xr, x1r, x2r = f32(2, cc, 16, 16), f32(2, cc // 2, 16, 16), f32(
        2, cc // 2, 16, 16)
    want_rolls = lambda: block_tail_xla(xr, x1r, x2r, pk, pb, ffn)
    for taps in ("vpu", "mxu"):
        cases.append((f"block tail tiled taps={taps}",
                      lambda taps=taps: fused_block_tail_cm(
                          xt, x1t, x2t, pk, pb, ffn, tile_rows=8, taps=taps),
                      want_tail))
        cases.append((f"block tail rolls taps={taps}",
                      lambda taps=taps: fused_block_tail_cm(
                          xr, x1r, x2r, pk, pb, ffn, taps=taps), want_rolls))

    # --- global mixer + mixer head, both trig engines ----------------------
    cm = 8
    xg = f32(2, cm, 64, 64)
    asc, abi, psc, pbi = f32(cm), f32(cm) * 0.1, f32(cm), f32(cm) * 0.1
    want_mix = lambda: global_mixer_xla_cm(xg, asc, abi, psc, pbi)
    xh = f32(2, 2 * cm, 64, 64)
    lng, lnb = 1.0 + f32(2 * cm) * 0.1, f32(2 * cm)
    want_head = lambda: ln_mixer_head_xla_cm(xh, lng, lnb, asc, abi, psc,
                                             pbi)
    for trig in ("native", "poly"):
        cases.append((f"global mixer trig={trig}",
                      lambda trig=trig: fused_global_mixer_cm(
                          xg, asc, abi, psc, pbi, trig=trig), want_mix))
        cases.append((f"mixer head trig={trig}",
                      lambda trig=trig: fused_ln_mixer_head_cm(
                          xh, lng, lnb, asc, abi, psc, pbi, trig=trig),
                      want_head))

    # --- bf16-storage variants of the trunk kernels ------------------------
    # (LGTEUN_EVAL_DTYPE=bf16 feeds the kernels bf16 refs; loads upcast,
    # internal math stays f32 — the parity bound is bf16 I/O rounding)
    xt16 = (xt.astype(jnp.bfloat16), x1t.astype(jnp.bfloat16),
            x2t.astype(jnp.bfloat16))
    cases.append(("block tail tiled bf16-io",
                  lambda: fused_block_tail_cm(
                      *xt16, pk, pb, ffn, tile_rows=8,
                      taps="vpu").astype(jnp.float32), want_tail))
    cases.append(("mixer head bf16-io",
                  lambda: tuple(
                      t.astype(jnp.float32) for t in fused_ln_mixer_head_cm(
                          xh.astype(jnp.bfloat16), lng, lnb, asc, abi, psc,
                          pbi, trig="poly")), want_head))
    # bf16res mode: f32 input, bf16 branch OUTPUTS (out_dtype override)
    cases.append(("mixer head f32-in bf16-out",
                  lambda: tuple(
                      t.astype(jnp.float32) for t in fused_ln_mixer_head_cm(
                          xh, lng, lnb, asc, abi, psc, pbi,
                          out_dtype=jnp.bfloat16)), want_head))
    # training tail: f32 residual + bf16 branch inputs (bf16res) and the
    # masked (dropout) variants of both tail kernels
    cases.append(("block tail f32-res bf16-branch",
                  lambda: fused_block_tail_cm(
                      xt, x1t.astype(jnp.bfloat16), x2t.astype(jnp.bfloat16),
                      pk, pb, ffn, tile_rows=8), want_tail))
    mask_t = jnp.asarray(
        (rng.random((2, cc, 16, 128)) < 0.9) / 0.9, jnp.float32)
    mask_r = jnp.asarray(
        (rng.random((2, cc, 16, 16)) < 0.9) / 0.9, jnp.float32)
    cases.append(("block tail tiled masked",
                  lambda: fused_block_tail_cm(
                      xt, x1t, x2t, pk, pb, ffn, tile_rows=8, mask=mask_t),
                  lambda: block_tail_xla(xt, x1t, x2t, pk, pb, ffn,
                                         mask=mask_t)))
    cases.append(("block tail rolls masked",
                  lambda: fused_block_tail_cm(
                      xr, x1r, x2r, pk, pb, ffn, mask=mask_r),
                  lambda: block_tail_xla(xr, x1r, x2r, pk, pb, ffn,
                                         mask=mask_r)))

    # --- whole-LGB-block megakernel (fuse level 3) --------------------------
    from lgteun_tpu.ops.lgb_block_kernel import (
        fused_lgb_block_cm, lgb_block_xla_cm,
    )

    cb = 8
    conv = lambda ci, co: {"Conv_0": {"Conv_0": {
        "kernel": f32(1, 1, ci, co), "bias": f32(co)}}}
    blk = {
        "norm": {"scale": 1.0 + 0.1 * f32(cb), "bias": f32(cb)},
        "local": {"to_qkv_kernel": f32(1, 1, cb // 2, 3 * cb // 2),
                  "to_qkv_bias": f32(3 * cb // 2),
                  "pos_emb": f32(2, 64, 64)},
        "global": {"amp_scale": f32(1, 1, 1, cb // 2),
                   "amp_bias": f32(cb // 2),
                   "pha_scale": f32(1, 1, 1, cb // 2),
                   "pha_bias": f32(cb // 2)},
        "proj": conv(cb, cb),
        "ffn": {"ln_gamma": 1.0 + 0.1 * f32(cb), "ln_beta": f32(cb),
                "w1": f32(cb, 4 * cb), "b1": f32(4 * cb),
                "w2": f32(4 * cb, 4 * cb), "b2": f32(4 * cb),
                "dw": f32(3, 3, 4 * cb), "bdw": f32(4 * cb),
                "w3": f32(4 * cb, cb), "b3": f32(cb)},
    }
    xlgb = f32(2, cb, 16, 128)
    want_lgb = lambda: lgb_block_xla_cm(xlgb, blk)
    for te in (False, True):
        cases.append((f"lgb megakernel tanh_exp={te}",
                      lambda te=te: fused_lgb_block_cm(
                          xlgb, blk, tile_rows=8, tanh_exp=te), want_lgb))
    cases.append(("lgb megakernel bf16-io",
                  lambda: fused_lgb_block_cm(
                      xlgb.astype(jnp.bfloat16), blk,
                      tile_rows=8).astype(jnp.float32), want_lgb))

    # --- whole-network LightNet kernel -------------------------------------
    from lgteun_tpu.models.lightnet import LightNetModule
    from lgteun_tpu.ops.lightnet_kernel import lightnet_fused_forward

    lm = LightNetModule(ms_chans=4)
    ms_in = f32(1, 32, 32, 4) * 0.2 + 0.5
    pan_in = f32(1, 128, 128, 1) * 0.2 + 0.5
    lparams = lm.init(jax.random.PRNGKey(0), ms_in, pan_in)["params"]
    cases.append(("lightnet whole-net",
                  lambda: lightnet_fused_forward(lparams, ms_in, pan_in),
                  lambda: lm.apply({"params": lparams}, ms_in, pan_in)))

    # --- whole-chain texture match (INNT) -----------------------------------
    from lgteun_tpu.ops.texture_match_kernel import (
        fused_texture_match, texture_match_xla,
    )

    # Well-separated matches: lr = spatially-shifted ref + small noise,
    # so each query's best ref sub-patch wins by a wide margin. Random
    # iid data has top-2 correlation gaps ~1e-2 — below the MXU's bf16
    # operand rounding on the R dot, flipping argmax picks on BOTH the
    # fused and the XLA-on-chip paths (benign, documented in
    # patch_match_kernel.py) and swamping the lowering check.
    tm_ref = f32(8, 4, 576)
    tm_lr = jnp.roll(tm_ref, 48, axis=2) + 0.01 * f32(8, 4, 576)
    cases.append(("texture match whole-chain",
                  lambda: fused_texture_match(tm_lr, tm_ref),
                  lambda: texture_match_xla(tm_lr, tm_ref, 24)))
    return cases


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tol", type=float, default=2e-2)
    args = ap.parse_args()
    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}")

    rng = np.random.default_rng(0)
    fails = 0
    for name, fused, want in _cases(rng):
        t0 = time.perf_counter()
        try:
            got = jax.tree.map(np.asarray, fused())   # readback = sync
            ref = jax.tree.map(np.asarray, want())
            rel = max(_rel(g, r) for g, r in zip(jax.tree.leaves(got),
                                                 jax.tree.leaves(ref)))
            ok = rel <= args.tol
            fails += not ok
            print(f"{'PASS' if ok else 'FAIL':4s} {name:32s} "
                  f"rel={rel:.2e}  ({time.perf_counter() - t0:.1f}s)")
        except Exception as e:  # noqa: BLE001 — triage tool, keep going
            fails += 1
            msg = str(e).splitlines()[0][:120]
            print(f"FAIL {name:32s} {type(e).__name__}: {msg}")
    print(f"{fails} failing")
    return fails


if __name__ == "__main__":
    raise SystemExit(main())
