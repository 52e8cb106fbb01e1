"""INNT component profile on chip (VERDICT r3 next-step #7).

INNT is the zoo floor (15x vs the 3090). The patch-match kernel already
killed the 10.8 GB similarity tensor; this breaks the remaining
~2.9 ms/img into its structural pieces so the next fusion target is a
measured choice, using the dispatch-proof on-device loop harness.

Usage: python scripts/profile_innt.py [--batch 32]
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


def timed(fn, args, iters=8):
    @jax.jit
    def chained(n, a0, rest):
        def body(_, carry):
            x_c, acc = carry
            out = fn(x_c, *rest)
            return x_c + 1e-12 * jnp.mean(out), acc + jnp.mean(out)

        _, acc = jax.lax.fori_loop(0, n, body, (a0, jnp.float32(0)))
        return acc

    a0, rest = args[0], tuple(args[1:])

    def run(k):
        t0 = time.perf_counter()
        float(chained(k, a0, rest))
        return time.perf_counter() - t0

    run(1)
    t1 = min(run(2) for _ in range(2))
    t2 = min(run(2 + iters) for _ in range(2))
    return (t2 - t1) / iters * 1000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--ms-chans", type=int, default=4)
    args = ap.parse_args()
    b, c = args.batch, args.ms_chans

    import flax.linen as nn

    from lgteun_tpu.models.innt import (GPPNNINNT, PatchFusion,
                                        TransformerFusion, _InvBlockINNT)
    from lgteun_tpu.models.common.refine import Refine
    from lgteun_tpu.models.common.layers import Conv
    from lgteun_tpu.ops.patches import extract_patches, fold_patches
    from lgteun_tpu.ops.resize import resize_bicubic

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    ms = jnp.asarray(rng.uniform(0, 1, (b, 32, 32, c)), jnp.float32)
    pan = jnp.asarray(rng.uniform(0, 1, (b, 128, 128, 1)), jnp.float32)

    rows = []

    def report(name, ms_):
        rows.append((name, ms_))
        print(f"{name:34s} {ms_:8.2f} ms/batch {ms_ / b:7.3f} ms/img",
              flush=True)

    # whole model
    m = GPPNNINNT(ms_chans=c, n_feat=8)
    params = m.init(key, ms, pan)
    report("WHOLE GPPNNINNT", timed(
        lambda a, p_: m.apply(params, a, p_), (ms, pan)))

    # bicubic upsample
    report("resize_bicubic x4", timed(
        lambda a: resize_bicubic(a, (128, 128), align_corners=True), (ms,)))

    half = 4
    feat = jnp.asarray(rng.uniform(0, 1, (b, 128, 128, half)), jnp.float32)

    # PatchFusion end-to-end
    pf = PatchFusion(half)
    pfp = pf.init(key, feat, feat)
    report("PatchFusion (24/8 + transformer)", timed(
        lambda a, bb: pf.apply(pfp, a, bb), (feat, feat)))

    # inside PatchFusion: 24x24/s8 extract + scramble (no transformer)
    def pf_shell(a, bb):
        k, s, p = 24, 8, 8
        u1 = extract_patches(a, k, s, p)
        u2 = extract_patches(bb, k, s, p)
        L = u1.shape[1]
        t1 = u1.transpose(0, 2, 1).reshape(b * L, half, k, k)
        t2 = u2.transpose(0, 2, 1).reshape(b * L, half, k, k)
        f = (t1 + t2).reshape(b, half * k * k, L).transpose(0, 2, 1)
        return fold_patches(f, (128, 128), half, k, s, p)

    report("  24/8 extract+scramble+fold only", timed(pf_shell, (feat, feat)))

    # TransformerFusion on the patch batch
    L = ((128 + 16 - 24) // 8 + 1) ** 2
    patches = jnp.asarray(rng.uniform(0, 1, (b * L, 24, 24, half)),
                          jnp.float32)
    tf = TransformerFusion(half)
    tfp = tf.init(key, patches, patches)
    report(f"  TransformerFusion [{b * L},24,24,{half}]", timed(
        lambda a, bb: tf.apply(tfp, a, bb), (patches, patches)))

    # inside TransformerFusion: patch match alone vs convs alone
    from lgteun_tpu.ops.patch_match_kernel import fused_patch_match

    def match_only(a, bb):
        lr_unf = extract_patches(a, 3, 1, 1)
        ref_unf = extract_patches(bb, 3, 1, 1)
        ref_n = ref_unf / (jnp.linalg.norm(ref_unf, axis=2, keepdims=True) + 1e-12)
        lr_n = lr_unf / (jnp.linalg.norm(lr_unf, axis=2, keepdims=True) + 1e-12)
        t_km, r_star = fused_patch_match(lr_n, ref_n,
                                         ref_unf.transpose(0, 2, 1))
        t = fold_patches(t_km.transpose(0, 2, 1), (24, 24), half, 3, 1, 1) / 9.0
        return t + r_star.reshape(-1, 24, 24, 1)

    report("    match (extract+norm+pm+fold)", timed(match_only,
                                                     (patches, patches)))

    conv0 = Conv(half, (3, 3))
    c0p = conv0.init(key, jnp.concatenate([patches, patches], axis=-1))

    def convs_only(a, bb):
        y = conv0.apply(c0p, jnp.concatenate([a, bb], axis=-1))
        return nn.relu(y)

    report("    one 3x3 conv on patch batch", timed(convs_only,
                                                    (patches, patches)))

    # InvBlock stack (x3) on [b,128,128,8]
    x8 = jnp.asarray(rng.uniform(0, 1, (b, 128, 128, 8)), jnp.float32)
    inv = _InvBlockINNT(8, half)
    invp = inv.init(key, x8)
    one = timed(lambda a: inv.apply(invp, a), (x8,))
    report("one InvBlock [b,128,128,8]", one)
    report("  => x3 stack (extrapolated)", one * 3)

    # Refine tail
    rf = Refine(c)
    rfp = rf.init(key, x8)
    report("Refine tail", timed(lambda a: rf.apply(rfp, a), (x8,)))

    total = sum(msv for name, msv in rows[1:] if not name.startswith(" "))
    print(f"{'(sum of top-level parts)':34s} {total:8.2f} ms/batch")


if __name__ == "__main__":
    main()
