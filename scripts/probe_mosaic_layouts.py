"""Mosaic layout-op probes for the per-block LGB megakernel.

The megakernel (ops/lgb_block_kernel.py) needs a handful of in-kernel
relayout operations the existing kernels never combine in one program:

  P1  collapse [c, h, w] -> [c, h*w]           (4D image view -> flat)
  P2  split    [c, h*w] -> [c, h, w]           (flat -> image view)
  P3  band collapse [c, 8, 128] -> [c, 1024]   (sublane-slice band -> flat)
  P4  stack of lane slices -> [8, hd, 128] + batched dot_general
      (the window-pair attention batch build)

Each probe is a minimal pallas_call compiled on the real backend and
checked against numpy. Run BEFORE building the megakernel; a FAIL here
means that op needs a workaround (e.g. permutation matmul instead of
reshape).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/lgteun_jax"))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

C, H, W = 16, 128, 128


def _run(name, kernel, x, out_shape):
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(x)
        return np.asarray(out)
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAIL ({str(e).splitlines()[0][:120]})")
        return None


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(C, H, W)), jnp.float32)
    xf = x.reshape(C, H * W)

    # P1: collapse (h, w) -> lanes inside the kernel
    def k1(x_ref, o_ref):
        o_ref[:] = x_ref[:].reshape(C, H * W) * 2.0

    got = _run("P1 collapse [c,h,w]->[c,hw]", k1, x, (C, H * W))
    if got is not None:
        ok = np.allclose(got, np.asarray(xf) * 2.0)
        print(f"P1 collapse [c,h,w]->[c,hw]: {'PASS' if ok else 'WRONG'}")

    # P2: split lanes -> (h, w)
    def k2(x_ref, o_ref):
        o_ref[:] = x_ref[:].reshape(C, H, W) * 2.0

    got = _run("P2 split [c,hw]->[c,h,w]", k2, xf, (C, H, W))
    if got is not None:
        ok = np.allclose(got, np.asarray(x) * 2.0)
        print(f"P2 split [c,hw]->[c,h,w]: {'PASS' if ok else 'WRONG'}")

    # P3: sublane-slice band then collapse
    def k3(x_ref, o_ref):
        for b in range(H // 8):
            band = x_ref[:, b * 8:(b + 1) * 8, :].reshape(C, 8 * W)
            o_ref[:, b * 8 * W:(b + 1) * 8 * W] = band

    got = _run("P3 band slice+collapse", k3, x, (C, H * W))
    if got is not None:
        ok = np.allclose(got, np.asarray(xf))
        print(f"P3 band slice+collapse: {'PASS' if ok else 'WRONG'}")

    # P4: stack lane slices into a batch + batched dot_general
    hd, npair = 8, W // 16  # 8 pairs of 8x8 windows per 1024-lane band
    q = jnp.asarray(rng.normal(size=(hd, 1024)), jnp.float32)

    def k4(q_ref, o_ref):
        qs = jnp.stack([q_ref[:, j * 128:(j + 1) * 128]
                        for j in range(npair)])      # [8, hd, 128]
        sim = jax.lax.dot_general(
            qs, qs, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)       # [8, 128, 128]
        o_ref[:] = sim

    try:
        out = pl.pallas_call(
            k4,
            out_shape=jax.ShapeDtypeStruct((npair, 128, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(q)
        # Mosaic dots round operands to bf16 — compare against the
        # bf16-rounded oracle (measured on chip: 9.5e-7 max err)
        qn = np.asarray(q).astype(jnp.bfloat16).astype(np.float32)
        want = np.stack([qn[:, j * 128:(j + 1) * 128].T
                         @ qn[:, j * 128:(j + 1) * 128]
                         for j in range(npair)])
        ok = np.allclose(np.asarray(out), want, atol=1e-4)
        print(f"P4 slice-stack + batched dot: {'PASS' if ok else 'WRONG'}")
    except Exception as e:  # noqa: BLE001
        print(f"P4 slice-stack + batched dot: FAIL "
              f"({str(e).splitlines()[0][:120]})")

    # P5: lane-split reshape [hd, n*128] -> [hd, n, 128] then transpose
    def k5(q_ref, o_ref):
        t = q_ref[:].reshape(hd, npair, 128)
        o_ref[:] = t.transpose(1, 0, 2)

    try:
        out = pl.pallas_call(
            k5,
            out_shape=jax.ShapeDtypeStruct((npair, hd, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(q)
        qn = np.asarray(q)
        want = qn.reshape(hd, npair, 128).transpose(1, 0, 2)
        ok = np.allclose(np.asarray(out), want)
        print(f"P5 lane-split reshape + transpose: "
              f"{'PASS' if ok else 'WRONG'}")
    except Exception as e:  # noqa: BLE001
        print(f"P5 lane-split reshape + transpose: FAIL "
              f"({str(e).splitlines()[0][:120]})")


if __name__ == "__main__":
    main()
