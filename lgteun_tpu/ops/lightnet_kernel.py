"""Whole-network fused LightNet inference (Pallas TPU kernel).

LightNet (reference models/lightnet.py:85-135) is 10 SpanConv layers —
each two parallel pointwise->depthwise3x3 branches summed — over a
[B, C+1, 128, 128] stack. It is the zoo's pure-traffic model: ~16 K
params, ~2 GFLOP/img, and every XLA lowering materialises each layer's
[B, 32, 128, 128] activation in HBM (the measured f32 NCHW path moves
~25x the model's minimum traffic and lands at 8.2 ms/batch-32 on v5e).

This kernel runs the ENTIRE network in one VMEM pass per image:

- grid = batch; each program holds one image's activations resident
  ([<=64, 16384] f32 ~ 4 MiB per buffer, far under the raised VMEM cap)
- the two SpanConv branches are packed on the sublane axis: one
  [64, 32] @ [32, N] MXU matmul computes both pointwise convs, one
  9-tap VPU pass (reusing `ffn_kernel._dw_taps`' halo-extended slice
  scheme) applies both depthwise convs, then the branch halves are
  summed — so a layer is exactly one matmul + one tap pass
- all layer channel counts (5..32) are zero-padded to 32: padded
  weight COLUMNS are zero, so garbage in padded activation rows can
  never propagate into real channels; the final row mask kills it
- HBM traffic per image: the 5-channel input + 4-channel output only
  (~0.6 MB vs ~120 MB for the unfused f32 path)

f32 activations throughout (the only rounding is the MXU dot's
bf16-operand rounding, the same class the XLA path's default-precision
matmuls apply). Parity vs the flax module is tested in
tests/test_lightnet_kernel.py; the reference numerics contract is the
NCHW fast path in models/lightnet.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lgteun_tpu.ops.ffn_kernel import _VMEM_PARAMS, _dw_taps

__all__ = ["lightnet_fused_forward", "lightnet_layers"]

_CPAD = 32   # all layer channel counts padded to this
_BPAD = 64   # two branches stacked: 2 * _CPAD


def lightnet_layers(ms_chans: int):
    """(name, cin, cout, relu_after) per SpanConv, in forward order
    (reference lightnet.py:85-135: head relu after head2, belly relu
    between conv1/conv2 of each block)."""
    c5 = ms_chans + 1
    return (
        ("head0", c5, c5, False),
        ("head1", c5, 20, False),
        ("head2", 20, 32, True),
        (("belly0", "conv1"), 32, 32, True),
        (("belly0", "conv2"), 32, 32, False),
        (("belly1", "conv1"), 32, 32, True),
        (("belly1", "conv2"), 32, 32, False),
        ("tail0", 32, 16, False),
        ("tail1", 16, 8, False),
        ("tail2", 8, ms_chans, False),
    )


def _subtree(params, name):
    return params[name] if isinstance(name, str) else params[name[0]][name[1]]


def _pack_params(params, ms_chans: int):
    """LightNetModule param tree -> (W [L,64,32], PB [L,64,1],
    DWK [L,64,9], DB [L,64,1]) with branch a in rows :32 and branch b
    in rows 32:, channels zero-padded to 32."""
    Ws, PBs, DWKs, DBs = [], [], [], []
    for name, cin, cout, _ in lightnet_layers(ms_chans):
        p = _subtree(params, name)
        W = jnp.zeros((_BPAD, _CPAD), jnp.float32)
        PB = jnp.zeros((_BPAD,), jnp.float32)
        DWK = jnp.zeros((_BPAD, 9), jnp.float32)
        DB = jnp.zeros((_BPAD,), jnp.float32)
        for bi, (pw, dw) in enumerate((("pw1", "dw1"), ("pw2", "dw2"))):
            r = bi * _CPAD
            W = W.at[r:r + cout, :cin].set(p[pw]["kernel"][0, 0].T)
            PB = PB.at[r:r + cout].set(p[pw]["bias"])
            DWK = DWK.at[r:r + cout].set(p[dw]["kernel"][:, :, 0].reshape(9, -1).T)
            DB = DB.at[r:r + cout].set(p[dw]["bias"])
        Ws.append(W)
        PBs.append(PB[:, None])
        DWKs.append(DWK)
        DBs.append(DB[:, None])
    return (jnp.stack(Ws), jnp.stack(PBs), jnp.stack(DWKs), jnp.stack(DBs))


def _kernel(x_ref, lms_ref, W, PB, DWK, DB, out_ref, *, w, th, relu,
            ms_chans):
    """One image per program: x_ref [1, 32, n] (rows 0..ms_chans =
    pan+lms, rest zero), lms_ref [1, 8, n] (rows ms_chans.. zero)."""
    n = th * w
    n_all = (th + 2) * w
    x = x_ref[0]  # [32, n]

    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, n_all), 1)
    col_all = lane_ids % w
    left_edge = col_all == 0
    right_edge = col_all == w - 1
    # halo rows above/below the image are zeros (torch SAME zero pad)
    in_img = (lane_ids >= w) & (lane_ids < n_all - w)
    zrow = jnp.zeros((_BPAD, w), jnp.float32)

    for li in range(len(relu)):
        y = jax.lax.dot_general(
            W[li], x, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + PB[li]
        seg = jnp.concatenate([zrow, y, zrow], axis=1)  # [64, n_all]
        seg = jnp.where(in_img, seg, 0.0)
        acc = _dw_taps(seg, DWK[li], th=th, w=w, c4=_BPAD,
                       left_edge=left_edge, right_edge=right_edge,
                       mxu=False)
        acc = acc + DB[li]
        x = acc[:_CPAD] + acc[_CPAD:]
        if relu[li]:
            x = jnp.maximum(x, 0.0)

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (8, n), 0)
    out = jnp.where(row_ids < ms_chans, x[:8], 0.0) + lms_ref[0]
    out_ref[0] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("ms_chans", "interpret"))
def _lightnet_call(xp, lmsp, params, *, ms_chans: int,
                   interpret: bool = False):
    b, _, n = xp.shape
    w = 128
    th = n // w
    layers = lightnet_layers(ms_chans)
    W, PB, DWK, DB = _pack_params(params, ms_chans)
    kernel = functools.partial(_kernel, w=w, th=th,
                               relu=tuple(r for *_x, r in layers),
                               ms_chans=ms_chans)
    const = lambda shp: pl.BlockSpec(shp, lambda bi: tuple(0 for _ in shp),
                                     memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, 8, n), jnp.float32),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, _CPAD, n), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, n), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            const(W.shape), const(PB.shape), const(DWK.shape),
            const(DB.shape),
        ],
        out_specs=pl.BlockSpec((1, 8, n), lambda bi: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=_VMEM_PARAMS,
        interpret=interpret or jax.default_backend() != "tpu",
    )(xp, lmsp, W, PB, DWK, DB)


def lightnet_fused_forward(params, ms, pan, *, interpret: bool = False):
    """NHWC in/out; `params` = the LightNetModule param tree.

    Requires PAN width a multiple of 128 (lane-aligned H-shift slices);
    callers fall back to the NCHW XLA path otherwise."""
    from lgteun_tpu.models.common.layers import sampling

    ms_chans = ms.shape[-1]
    lms = sampling(sampling(ms, 2), 2)          # [b, h, w, C]
    x = jnp.concatenate([pan, lms], axis=-1)    # [b, h, w, C+1]
    b, h, w, c5 = x.shape
    if w % 128 or ms_chans > 8:
        raise ValueError(f"unsupported shape {x.shape} for the fused "
                         f"lightnet kernel")
    xc = jnp.moveaxis(x, -1, 1).reshape(b, c5, h * w)
    xp = jnp.pad(xc, ((0, 0), (0, _CPAD - c5), (0, 0)))
    lmsc = jnp.moveaxis(lms, -1, 1).reshape(b, ms_chans, h * w)
    lmsp = jnp.pad(lmsc, ((0, 0), (0, 8 - ms_chans), (0, 0)))
    out = _lightnet_call(xp, lmsp, params, ms_chans=ms_chans,
                         interpret=interpret)
    out = out[:, :ms_chans].reshape(b, ms_chans, h, w)
    return jnp.moveaxis(out, 1, -1).astype(ms.dtype)
