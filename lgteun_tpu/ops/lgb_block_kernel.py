"""Whole-LGB-block megakernel (Pallas TPU).

One LGB block of LGTEUN's LGT prior (reference models/common/LGT.py:
222-248) is

    y  = LN(x)                                   (channel LayerNorm)
    x1 = window_MHSA(y[:, :C/2])                 (LGT.py:112-146)
    x2 = global_FFT_mixer(y[:, C/2:])            (LGT.py:149-180)
    xm = x + proj([x1; x2])                      (LGT.py:200-218)
    out = xm + FFN(LN(xm))                       (LGT.py:91-109)

The round-3/4 fast path ran this as THREE fused Pallas kernels
(ops/spectral_kernel.fused_ln_mixer_head_cm -> packed v3 window
attention -> ops/ffn_kernel.fused_block_tail_cm) with XLA permutation
matmuls packing windows between them. Every boundary spills the
[B, C/2..C, H, W] activations to HBM — ~10 MB/image/block of pure
inter-kernel traffic; the measured 14% win of bf16-storage mode
(round 4) is exactly the size of that spill.

This kernel runs the WHOLE block in one VMEM residence (grid = batch,
one image per program):

- LN once, both mixer halves consumed in-register
- the window pack/unpack runs as in-kernel [win*W, win*W] permutation
  matmuls per 8-row band (the same `pack_mats` one-hot matrices the
  XLA path used, now without the HBM round trip)
- attention per band: qkv projection on the packed layout, then
  `W/(2*win)` window PAIRS batched on the dot_general batch axis with
  the v3 kernel's block-diagonal -1e9 position table and tanh-form
  softmax (ops/window_attention.py provenance)
- the spectral chain is `ops/spectral_kernel.mixer_body` verbatim
  (same epsilons, zero-bin convention, atan2/sincos polynomials)
- the tail is the row-tiled halo walk of `ops/ffn_kernel._tail_kernel`
  operating on the VMEM-resident xi/x1/x2 (same GELU/taps engines)

bf16 in/out refs upcast on load (selective-storage trunk); ALL internal
math including every inter-stage tensor stays f32 — so fusing is a
numerics UPGRADE over bf16 storage between separate kernels.

Validated against the three-kernel composition and the XLA reference in
tests/test_lgb_block_kernel.py; selected at LGTEUN_FUSE_LEVEL >= 3.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lgteun_tpu.ops.ffn_kernel import (
    _dw_taps,
    _gelu_exact,
    _gelu_mode,
    _taps_mode,
    block_tail_xla,
)
from lgteun_tpu.ops.spectral_kernel import (
    _mixer_mats,
    _trig_mode,
    ln_mixer_head_xla_cm,
    mixer_body,
)
from lgteun_tpu.ops.window_attention import _exp_from_tanh

__all__ = ["fused_lgb_block_cm", "lgb_block_xla_cm", "pack_mats"]

_VMEM_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


@functools.lru_cache(maxsize=None)
def pack_mats(win: int, w: int):
    """0/1 permutation matrices for the window-PAIR pack, numpy f32.

    P    [win*w, win*w]   flat 8-row band -> pair-major packed lanes
                          (pair j's lanes j*2win^2 .. (j+1)*2win^2, a
                          window's win^2 tokens contiguous)
    Pinv [win*w, win*w]   exact inverse (P is a permutation: P^T)

    Same layout contract as the XLA-side `_pack_mats` in
    models/lgteun_fast.py (which now reuses this constructor)."""
    npair = w // (2 * win)
    m = win * w
    P = np.zeros((m, m), np.float32)
    for r in range(win):
        for col in range(w):
            j, q = col // (2 * win), col % (2 * win)
            pw, cc = q // win, q % win
            P[r * w + col, j * 2 * win * win
              + pw * win * win + r * win + cc] = 1.0
    return P, P.T.copy()


def _pos2_blockdiag(pos, neg_val=-1e9):
    """[heads, S, S] -> [heads, 2S, 2S] block-diagonal with -1e9 off-
    diagonal blocks (the v3 packed-pair mask)."""
    heads, s, _ = pos.shape
    neg = jnp.full((heads, s, s), neg_val, pos.dtype)
    return jnp.concatenate([
        jnp.concatenate([pos, neg], axis=2),
        jnp.concatenate([neg, pos], axis=2)], axis=1)


def _attention_packed(qkv, pos2, *, c2, heads, npairs, scale, tanh_exp):
    """Whole-image packed attention: qkv [3c2, npairs*2S] (pair-major
    packed lanes) -> [c2, npairs*2S]. All window pairs ride the
    dot_general batch axis at once (lane-split reshape + transpose —
    both Mosaic-proven, scripts/probe_mosaic_layouts.py); softmax is
    the v3 kernel's (max-subtract + tanh-form exp)."""
    hd = c2 // heads
    s2 = qkv.shape[-1] // npairs  # 2 * win^2 lanes per pair

    def batched(t):
        return t.reshape(hd, npairs, s2).transpose(1, 0, 2)

    outs = []
    for h in range(heads):
        q = batched(qkv[h * hd:(h + 1) * hd])             # [np, hd, 2S]
        k = batched(qkv[c2 + h * hd:c2 + (h + 1) * hd])
        v = batched(qkv[2 * c2 + h * hd:2 * c2 + (h + 1) * hd])
        sim = jax.lax.dot_general(
            q * scale, k,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)           # [np, 2S, 2S]
        sim = sim + pos2[h][None]
        sim = sim - jnp.max(sim, axis=-1, keepdims=True)
        e = _exp_from_tanh(sim) if tanh_exp else jnp.exp(sim)
        # normalisation folded past the value matmul (see _kernel_v3)
        recip = 1.0 / jnp.sum(e, axis=-1)                 # [np, 2S]
        out_h = jax.lax.dot_general(
            v, e,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)           # [np, hd, 2S]
        out_h = out_h * recip[:, None, :]
        outs.append(out_h.transpose(1, 0, 2).reshape(hd, npairs * s2))
    return jnp.concatenate(outs, axis=0)                  # [c2, np*2S]


def _kernel(x_ref, lng, lnb, asc, abi, psc, pbi,
            wc, ws, hc, hs, hic, his, wic, wis,
            packP, packPinv, wqkvt, bqkv, pos2,
            wp1t, wp2t, bp, fg, fb, w1t, b1, w2t, b2, dw, bdw, w3t, b3,
            out_ref, *, c, h, w, win, heads, scale, eps, th,
            trig, mxu, rat, tanh_exp):
    """One image [c, h, w] per program; see module docstring."""
    c2 = c // 2
    xi = x_ref[0].astype(jnp.float32)                     # [c, h, w]

    # ---- LN over channels (per pixel) ----
    mu = jnp.mean(xi, axis=0, keepdims=True)
    var = jnp.mean((xi - mu) ** 2, axis=0, keepdims=True)
    y = (xi - mu) * jax.lax.rsqrt(var + eps)
    col3 = lambda p: p[...].reshape(-1, 1, 1)
    y = y * col3(lng) + col3(lnb)

    # ---- global branch: spectral mixer on y[c2:] ----
    x2 = mixer_body(y[c2:], col3(asc), col3(abi), col3(psc), col3(pbi),
                    tuple(m[:] for m in (wc, ws, hc, hs, hic, his, wic,
                                         wis)), c=c2, h=h, w=w, trig=trig)

    # ---- local branch: pack -> qkv -> pair-batched MHSA -> unpack ----
    # All 8-row bands pack in ONE [c2*nb, win*w] matmul (band rides the
    # sublane axis next to channels), qkv is one [3c2, c2] @ [c2, h*w]
    # matmul, and every window pair in the image batches through one
    # pair of attention dot_generals.
    nb = h // win
    npairs = (h // win) * (w // (2 * win))
    m = win * w

    def per_band(t, cc):
        """[cc, h*w] <-> [cc*nb, m] (band index onto the sublane axis)."""
        return t.reshape(cc, nb, m).reshape(cc * nb, m)

    def un_band(t, cc):
        return t.reshape(cc, nb, m).reshape(cc, h * w)

    y1f = y[:c2].reshape(c2, h * w)
    pb = un_band(jax.lax.dot_general(
        per_band(y1f, c2), packP[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32), c2)          # [c2, hw] packed
    qkv = jax.lax.dot_general(
        wqkvt[:], pb,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bqkv[:]     # [3c2, hw]
    ap = _attention_packed(qkv, pos2, c2=c2, heads=heads, npairs=npairs,
                           scale=scale, tanh_exp=tanh_exp)
    x1 = un_band(jax.lax.dot_general(
        per_band(ap, c2), packPinv[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32), c2).reshape(c2, h, w)

    # ---- tail: xm = x + proj([x1; x2]); out = xm + FFN(LN(xm)) ----
    # (the row-tiled halo walk of ops/ffn_kernel._tail_kernel)
    c4 = w1t.shape[0]
    nt = h // th
    n_all = (th + 2) * w

    def mm(wt, t, bias=None):
        out = jax.lax.dot_general(
            wt[:], t, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return out if bias is None else out + bias[:]

    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, n_all), 1)
    col_all = lane_ids % w
    left_edge = col_all == 0
    right_edge = col_all == w - 1

    for ti in range(nt):
        lo, hi = ti * th, (ti + 1) * th

        def seg_of(img, cc, lo=lo, hi=hi, ti=ti):
            top = (img[:, lo - 1:lo, :] if ti > 0
                   else jnp.zeros((cc, 1, w), jnp.float32))
            bot = (img[:, hi:hi + 1, :] if ti < nt - 1
                   else jnp.zeros((cc, 1, w), jnp.float32))
            seg3 = jnp.concatenate([top, img[:, lo:hi, :], bot], axis=1)
            return seg3.reshape(cc, n_all)

        xm = (seg_of(xi, c) + mm(wp1t, seg_of(x1, c2))
              + mm(wp2t, seg_of(x2, c2)) + bp[:])

        mu_t = jnp.mean(xm, axis=0, keepdims=True)
        var_t = jnp.mean((xm - mu_t) ** 2, axis=0, keepdims=True)
        yt = (xm - mu_t) * jax.lax.rsqrt(var_t + eps)
        yt = yt * fg[:] + fb[:]

        h1 = _gelu_exact(mm(w1t, yt, b1), rational=rat)
        h2 = mm(w2t, h1, b2)

        if ti == 0 or ti == nt - 1:
            ok = jnp.ones((1, n_all), jnp.bool_)
            if ti == 0:
                ok = ok & (lane_ids >= w)
            if ti == nt - 1:
                ok = ok & (lane_ids < n_all - w)
            h2 = jnp.where(ok, h2, 0.0)

        acc = _dw_taps(h2, dw[:], th=th, w=w, c4=c4, left_edge=left_edge,
                       right_edge=right_edge, mxu=mxu)
        acc = _gelu_exact(acc + bdw[:], rational=rat)

        out = mm(w3t, acc, b3)
        interior = xm[:, w:w + th * w]
        out_ref[0, :, lo:hi, :] = (
            (out + interior).reshape(c, th, w).astype(out_ref.dtype))


def lgb_block_xla_cm(x_cm, blk, *, win=8, heads=2, eps=1e-5):
    """XLA reference with identical semantics, channel-major [B,C,H,W].

    blk: {"norm": {scale, bias}, "local": {to_qkv_kernel [1,1,C/2,3C/2],
    to_qkv_bias, pos_emb}, "global": {amp_scale [1,1,1,C/2], amp_bias,
    pha_scale, pha_bias}, "proj": PointConv subtree, "ffn": flat FFN
    dict} — the `_lgb_cm` per-block param layout of models/lgteun_fast.
    """
    from lgteun_tpu.ops.window_attention import window_attention_xla

    b, c, h, w = x_cm.shape
    c2 = c // 2
    g = blk["global"]
    y1, x2 = ln_mixer_head_xla_cm(
        x_cm, blk["norm"]["scale"], blk["norm"]["bias"],
        g["amp_scale"][0, 0, 0], g["amp_bias"],
        g["pha_scale"][0, 0, 0], g["pha_bias"], eps=eps)
    loc = blk["local"]
    # [B, c2, H, W] -> [N, S, c2] windows
    nh, nw = h // win, w // win
    t = y1.reshape(b, c2, nh, win, nw, win).transpose(0, 2, 4, 3, 5, 1)
    xw = t.reshape(b * nh * nw, win * win, c2)
    out = window_attention_xla(xw, loc["to_qkv_kernel"][0, 0],
                               loc["to_qkv_bias"], loc["pos_emb"], heads,
                               (c2 // heads) ** -0.5)
    t = out.reshape(b, nh, nw, win, win, c2).transpose(0, 5, 1, 3, 2, 4)
    x1 = t.reshape(b, c2, h, w)
    return block_tail_xla(x_cm, x1, x2,
                          blk["proj"]["Conv_0"]["Conv_0"]["kernel"][0, 0],
                          blk["proj"]["Conv_0"]["Conv_0"]["bias"],
                          blk["ffn"], eps=eps)


def fused_lgb_block_cm(x_cm, blk, *, win: int = 8, heads: int = 2,
                       eps: float = 1e-5, tile_rows: int = 32,
                       interpret: bool = False, trig: str | None = None,
                       taps: str | None = None, gelu: str | None = None,
                       tanh_exp: bool = True):
    """Whole-LGB-block megakernel on channel-major [B, C, H, W].

    Requires W % 128 == 0 and W % (2*win) == 0 (the 64x64 bottleneck
    keeps the three-kernel path). `blk` uses the `lgb_block_xla_cm`
    param layout. trig/taps/gelu select the engine variants (env
    defaults, see ops/spectral_kernel and ops/ffn_kernel)."""
    return _fused_lgb_block_impl(
        x_cm, blk, win=win, heads=heads, eps=eps, tile_rows=tile_rows,
        interpret=interpret, trig=trig or _trig_mode(),
        taps=taps or _taps_mode(), gelu=gelu or _gelu_mode(),
        tanh_exp=tanh_exp)


@functools.partial(jax.jit, static_argnames=(
    "win", "heads", "eps", "tile_rows", "interpret", "trig", "taps",
    "gelu", "tanh_exp"))
def _fused_lgb_block_impl(x_cm, blk, *, win, heads, eps, tile_rows,
                          interpret, trig, taps, gelu, tanh_exp):
    b, c, h, w = x_cm.shape
    c2 = c // 2
    if w % 128 or w % (2 * win) or h % win:
        raise ValueError(f"image {h}x{w} not megakernel-aligned")
    mats = _mixer_mats(h, w)
    P, Pinv = pack_mats(win, w)
    loc = blk["local"]
    g = blk["global"]
    ffn = blk["ffn"]
    c4 = ffn["w1"].shape[-1]
    th = tile_rows
    while h % th:
        th //= 2
    mxu = taps == "mxu"
    pos2 = _pos2_blockdiag(loc["pos_emb"])

    kernel = functools.partial(
        _kernel, c=c, h=h, w=w, win=win, heads=heads,
        scale=(c2 // heads) ** -0.5, eps=eps, th=th, trig=trig, mxu=mxu,
        rat=gelu == "rational", tanh_exp=tanh_exp)
    col = lambda p: p.reshape(-1, 1)
    const = lambda shp: pl.BlockSpec(shp, lambda bi: tuple(0 for _ in shp),
                                     memory_space=pltpu.VMEM)
    img = lambda cc: pl.BlockSpec((1, cc, h, w), lambda bi: (bi, 0, 0, 0),
                                  memory_space=pltpu.VMEM)
    dw_arg = ffn["dw"].reshape(9, c4).T
    if mxu:
        from lgteun_tpu.ops.ffn_kernel import _mxu_tap_weights

        dw_arg = _mxu_tap_weights(ffn["dw"])
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, c, h, w), x_cm.dtype),
        grid=(b,),
        in_specs=[
            img(c),
            const((c, 1)), const((c, 1)),                   # LN(mix)
            const((c2, 1)), const((c2, 1)),                 # amp
            const((c2, 1)), const((c2, 1)),                 # pha
        ] + [const(m.shape) for m in mats] + [
            const(P.shape), const(Pinv.shape),
            const((3 * c2, c2)), const((3 * c2, 1)),        # qkv
            const(pos2.shape),
            const((c, c2)), const((c, c2)), const((c, 1)),  # proj
            const((c, 1)), const((c, 1)),                   # LN(ffn)
            const((c4, c)), const((c4, 1)),
            const((c4, c4)), const((c4, 1)),
            const(dw_arg.shape), const((c4, 1)),
            const((c, c4)), const((c, 1)),
        ],
        out_specs=img(c),
        compiler_params=_VMEM_PARAMS,
        interpret=interpret or jax.default_backend() != "tpu",
    )(x_cm,
      col(blk["norm"]["scale"]), col(blk["norm"]["bias"]),
      col(g["amp_scale"][0, 0, 0]), col(g["amp_bias"]),
      col(g["pha_scale"][0, 0, 0]), col(g["pha_bias"]),
      *(jnp.asarray(m) for m in mats),
      jnp.asarray(P), jnp.asarray(Pinv),
      loc["to_qkv_kernel"][0, 0].T, col(loc["to_qkv_bias"]),
      pos2,
      blk["proj"]["Conv_0"]["Conv_0"]["kernel"][0, 0][:c2].T,
      blk["proj"]["Conv_0"]["Conv_0"]["kernel"][0, 0][c2:].T,
      col(blk["proj"]["Conv_0"]["Conv_0"]["bias"]),
      col(ffn["ln_gamma"]), col(ffn["ln_beta"]),
      ffn["w1"].T, col(ffn["b1"]), ffn["w2"].T, col(ffn["b2"]),
      dw_arg, col(ffn["bdw"]), ffn["w3"].T, col(ffn["b3"]))
    return out
