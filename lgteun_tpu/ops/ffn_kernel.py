"""Fused LGB feed-forward block (Pallas TPU kernel).

LGTEUN's LGB applies `x + FFN(LN(x))` with FFN = point(C->4C) -> GELU
-> point(4C->4C) -> depthwise3x3 -> GELU -> point(4C->C) (reference:
models/common/LGT.py:91-109, 222-248). The XLA version materialises
~3.5 GB of HBM traffic per full-resolution block at LGTEUN's shapes —
the model is bandwidth bound — so this kernel runs the whole chain in
one VMEM pass (~0.27 GB of traffic).

Layout: everything is 2-D [C, rows*W] with channels on the sublane axis
and flattened pixels on lanes:

- channel contractions are clean [F, C] @ [C, N] MXU matmuls with
  N = (tile_rows+2)*W lanes
- the depthwise 3x3 becomes 9 shifted multiply-adds where H-shifts are
  W-aligned lane slices (W = 128 keeps them tile-aligned) and W-shifts
  are lane rolls with row-boundary masks
- each grid program holds ONE whole image in VMEM (grid = batch) and
  walks `tile_rows`-row tiles in an inner loop, so halo rows are plain
  VMEM slices — no padded input copy, no small strided halo DMAs

Validated against the XLA path in tests/test_ffn_kernel.py, including
image-edge zero-padding semantics.
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_ln_ffn", "fused_ln_ffn_cm", "fused_block_tail_cm",
           "ln_ffn_xla"]

# Whole-image-per-program kernels exceed Mosaic's default 16 MiB scoped
# VMEM (measured on chip: the block tail needs 17.89 MiB at the
# [96,32,128,128] headline shape — resident x/x1/x2/out images plus the
# per-tile seg/h1/h2 temporaries). v5e has 128 MiB physical VMEM; raise
# the cap and let the compiler place what the kernel actually uses.
_VMEM_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def ln_ffn_xla(x, params, eps=1e-5, dtype=None):
    """Reference XLA implementation of out = x + FFN(LN(x)).

    params: dict with ln_gamma [C], ln_beta [C], w1 [C,4C], b1 [4C],
    w2 [4C,4C], b2 [4C], dw [3,3,4C], bdw [4C], w3 [4C,C], b3 [C].

    `dtype=bf16` = selective mixed precision: LN statistics, GELU and
    the residual stay f32; matmul/conv OPERANDS are bf16 with f32
    accumulation (preferred_element_type).
    """
    if dtype is None:
        params = jax.tree.map(lambda p: p.astype(x.dtype), params)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    y = (x - mu) / jnp.sqrt(var + eps) * params["ln_gamma"] + params["ln_beta"]

    def mm(t, w):
        if dtype is None:
            return jnp.einsum("...c,cd->...d", t, w)
        return jnp.einsum("...c,cd->...d", t.astype(dtype), w.astype(dtype),
                          preferred_element_type=jnp.float32)

    h = mm(y, params["w1"]) + params["b1"]
    h = jax.nn.gelu(h, approximate=False)
    h = mm(h, params["w2"]) + params["b2"]
    c4 = h.shape[-1]
    kernel = params["dw"].reshape(3, 3, 1, c4)
    conv_in = h if dtype is None else h.astype(dtype)
    conv_k = kernel if dtype is None else kernel.astype(dtype)
    # under mixed precision the conv runs wholly in bf16 (XLA's TPU
    # conv accumulates f32 internally; only the 9-tap output rounds) —
    # mixed-dtype preferred_element_type breaks the conv transpose rule
    # in jax.grad
    h = jax.lax.conv_general_dilated(
        conv_in, conv_k, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c4).astype(h.dtype) + params["bdw"]
    h = jax.nn.gelu(h, approximate=False)
    out = mm(h, params["w3"]) + params["b3"]
    return x + out.astype(x.dtype)


# erf(z) = tanh(z * Q(z^2)) coefficients: weighted-minimax fit of
# atanh(erf(z))/z (even in z) on z in [0, 4.2]; |erf err| <= 1.54e-7,
# the same f32 floor as Abramowitz-Stegun 7.1.26. The tanh FORM is the
# point: measured in-kernel on v5e, tanh is ~7x cheaper than the
# exp(-z^2)-based A&S evaluation (Mosaic's exp dominates the fused FFN
# kernel's VPU time; see scripts/ablate_fast_path.py provenance in git
# history). Both branches of the odd function are handled without
# sign/abs; the clamp keeps the poly inside its fitted domain (erf has
# saturated to f32 1.0 by |z| = 4.2, where the tanh argument is 11.6).
_ERF_TANH_Q = (1.1283797847e+00, 1.0276470515e-01, -1.8250625709e-04,
               -6.2742960006e-04, 9.0387230182e-05, -6.1008284494e-06,
               1.6583619694e-07)


# tanh(y) = y * N(y^2)/D(y^2): Lawson-reweighted least-squares rational
# fit on y in [0, 8.7] (tanh(8.7) is within half an f32 ulp of 1.0, so
# the clamp saturates exactly like tanh does). |tanh err| <= 3.4e-7
# evaluated in f32 Horner, which composes to |gelu err| <= 1.3e-6 —
# well inside the fused kernels' 3e-5 test tolerance and the 5e-4
# torch-parity budget. A/B'd against Mosaic's tanh primitive and LOST:
# 74.8 vs 59.5 ms full fast path at [96,32,128,128] (v5e) — the VPU
# divide costs more than Mosaic's whole tanh, so 'tanh' ships.
_TANH_RAT_N = (0.9999999319374541, 0.13393122814163347,
               0.0035102273185180504, 2.0861321721423918e-05,
               1.3727519360705251e-08)
_TANH_RAT_D = (1.0, 0.4672642910252975, 0.025931971607585123,
               0.00033100555497621087, 7.924090953224292e-07)


def _tanh_rational(y):
    t = jnp.clip(y, -8.7, 8.7)
    u = t * t
    n = jnp.float32(_TANH_RAT_N[-1])
    for c in _TANH_RAT_N[-2::-1]:
        n = n * u + jnp.float32(c)
    d = jnp.float32(_TANH_RAT_D[-1])
    for c in _TANH_RAT_D[-2::-1]:
        d = d * u + jnp.float32(c)
    return t * (n / d)


def _gelu_mode() -> str:
    """tanh engine inside the fused kernels' GELU (env LGTEUN_GELU,
    resolved at the non-jitted kernel entries): 'tanh' (default)
    Mosaic's tanh primitive; 'rational' the `_tanh_rational` N4/D4
    Horner chains. Measured v5e A/B at the headline shape: tanh 59.5
    vs rational 74.8 ms full path — Mosaic's tanh wins, it ships.
    (GELU overall is ~26% of the block-tail kernel per
    scripts/bench_tail_internals.py; the tanh call is evidently the
    cheap part of it.)"""
    mode = _os.environ.get("LGTEUN_GELU", "tanh").lower()
    return mode if mode in ("tanh", "rational") else "tanh"


def _gelu_exact(x, rational=False):
    """0.5 x (1 + erf(x/sqrt2)) with erf = tanh(z Q(z^2)) (|err| <
    1.6e-7 == f32 rounding); Mosaic has no erf/erfc primitive and its
    exp is far slower than tanh on the VPU. `rational` swaps Mosaic's
    tanh for the `_tanh_rational` approximation (|gelu err| <= 1.3e-6)."""
    z = jnp.clip(x * 0.7071067811865476, -4.2, 4.2)
    u = z * z
    q = jnp.float32(_ERF_TANH_Q[-1])
    for c in _ERF_TANH_Q[-2::-1]:
        q = q * u + jnp.float32(c)
    erf = _tanh_rational(z * q) if rational else jnp.tanh(z * q)
    return 0.5 * x * (1.0 + erf)


def _taps_mode() -> str:
    """Depthwise-tap engine for the fused FFN kernels (env
    LGTEUN_FFN_TAPS, resolved at the non-jitted kernel entries):

      'vpu' (default)  9 shifted multiply-adds on the VPU (f32)
      'mxu'            3 block-diagonal [c4, 3c4] matmuls against a
                       sublane-stacked [h2_left; h2; h2_right] buffer —
                       moves the tap arithmetic onto the (mostly idle)
                       MXU at the cost of one sublane concat and the
                       Mosaic dot's bf16 operand rounding (same class
                       as the kernel's other matmuls; inference only)

    Measured v5e A/B at the headline shape (scripts/ablate_fast_path.py,
    [96,32,128,128] full path): vpu 61.9 ms vs mxu 71.6 ms — the 3x
    sublane stack + extra dw matmul traffic costs more than the 9 VPU
    madds save, so vpu stays the default.

    Exists for on-chip ablation of the tap engines (profiling put ~25%
    of the fused FFN kernel in the VPU tap loop)."""
    mode = _os.environ.get("LGTEUN_FFN_TAPS", "vpu").lower()
    return mode if mode in ("vpu", "mxu") else "vpu"


def _mxu_tap_weights(dw):
    """dw [3, 3, c4] -> [3, c4, 3*c4]: per-row-offset block-diagonal
    matrices W_dr = [diag(dw[dr,0]) | diag(dw[dr,1]) | diag(dw[dr,2])]
    so that acc = sum_dr W_dr @ [h2_l; h2; h2_r][:, row-slice dr]
    reproduces the 9-tap depthwise conv as MXU matmuls."""
    c4 = dw.shape[-1]
    eye = jnp.eye(c4, dtype=dw.dtype)
    return jnp.stack([
        jnp.concatenate([eye * dw[dr, dc][None, :] for dc in range(3)],
                        axis=1)
        for dr in range(3)])


def _dw_taps(h2, dw, *, th, w, c4, left_edge, right_edge, mxu):
    """Depthwise 3x3 on the halo-extended [c4, (th+2)*w] buffer ->
    [c4, th*w] (the interior rows). `dw` is [c4, 9] for the VPU engine
    or the `_mxu_tap_weights` [3, c4, 3c4] stack for the MXU engine.
    W-shifts are lane rolls with row-boundary masks; H-shifts are
    W-aligned lane slices (VPU) / row-slices of the stacked buffer
    (MXU)."""
    n_all = h2.shape[-1]
    h2_l = jnp.where(left_edge, 0.0, pltpu.roll(h2, 1, 1))
    h2_r = jnp.where(right_edge, 0.0, pltpu.roll(h2, n_all - 1, 1))
    acc = jnp.zeros((c4, th * w), jnp.float32)
    if mxu:
        stacked = jnp.concatenate([h2_l, h2, h2_r], axis=0)  # [3c4, n_all]
        for dr in range(3):
            a = dr * w
            acc = acc + jax.lax.dot_general(
                dw[dr], stacked[:, a:a + th * w],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        return acc
    for dr in range(3):
        a, b = dr * w, dr * w + th * w
        for dc, buf in ((0, h2_l), (1, h2), (2, h2_r)):
            acc = acc + buf[:, a:b] * dw[:, 3 * dr + dc][:, None]
    return acc


def _kernel(x_ref, ln_g, ln_b, w1t, b1, w2t, b2, dw, bdw,
            w3t, b3, out_ref, *, th, w, c, c4, h_img, eps, mxu, rat):
    """Whole image [1, c, h*w] per program, inner Python loop over
    `th`-row tiles.

    Whole-image blocks keep every DMA large and aligned: the previous
    revision tiled the GRID over rows and fetched two one-row halo
    blocks per step from a padded copy of the input — the padded-copy
    materialisation plus the small strided halo DMAs cost ~3.5x the
    kernel's whole HBM budget (measured v5e: 5.5 -> 4.9 ms/call at
    [96,32,128,128] from this restructure alone). Here halo rows are
    plain VMEM slices of the resident image and the image edges are the
    only places needing a zero-row (torch zero padding semantics).

    bf16 in/out refs are accepted (the selective-bf16 trunk's storage
    dtype): loads upcast to f32 so ALL internal math stays f32; only
    the HBM<->VMEM DMAs shrink.
    """
    xi = x_ref[0].astype(jnp.float32)  # [c, h*w]
    nt = h_img // th
    n_all = (th + 2) * w

    def mm(wt, t, bias):
        out = jax.lax.dot_general(
            wt, t, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return out + bias[:]

    # masks are identical for every tile — build once
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, n_all), 1)
    col_all = lane_ids % w
    left_edge = col_all == 0
    right_edge = col_all == w - 1

    for ti in range(nt):
        lo, hi = ti * th * w, (ti + 1) * th * w
        top = xi[:, lo - w:lo] if ti > 0 else jnp.zeros((c, w), jnp.float32)
        bot = (xi[:, hi:hi + w] if ti < nt - 1
               else jnp.zeros((c, w), jnp.float32))
        seg = jnp.concatenate([top, xi[:, lo:hi], bot], axis=1)
        # [c, (th+2)*w]

        mu = jnp.mean(seg, axis=0, keepdims=True)
        var = jnp.mean((seg - mu) ** 2, axis=0, keepdims=True)
        y = (seg - mu) * jax.lax.rsqrt(var + eps)
        y = y * ln_g[:] + ln_b[:]  # [c,1] blocks broadcast over lanes

        h1 = _gelu_exact(mm(w1t[:], y, b1), rational=rat)  # [c4,(th+2)w]
        h2 = mm(w2t[:], h1, b2)               # [c4, (th+2)w]

        # zero the out-of-image halo row (torch zero padding); which
        # tiles have one is static, so interior tiles skip the select
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

        out = mm(w3t[:], acc, b3)  # [c, th*w]
        out_ref[0, :, lo:hi] = (out + xi[:, lo:hi]).astype(out_ref.dtype)


def _tail_kernel(x_ref, x1_ref, x2_ref, wp1t, wp2t, bp, ln_g, ln_b, w1t, b1,
                 w2t, b2, dw, bdw, w3t, b3, *refs, th, w, c, c4, h_img,
                 eps, mxu, rat, masked=False):
    """Block-tail: xm = x + [mask *] proj([x1; x2]); out = xm +
    FFN(LN(xm)).

    Same whole-image-per-program structure as `_kernel`; the 1x1 proj
    and the mixer residual are recomputed per tile INCLUDING the two
    halo rows (proj is pointwise, so halo xm rows are exact), which
    keeps only x/x1/x2 resident instead of a fourth xm image. bf16
    in/out refs upcast on load; internal math is always f32.

    `masked`: an extra [1, c, h*w] dropout-mask input (values 0 or
    1/keep) multiplies the proj output before the residual add — the
    training path's Dropout(0.1) after the mixer proj (reference
    LGT.py:198)."""
    m_ref, out_ref = refs if masked else (None, refs[0])
    xi = x_ref[0].astype(jnp.float32)    # [c, h*w]
    x1i = x1_ref[0].astype(jnp.float32)  # [c//2, h*w]
    x2i = x2_ref[0].astype(jnp.float32)
    mi = m_ref[0].astype(jnp.float32) if masked else None
    nt = h_img // th
    n_all = (th + 2) * w
    ch = c // 2

    def mm(wt, t, bias=None):
        out = jax.lax.dot_general(
            wt, t, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return out if bias is None else out + bias[:]

    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, n_all), 1)
    col_all = lane_ids % w
    left_edge = col_all == 0
    right_edge = col_all == w - 1

    for ti in range(nt):
        lo, hi = ti * th * w, (ti + 1) * th * w

        def seg_of(img, cc):
            top = (img[:, lo - w:lo] if ti > 0
                   else jnp.zeros((cc, w), jnp.float32))
            bot = (img[:, hi:hi + w] if ti < nt - 1
                   else jnp.zeros((cc, w), jnp.float32))
            return jnp.concatenate([top, img[:, lo:hi], bot], axis=1)

        mixed = (mm(wp1t[:], seg_of(x1i, ch))
                 + mm(wp2t[:], seg_of(x2i, ch)) + bp[:])
        if masked:
            mixed = mixed * seg_of(mi, c)
        xm = seg_of(xi, c) + mixed

        mu = jnp.mean(xm, axis=0, keepdims=True)
        var = jnp.mean((xm - mu) ** 2, axis=0, keepdims=True)
        y = (xm - mu) * jax.lax.rsqrt(var + eps)
        y = y * ln_g[:] + ln_b[:]

        h1 = _gelu_exact(mm(w1t[:], y, b1), rational=rat)
        h2 = mm(w2t[:], h1, b2)

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

        out = mm(w3t[:], acc, b3)
        # seg_of always prepends one halo row (zeros at the image top),
        # so the tile's interior starts at column w unconditionally
        interior = xm[:, w:w + th * w]
        out_ref[0, :, lo:hi] = (out + interior).astype(out_ref.dtype)


def _tail_kernel_rolls(x_ref, x1_ref, x2_ref, wp1t, wp2t, bp, ln_g, ln_b,
                       w1t, b1, w2t, b2, dw, bdw, w3t, b3, *refs, w, c,
                       c4, n, eps, mxu, rat, masked=False):
    """Whole-image, roll-based variant of `_tail_kernel` for images
    whose row length W is not a multiple of the 128-lane tile (the
    64x64 bottleneck scale). Halo lane-slices at W-offsets would be
    unaligned (Mosaic rejects lane-offset concats), so instead the
    depthwise 3x3 runs as 9 lane-rolls of the WHOLE [c4, h*w] buffer
    with row/column edge masks — rolls take any shift, and no slice or
    concat ever crosses a lane boundary. One pass, no row tiling
    (VMEM: the bottleneck image is 1/4 the pixels of the full-res
    tiles). bf16 in/out refs upcast on load; internal math always f32.
    `masked` adds the dropout-mask input (see `_tail_kernel`)."""
    m_ref, out_ref = refs if masked else (None, refs[0])
    xi = x_ref[0].astype(jnp.float32)

    def mm(wt, t, bias=None):
        out = jax.lax.dot_general(
            wt, t, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return out if bias is None else out + bias[:]

    mixed = (mm(wp1t[:], x1_ref[0].astype(jnp.float32))
             + mm(wp2t[:], x2_ref[0].astype(jnp.float32)) + bp[:])
    if masked:
        mixed = mixed * m_ref[0].astype(jnp.float32)
    xm = xi + mixed

    mu = jnp.mean(xm, axis=0, keepdims=True)
    var = jnp.mean((xm - mu) ** 2, axis=0, keepdims=True)
    y = (xm - mu) * jax.lax.rsqrt(var + eps)
    y = y * ln_g[:] + ln_b[:]

    h1 = _gelu_exact(mm(w1t[:], y, b1), rational=rat)
    h2 = mm(w2t[:], h1, b2)

    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    col = lane_ids % w
    row_ok = (None, lane_ids >= w, lane_ids < n - w)      # dr-1 = 0,-1,+1
    col_ok = (None, col > 0, col < w - 1)                 # dc-1 = 0,-1,+1
    acc = jnp.zeros((c4, n), jnp.float32)
    if mxu:
        # column shifts once (masked rolls), sublane-stack, then one
        # whole-buffer row-roll + block-diagonal matmul per row offset;
        # the row masks commute with the column masks because row
        # offsets are multiples of w
        h2_l = jnp.where(col_ok[1], pltpu.roll(h2, 1, 1), 0.0)
        h2_r = jnp.where(col_ok[2], pltpu.roll(h2, n - 1, 1), 0.0)
        stacked = jnp.concatenate([h2_l, h2, h2_r], axis=0)  # [3c4, n]
        for dr in range(3):
            o = (dr - 1) * w
            t = pltpu.roll(stacked, (-o) % n, 1) if o else stacked
            okr = row_ok[0 if dr == 1 else (1 if dr == 0 else 2)]
            if okr is not None:
                t = jnp.where(okr, t, 0.0)
            acc = acc + jax.lax.dot_general(
                dw[dr], t,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    else:
        for dr in range(3):
            for dc in range(3):
                o = (dr - 1) * w + (dc - 1)   # acc[n] += h2[n + o] * dw
                t = pltpu.roll(h2, (-o) % n, 1) if o else h2
                okr = row_ok[0 if dr == 1 else (1 if dr == 0 else 2)]
                okc = col_ok[0 if dc == 1 else (1 if dc == 0 else 2)]
                ok = okr if okc is None else (
                    okc if okr is None else okr & okc)
                if ok is not None:
                    t = jnp.where(ok, t, 0.0)
                acc = acc + t * dw[:, 3 * dr + dc][:, None]
    acc = _gelu_exact(acc + bdw[:], rational=rat)

    out = mm(w3t[:], acc, b3)
    out_ref[0] = (out + xm).astype(out_ref.dtype)


def block_tail_xla(x_cm, x1_cm, x2_cm, proj_kernel, proj_bias, ffn_params,
                   eps=1e-5, mask=None):
    """XLA reference for the fused block tail, channel-major [B,C,H,W]:
    xm = x + [mask *] 1x1conv([x1; x2]); return xm + FFN(LN(xm))."""
    cat = jnp.concatenate([x1_cm, x2_cm], axis=1)
    mixed = (jnp.einsum("bchw,cd->bdhw", cat, proj_kernel)
             + proj_bias[None, :, None, None])
    if mask is not None:
        mixed = mixed * mask
    xm = x_cm + mixed
    y = ln_ffn_xla(jnp.moveaxis(xm, 1, -1), ffn_params, eps=eps)
    return jnp.moveaxis(y, -1, 1)


def fused_block_tail_cm(x_cm, x1_cm, x2_cm, proj_kernel, proj_bias,
                        ffn_params, *, eps: float = 1e-5,
                        tile_rows: int = 32, interpret: bool = False,
                        taps: str | None = None,
                        gelu: str | None = None, mask=None):
    """Fused LGB block tail on channel-major [B, C, H, W]:

        xm  = x + proj([x1; x2])      (the mixer 1x1 proj + residual)
        out = xm + FFN(LN(xm))        (the `fused_ln_ffn` chain)

    proj_kernel [C, C] / proj_bias [C] are the PointConv params; x1/x2
    are the local/global mixer halves [B, C/2, H, W]. Eliminates the
    concat + proj + residual XLA pass between the mixers and the FFN
    kernel (~0.6 GB HBM per full-res block at headline shapes).
    Inference path (training uses the XLA composition).

    Row length W a multiple of 128 runs the row-tiled kernel (halo rows
    are aligned lane slices); other lane-tile-aligned images (H*W % 128
    == 0, e.g. the 64x64 bottleneck) run the whole-image roll-based
    variant.

    `taps` selects the depthwise-tap engine ('vpu'/'mxu', see
    `_taps_mode`) and `gelu` the tanh engine ('tanh'/'rational', see
    `_gelu_mode`); None reads the env flags at trace time. `mask`
    (training): [B,C,H,W] dropout mask multiplied onto the proj
    output before the residual add."""
    return _fused_block_tail_impl(x_cm, x1_cm, x2_cm, proj_kernel,
                                  proj_bias, ffn_params, mask, eps=eps,
                                  tile_rows=tile_rows, interpret=interpret,
                                  taps=taps or _taps_mode(),
                                  gelu=gelu or _gelu_mode())


@functools.partial(jax.jit, static_argnames=("eps", "tile_rows", "interpret",
                                             "taps", "gelu"))
def _fused_block_tail_impl(x_cm, x1_cm, x2_cm, proj_kernel, proj_bias,
                           ffn_params, mask=None, *, eps: float,
                           tile_rows: int, interpret: bool, taps: str,
                           gelu: str = "tanh"):
    b, c, h, w = x_cm.shape
    c4 = ffn_params["w1"].shape[-1]
    ch = c // 2
    mxu = taps == "mxu"
    rat = gelu == "rational"
    masked = mask is not None
    if w % 128 == 0:
        th = tile_rows
        while h % th:
            th //= 2
        kernel = functools.partial(_tail_kernel, th=th, w=w, c=c, c4=c4,
                                   h_img=h, eps=eps, mxu=mxu, rat=rat,
                                   masked=masked)
    elif (h * w) % 128 == 0:
        kernel = functools.partial(_tail_kernel_rolls, w=w, c=c, c4=c4,
                                   n=h * w, eps=eps, mxu=mxu, rat=rat,
                                   masked=masked)
    else:
        raise ValueError(f"image {h}x{w} is not lane-tile aligned")
    col = lambda p: p.reshape(-1, 1)
    const = lambda shp: pl.BlockSpec(shp, lambda bi: tuple(0 for _ in shp),
                                     memory_space=pltpu.VMEM)
    img = lambda cc: pl.BlockSpec((1, cc, h * w), lambda bi: (bi, 0, 0),
                                  memory_space=pltpu.VMEM)
    dw_arg = (_mxu_tap_weights(ffn_params["dw"]) if mxu
              else ffn_params["dw"].reshape(9, c4).T)
    operands = [
        x_cm.reshape(b, c, h * w), x1_cm.reshape(b, ch, h * w),
        x2_cm.reshape(b, ch, h * w),
        proj_kernel[:ch].T, proj_kernel[ch:].T, col(proj_bias),
        col(ffn_params["ln_gamma"]), col(ffn_params["ln_beta"]),
        ffn_params["w1"].T, col(ffn_params["b1"]),
        ffn_params["w2"].T, col(ffn_params["b2"]),
        dw_arg, col(ffn_params["bdw"]),
        ffn_params["w3"].T, col(ffn_params["b3"]),
    ]
    in_specs = [
        img(c), img(ch), img(ch),
        const((c, ch)),   # proj1^T
        const((c, ch)),   # proj2^T
        const((c, 1)),    # proj bias
        const((c, 1)),    # ln_gamma
        const((c, 1)),    # ln_beta
        const((c4, c)),   # w1^T
        const((c4, 1)),   # b1
        const((c4, c4)),  # w2^T
        const((c4, 1)),   # b2
        const(dw_arg.shape),  # dw taps ([c4, 9] vpu / [3, c4, 3c4] mxu)
        const((c4, 1)),   # bdw
        const((c, c4)),   # w3^T
        const((c, 1)),    # b3
    ]
    if masked:
        operands.append(mask.reshape(b, c, h * w))
        in_specs.append(img(c))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, c, h * w), x_cm.dtype),
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, c, h * w), lambda bi: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=_VMEM_PARAMS,
        interpret=interpret or jax.default_backend() != "tpu",
    )(*operands)
    return out.reshape(b, c, h, w)


@jax.custom_vjp
def fused_block_tail_train(x, x1, x2, proj_kernel, proj_bias, ffn_params,
                           mask):
    """Differentiable fused LGB block tail, channel-major: Pallas
    forward (`fused_block_tail_cm`, engine flags read at trace time),
    XLA backward via recompute of the identical-math `block_tail_xla`.
    `mask` is the mixer-proj dropout mask ([B,C,H,W], values 0 or
    1/keep) or None (deterministic / drop_rate 0 — no mask DMA); None
    is an empty pytree so the custom_vjp signature stays fixed and its
    cotangent is trivially None."""
    return fused_block_tail_cm(x, x1, x2, proj_kernel, proj_bias,
                               ffn_params, mask=mask)


def _tail_train_fwd(x, x1, x2, proj_kernel, proj_bias, ffn_params, mask):
    out = fused_block_tail_cm(x, x1, x2, proj_kernel, proj_bias,
                              ffn_params, mask=mask)
    return out, (x, x1, x2, proj_kernel, proj_bias, ffn_params, mask)


def _tail_train_bwd(res, g):
    x, x1, x2, proj_kernel, proj_bias, ffn_params, mask = res
    _, vjp = jax.vjp(
        lambda a, b, c, d, e, f, m: block_tail_xla(a, b, c, d, e, f,
                                                   mask=m),
        x, x1, x2, proj_kernel, proj_bias, ffn_params, mask)
    return vjp(g)


fused_block_tail_train.defvjp(_tail_train_fwd, _tail_train_bwd)


@jax.custom_vjp
def fused_ln_ffn(x, params):
    """out = x + FFN(LN(x)) on NHWC [B, H, W, C] (differentiable:
    Pallas forward, XLA backward via recompute)."""
    return _fused_ln_ffn_impl(x, params)


def _fused_ln_ffn_fwd(x, params):
    return _fused_ln_ffn_impl(x, params), (x, params)


def _fused_ln_ffn_bwd(res, g):
    x, params = res
    _, vjp = jax.vjp(ln_ffn_xla, x, params)
    return vjp(g)


fused_ln_ffn.defvjp(_fused_ln_ffn_fwd, _fused_ln_ffn_bwd)


def fused_ln_ffn_cm(x_cm, params, *, eps: float = 1e-5,
                    taps: str | None = None, gelu: str | None = None):
    """`fused_ln_ffn` for channel-major [B, C, H, W] input/output —
    the layout the kernel uses internally, so the NHWC<->CM moveaxis
    relayouts disappear (the channel-major LGT trunk's FFN entry).
    Inference path (no custom_vjp; the NHWC wrapper covers training)."""
    b, c, h, w = x_cm.shape
    return _ffn_kernel_call(x_cm.reshape(b, c, h * w), b, h, w, c, params,
                            eps=eps, taps=taps or _taps_mode(),
                            gelu=gelu or _gelu_mode()).reshape(b, c, h, w)


@functools.partial(jax.jit, static_argnames=("eps", "tile_rows", "interpret",
                                             "taps", "gelu"))
def _fused_ln_ffn_impl(x, params, *, eps: float = 1e-5, tile_rows: int = 32,
                       interpret: bool = False, taps: str = "vpu",
                       gelu: str = "tanh"):
    """Kernel invocation (non-differentiable inner)."""
    b, h, w, c = x.shape
    xc = jnp.moveaxis(x, -1, 1).reshape(b, c, h * w)
    out = _ffn_kernel_call(xc, b, h, w, c, params, eps=eps,
                           tile_rows=tile_rows, interpret=interpret,
                           taps=taps, gelu=gelu)
    return jnp.moveaxis(out.reshape(b, c, h, w), 1, -1)


@functools.partial(jax.jit,
                   static_argnames=("b", "h", "w", "c", "eps", "tile_rows",
                                    "interpret", "taps", "gelu"))
def _ffn_kernel_call(xc, b, h, w, c, params, *, eps: float = 1e-5,
                     tile_rows: int = 32, interpret: bool = False,
                     taps: str = "vpu", gelu: str = "tanh"):
    """Core pallas_call on channel-major [B, C, H*W] pixels."""
    c4 = params["w1"].shape[-1]
    th = tile_rows
    while h % th:
        th //= 2
    mxu = taps == "mxu"

    kernel = functools.partial(_kernel, th=th, w=w, c=c, c4=c4, h_img=h,
                               eps=eps, mxu=mxu, rat=gelu == "rational")
    col = lambda p: p.reshape(-1, 1)
    const = lambda shp: pl.BlockSpec(shp, lambda bi: tuple(0 for _ in shp),
                                     memory_space=pltpu.VMEM)
    dw_arg = (_mxu_tap_weights(params["dw"]) if mxu
              else params["dw"].reshape(9, c4).T)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, c, h * w), xc.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, c, h * w), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),  # whole image
            const((c, 1)),    # ln_gamma
            const((c, 1)),    # ln_beta
            const((c4, c)),   # w1^T
            const((c4, 1)),   # b1
            const((c4, c4)),  # w2^T
            const((c4, 1)),   # b2
            const(dw_arg.shape),  # dw taps ([c4, 9] vpu / [3, c4, 3c4] mxu)
            const((c4, 1)),   # bdw
            const((c, c4)),   # w3^T
            const((c, 1)),    # b3
        ],
        out_specs=pl.BlockSpec((1, c, h * w), lambda bi: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=_VMEM_PARAMS,
        interpret=interpret or jax.default_backend() != "tpu",
    )(xc, col(params["ln_gamma"]), col(params["ln_beta"]),
      params["w1"].T, col(params["b1"]), params["w2"].T, col(params["b2"]),
      dw_arg, col(params["bdw"]),
      params["w3"].T, col(params["b3"]))
    return out
