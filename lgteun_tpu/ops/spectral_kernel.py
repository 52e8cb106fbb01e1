"""Fused FFT amp/phase global mixer (Pallas TPU kernel).

LGT's global mixer (reference: models/common/LGT.py:149-180) is
rfft2 -> per-channel affine on amplitude & phase -> recombine
amp*cos/sin(pha) -> irfft2 -> abs. The XLA matmul-DFT path
(`models/lgteun_fast.py::_global_mixer_cm` over `ops/fft.py`) runs ~12
einsum passes plus the amp/phase elementwise chain, each materialising
the [B, C/2, H, W]-scale intermediate in HBM — the mixer is the third
largest cost in the fast path (~16 ms/batch at the headline shape).

This kernel holds ONE image's mixer half in VMEM (grid = batch) and
runs the whole chain in a single HBM read + write:

- W-axis half-spectrum DFT as [W, W] matmuls whose rows past W/2+1 are
  zero (the hermitian half rides in zero-padded lanes, so every dot
  stays a dense tile-aligned MXU op)
- H-axis full complex DFT / inverse as channel-batched [H, H] matmuls
  against broadcast constant matrices
- amplitude via sqrt, phase via an atan2 built from a degree-8
  minimax atan polynomial (5.8e-9 max err; Mosaic has no atan2
  primitive), recombination with the reference's exact epsilon
  placement and zero-bin convention; sin/cos either native or as
  range-reduced Horner polynomials (LGTEUN_MIXER_TRIG=poly, f32-floor
  accuracy — for ablation against Mosaic's transcendentals)
- W-axis inverse with the hermitian 2/1 weighting folded into the
  constant matrix (matching `ops/fft.py::_irdft_mats`)

Matmul operands round to bf16 (Mosaic's only dot mode) — the same
TF32-class numerics as the rest of the default TPU inference path;
LGTEUN_MATMUL_PRECISION=highest routes the model off this kernel.
Validated against the XLA mixer in tests/test_spectral_kernel.py.
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_global_mixer_cm", "fused_ln_mixer_head_cm",
           "global_mixer_xla_cm", "ln_mixer_head_xla_cm"]

# Whole-image-per-program kernels can exceed Mosaic's default 16 MiB
# scoped VMEM at the headline batch shapes (see ops/ffn_kernel.py);
# v5e has 128 MiB physical VMEM — raise the cap.
_VMEM_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

# atan(t)/t as a polynomial in t^2 on [0, 1]; weighted-minimax LS fit,
# max |atan err| 5.8e-9
_ATAN_COEFFS = (9.9999988639e-01, -3.3332596975e-01, 1.9985905766e-01,
                -1.4161222370e-01, 1.0498922667e-01, -7.2348126864e-02,
                3.9780741785e-02, -1.4401083247e-02, 2.4566602037e-03)
_PI = 3.14159265358979323846
_HALF_PI = _PI / 2.0


def _atan2(y, x):
    """atan2 from the octant-reduced atan polynomial (natively
    supported ops only: abs/min/max/divide/select)."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    t = lo / jnp.maximum(hi, 1e-30)
    u = t * t
    q = jnp.float32(_ATAN_COEFFS[-1])
    for c in _ATAN_COEFFS[-2::-1]:
        q = q * u + jnp.float32(c)
    a = t * q
    a = jnp.where(ay > ax, _HALF_PI - a, a)
    a = jnp.where(x < 0.0, _PI - a, a)
    return jnp.where(y < 0.0, -a, a)


# cos as an even / sin as an odd polynomial in r^2 on r in [-pi, pi]
# (Chebyshev-node LS fit; f32-eval max err 3.6e-7 / 5.2e-7 — at the
# f32 rounding floor). Same playbook as the tanh-form exp/GELU: Mosaic
# trig transcendentals are multi-pass VPU ops, a Horner chain is FMAs.
_COS_COEFFS = (1.0, -0.5, 4.1666664e-02, -1.3888864e-03, 2.4800554e-05,
               -2.7534810e-07, 2.0603630e-09, -9.7225726e-12)
_SIN_COEFFS = (1.0, -1.6666667e-01, 8.3333328e-03, -1.9841244e-04,
               2.7556455e-06, -2.5035391e-08, 1.5874152e-10, -6.5498898e-13)
_INV_TWO_PI = 1.0 / (2.0 * _PI)


def _sincos_poly(x):
    """(sin x, cos x) via range reduction to [-pi, pi] + degree-14/15
    polynomials; |err| <= ~5e-7 for |x| up to ~1e3 (the phase-affine
    range — pha in [-pi, pi] times a learned per-channel scale)."""
    r = x - (2.0 * _PI) * jnp.round(x * _INV_TWO_PI)
    u = r * r
    qc = jnp.float32(_COS_COEFFS[-1])
    for cf in _COS_COEFFS[-2::-1]:
        qc = qc * u + jnp.float32(cf)
    qs = jnp.float32(_SIN_COEFFS[-1])
    for cf in _SIN_COEFFS[-2::-1]:
        qs = qs * u + jnp.float32(cf)
    return r * qs, qc


def _trig_mode() -> str:
    """Trig engine for the fused mixer kernels (env LGTEUN_MIXER_TRIG,
    resolved at the non-jitted kernel entries): 'poly' (default) the
    `_sincos_poly` Horner chains; 'native' Mosaic sin/cos. Measured
    v5e A/B at the headline shape (scripts/ablate_fast_path.py,
    [96,32,128,128] full path): poly 59.9 ms vs native 62.2 ms —
    poly wins ~4% end-to-end at f32-floor accuracy, so it ships."""
    mode = _os.environ.get("LGTEUN_MIXER_TRIG", "poly").lower()
    return mode if mode in ("native", "poly") else "poly"


@functools.lru_cache(maxsize=None)
def _mixer_mats(h: int, w: int):
    """Constant DFT matrices, numpy f32 (jnp constants would leak
    across traces):

    wc/ws   [w, w]  W-axis half-spectrum forward, transposed for
                    right-multiplication; columns past w//2+1 are zero
    hc/hs   [h, h]  H-axis full forward (left-multiplied, batched)
    hic/his [h, h]  H-axis inverse
    wic/wis [w, w]  W-axis hermitian-weighted inverse, transposed for
                    right-multiplication; rows past w//2+1 are zero
    """
    from lgteun_tpu.ops.fft import _snap

    nk = w // 2 + 1
    k = np.arange(nk)[:, None]
    ww = np.arange(w)[None, :]
    ang = 2.0 * np.pi * k * ww / w
    wc = np.zeros((w, w), np.float64)
    ws = np.zeros((w, w), np.float64)
    wc[:, :nk] = _snap(np.cos(ang)).T
    ws[:, :nk] = _snap(-np.sin(ang)).T

    kh = np.arange(h)[:, None]
    hh = np.arange(h)[None, :]
    angh = 2.0 * np.pi * kh * hh / h
    hc = _snap(np.cos(angh))
    hs = _snap(-np.sin(angh))
    hic = hc.T / h
    his = -hs.T / h

    weight = np.full(nk, 2.0)
    weight[0] = 1.0
    if w % 2 == 0:
        weight[-1] = 1.0
    wi_ang = 2.0 * np.pi * np.arange(w)[:, None] * np.arange(nk)[None, :] / w
    wic = np.zeros((w, w), np.float64)
    wis = np.zeros((w, w), np.float64)
    wic[:nk, :] = (_snap(np.cos(wi_ang)) * weight / w).T
    wis[:nk, :] = (_snap(-np.sin(wi_ang)) * weight / w).T
    return tuple(m.astype(np.float32) for m in (wc, ws, hc, hs, hic, his,
                                                wic, wis))


def mixer_body(xi, asc, abi, psc, pbi, mats, *, c, h, w,
               trig: str = "native"):
    """Value-level fused mixer chain on one image [c, h, w] (shared by
    `_kernel` and `_head_kernel`). asc/abi/psc/pbi: [c, 1, 1]; mats:
    the 8 `_mixer_mats` arrays."""
    wc, ws, hc, hs, hic, his, wic, wis = mats

    def rmul(t, m):
        """[c, h, w] @ [w, w'] — pixels row-major on sublanes."""
        t2 = t.reshape(c * h, w)
        out = jax.lax.dot_general(
            t2, m[:], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return out.reshape(c, h, w)

    def lmul(m, t):
        """[h', h] @ [c, h, w] batched over channels."""
        mb = jnp.broadcast_to(m[:][None], (c, h, h))
        return jax.lax.dot_general(
            mb, t, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

    # forward rfft2 (half W spectrum in zero-padded lanes)
    re = rmul(xi, wc)
    im = rmul(xi, ws)
    re, im = lmul(hc, re) - lmul(hs, im), lmul(hc, im) + lmul(hs, re)

    # amp/phase with the reference's zero-bin convention and epsilons
    zero = (re == 0.0) & (im == 0.0)
    re_s = jnp.where(zero, 1.0, re)
    im_s = jnp.where(zero, 0.0, im)
    amp = jnp.where(zero, 0.0, jnp.sqrt(re_s * re_s + im_s * im_s))
    pha = jnp.where(zero, 0.0, _atan2(im_s, re_s))
    amp = amp * asc + abi
    pha = pha * psc + pbi
    if trig == "poly":
        sin_p, cos_p = _sincos_poly(pha)
    else:
        sin_p, cos_p = jnp.sin(pha), jnp.cos(pha)
    real = amp * cos_p + 1e-8 + 1e-8
    imag = amp * sin_p + 1e-8

    # inverse: H full complex, then hermitian-weighted W
    mid_re = lmul(hic, real) - lmul(his, imag)
    mid_im = lmul(hic, imag) + lmul(his, real)
    out = rmul(mid_re, wic) + rmul(mid_im, wis)
    return jnp.abs(out)


def _kernel(x_ref, asc_ref, abi_ref, psc_ref, pbi_ref, wc, ws, hc, hs,
            hic, his, wic, wis, out_ref, *, c, h, w, trig):
    col = lambda p: p[...].reshape(c, 1, 1)
    out = mixer_body(x_ref[0].astype(jnp.float32), col(asc_ref),
                     col(abi_ref), col(psc_ref),
                     col(pbi_ref),
                     tuple(m[:] for m in (wc, ws, hc, hs, hic, his, wic,
                                          wis)), c=c, h=h, w=w, trig=trig)
    out_ref[0] = out.astype(out_ref.dtype)


def fused_global_mixer_cm(x, amp_scale, amp_bias, pha_scale, pha_bias, *,
                          interpret: bool = False, trig: str | None = None):
    """Channel-major [B, C, H, W] -> [B, C, H, W] fused global mixer.

    amp_scale/amp_bias/pha_scale/pha_bias: [C] per-channel affine (the
    reference's 1x1 depthwise amp_fuse/pha_fuse convs). `trig` selects
    the sin/cos engine ('native'/'poly', see `_trig_mode`)."""
    return _fused_global_mixer_impl(x, amp_scale, amp_bias, pha_scale,
                                    pha_bias, interpret=interpret,
                                    trig=trig or _trig_mode())


@functools.partial(jax.jit, static_argnames=("interpret", "trig"))
def _fused_global_mixer_impl(x, amp_scale, amp_bias, pha_scale, pha_bias, *,
                             interpret: bool, trig: str):
    b, c, h, w = x.shape
    mats = _mixer_mats(h, w)
    kernel = functools.partial(_kernel, c=c, h=h, w=w, trig=trig)
    col = lambda p: p.reshape(-1, 1)
    const = lambda shp: pl.BlockSpec(shp, lambda bi: tuple(0 for _ in shp),
                                     memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, c, h, w), x.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, c, h, w), lambda bi: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            const((c, 1)), const((c, 1)), const((c, 1)), const((c, 1)),
        ] + [const((m.shape[0], m.shape[1])) for m in mats],
        out_specs=pl.BlockSpec((1, c, h, w), lambda bi: (bi, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=_VMEM_PARAMS,
        interpret=interpret or jax.default_backend() != "tpu",
    )(x, col(amp_scale), col(amp_bias), col(pha_scale), col(pha_bias),
      *(jnp.asarray(m) for m in mats))


def _head_kernel(x_ref, lng_ref, lnb_ref, asc_ref, abi_ref, psc_ref,
                 pbi_ref, wc, ws, hc, hs, hic, his, wic, wis, y1_ref,
                 x2_ref, *, c, h, w, eps, trig):
    """LGB mixer head: y = LN(x); y1 = y[:C/2] (local-attention input);
    x2 = global_mixer(y[C/2:]). One HBM read of x, no LN materialise,
    no separate mixer-half read. bf16 in/out refs upcast on load;
    internal math (LN stats, the whole spectral chain) is always f32."""
    xi = x_ref[0].astype(jnp.float32)  # [c, h, w]
    mu = jnp.mean(xi, axis=0, keepdims=True)
    var = jnp.mean((xi - mu) ** 2, axis=0, keepdims=True)
    y = (xi - mu) * jax.lax.rsqrt(var + eps)
    col3 = lambda p: p[...].reshape(-1, 1, 1)
    y = y * col3(lng_ref) + col3(lnb_ref)
    c2 = c // 2
    y1_ref[0] = y[:c2].astype(y1_ref.dtype)
    out = mixer_body(y[c2:], col3(asc_ref), col3(abi_ref), col3(psc_ref),
                     col3(pbi_ref),
                     tuple(m[:] for m in (wc, ws, hc, hs, hic, his, wic,
                                          wis)), c=c2, h=h, w=w, trig=trig)
    x2_ref[0] = out.astype(x2_ref.dtype)


def fused_ln_mixer_head_cm(x, ln_scale, ln_bias, amp_scale, amp_bias,
                           pha_scale, pha_bias, *, eps: float = 1e-5,
                           interpret: bool = False,
                           trig: str | None = None,
                           out_dtype=None):
    """Fused LGB mixer head on channel-major [B, C, H, W]:

        y  = LN(x)                     (channel LayerNorm, per pixel)
        y1 = y[:, :C/2]                (-> window-attention input)
        x2 = global_mixer(y[:, C/2:])  (the whole DFT amp/phase chain)

    Returns (y1, x2), each [B, C/2, H, W]. ln_scale/ln_bias: [C];
    amp/pha params: [C/2]. Saves the XLA LN pass and the mixer half's
    HBM round trip vs LN + `fused_global_mixer_cm`. `trig` selects the
    sin/cos engine ('native'/'poly', see `_trig_mode`). `out_dtype`
    overrides the output storage dtype (default: x.dtype) — the
    bf16res serving mode keeps x f32 but stores the branch outputs
    bf16; kernel math is f32 either way."""
    return _fused_head_impl(x, ln_scale, ln_bias, amp_scale, amp_bias,
                            pha_scale, pha_bias, eps=eps,
                            interpret=interpret, trig=trig or _trig_mode(),
                            out_dtype=(jnp.dtype(out_dtype).name
                                       if out_dtype is not None else None))


@functools.partial(jax.jit, static_argnames=("eps", "interpret", "trig",
                                             "out_dtype"))
def _fused_head_impl(x, ln_scale, ln_bias, amp_scale, amp_bias,
                     pha_scale, pha_bias, *, eps: float, interpret: bool,
                     trig: str, out_dtype: str | None = None):
    odt = jnp.dtype(out_dtype) if out_dtype is not None else x.dtype
    b, c, h, w = x.shape
    c2 = c // 2
    mats = _mixer_mats(h, w)
    kernel = functools.partial(_head_kernel, c=c, h=h, w=w, eps=eps,
                               trig=trig)
    col = lambda p: p.reshape(-1, 1)
    const = lambda shp: pl.BlockSpec(shp, lambda bi: tuple(0 for _ in shp),
                                     memory_space=pltpu.VMEM)
    img = lambda cc: pl.BlockSpec((1, cc, h, w), lambda bi: (bi, 0, 0, 0),
                                  memory_space=pltpu.VMEM)
    y1, x2 = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((b, c2, h, w), odt),
                   jax.ShapeDtypeStruct((b, c2, h, w), odt)),
        grid=(b,),
        in_specs=[
            img(c),
            const((c, 1)), const((c, 1)),
            const((c2, 1)), const((c2, 1)), const((c2, 1)), const((c2, 1)),
        ] + [const((m.shape[0], m.shape[1])) for m in mats],
        out_specs=(img(c2), img(c2)),
        compiler_params=_VMEM_PARAMS,
        interpret=interpret or jax.default_backend() != "tpu",
    )(x, col(ln_scale), col(ln_bias), col(amp_scale), col(amp_bias),
      col(pha_scale), col(pha_bias), *(jnp.asarray(m) for m in mats))
    return y1, x2


@jax.custom_vjp
def fused_ln_mixer_head_train(x, ln_scale, ln_bias, amp_scale, amp_bias,
                              pha_scale, pha_bias):
    """Differentiable LGB mixer head: Pallas forward
    (`fused_ln_mixer_head_cm`), XLA backward via recompute of the
    identical-math `ln_mixer_head_xla_cm`. Returns (y1, x2) — the
    training-path entry for the fast trunk."""
    return fused_ln_mixer_head_cm(x, ln_scale, ln_bias, amp_scale,
                                  amp_bias, pha_scale, pha_bias)


def _head_train_fwd(x, ln_scale, ln_bias, amp_scale, amp_bias,
                    pha_scale, pha_bias):
    out = fused_ln_mixer_head_cm(x, ln_scale, ln_bias, amp_scale,
                                 amp_bias, pha_scale, pha_bias)
    return out, (x, ln_scale, ln_bias, amp_scale, amp_bias, pha_scale,
                 pha_bias)


def _head_train_bwd(res, g):
    _, vjp = jax.vjp(ln_mixer_head_xla_cm, *res)
    return vjp(g)


fused_ln_mixer_head_train.defvjp(_head_train_fwd, _head_train_bwd)


def ln_mixer_head_xla_cm(x, ln_scale, ln_bias, amp_scale, amp_bias,
                         pha_scale, pha_bias, eps: float = 1e-5):
    """XLA reference for the fused mixer head (identical semantics)."""
    mu = jnp.mean(x, axis=1, keepdims=True)
    var = jnp.var(x, axis=1, keepdims=True)
    y = (x - mu) * jax.lax.rsqrt(var + eps)
    y = y * ln_scale[None, :, None, None] + ln_bias[None, :, None, None]
    c2 = x.shape[1] // 2
    x2 = global_mixer_xla_cm(y[:, c2:], amp_scale, amp_bias,
                             pha_scale, pha_bias)
    return y[:, :c2], x2


def global_mixer_xla_cm(x, amp_scale, amp_bias, pha_scale, pha_bias):
    """XLA reference with identical semantics (mirrors
    `models/lgteun_fast.py::_global_mixer_cm`)."""
    from lgteun_tpu.ops.fft import irfft2_pair_cm, rfft2_pair_cm

    h, w = x.shape[-2], x.shape[-1]
    re, im = rfft2_pair_cm(x, norm="backward")
    zero = (re == 0.0) & (im == 0.0)
    re_s = jnp.where(zero, 1.0, re)
    im_s = jnp.where(zero, 0.0, im)
    amp = jnp.where(zero, 0.0, jnp.sqrt(re_s**2 + im_s**2))
    pha = jnp.where(zero, 0.0, jnp.arctan2(im_s, re_s))
    col = lambda v: v[None, :, None, None]
    amp = amp * col(amp_scale) + col(amp_bias)
    pha = pha * col(pha_scale) + col(pha_bias)
    real = amp * jnp.cos(pha) + 1e-8 + 1e-8
    imag = amp * jnp.sin(pha) + 1e-8
    return jnp.abs(irfft2_pair_cm(real, imag, s=(h, w), norm="backward"))
