"""Fused 15x15 neighborhood attention (MDCUN's blockNL) — Pallas TPU.

Reference: models/MDCUN.py:64-107. Per pixel p, attention over its
fs x fs neighborhood:

    att(p, f) = softmax_f( theta(x)[p] . phi(x)[p + f] )
    out[p]    = w( sum_f att(p, f) * g(x)[p + f] ) + x[p]

theta/phi/g/w are bias-free 1x1 convs. The XLA path materialises two
[B, H, W, C, fs²] unfold tensors (~4 GB of HBM traffic per call at
eval batch sizes) — this kernel keeps everything in VMEM:

- channel-major 2-D tiles [C, rows*W] (pixels on lanes), row tiles
  with an 8-row halo (>= fs//2) fed by block-spec'd slices of an
  H-padded copy; zero padding reproduces torch's F.unfold semantics
  (out-of-image neighbors contribute logit theta.0 = 0, matching the
  reference's softmax over zero-padded positions)
- the four 1x1 projections are tiny in-kernel matmuls
- the fs² offsets are W-aligned lane slices (H shifts) + masked lane
  rolls (W shifts); logits live in a [fs², rows*W] VMEM scratch;
  softmax reduces over the offset axis

Validated against the XLA path in tests/test_nonlocal_kernel.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_neighborhood_attention", "neighborhood_attention_xla"]


def neighborhood_attention_xla(x, wt, wp, wg, ww, fs: int = 15):
    """Reference XLA path on NHWC [B,H,W,C]; wt/wp/wg/ww are [C, C]
    (1x1 conv kernels, no bias). Mirrors reference MDCUN.py:79-107."""
    from lgteun_tpu.ops.patches import extract_patches

    b, h, w, c = x.shape
    theta = jnp.einsum("bhwc,cd->bhwd", x, wt)
    phi = jnp.einsum("bhwc,cd->bhwd", x, wp)
    g = jnp.einsum("bhwc,cd->bhwd", x, wg)
    pad = fs // 2

    def patches(t):
        u = extract_patches(t, fs, 1, pad)  # [B, H*W, C*fs*fs]
        return u.reshape(b, h, w, c, fs * fs)

    phi_p = patches(phi)
    g_p = patches(g)
    att = jnp.einsum("bhwc,bhwcf->bhwf", theta, phi_p)
    att = jax.nn.softmax(att, axis=-1)
    out = jnp.einsum("bhwf,bhwcf->bhwc", att, g_p)
    return jnp.einsum("bhwc,cd->bhwd", out, ww) + x


def _kernel(x_body, x_top, x_bot, wt, wp, wg, ww, out_ref, logits, *,
            th, w, c, fs, halo):
    """Slab rows: [halo | th body | halo]; all 2-D [C, rows*W]."""
    n_body = th * w
    x_slab = jnp.concatenate([x_top[0], x_body[0], x_bot[0]], axis=1)
    # [c, (th + 2*halo) * w]

    def proj(wmat, t):
        return jax.lax.dot_general(
            wmat, t, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # w^T contraction: [C, N]

    theta = proj(wt[:], x_slab)[:, halo * w: halo * w + n_body]  # body only
    phi = proj(wp[:], x_slab)
    g = proj(wg[:], x_slab)

    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, n_body), 1)
    col = lane_ids % w
    r = fs // 2

    def shifted(t_slab, dr, dc):
        """Neighbor map for offset (dr, dc) aligned to body pixels."""
        sl = t_slab[:, (halo + dr) * w: (halo + dr) * w + n_body]
        if dc == 0:
            return sl
        if dc > 0:
            rolled = pltpu.roll(sl, n_body - dc, 1)  # left shift dc
            return jnp.where(col >= w - dc, 0.0, rolled)
        rolled = pltpu.roll(sl, -dc, 1)  # right shift |dc|
        return jnp.where(col < -dc, 0.0, rolled)

    # pass 1: logits per offset
    for f in range(fs * fs):
        dr = f // fs - r
        dc = f % fs - r
        phi_f = shifted(phi, dr, dc)
        logits[f:f + 1, :] = jnp.sum(theta * phi_f, axis=0, keepdims=True)

    # softmax over offsets (axis 0 of the scratch)
    lg = logits[:]
    lg = lg - jnp.max(lg, axis=0, keepdims=True)
    e = jnp.exp(lg)
    attn = e / jnp.sum(e, axis=0, keepdims=True)  # [fs*fs, n_body]

    # pass 2: weighted neighbor sum of g
    acc = jnp.zeros((c, n_body), jnp.float32)
    for f in range(fs * fs):
        dr = f // fs - r
        dc = f % fs - r
        acc = acc + shifted(g, dr, dc) * attn[f:f + 1, :]

    out = jax.lax.dot_general(
        ww[:], acc, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    out_ref[0] = (out + x_slab[:, halo * w: halo * w + n_body]).astype(
        out_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_neighborhood_attention(x, wt, wp, wg, ww, fs: int = 15):
    """Differentiable wrapper: Pallas forward, XLA backward."""
    return _fused_na_impl(x, wt, wp, wg, ww, fs=fs)


def _fused_na_fwd(x, wt, wp, wg, ww, fs):
    return _fused_na_impl(x, wt, wp, wg, ww, fs=fs), (x, wt, wp, wg, ww)


def _fused_na_bwd(fs, res, grad):
    x, wt, wp, wg, ww = res
    _, vjp = jax.vjp(
        lambda a, b, c_, d, e: neighborhood_attention_xla(a, b, c_, d, e, fs),
        x, wt, wp, wg, ww)
    return vjp(grad)


fused_neighborhood_attention.defvjp(_fused_na_fwd, _fused_na_bwd)


@functools.partial(jax.jit, static_argnames=("fs", "tile_rows", "interpret"))
def _fused_na_impl(x, wt, wp, wg, ww, *, fs: int = 15, tile_rows: int = 16,
                   interpret: bool = False):
    b, h, w, c = x.shape
    th = tile_rows
    while h % th:
        th //= 2
    halo = 8  # >= fs//2, multiple of 8 for lane-aligned halo blocks
    # The halo BlockSpec index maps stride by th // halo; any th not a
    # multiple of halo (e.g. H % 8 != 0 forcing th < 8) would make
    # every grid program read tile 0's halo rows — silently wrong.
    # Fall back to the XLA path for such shapes.
    if th % halo != 0 or fs // 2 > halo:
        return neighborhood_attention_xla(x, wt, wp, wg, ww, fs)

    xc = jnp.moveaxis(x, -1, 1).reshape(b, c, h * w)
    xp = jnp.pad(xc, [(0, 0), (0, 0), (halo * w, (halo + 8) * w)])

    kernel = functools.partial(_kernel, th=th, w=w, c=c, fs=fs, halo=halo)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, c, h * w), x.dtype),
        grid=(b, h // th),
        in_specs=[
            pl.BlockSpec((1, c, th * w), lambda bi, ti: (bi, 0, ti),
                         memory_space=pltpu.VMEM),  # body (unpadded)
            pl.BlockSpec((1, c, halo * w),
                         lambda bi, ti: (bi, 0, ti * (th // halo)),
                         memory_space=pltpu.VMEM),  # top halo (padded)
            pl.BlockSpec((1, c, halo * w),
                         lambda bi, ti: (bi, 0,
                                         ti * (th // halo) + th // halo + 1),
                         memory_space=pltpu.VMEM),  # bottom halo (padded)
            pl.BlockSpec((c, c), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),  # wt
            pl.BlockSpec((c, c), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),  # wp
            pl.BlockSpec((c, c), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),  # wg
            pl.BlockSpec((c, c), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),  # ww
        ],
        out_specs=pl.BlockSpec((1, c, th * w), lambda bi, ti: (bi, 0, ti),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((fs * fs, th * w), jnp.float32),
        ],
        interpret=interpret or jax.default_backend() != "tpu",
    )(xc, xp, xp, wt, wp, wg, ww)
    return jnp.moveaxis(out.reshape(b, c, h, w), 1, -1)
