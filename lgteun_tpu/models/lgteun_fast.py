"""Channel-major LGTEUN inference fast path (the "LGB trunk").

Same math as `models/lgteun.py` + `models/common/lgt.py`, expressed as
a pure function over the flax param tree with activations held in
channel-major [B, C, H, W] throughout the LGT prior:

- NHWC keeps C in {8, 16, 32, 64} in the 128-lane minormost dim, so
  every transpose/reshape between the fused kernels touches up to 8x
  padded HBM traffic. Channel-major puts W (128/64) in the lanes.
- The fused Pallas kernels (window attention, LN+FFN) already use
  channel-major layouts internally; this trunk feeds them natively
  (`fused_window_attention_v2_cm`, `fused_ln_ffn_cm`) so their
  entry/exit relayouts disappear.
- Pointwise convs become `bchw,cd->bdhw` einsums; LN reduces over
  axis 1; the FFT mixer uses the channel-major DFT pair
  (`rfft2_pair_cm`); resizes use `sample_scale_cm`.

Measured (v5e, batch 96, WV-3 8-band, K=2, round 5): 55.2 ms/batch =
28.5 MP/s (23.1x the RTX-3090 reference) in the in-budget bf16res
storage mode, 57.4 ms = 27.4 MP/s full-f32, with the full fused trunk
on chip: mixer-head kernel -> packed v3 attention (tanh-form softmax)
-> block-tail kernel, poly-trig engine, channel-major unfolding (all
24 kernel variants PASS scripts/prove_kernels.py; `LGTEUN_FUSE_LEVEL`
3/2/1/0 stages them). The block tail dominates and is VPU-bound
(GELU + taps) — see ROOFLINE.md for the full per-kernel budget.

Used by the `UnlgFormer` Method for TPU inference (LGTEUN_FAST=0
restores the flax module path) AND for TPU f32 training
(`train=True`: fused kernels through custom_vjp wrappers with
XLA-recompute backwards, dropout as in-kernel masks —
LGTEUN_FAST_TRAIN=0 restores the module); other backends and the
selective-bf16 recipe use the module. f32-parity with the module is
tested in tests/test_lgteun.py::test_fast_forward_matches_module and
(gradients) tests/test_lgteun_fast_train.py.

LGTEUN_EVAL_DTYPE switches the trunk to selective bf16 STORAGE (see
`_storage_dtype` for the two recipes): inter-kernel activations are
bf16 (half the kernel DMA), every kernel upcasts on load and runs its
math — LN statistics, softmax, the spectral chain, GELU — in f32, and
the unfolding data steps + final residual stay f32. `bf16` rounds
everything incl. the LGB residual stream; `bf16res` rounds only the
mixer branch tensors so the error cannot compound across blocks —
the in-budget serving headline. Drift bounds tested in
tests/test_lgteun.py::test_fast_forward_bf16_storage_drift_bounded.

Reference provenance is unchanged: models/unlg_former.py:21-67,
models/common/LGT.py (see models/lgteun.py for the unfolding quirk).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from lgteun_tpu.ops import fuse_level
from lgteun_tpu.ops.fft import irfft2_pair_cm, rfft2_pair_cm
from lgteun_tpu.ops.resize import sample_scale_cm

__all__ = ["lgteun_fast_forward"]


def _storage_dtype():
    """LGTEUN_EVAL_DTYPE selects the trunk's activation-storage recipe
    (kernel-internal math — LN statistics, softmax, the spectral chain,
    GELU — is ALWAYS f32; only what is stored/DMA'd between kernels
    changes). Returns (sdtype, res_f32):

      unset      -> (None, False): full f32 storage (reference numerics)
      "bf16"     -> (bf16, False): every inter-kernel tensor incl. the
                    LGB residual stream is bf16 (half the kernel DMA).
                    Fastest, but the residual stream re-rounds to bf16
                    after every block, so error accumulates across the
                    6 LGB blocks (measured -0.103 dB on the synthetic
                    WV-3 study, benchmarks/eval_numerics.json).
      "bf16res"  -> (bf16, True): the mixer BRANCH tensors (y1/x1/x2 —
                    the half-channel streams between the head kernel,
                    the attention kernel and the block tail) are bf16,
                    but the residual stream x, the inter-scale
                    resample/pointconvs and the block outputs stay f32,
                    so per-block rounding enters only through branch
                    operands and never compounds on the trunk value.
                    The in-budget serving mode (see the same study for
                    its measured delta).

    The unfolding data steps (D/DT/R/RT, eta) stay f32 in every mode."""
    import os

    mode = os.environ.get("LGTEUN_EVAL_DTYPE")
    if mode == "bf16":
        return jnp.bfloat16, False
    if mode == "bf16res":
        return jnp.bfloat16, True
    return None, False


def _pointconv_cm(x, p, sdtype=None):
    """PointConv param subtree (Conv_0/Conv_0) on [B, C, H, W]. Under
    bf16 storage the einsum takes bf16 operands with f32 accumulation,
    adds the bias in f32, and rounds once to storage."""
    k = p["Conv_0"]["Conv_0"]["kernel"][0, 0]  # [Cin, Cout]
    b = p["Conv_0"]["Conv_0"]["bias"]
    if sdtype is None:
        return (jnp.einsum("bchw,cd->bdhw", x, k)
                + b[None, :, None, None])
    if jax.default_backend() == "tpu":
        y = jnp.einsum("bchw,cd->bdhw", x.astype(sdtype), k.astype(sdtype),
                       preferred_element_type=jnp.float32)
    else:
        # CPU's dot thunk can't run bf16xbf16=f32; mimic the TPU
        # semantics (bf16-rounded operands, f32 accumulation) exactly
        y = jnp.einsum("bchw,cd->bdhw",
                       x.astype(sdtype).astype(jnp.float32),
                       k.astype(sdtype).astype(jnp.float32))
    return (y + b[None, :, None, None]).astype(sdtype)


def _ln_cm(x, scale, bias, eps=1e-5):
    """LN over channels; statistics and affine always in f32, output in
    the input's storage dtype."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=1, keepdims=True)
    var = jnp.var(xf, axis=1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = y * scale[None, :, None, None] + bias[None, :, None, None]
    return y.astype(x.dtype)


def _windows_cm(x, win):
    """[B, C, H, W] -> [B*nh*nw, C, win*win]."""
    b, c, h, w = x.shape
    nh, nw = h // win, w // win
    t = x.reshape(b, c, nh, win, nw, win)
    t = t.transpose(0, 2, 4, 1, 3, 5)
    return t.reshape(b * nh * nw, c, win * win)


def _unwindows_cm(t, win, hw, b):
    h, w = hw
    nh, nw = h // win, w // win
    c = t.shape[1]
    t = t.reshape(b, nh, nw, c, win, win)
    t = t.transpose(0, 3, 1, 4, 2, 5)
    return t.reshape(b, c, h, w)


def _window_pairs_cm(x, win):
    """[B, C, H, W] -> [B*nh*(nw/2), C, 2*win*win]: horizontally
    adjacent window PAIRS packed on the last (lane) axis, each window's
    tokens contiguous."""
    b, c, h, w = x.shape
    nh, nw2 = h // win, w // (2 * win)
    t = x.reshape(b, c, nh, win, nw2, 2, win)
    t = t.transpose(0, 2, 4, 1, 5, 3, 6)  # [b, nh, nw2, c, 2, win, win]
    return t.reshape(b * nh * nw2, c, 2 * win * win)


def _unwindow_pairs_cm(t, win, hw, b):
    h, w = hw
    nh, nw2 = h // win, w // (2 * win)
    c = t.shape[1]
    t = t.reshape(b, nh, nw2, c, 2, win, win)
    t = t.transpose(0, 3, 1, 5, 2, 4, 6)  # [b, c, nh, win, nw2, 2, win]
    return t.reshape(b, c, h, w)


@functools.lru_cache(maxsize=None)
def _pack_mats(win: int, w: int):
    """0/1 permutation tensors expressing the window-pair pack/unpack
    as MXU matmuls. The pack is a fine-grained (8-lane-granule) shuffle
    that XLA's transpose emitter runs ~10x off stream rate; a
    permutation is a linear map, so a [win*w, npair*2win^2] one-hot
    einsum does the same relayout on the MXU (measured v5e,
    [96,16,128,128] pack+unpack pair: 2.9 ms transpose -> 2.0 ms
    HIGH-precision matmul -> single-pass bf16 matmul, see
    `_window_pairs_mm` for why bf16 is numerically free here).

    The flat [win*w, win*w] form lives in ops/lgb_block_kernel.py
    (the megakernel packs in-kernel with the same matrices); this
    reshapes it to the einsum-friendly [m, npair, 2win^2] pair."""
    from lgteun_tpu.ops.lgb_block_kernel import pack_mats

    npair = w // (2 * win)
    m = win * w
    Pflat, _ = pack_mats(win, w)
    P = Pflat.reshape(m, npair, 2 * win * win)
    Pinv = Pflat.T.reshape(npair, 2 * win * win, m)
    return P, Pinv  # numpy (jnp constants would leak across traces)


def _window_pairs_mm(x, win):
    """`_window_pairs_cm` as a permutation matmul (TPU fast path).

    The one-hot contraction runs as a single bf16 MXU pass: a
    permutation matmul copies values, so the only rounding is the
    values themselves to bf16 — exactly the rounding the attention
    kernel's own Mosaic dot applies to its operands anyway, i.e. free
    on the attention input (measured: HIGH 3-pass -> bf16 1-pass is
    ~3x on the pack/unpack matmuls)."""
    b, c, h, w = x.shape
    nh, npair = h // win, w // (2 * win)
    P, _ = _pack_mats(win, w)
    xv = x.reshape(b, c, nh, win * w).astype(jnp.bfloat16)
    y = jnp.einsum("bcnm,mjl->bncjl", xv,
                   jnp.asarray(P, jnp.bfloat16),
                   preferred_element_type=jnp.float32)
    y = y.transpose(0, 1, 3, 2, 4)  # [b, nh, j, c, l]
    return y.reshape(b * nh * npair, c, 2 * win * win)


def _unwindow_pairs_mm(t, win, hw, b):
    h, w = hw
    nh, npair = h // win, w // (2 * win)
    c = t.shape[1]
    _, Pinv = _pack_mats(win, w)
    y = t.reshape(b, nh, npair, c, 2 * win * win).transpose(0, 1, 3, 2, 4)
    out = jnp.einsum("bncjl,jlm->bcnm", y.astype(jnp.bfloat16),
                     jnp.asarray(Pinv, jnp.bfloat16),
                     preferred_element_type=jnp.float32)
    return out.reshape(b, c, h, w)


def _parity_grade() -> bool:
    """LGTEUN_MATMUL_PRECISION=highest = parity-grade numerics: skip
    the fused Pallas kernels (Mosaic dots round operands to bf16 with
    no precision escape hatch) and the matmul relayouts, keeping the
    whole fast path on HIGHEST-precision XLA ops. Default TPU inference
    accepts ~1e-3 mean output drift vs f32 — the same class of drift
    XLA's own default-precision matmuls already introduce (measured:
    fused 1.4e-3 vs plain-XLA-default 1.1e-3 mean on a fresh-init
    LGTEUN) and the same class the reference itself ships (torch 1.9
    cuDNN on RTX 3090 defaults to TF32 matmuls)."""
    import os

    return os.environ.get("LGTEUN_MATMUL_PRECISION", "").lower() == "highest"


def _local_mixer_cm(x, p, win, heads, train=False):
    from lgteun_tpu.ops.window_attention import (
        fused_window_attention_v3_packed,
        fused_window_attention_v3_packed_train,
        window_attention_xla,
    )

    b, c, h, w = x.shape
    scale = (c // heads) ** -0.5
    wqkv = p["to_qkv_kernel"][0, 0]  # [C, 3C]
    bqkv = p["to_qkv_bias"]
    if (jax.default_backend() == "tpu" and (w // win) % 2 == 0
            and not _parity_grade() and fuse_level() >= 1):
        xp = _window_pairs_mm(x, win).astype(x.dtype)  # [N/2, C, 2S]
        if train:
            out = fused_window_attention_v3_packed_train(
                xp, wqkv, bqkv, p["pos_emb"], heads, scale)
        else:
            out = fused_window_attention_v3_packed(
                xp, wqkv, bqkv, p["pos_emb"], heads=heads, scale=scale,
                tanh_exp=fuse_level() >= 2)
        return _unwindow_pairs_mm(out, win, (h, w), b).astype(x.dtype)
    xt = _windows_cm(x, win)  # [N, C, S]
    out = window_attention_xla(xt.transpose(0, 2, 1), wqkv, bqkv,
                               p["pos_emb"], heads,
                               scale).transpose(0, 2, 1)
    return _unwindows_cm(out, win, (h, w), b).astype(x.dtype)


def _global_mixer_cm(x, p, train=False):
    """FFT amp/phase mixer, channel-major (exact forward values incl.
    the zero-bin convention and the reference's epsilons). The spectral
    math is always f32; bf16-storage inputs round only at the output."""
    if (not train and jax.default_backend() == "tpu"
            and not _parity_grade() and fuse_level() >= 2):
        from lgteun_tpu.ops.spectral_kernel import fused_global_mixer_cm

        return fused_global_mixer_cm(
            x, p["amp_scale"][0, 0, 0], p["amp_bias"],
            p["pha_scale"][0, 0, 0], p["pha_bias"])
    sdt = x.dtype
    x = x.astype(jnp.float32)
    h, w = x.shape[-2], x.shape[-1]
    re, im = rfft2_pair_cm(x, norm="backward")
    zero = (re == 0.0) & (im == 0.0)
    re_s = jnp.where(zero, 1.0, re)
    im_s = jnp.where(zero, 0.0, im)
    amp = jnp.where(zero, 0.0, jnp.sqrt(re_s**2 + im_s**2))
    pha = jnp.where(zero, 0.0, jnp.arctan2(im_s, re_s))
    col = lambda v: v[None, :, None, None]
    amp = amp * col(p["amp_scale"][0, 0, 0]) + col(p["amp_bias"])
    pha = pha * col(p["pha_scale"][0, 0, 0]) + col(p["pha_bias"])
    real = amp * jnp.cos(pha) + 1e-8 + 1e-8
    imag = amp * jnp.sin(pha) + 1e-8
    out = jnp.abs(irfft2_pair_cm(real, imag, s=(h, w), norm="backward"))
    return out.astype(sdt)


def _ffn_flat(p):
    return {
        "ln_gamma": p["ln_gamma"], "ln_beta": p["ln_beta"],
        "w1": p["w1"][0, 0], "b1": p["b1"],
        "w2": p["w2"][0, 0], "b2": p["b2"],
        "dw": p["dw"][:, :, 0], "bdw": p["bdw"],
        "w3": p["w3"][0, 0], "b3": p["b3"],
    }


def _ffn_cm(x, p, eps=1e-5, train=False):
    from lgteun_tpu.ops.ffn_kernel import fused_ln_ffn_cm, ln_ffn_xla

    flat = _ffn_flat(p)
    # train goes through XLA: this branch is only reached at fuse
    # level < 2 (the train wrappers cover the level-2 tail kernel) and
    # the raw CM FFN kernel has no vjp
    if (not train and jax.default_backend() == "tpu"
            and x.shape[-1] % 128 == 0
            and not _parity_grade() and fuse_level() >= 1):
        return fused_ln_ffn_cm(x, flat, eps=eps)  # includes the +x residual
    y = ln_ffn_xla(jnp.moveaxis(x, 1, -1), flat, eps=eps)
    return jnp.moveaxis(y, -1, 1)


def _lgb_cm(x, p, num_blocks, win, heads, bdtype=None, train=False,
            drop_rate=0.0, rng=None):
    """One LGB stack. `bdtype` (bf16res mode): storage dtype for the
    mixer BRANCH tensors only — y1/x2 out of the head kernel, x1 out of
    attention — while the residual stream x stays in its own dtype
    (f32). The fused tail kernel upcasts the bf16 branch refs on load
    and writes the block output in x's dtype, so rounding never
    compounds across blocks.

    `train` routes the fused kernels through their custom_vjp wrappers
    (Pallas forward, XLA-recompute backward) and applies the
    reference's Dropout(drop_rate) after the mixer proj (reference
    LGT.py:198) as an in-kernel mask sampled from `rng`."""
    c = x.shape[1]
    half = c // 2
    use_drop = train and drop_rate > 0.0 and rng is not None
    keep = 1.0 - drop_rate

    def drop_mask(k, shape, dtype):
        m = jax.random.bernoulli(k, keep, shape)
        return m.astype(dtype) * (1.0 / keep)

    # full-res (W%128) blocks run the row-tiled tail kernel; the 64x64
    # bottleneck (H*W%128) runs the whole-image roll-based variant
    fused = (jax.default_backend() == "tpu"
             and (x.shape[-2] * x.shape[-1]) % 128 == 0
             and not _parity_grade() and fuse_level() >= 2)
    # fuse level 3: the whole-block megakernel (one VMEM residence per
    # block — no inter-kernel HBM spill; ops/lgb_block_kernel.py) on
    # megakernel-aligned shapes; the bottleneck keeps the 3-kernel path
    mega = (fused and not train and fuse_level() >= 3
            and x.shape[-1] % 128 == 0
            and x.shape[-1] % (2 * win) == 0 and x.shape[-2] % win == 0)
    if mega:
        from lgteun_tpu.ops.lgb_block_kernel import fused_lgb_block_cm

        for i in range(num_blocks):
            mx = p[f"mixer_{i}"]
            blk = {"norm": p[f"norm_mix_{i}"], "local": mx["local"],
                   "global": mx["global"], "proj": mx["proj"],
                   "ffn": _ffn_flat(p[f"ffn_{i}"])}
            x = fused_lgb_block_cm(x, blk, win=win, heads=heads)
        return x
    for i in range(num_blocks):
        mx = p[f"mixer_{i}"]
        mask = None
        if use_drop:
            rng, kb = jax.random.split(rng)
            mask = drop_mask(kb, x.shape, x.dtype)
        if fused:
            from lgteun_tpu.ops.ffn_kernel import (
                fused_block_tail_cm,
                fused_block_tail_train,
            )
            from lgteun_tpu.ops.spectral_kernel import (
                fused_ln_mixer_head_cm,
                fused_ln_mixer_head_train,
            )

            g = mx["global"]
            pk = mx["proj"]["Conv_0"]["Conv_0"]["kernel"][0, 0]
            pb = mx["proj"]["Conv_0"]["Conv_0"]["bias"]
            if train:
                y1, x2 = fused_ln_mixer_head_train(
                    x, p[f"norm_mix_{i}"]["scale"],
                    p[f"norm_mix_{i}"]["bias"],
                    g["amp_scale"][0, 0, 0], g["amp_bias"],
                    g["pha_scale"][0, 0, 0], g["pha_bias"])
                x1 = _local_mixer_cm(y1, mx["local"], win, heads,
                                     train=True)
                x = fused_block_tail_train(x, x1, x2, pk, pb,
                                           _ffn_flat(p[f"ffn_{i}"]), mask)
            else:
                y1, x2 = fused_ln_mixer_head_cm(
                    x, p[f"norm_mix_{i}"]["scale"],
                    p[f"norm_mix_{i}"]["bias"],
                    g["amp_scale"][0, 0, 0], g["amp_bias"],
                    g["pha_scale"][0, 0, 0], g["pha_bias"],
                    out_dtype=bdtype)
                x1 = _local_mixer_cm(y1, mx["local"], win, heads)
                x = fused_block_tail_cm(x, x1, x2, pk, pb,
                                        _ffn_flat(p[f"ffn_{i}"]))
        else:
            y = _ln_cm(x, p[f"norm_mix_{i}"]["scale"],
                       p[f"norm_mix_{i}"]["bias"])
            # bf16res on non-TPU backends: mirror the kernel semantics
            # (bf16 rounding at branch kernel boundaries, f32 math)
            rnd = ((lambda t: t.astype(bdtype).astype(x.dtype))
                   if bdtype is not None and x.dtype != bdtype
                   else (lambda t: t))
            x1 = rnd(_local_mixer_cm(rnd(y[:, :half]), mx["local"],
                                     win, heads, train=train))
            x2 = rnd(_global_mixer_cm(rnd(y[:, half:]), mx["global"],
                                      train=train))
            mixed = _pointconv_cm(jnp.concatenate([x1, x2], axis=1),
                                  mx["proj"])
            if mask is not None:
                mixed = mixed * mask
            x = x + mixed
            x = _ffn_cm(x, p[f"ffn_{i}"], train=train)
    return x


def _lgt_cm(z, p, win, heads, num_block=(2, 1), sdtype=None,
            res_f32=False, train=False, drop_rate=0.0, rng=None):
    """LGT prior, channel-major [B, C, H, W] in/out (the whole fast
    forward is channel-major end-to-end).

    `sdtype`/`res_f32` (see `_storage_dtype`): bf16 activation storage.
    With res_f32 (the bf16res mode) only the mixer branch tensors
    inside each LGB block are bf16; the residual stream, inter-scale
    convs/resamples, patch embed, tail conv and residual add stay
    f32. Without it the whole trunk is bf16 storage."""
    # patch embed (patch_size=1): depthwise 1x1 = per-channel affine
    kdw = p["patch_dw"]["Conv_0"]["kernel"][0, 0, 0]  # [C]
    bdw = p["patch_dw"]["Conv_0"]["bias"]
    fea = z * kdw[None, :, None, None] + bdw[None, :, None, None]
    fea = _pointconv_cm(fea, p["patch_pw"])
    fea = _ln_cm(fea, p["patch_norm_ln"]["scale"], p["patch_norm_ln"]["bias"])
    bdtype = sdtype if res_f32 else None  # branch-only storage dtype
    stream_sdtype = None if res_f32 else sdtype
    if stream_sdtype is not None:
        fea = fea.astype(stream_sdtype)

    scales = len(num_block)

    def stack_rng():
        nonlocal rng
        if rng is None:
            return None
        rng, sub = jax.random.split(rng)
        return sub

    skips = []
    for i in range(scales - 1):
        fea = _lgb_cm(fea, p[f"enc_lgb_{i}"], num_block[i], win, heads,
                      bdtype, train, drop_rate, stack_rng())
        skips.append(fea)
        fea = sample_scale_cm(fea, 0.5).astype(fea.dtype)
        fea = _pointconv_cm(fea, p[f"enc_down_{i}"], stream_sdtype)

    fea = _lgb_cm(fea, p["bottleneck"], num_block[-1], win, heads, bdtype,
                  train, drop_rate, stack_rng())

    for i in range(scales - 1):
        fea = sample_scale_cm(fea, 2).astype(fea.dtype)
        fea = _pointconv_cm(fea, p[f"dec_up_{i}"], stream_sdtype)
        fea = jnp.concatenate([fea, skips[scales - 2 - i]], axis=1)
        fea = _pointconv_cm(fea, p[f"dec_fuse_{i}"], stream_sdtype)
        fea = _lgb_cm(fea, p[f"dec_lgb_{i}"], num_block[scales - 2 - i],
                      win, heads, bdtype, train, drop_rate, stack_rng())

    out = _pointconv_cm(fea.astype(jnp.float32), p["tail"])
    return out + z


def _depconv_cm(x, p):
    """DepConv (3x3 depthwise, zero 'SAME' padding) on [B, C, H, W] as
    9 shifted multiply-adds — XLA fuses the chain into one elementwise
    pass over the lane-friendly channel-major layout. The NHWC lowering
    of the same conv is the root of the batch-8 step-time anomaly
    (see ROOFLINE.md "The batch-8 anomaly"): C=8 in the 128-lane minor
    dimension wastes 94% of every vector register and XLA's conv
    schedule collapses at some batch shapes."""
    k = p["Conv_0"]["Conv_0"]["kernel"][:, :, 0]  # [3, 3, C]
    b = p["Conv_0"]["Conv_0"]["bias"]
    h, w = x.shape[-2], x.shape[-1]
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)))
    acc = None
    for dr in range(3):
        for dc in range(3):
            t = xp[:, :, dr:dr + h, dc:dc + w] * k[dr, dc][None, :, None,
                                                           None]
            acc = t if acc is None else acc + t
    return acc + b[None, :, None, None]


def _depconv_nhwc(x, p):
    """DepConv (3x3 depthwise) from its Conv_0/Conv_0 subtree, NHWC."""
    k = p["Conv_0"]["Conv_0"]["kernel"]  # [3, 3, 1, C]
    b = p["Conv_0"]["Conv_0"]["bias"]
    c = x.shape[-1]
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", feature_group_count=c,
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b


def _pointconv_nhwc(x, p):
    k = p["Conv_0"]["Conv_0"]["kernel"][0, 0]
    b = p["Conv_0"]["Conv_0"]["bias"]
    return jnp.einsum("bhwc,cd->bhwd", x, k) + b


def lgteun_fast_forward(params, ms, pan, *, stage=2, window_size=8,
                        num_heads=2, num_block=(2, 1), train=False,
                        drop_rate=0.0, rng=None):
    """params = the LGTEUN module's param tree; ms/pan NHWC.

    `train=True` is the TPU training fast path: same channel-major
    trunk, fused kernels routed through their custom_vjp wrappers
    (Pallas forward, XLA-recompute backward) and the reference's
    mixer-proj Dropout(drop_rate) applied as in-kernel masks sampled
    from `rng` (one split per LGB block; `rng=None` disables dropout).
    Storage is always f32 in training (LGTEUN_EVAL_DTYPE is an
    inference flag). Gradient parity vs the flax module is tested in
    tests/test_lgteun_fast_train.py.

    The unfolding data steps (D/DT/R/RT, eta) run channel-major too:
    their NHWC lowering (C∈{1,8} in the lane dim) was both slow and
    the source of the batch-8 step-time anomaly — see `_depconv_cm`
    and ROOFLINE.md."""
    ms_cm = jnp.moveaxis(ms, -1, 1)
    pan_cm = jnp.moveaxis(pan, -1, 1)
    z = sample_scale_cm(ms_cm, 4)

    def down(x):
        x = _depconv_cm(sample_scale_cm(x, 0.5), params["D"]["dw0"])
        return _depconv_cm(sample_scale_cm(x, 0.5), params["D"]["dw1"])

    def up(x):
        x = _depconv_cm(sample_scale_cm(x, 2), params["DT"]["dw0"])
        return _depconv_cm(sample_scale_cm(x, 2), params["DT"]["dw1"])

    out = z
    sdtype, res_f32 = (None, False) if train else _storage_dtype()
    for i in range(stage):
        eta = params[f"eta_{i}"]
        ms_term = up(down(z) - ms_cm)
        pan_term = _pointconv_cm(
            _pointconv_cm(z, params["R"]) - pan_cm, params["RT"])
        z = z - eta * (ms_term + pan_term)
        if i == stage - 1:  # earlier priors are dead code (see lgteun.py)
            out = _lgt_cm(z, params[f"prior_{i}"], window_size, num_heads,
                          num_block, sdtype=sdtype, res_f32=res_f32,
                          train=train, drop_rate=drop_rate, rng=rng)
    return jnp.moveaxis(out, 1, -1)
