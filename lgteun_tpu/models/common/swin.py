"""Swin-transformer machinery for PanFormer (NHWC, flax).

Reference: models/common/modules.py:278-502 — PatchMerging (unfold +
linear), WindowAttention with cyclic shift, attention masks, relative
position embedding, and optional cross-attention where the *query*
comes from the second input; SwinBlock = residual(prenorm(attn)) +
residual(prenorm(MLP)); SwinModule = patch merge + alternating
regular/shifted blocks.

Reference quirks preserved:
- cross-attention normalises only the kv stream (PreNorm wraps x; y is
  passed through raw — reference modules.py:295-303,383-386)
- the shifted-window masks are added to the last row of windows
  (upper/lower) and every (nw_w)-th window (left/right) exactly as in
  reference modules.py:412-414
- qkv projections have no bias; pos tables init from a standard normal
  (reference modules.py:363-372)
"""

from __future__ import annotations

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from lgteun_tpu.models.common.layers import torch_conv_bias_init

__all__ = ["SwinModule", "pixel_shuffle"]

_NEG_INF = -1e9  # used in place of float('-inf') for f32 safety


def _torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    """torch nn.Linear default: U(+-1/sqrt(fan_in)); shape [in, out]."""
    fan_in = shape[0]
    bound = (1.0 / fan_in) ** 0.5
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class _Dense(nn.Module):
    """nn.Linear with torch default init (weight and bias)."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        return nn.Dense(self.features, use_bias=self.use_bias,
                        kernel_init=_torch_linear_kernel_init,
                        bias_init=torch_conv_bias_init(fan_in))(x)


def pixel_shuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """torch PixelShuffle on NHWC: channel index c*r*r + i*r + j ->
    spatial (h*r+i, w*r+j), channel c."""
    b, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # b, h, r, w, r, c
    return x.reshape(b, h * r, w * r, c)


@functools.lru_cache(maxsize=None)
def _relative_index(window_size: int) -> np.ndarray:
    """[win², win², 2] table of relative (dy, dx) + (w-1) offsets
    (reference modules.py:335-338)."""
    coords = np.array([[y, x] for y in range(window_size)
                       for x in range(window_size)])
    rel = coords[None, :, :] - coords[:, None, :]
    return rel + window_size - 1


@functools.lru_cache(maxsize=None)
def _shift_masks(window_size: int) -> tuple[np.ndarray, np.ndarray]:
    """(upper_lower, left_right) additive masks (reference
    modules.py:319-332)."""
    d = window_size // 2
    n = window_size * window_size
    ul = np.zeros((n, n), np.float32)
    ul[-d * window_size:, :-d * window_size] = _NEG_INF
    ul[:-d * window_size, -d * window_size:] = _NEG_INF
    lr = np.zeros((window_size, window_size, window_size, window_size),
                  np.float32)
    lr[:, -d:, :, :-d] = _NEG_INF
    lr[:, :-d, :, -d:] = _NEG_INF
    lr = lr.reshape(n, n)
    return ul, lr


class WindowAttention(nn.Module):
    """(Shifted-)window MHSA with optional cross-attention
    (reference modules.py:341-422)."""

    heads: int
    head_dim: int
    shifted: bool
    window_size: int
    relative_pos_embedding: bool = True
    cross_attn: bool = False

    @nn.compact
    def __call__(self, x, y=None):
        w = self.window_size
        inner = self.heads * self.head_dim
        scale = self.head_dim ** -0.5

        if self.shifted:
            d = w // 2
            x = jnp.roll(x, (-d, -d), axis=(1, 2))
            if self.cross_attn and y is not None:
                y = jnp.roll(y, (-d, -d), axis=(1, 2))

        b, n_h, n_w, _ = x.shape
        nw_h, nw_w = n_h // w, n_w // w

        if not self.cross_attn:
            qkv = _Dense(inner * 3, use_bias=False, name="to_qkv")(x)
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            kv = _Dense(inner * 2, use_bias=False, name="to_kv")(x)
            k, v = jnp.split(kv, 2, axis=-1)
            q = _Dense(inner, use_bias=False, name="to_q")(y)

        def to_windows(t):
            t = t.reshape(b, nw_h, w, nw_w, w, self.heads, self.head_dim)
            t = t.transpose(0, 5, 1, 3, 2, 4, 6)
            return t.reshape(b, self.heads, nw_h * nw_w, w * w, self.head_dim)

        q, k, v = map(to_windows, (q, k, v))
        dots = jnp.einsum("bhwid,bhwjd->bhwij", q, k) * scale

        if self.relative_pos_embedding:
            table = self.param("pos_embedding", nn.initializers.normal(1.0),
                               (2 * w - 1, 2 * w - 1), jnp.float32)
            idx = _relative_index(w)
            dots = dots + table[idx[:, :, 0], idx[:, :, 1]]
        else:
            pos = self.param("pos_embedding", nn.initializers.normal(1.0),
                             (w * w, w * w), jnp.float32)
            dots = dots + pos

        if self.shifted:
            ul, lr = _shift_masks(w)
            n_win = nw_h * nw_w
            win_mask = np.zeros((n_win, w * w, w * w), np.float32)
            win_mask[-nw_w:] += ul
            win_mask[nw_w - 1::nw_w] += lr
            dots = dots + jnp.asarray(win_mask)[None, None]

        attn = jax.nn.softmax(dots, axis=-1)
        out = jnp.einsum("bhwij,bhwjd->bhwid", attn, v)
        out = out.reshape(b, self.heads, nw_h, nw_w, w, w, self.head_dim)
        out = out.transpose(0, 2, 4, 3, 5, 1, 6)
        out = out.reshape(b, n_h, n_w, inner)
        out = _Dense(x.shape[-1], name="to_out")(out)
        if self.shifted:
            out = jnp.roll(out, (d, d), axis=(1, 2))
        return out


class SwinBlock(nn.Module):
    dim: int
    heads: int
    head_dim: int
    mlp_dim: int
    shifted: bool
    window_size: int
    relative_pos_embedding: bool = True
    cross_attn: bool = False

    @nn.compact
    def __call__(self, x, y=None):
        xn = nn.LayerNorm(epsilon=1e-5, name="attn_norm")(x)
        x = x + WindowAttention(
            self.heads, self.head_dim, self.shifted, self.window_size,
            self.relative_pos_embedding, self.cross_attn, name="attn")(xn, y)
        xn = nn.LayerNorm(epsilon=1e-5, name="mlp_norm")(x)
        h = _Dense(self.mlp_dim, name="mlp_fc1")(xn)
        h = jax.nn.gelu(h, approximate=False)
        h = _Dense(self.dim, name="mlp_fc2")(h)
        return x + h


class PatchMerging(nn.Module):
    """Unfold(ds, stride ds) + linear, torch channel-major patch order
    (reference modules.py:443-455). NHWC in/out."""

    out_channels: int
    downscaling_factor: int

    @nn.compact
    def __call__(self, x):
        ds = self.downscaling_factor
        b, h, w, c = x.shape
        nh, nw = h // ds, w // ds
        if ds > 1:
            x = x.reshape(b, nh, ds, nw, ds, c)
            # torch unfold flattens (c, kh, kw) with c outermost
            x = x.transpose(0, 1, 3, 5, 2, 4)
            x = x.reshape(b, nh, nw, c * ds * ds)
        return _Dense(self.out_channels, name="linear")(x)


class SwinModule(nn.Module):
    """Patch merge + `layers` alternating regular/shifted Swin blocks
    (reference modules.py:458-502). NHWC in/out."""

    hidden_dimension: int
    layers: int
    downscaling_factor: int
    num_heads: int
    head_dim: int
    window_size: int
    relative_pos_embedding: bool = True
    cross_attn: bool = False

    @nn.compact
    def __call__(self, x, y=None):
        merge = PatchMerging(self.hidden_dimension, self.downscaling_factor,
                             name="patch_partition")
        x = merge(x)
        if y is not None:
            y = merge(y)  # shared weights (reference modules.py:497-499)
        for i in range(self.layers // 2):
            x = SwinBlock(self.hidden_dimension, self.num_heads, self.head_dim,
                          self.hidden_dimension * 4, False, self.window_size,
                          self.relative_pos_embedding, self.cross_attn,
                          name=f"regular_{i}")(x, y)
            x = SwinBlock(self.hidden_dimension, self.num_heads, self.head_dim,
                          self.hidden_dimension * 4, True, self.window_size,
                          self.relative_pos_embedding, self.cross_attn,
                          name=f"shifted_{i}")(x, y)
        return x
