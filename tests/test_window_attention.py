"""Pallas fused window attention vs the XLA reference path
(interpreter mode on CPU)."""

import jax
import numpy as np
import pytest

from lgteun_tpu.ops.window_attention import (
    fused_window_attention,
    window_attention_xla,
)


@pytest.mark.parametrize("n,s,c,heads", [(16, 64, 16, 2), (8, 64, 32, 2),
                                         (4, 16, 8, 2)])
def test_fused_matches_xla(rng, n, s, c, heads):
    xw = rng.standard_normal((n, s, c)).astype(np.float32)
    wqkv = (rng.standard_normal((c, 3 * c)) * 0.1).astype(np.float32)
    bqkv = (rng.standard_normal((3 * c,)) * 0.1).astype(np.float32)
    pos = rng.standard_normal((heads, s, s)).astype(np.float32)
    scale = (c // heads) ** -0.5

    want = np.asarray(window_attention_xla(xw, wqkv, bqkv, pos, heads, scale))
    got = np.asarray(fused_window_attention(
        xw, wqkv, bqkv, pos, heads=heads, scale=scale, interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("tanh_exp", [True, False])
def test_packed_v3_matches_xla(rng, tanh_exp):
    """2-window lane-packed kernel (interpret mode): block-diag -1e9
    position masking must reproduce per-window attention exactly —
    with both softmax forms (tanh-form exp, and the fuse-level-1
    plain-exp fallback)."""
    import functools

    import jax
    import jax.numpy as jnp

    from lgteun_tpu.ops.window_attention import (
        fused_window_attention_v3_packed,
        window_attention_xla,
    )

    n, s, c, heads = 8, 64, 16, 2
    scale = (c // heads) ** -0.5
    xw = jnp.asarray(rng.uniform(-1, 1, (n, s, c)).astype(np.float32))
    wqkv = jnp.asarray(rng.normal(0, 0.2, (c, 3 * c)).astype(np.float32))
    bqkv = jnp.asarray(rng.normal(0, 0.1, (3 * c,)).astype(np.float32))
    pos = jnp.asarray(rng.normal(0, 0.5, (heads, s, s)).astype(np.float32))

    want = window_attention_xla(xw, wqkv, bqkv, pos, heads, scale)
    # pack pairs: [n, s, c] -> [n/2, c, 2s]
    xp = xw.reshape(n // 2, 2, s, c).transpose(0, 3, 1, 2).reshape(
        n // 2, c, 2 * s)
    got = fused_window_attention_v3_packed(xp, wqkv, bqkv, pos,
                                           heads=heads, scale=scale,
                                           tanh_exp=tanh_exp)
    got = got.reshape(n // 2, c, 2, s).transpose(0, 2, 3, 1).reshape(n, s, c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5)


def test_v3_wrapper_matches_xla_and_differentiable(rng):
    """`fused_window_attention_v3` ([N, S, C] entry used by LocalMixer
    in training): forward parity vs XLA and custom_vjp grads vs the
    XLA path (backward is an XLA recompute, so grads must match to
    f32 tolerance)."""
    import jax.numpy as jnp

    from lgteun_tpu.ops.window_attention import fused_window_attention_v3

    n, s, c, heads = 8, 64, 16, 2
    scale = (c // heads) ** -0.5
    xw = jnp.asarray(rng.uniform(-1, 1, (n, s, c)).astype(np.float32))
    wqkv = jnp.asarray(rng.normal(0, 0.2, (c, 3 * c)).astype(np.float32))
    bqkv = jnp.asarray(rng.normal(0, 0.1, (3 * c,)).astype(np.float32))
    pos = jnp.asarray(rng.normal(0, 0.5, (heads, s, s)).astype(np.float32))

    want = window_attention_xla(xw, wqkv, bqkv, pos, heads, scale)
    got = fused_window_attention_v3(xw, wqkv, bqkv, pos, heads, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    def loss_fused(x_, w_):
        return jnp.sum(fused_window_attention_v3(
            x_, w_, bqkv, pos, heads, scale) ** 2)

    def loss_xla(x_, w_):
        return jnp.sum(window_attention_xla(
            x_, w_, bqkv, pos, heads, scale) ** 2)

    gx_f, gw_f = jax.grad(loss_fused, argnums=(0, 1))(xw, wqkv)
    gx_x, gw_x = jax.grad(loss_xla, argnums=(0, 1))(xw, wqkv)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_x),
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(gw_f), np.asarray(gw_x),
                               atol=2e-4, rtol=2e-4)


def test_local_mixer_fused_routing_matches_xla(rng):
    """LocalMixer with use_fused=True (which routes to the packed v3
    kernel when the window count is even) must match the XLA path in
    values and input grads — the training-path integration of the
    fused attention."""
    import jax.numpy as jnp

    from lgteun_tpu.models.common.lgt import LocalMixer

    x = jnp.asarray(rng.uniform(-1, 1, (2, 16, 16, 16)).astype(np.float32))
    m_f = LocalMixer(win_size=8, num_heads=2, use_fused=True)
    m_x = LocalMixer(win_size=8, num_heads=2, use_fused=False)
    params = m_x.init(jax.random.PRNGKey(0), x)

    want = m_x.apply(params, x)
    got = m_f.apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    g_w = jax.grad(lambda x_: jnp.sum(m_x.apply(params, x_) ** 2))(x)
    g_f = jax.grad(lambda x_: jnp.sum(m_f.apply(params, x_) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_w),
                               atol=2e-4, rtol=2e-4)


def test_window_pair_partition_roundtrip(rng):
    """_window_pairs_cm / _unwindow_pairs_cm invert each other and
    agree with the plain partition."""
    import jax.numpy as jnp

    from lgteun_tpu.models.lgteun_fast import (
        _unwindow_pairs_cm,
        _window_pairs_cm,
        _windows_cm,
    )

    x = jnp.asarray(rng.uniform(0, 1, (2, 6, 16, 32)).astype(np.float32))
    xp = _window_pairs_cm(x, 8)
    assert xp.shape == (2 * 2 * 2, 6, 128)
    back = _unwindow_pairs_cm(xp, 8, (16, 32), 2)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))
    # each pair's first half == the corresponding plain window
    plain = _windows_cm(x, 8)
    np.testing.assert_array_equal(np.asarray(xp[:, :, :64]),
                                  np.asarray(plain[0::2]))
    np.testing.assert_array_equal(np.asarray(xp[:, :, 64:]),
                                  np.asarray(plain[1::2]))
