"""Fused patch-correlation search vs the XLA path."""

import jax
import jax.numpy as jnp
import numpy as np

from lgteun_tpu.ops.patch_match_kernel import (
    _fused_pm_impl,
    fused_patch_match,
    patch_match_xla,
)


def _inputs(rng, n=4, ll=64, kk=36):
    lr = rng.standard_normal((n, ll, kk)).astype(np.float32)
    ref = rng.standard_normal((n, ll, kk)).astype(np.float32)
    lr_n = lr / np.linalg.norm(lr, axis=2, keepdims=True)
    ref_n = ref / np.linalg.norm(ref, axis=2, keepdims=True)
    ref_u = rng.standard_normal((n, kk, ll)).astype(np.float32)
    return jnp.asarray(lr_n), jnp.asarray(ref_n), jnp.asarray(ref_u)


def test_fused_matches_xla(rng):
    lr_n, ref_n, ref_u = _inputs(rng)
    t_want, s_want = patch_match_xla(lr_n, ref_n, ref_u)
    t_got, s_got = _fused_pm_impl(lr_n, ref_n, ref_u, interpret=True)
    np.testing.assert_allclose(np.asarray(s_got), np.asarray(s_want),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(t_got), np.asarray(t_want),
                               atol=1e-5)


def test_tie_break_picks_first(rng):
    """Duplicate ref rows -> reference (torch.max) picks the first
    maximal index; the one-hot path must match, not sum duplicates."""
    lr_n, ref_n, ref_u = _inputs(rng, n=2)
    ref_n = ref_n.at[:, 5].set(ref_n[:, 3])  # rows 3 and 5 identical
    t_want, s_want = patch_match_xla(lr_n, ref_n, ref_u)
    t_got, s_got = _fused_pm_impl(lr_n, ref_n, ref_u, interpret=True)
    np.testing.assert_allclose(np.asarray(t_got), np.asarray(t_want),
                               atol=1e-5)


def test_tie_break_all_rows_identical(rng):
    """Flat/duplicate ref patches make EVERY correlation column an
    exact |L|-way tie; the transfer must pick row 0, not sum all."""
    lr_n, ref_n, ref_u = _inputs(rng, n=2)
    ref_n = jnp.broadcast_to(ref_n[:, :1], ref_n.shape)  # all rows equal
    t_want, s_want = patch_match_xla(lr_n, ref_n, ref_u)
    t_got, s_got = _fused_pm_impl(lr_n, ref_n, ref_u, interpret=True)
    np.testing.assert_allclose(np.asarray(s_got), np.asarray(s_want),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(t_got), np.asarray(t_want),
                               atol=1e-6)
    # explicit: transferred patches are ref_u row 0 everywhere
    np.testing.assert_allclose(np.asarray(t_got),
                               np.broadcast_to(
                                   np.asarray(ref_u)[:, :, :1], t_got.shape),
                               atol=1e-6)


def test_tie_break_large_magnitude(rng):
    """Ties at |R| >= 0.25 where an epsilon bias is below float32 ULP
    (the regression the index reduction fixes)."""
    n, ll, kk = 2, 64, 36
    lr_n = jnp.asarray(rng.standard_normal((n, ll, kk)).astype(np.float32))
    lr_n = lr_n / jnp.linalg.norm(lr_n, axis=2, keepdims=True)
    # every ref row = first query row -> R[:, i, 0] == 1.0 for all i
    ref_n = jnp.broadcast_to(lr_n[:, :1], (n, ll, kk))
    ref_u = jnp.asarray(rng.standard_normal((n, kk, ll)).astype(np.float32))
    t_want, _ = patch_match_xla(lr_n, ref_n, ref_u)
    t_got, _ = _fused_pm_impl(lr_n, ref_n, ref_u, interpret=True)
    np.testing.assert_allclose(np.asarray(t_got), np.asarray(t_want),
                               atol=1e-6)


def test_gradients(rng):
    lr_n, ref_n, ref_u = _inputs(rng, n=2)

    g1 = jax.grad(lambda a: jnp.sum(fused_patch_match(a, ref_n, ref_u)[0]
                                    ** 2))(lr_n)
    g2 = jax.grad(lambda a: jnp.sum(patch_match_xla(a, ref_n, ref_u)[0]
                                    ** 2))(lr_n)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4)


def test_fold_patches_blocked_matches_adjoint(rng):
    """The (k/s)^2 block-decomposed fold must equal the VJP-adjoint fold
    (torch F.fold semantics) for INNT's 24/8 and 3/1 configurations."""
    import jax
    import jax.numpy as jnp

    from lgteun_tpu.ops.patches import (
        _fold_patches_blocked,
        extract_patches,
    )

    for (hw, c, k, s, p) in [((128, 128), 4, 24, 8, 8),
                             ((24, 24), 4, 3, 1, 1),
                             ((32, 32), 3, 8, 4, 2),
                             ((16, 16), 2, 4, 4, 0)]:
        h, w = hw
        oh = (h + 2 * p - k) // s + 1
        ow = (w + 2 * p - k) // s + 1
        patches = jnp.asarray(
            rng.uniform(-1, 1, (2, oh * ow, c * k * k)).astype(np.float32))

        def extract(img):
            return extract_patches(img, k, s, p)

        zero = jnp.zeros((2, h, w, c), jnp.float32)
        _, vjp = jax.vjp(extract, zero)
        want = vjp(patches)[0]
        got = _fold_patches_blocked(patches, hw, c, k, s, p)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)
