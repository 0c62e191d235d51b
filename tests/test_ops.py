"""Pallas kernel correctness (interpreter mode on the CPU suite):
ops.chol.chol_tri_inv vs the XLA cholesky + triangular-solve chain."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from idocp_tpu.ops import chol_tri_inv


@pytest.mark.parametrize("n,B", [(12, 8), (18, 130)])
def test_chol_tri_inv_matches_xla(n, B):
    key = jax.random.PRNGKey(0)
    X = jax.random.normal(key, (B, n, n))
    A = X @ jnp.swapaxes(X, 1, 2) / n + 2.0 * jnp.eye(n)
    A = A.astype(jnp.float32)
    Li = chol_tri_inv(A, interpret=True)
    L = jnp.linalg.cholesky(A)
    eye = jnp.broadcast_to(jnp.eye(n, dtype=jnp.float32), A.shape)
    Li_ref = jax.vmap(lambda Lk: jax.scipy.linalg.solve_triangular(
        Lk, eye[0], lower=True))(L)
    np.testing.assert_allclose(np.asarray(Li), np.asarray(Li_ref),
                               rtol=2e-4, atol=2e-5)
    # inverse property: Li A Li^T = I
    I_rec = Li @ A @ jnp.swapaxes(Li, 1, 2)
    np.testing.assert_allclose(np.asarray(I_rec),
                               np.asarray(eye), atol=5e-4)


@pytest.mark.parametrize("n", [3, 12, 18])
def test_smallchol_unrolled_matches_numpy(n):
    """Unrolled Cholesky/tri-inv (ops/smallchol, the production backend)
    against numpy, in every usage pattern the solver exercises: direct
    leading-batch, single matrix, vmap, and nested vmap."""
    from idocp_tpu.ops import smallchol
    key = jax.random.PRNGKey(1)
    X = jax.random.normal(key, (6, n, n))
    A = X @ jnp.swapaxes(X, 1, 2) / n + 2.0 * jnp.eye(n)
    L_ref = np.linalg.cholesky(np.asarray(A))
    Li_ref = np.stack([np.linalg.inv(l) for l in L_ref])
    np.testing.assert_allclose(np.asarray(smallchol.chol(A)), L_ref,
                               atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(smallchol.tri_inv(jnp.asarray(L_ref))), Li_ref,
        atol=1e-10)
    np.testing.assert_allclose(np.asarray(smallchol.chol_tri_inv(A)),
                               Li_ref, atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(smallchol.chol_tri_inv(A[0])), Li_ref[0], atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(jax.jit(jax.vmap(smallchol.chol_tri_inv))(A)), Li_ref,
        atol=1e-10)
    A2 = A.reshape(2, 3, n, n)
    np.testing.assert_allclose(
        np.asarray(jax.jit(jax.vmap(jax.vmap(smallchol.chol_tri_inv)))(
            A2)).reshape(6, n, n), Li_ref, atol=1e-10)


def test_smallchol_nan_on_indefinite():
    """chol_rescue's Levenberg ladder relies on NaN propagation for
    non-SPD inputs — the unrolled path must match jnp.linalg.cholesky's
    NaN semantics."""
    from idocp_tpu.ops import smallchol
    bad = -jnp.eye(4)
    assert np.isnan(np.asarray(smallchol.chol(bad))).any()
    assert np.isnan(np.asarray(smallchol.chol_tri_inv(bad))).any()


def test_smallchol_xla_fallback_above_cap():
    """Above UNROLL_MAX the dispatch must fall back to the XLA custom
    call (unrolling n=40 would explode compile time)."""
    from idocp_tpu.ops import smallchol
    n = smallchol.UNROLL_MAX + 4
    key = jax.random.PRNGKey(2)
    X = jax.random.normal(key, (2, n, n))
    A = X @ jnp.swapaxes(X, 1, 2) / n + 2.0 * jnp.eye(n)
    Li_ref = np.stack([np.linalg.inv(np.linalg.cholesky(a))
                       for a in np.asarray(A)])
    np.testing.assert_allclose(np.asarray(smallchol.chol_tri_inv(A)),
                               Li_ref, atol=1e-9)
