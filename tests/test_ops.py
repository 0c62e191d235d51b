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
