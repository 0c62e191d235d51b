"""Lie-group op tests: algebraic identities + finite-difference Jacobians."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from idocp_tpu.robot import lie
from idocp_tpu.robot import model as model_mod


def random_quat(key):
    return lie.quat_normalize(jax.random.normal(key, (4,)))


def test_quat_mul_matches_matrix():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    q1, q2 = random_quat(k1), random_quat(k2)
    R = lie.quat_to_matrix(lie.quat_mul(q1, q2))
    np.testing.assert_allclose(
        R, lie.quat_to_matrix(q1) @ lie.quat_to_matrix(q2), atol=1e-12)


def test_quat_rotate_matches_matrix():
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    q = random_quat(k1)
    x = jax.random.normal(k2, (3,))
    np.testing.assert_allclose(
        lie.quat_rotate(q, x), lie.quat_to_matrix(q) @ x, atol=1e-12)


@pytest.mark.parametrize("scale", [1.0, 1e-8, 0.0])
def test_quat_exp_log_roundtrip(scale):
    w = scale * jnp.array([0.3, -0.7, 0.5])
    np.testing.assert_allclose(lie.quat_log(lie.quat_exp(w)), w, atol=1e-10)


@pytest.mark.parametrize("scale", [1.0, 1e-7, 0.0])
def test_se3_exp_log_roundtrip(scale):
    xi = scale * jnp.array([0.3, -0.7, 0.5, 1.2, -0.4, 0.8])
    q, p = lie.se3_exp(xi)
    np.testing.assert_allclose(lie.se3_log(q, p), xi, atol=1e-9)


def test_se3_difference_integrate_inverse():
    k = jax.random.PRNGKey(2)
    k1, k2, k3, k4 = jax.random.split(k, 4)
    q0, p0 = random_quat(k1), jax.random.normal(k2, (3,))
    q1, p1 = random_quat(k3), jax.random.normal(k4, (3,))
    xi = lie.se3_difference(q0, p0, q1, p1)
    q2, p2 = lie.se3_integrate(q0, p0, xi)
    np.testing.assert_allclose(p2, p1, atol=1e-10)
    # quaternion sign ambiguity
    assert min(float(jnp.linalg.norm(q2 - q1)),
               float(jnp.linalg.norm(q2 + q1))) < 1e-10


def test_exp_gradients_finite_at_zero():
    g = jax.jacfwd(lie.se3_exp)(jnp.zeros(6))
    assert all(bool(jnp.all(jnp.isfinite(x))) for x in g)
    g2 = jax.jacfwd(lie.quat_exp)(jnp.zeros(3))
    assert bool(jnp.all(jnp.isfinite(g2)))


def test_model_integrate_difference(robot_model):
    m = robot_model
    key = jax.random.PRNGKey(3)
    q0 = model_mod.random_configuration(m, key)
    q1 = model_mod.random_configuration(m, jax.random.fold_in(key, 1))
    d = model_mod.difference(m, q0, q1)
    q2 = model_mod.integrate(m, q0, d)
    np.testing.assert_allclose(
        model_mod.difference(m, q1, q2), jnp.zeros(m.nv), atol=1e-9)


def test_model_difference_zero(robot_model):
    m = robot_model
    q = model_mod.random_configuration(m, jax.random.PRNGKey(4))
    np.testing.assert_allclose(
        model_mod.difference(m, q, q), jnp.zeros(m.nv), atol=1e-12)


def test_tangent_jacobian_vs_fd(robot_model):
    m = robot_model
    q = model_mod.random_configuration(m, jax.random.PRNGKey(5))

    def fn(qq):
        return model_mod.difference(m, m.neutral_q(), qq)

    J = model_mod.tangent_jacobian(fn, m, q)
    eps = 1e-6
    fn_j = jax.jit(lambda e: fn(model_mod.integrate(m, q, e)))
    Jfd = np.zeros((m.nv, m.nv))
    for i in range(m.nv):
        e = np.zeros(m.nv)
        e[i] = eps
        Jfd[:, i] = (np.asarray(fn_j(jnp.asarray(e)))
                     - np.asarray(fn_j(jnp.asarray(-e)))) / (2 * eps)
    np.testing.assert_allclose(np.asarray(J), Jfd, atol=1e-6)
