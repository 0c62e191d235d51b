"""Dynamics-core oracle tests (SURVEY.md §4.2 pattern, physics identities
replacing the unavailable Pinocchio oracle — DESIGN.md correctness strategy)."""
import jax
import jax.numpy as jnp
import numpy as np

from idocp_tpu.robot import dynamics, kinematics
from idocp_tpu.robot import model as model_mod


def rand_qva(m, seed=0):
    key = jax.random.PRNGKey(seed)
    q = model_mod.random_configuration(m, key)
    v = jax.random.normal(jax.random.fold_in(key, 1), (m.nv,))
    a = jax.random.normal(jax.random.fold_in(key, 2), (m.nv,))
    return q, v, a


def test_gravity_torque_is_pe_gradient(robot_model):
    """RNEA(q, 0, 0) == dPE/dq (tangent-space gradient)."""
    m = robot_model
    q, _, _ = rand_qva(m, 0)
    tau_g = dynamics.rnea(m, q, jnp.zeros(m.nv), jnp.zeros(m.nv))
    g = model_mod.tangent_jacobian(
        lambda qq: kinematics.potential_energy(m, qq), m, q)
    np.testing.assert_allclose(np.asarray(tau_g), np.asarray(g), atol=1e-9)


def test_mass_matrix_crba_vs_rnea(robot_model):
    """Two independent algorithms for M(q) must agree."""
    m = robot_model
    q, _, _ = rand_qva(m, 1)
    M1 = dynamics.mass_matrix(m, q)
    M2 = dynamics.crba(m, q)
    np.testing.assert_allclose(np.asarray(M1), np.asarray(M2), atol=1e-9)
    # symmetry + positive definiteness
    np.testing.assert_allclose(np.asarray(M1), np.asarray(M1).T, atol=1e-9)
    assert np.all(np.linalg.eigvalsh(np.asarray(M1)) > 0)


def test_rnea_decomposition(robot_model):
    """RNEA(q,v,a) == M(q) a + RNEA(q,v,0)."""
    m = robot_model
    q, v, a = rand_qva(m, 2)
    lhs = dynamics.rnea(m, q, v, a)
    rhs = dynamics.mass_matrix(m, q) @ a + dynamics.rnea(
        m, q, v, jnp.zeros(m.nv))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-8)


def test_power_balance(robot_model):
    """v^T tau == d/dt (KE + PE) along (qdot=v, vdot=a)."""
    m = robot_model
    q, v, a = rand_qva(m, 3)
    tau = dynamics.rnea(m, q, v, a)
    zero = jnp.zeros(m.nv)

    def energy(e, vv):
        qq = model_mod.integrate(m, q, e)
        return (dynamics.kinetic_energy(m, qq, vv)
                + kinematics.potential_energy(m, qq))

    _, de = jax.jvp(energy, (zero, v), (v, a))
    np.testing.assert_allclose(float(v @ tau), float(de), rtol=1e-8)


def test_external_force_is_jacobian_transpose(anymal):
    """RNEA(..., f) == RNEA(...) - sum J_i^T f_i (backward-pass application
    vs explicit frame Jacobians — reference: Robot::setContactForces)."""
    m = anymal
    q, v, a = rand_qva(m, 4)
    fids = tuple(range(4))
    key = jax.random.PRNGKey(9)
    f = jax.random.normal(key, (4, 3))
    tau_f = dynamics.rnea(m, q, v, a, contact_frames=fids, f_world=f)
    tau = dynamics.rnea(m, q, v, a)
    J = kinematics.frame_linear_jacobians(m, q, fids)  # (4, 3, nv)
    jtf = jnp.einsum("cin,ci->n", J, f)
    np.testing.assert_allclose(
        np.asarray(tau_f), np.asarray(tau - jtf), atol=1e-8)


def test_rnea_derivatives_vs_fd(robot_model):
    m = robot_model
    q, v, a = rand_qva(m, 5)
    fids = tuple(range(min(2, len(m.frame_names))))
    f = 5.0 * jnp.ones((len(fids), 3))
    dq, dv, da = dynamics.rnea_derivatives(m, q, v, a, fids, f)
    eps = 1e-6
    rnea_j = jax.jit(lambda qq, vv, aa: dynamics.rnea(m, qq, vv, aa, fids, f))
    integ_j = jax.jit(lambda qq, e: model_mod.integrate(m, qq, e))

    def idfun(qq, vv, aa):
        return np.asarray(rnea_j(qq, vv, aa))

    for i in range(m.nv):
        e = np.zeros(m.nv)
        e[i] = eps
        ej = jnp.asarray(e)
        fd_q = (idfun(integ_j(q, ej), v, a)
                - idfun(integ_j(q, -ej), v, a)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(dq[:, i]), fd_q, atol=1e-5)
        fd_v = (idfun(q, v + ej, a) - idfun(q, v - ej, a)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(dv[:, i]), fd_v, atol=1e-5)
        fd_a = (idfun(q, v, a + ej) - idfun(q, v, a - ej)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(da[:, i]), fd_a, atol=1e-5)


def test_free_fall_com_acceleration(anymal):
    """Passive rows solve: unforced floating robot's COM accelerates at g."""
    m = anymal
    key = jax.random.PRNGKey(7)
    q = model_mod.random_configuration(m, key)
    v = jnp.zeros(m.nv)
    # solve M a = -h for a (free fall, no actuation)
    M = dynamics.mass_matrix(m, q)
    h = dynamics.nonlinear_effects(m, q, v)
    a = jnp.linalg.solve(M, -h)
    # COM acceleration via second-order kinematics
    zero = jnp.zeros(m.nv)

    def com_vel(e, vv):
        _, cv = jax.jvp(
            lambda e2: kinematics.com(m, model_mod.integrate(
                m, model_mod.integrate(m, q, e), e2)), (zero,), (vv,))
        return cv

    _, com_acc = jax.jvp(com_vel, (zero, v), (v, a))
    np.testing.assert_allclose(np.asarray(com_acc), np.asarray(m.gravity),
                               atol=1e-8)


def test_frame_velocity_acceleration_consistency(anymal):
    m = anymal
    q, v, a = rand_qva(m, 8)
    fids = (0, 2)
    vel = kinematics.frame_velocities(m, q, v, fids)
    J = kinematics.frame_linear_jacobians(m, q, fids)
    np.testing.assert_allclose(
        np.asarray(vel), np.asarray(jnp.einsum("cin,n->ci", J, v)), atol=1e-9)
    # acceleration by FD of velocity along the flow
    acc = kinematics.frame_accelerations(m, q, v, a, fids)
    dt = 1e-6
    qp = model_mod.integrate(m, q, dt * v)
    vp = v + dt * a
    qm = model_mod.integrate(m, q, -dt * v)
    vm = v - dt * a
    acc_fd = (np.asarray(kinematics.frame_velocities(m, qp, vp, fids))
              - np.asarray(kinematics.frame_velocities(m, qm, vm, fids))
              ) / (2 * dt)
    np.testing.assert_allclose(np.asarray(acc), acc_fd, atol=1e-5)


def test_rnea_level_batched_vs_unrolled(robot_model):
    """Two-algorithm cross-check: the level-batched hot-path RNEA (O(depth)
    graph) must match the body-unrolled oracle, with and without external
    contact forces (SURVEY.md §4 two-algorithm pattern)."""
    m = robot_model
    key = jax.random.PRNGKey(11)
    q = model_mod.random_configuration(m, key)
    v = jax.random.normal(jax.random.fold_in(key, 1), (m.nv,))
    a = jax.random.normal(jax.random.fold_in(key, 2), (m.nv,))
    t1 = dynamics.rnea(m, q, v, a)
    t2 = dynamics.rnea_unrolled(m, q, v, a)
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2),
                               rtol=1e-10, atol=1e-10)
    if len(m.frame_names):
        fids = tuple(range(len(m.frame_names)))
        fw = jax.random.normal(jax.random.fold_in(key, 3), (len(fids), 3))
        t1 = dynamics.rnea(m, q, v, a, fids, fw)
        t2 = dynamics.rnea_unrolled(m, q, v, a, fids, fw)
        np.testing.assert_allclose(np.asarray(t1), np.asarray(t2),
                                   rtol=1e-10, atol=1e-10)


def test_rnea_no_gravity_identity(robot_model):
    """RNEA(q,0,a) − RNEA(q,0,0) == no-gravity RNEA(q,0,a) — the identity
    the impulse implicit-derivative sweep relies on."""
    m = robot_model
    key = jax.random.PRNGKey(12)
    q = model_mod.random_configuration(m, key)
    z = jnp.zeros(m.nv)
    a = jax.random.normal(jax.random.fold_in(key, 1), (m.nv,))
    lhs = dynamics.rnea(m, q, z, a) - dynamics.rnea(m, q, z, z)
    rhs = dynamics.rnea(m, q, z, a, no_gravity=True)
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs),
                               rtol=1e-8, atol=1e-10)
