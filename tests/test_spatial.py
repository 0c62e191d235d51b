"""Two-algorithm cross-checks for the dense world-frame spatial dynamics
(robot/spatial.py) against the recursion+autodiff path (robot/dynamics.py,
robot/kinematics.py) — the SURVEY.md §4 oracle pattern. Every analytic
derivative must match forward-mode autodiff to fp64 precision on both the
fixed-base (iiwa) and floating-base (anymal) fixtures.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from idocp_tpu.robot import dynamics, kinematics, spatial
from idocp_tpu.robot import model as model_mod

FRAMES = {"iiwa": (0,), "anymal": (0, 1, 2, 3)}


def _rand_state(model, seed=0):
    key = jax.random.PRNGKey(seed)
    q = model_mod.random_configuration(model, key)
    v = 0.7 * jax.random.normal(jax.random.fold_in(key, 1), (model.nv,))
    a = 0.9 * jax.random.normal(jax.random.fold_in(key, 2), (model.nv,))
    return q, v, a


def _frames(model):
    return FRAMES["anymal" if model.has_floating_base else "iiwa"]


def _forces(model, seed=3):
    fids = _frames(model)
    key = jax.random.fold_in(jax.random.PRNGKey(seed), 7)
    return fids, 5.0 * jax.random.normal(key, (len(fids), 3))


def test_tau_matches_recursive(robot_model):
    m = robot_model
    q, v, a = _rand_state(m)
    fids, fw = _forces(m)
    f = spatial.fk(m, q)
    p_f, fb = spatial.frame_points(m, f, fids)
    fext = spatial.contact_forces_to_body(m, p_f, fb, fw, m.nbodies)
    mo = spatial.motion(m, f, v, a, derivatives=False)
    tau, _, _ = spatial.rnea(m, f, mo, fext)
    tau_ref = dynamics.rnea(m, q, v, a, fids, fw)
    np.testing.assert_allclose(np.asarray(tau), np.asarray(tau_ref),
                               rtol=1e-9, atol=1e-9)


def test_tau_no_gravity(robot_model):
    m = robot_model
    q, v, a = _rand_state(m, 1)
    f = spatial.fk(m, q)
    mo = spatial.motion(m, f, jnp.zeros(m.nv), a, derivatives=False,
                        no_gravity=True)
    tau, _, _ = spatial.rnea(m, f, mo)
    tau_ref = dynamics.rnea(m, q, jnp.zeros(m.nv), a, no_gravity=True)
    np.testing.assert_allclose(np.asarray(tau), np.asarray(tau_ref),
                               rtol=1e-9, atol=1e-9)


def test_mass_matrix_matches(robot_model):
    m = robot_model
    q, _, _ = _rand_state(m, 2)
    f = spatial.fk(m, q)
    M = spatial.mass_matrix(m, f)
    M_ref = dynamics.mass_matrix(m, q)
    np.testing.assert_allclose(np.asarray(M), np.asarray(M_ref),
                               rtol=1e-9, atol=1e-9)


def test_point_jacobians_match(robot_model):
    m = robot_model
    q, _, _ = _rand_state(m, 3)
    fids = _frames(m)
    f = spatial.fk(m, q)
    p_f, fb = spatial.frame_points(m, f, fids)
    J = spatial.point_jacobians(m, f, p_f, fb)
    J_ref = dynamics.contact_velocity_jacobian(m, q, fids)
    np.testing.assert_allclose(
        np.asarray(J).reshape(3 * len(fids), m.nv), np.asarray(J_ref),
        rtol=1e-9, atol=1e-9)


def test_rnea_derivatives_match_autodiff(robot_model):
    m = robot_model
    q, v, a = _rand_state(m, 4)
    fids, fw = _forces(m, 5)
    f = spatial.fk(m, q)
    p_f, fb = spatial.frame_points(m, f, fids)
    J = spatial.point_jacobians(m, f, p_f, fb)
    fext = spatial.contact_forces_to_body(m, p_f, fb, fw, m.nbodies)
    dfext_q = spatial.contact_forces_dq(m, J, fb, fw, m.nbodies)
    mo = spatial.motion(m, f, v, a)
    _, _, F = spatial.rnea(m, f, mo, fext)
    dq, dv = spatial.rnea_derivatives(m, f, mo, F, dfext_q)
    dq_ref, dv_ref, _ = dynamics.rnea_derivatives(m, q, v, a, fids, fw)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_ref),
                               rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_ref),
                               rtol=1e-8, atol=1e-8)


def test_rnea_derivatives_no_gravity_vzero(robot_model):
    """The impulse-sweep configuration: v = 0, gravity off, forces on."""
    m = robot_model
    q, _, a = _rand_state(m, 6)
    fids, fw = _forces(m, 8)
    zero = jnp.zeros(m.nv)
    f = spatial.fk(m, q)
    p_f, fb = spatial.frame_points(m, f, fids)
    J = spatial.point_jacobians(m, f, p_f, fb)
    fext = spatial.contact_forces_to_body(m, p_f, fb, fw, m.nbodies)
    dfext_q = spatial.contact_forces_dq(m, J, fb, fw, m.nbodies)
    mo = spatial.motion(m, f, zero, a, no_gravity=True)
    _, _, F = spatial.rnea(m, f, mo, fext)
    dq, _ = spatial.rnea_derivatives(m, f, mo, F, dfext_q)

    def ref(e):
        return dynamics.rnea(m, model_mod.integrate(m, q, e), zero, a,
                             fids, fw, no_gravity=True)

    dq_ref = jax.jacfwd(ref)(zero)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_ref),
                               rtol=1e-8, atol=1e-8)


def test_point_pva_matches(robot_model):
    m = robot_model
    q, v, a = _rand_state(m, 7)
    fids = _frames(m)
    f = spatial.fk(m, q)
    p_f, fb = spatial.frame_points(m, f, fids)
    mo = spatial.motion(m, f, v, a, derivatives=False)
    pos, vel, acc = spatial.point_pva(f, mo, p_f, fb)
    pos_r, vel_r, acc_r = kinematics.frame_pva(m, q, v, a, fids)
    np.testing.assert_allclose(np.asarray(pos), np.asarray(pos_r),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(vel), np.asarray(vel_r),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(acc), np.asarray(acc_r),
                               rtol=1e-8, atol=1e-8)


def _mixed_model():
    """Floating base + revolute + PRISMATIC chain: exercises the
    prismatic branches of spatial/kinematics, untested by the iiwa/anymal
    fixtures (all-revolute)."""
    from idocp_tpu.robot.model import (FREE, PRISMATIC, REVOLUTE,
                                       ModelBuilder)
    b = ModelBuilder("mixed")
    base = b.add_body("base", -1, FREE, mass=3.0, com=(0.02, 0.0, 0.05),
                      inertia=0.05 * np.eye(3))
    l1 = b.add_body("l1", base, REVOLUTE, placement_pos=(0.2, 0.1, 0.0),
                    placement_rpy=(0.2, 0.0, 0.1), axis=(0.0, 1.0, 0.0),
                    mass=1.0, com=(0.0, 0.0, -0.1),
                    inertia=0.01 * np.eye(3))
    l2 = b.add_body("l2", l1, PRISMATIC, placement_pos=(0.0, 0.0, -0.25),
                    placement_rpy=(0.0, 0.3, 0.0), axis=(0.0, 0.0, 1.0),
                    mass=0.7, com=(0.0, 0.01, -0.05),
                    inertia=0.005 * np.eye(3))
    l3 = b.add_body("l3", l2, REVOLUTE, placement_pos=(0.05, 0.0, -0.2),
                    axis=(1.0, 0.0, 0.0), mass=0.4,
                    inertia=0.002 * np.eye(3))
    b.add_frame("tip", l3, pos=(0.0, 0.0, -0.15))
    return b.build()


def test_mixed_prismatic_model_cross_checks():
    """tau / M / J / rnea-derivative / point-pva parity on a model with a
    prismatic joint (two-algorithm cross-check, mirroring the fixture
    tests)."""
    m = _mixed_model()
    q, v, a = _rand_state(m, 21)
    fids = (0,)
    key = jax.random.fold_in(jax.random.PRNGKey(22), 1)
    fw = 3.0 * jax.random.normal(key, (1, 3))

    f = spatial.fk(m, q)
    p_f, fb = spatial.frame_points(m, f, fids)
    J = spatial.point_jacobians(m, f, p_f, fb)
    fext = spatial.contact_forces_to_body(m, p_f, fb, fw, m.nbodies)
    dfext_q = spatial.contact_forces_dq(m, J, fb, fw, m.nbodies)
    mo = spatial.motion(m, f, v, a)
    tau, _, F = spatial.rnea(m, f, mo, fext)
    np.testing.assert_allclose(
        np.asarray(tau), np.asarray(dynamics.rnea(m, q, v, a, fids, fw)),
        rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(spatial.mass_matrix(m, f)),
        np.asarray(dynamics.mass_matrix(m, q)), rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(J).reshape(3, m.nv),
        np.asarray(dynamics.contact_velocity_jacobian(m, q, fids)),
        rtol=1e-9, atol=1e-10)
    dq, dv = spatial.rnea_derivatives(m, f, mo, F, dfext_q)
    dq_ref, dv_ref, _ = dynamics.rnea_derivatives(m, q, v, a, fids, fw)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_ref),
                               rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_ref),
                               rtol=1e-8, atol=1e-8)
    pos, vel, acc = spatial.point_pva(f, mo, p_f, fb)
    pr, vr, ar = kinematics.frame_pva(m, q, v, a, fids)
    np.testing.assert_allclose(np.asarray(acc), np.asarray(ar),
                               rtol=1e-8, atol=1e-8)


def test_se3_right_jacobian_matches_autodiff():
    """Closed-form SE(3) right Jacobian (lie.se3_jr, Barfoot Q-matrix)
    vs forward-mode autodiff, large and near-zero twists."""
    from idocp_tpu.robot import lie

    def jr_ref(xi):
        def f(d):
            q1, p1 = lie.se3_exp(xi + d)
            q0, p0 = lie.se3_exp(xi)
            return lie.se3_difference(q0, p0, q1, p1)
        return jax.jacfwd(f)(jnp.zeros(6))

    key = jax.random.PRNGKey(3)
    for scale in (1.0, 0.3, 1e-4):
        xi = scale * jax.random.normal(jax.random.fold_in(key, int(1e6 *
                                                                   scale)),
                                       (6,))
        np.testing.assert_allclose(np.asarray(lie.se3_jr(xi)),
                                   np.asarray(jr_ref(xi)),
                                   rtol=1e-9, atol=1e-11)


def test_transition_blocks_match_autodiff(robot_model):
    """Closed-form row-scaled state-equation + switching blocks
    (state_equation.transition_blocks / stage._state_eq_switching_blocks)
    vs the forward-mode oracle (_state_eq_switching_blocks_ad)."""
    from idocp_tpu.ocp import stage as stage_mod
    from idocp_tpu.robot.contact import ContactModel

    m = robot_model
    fids = _frames(m)
    cm = ContactModel(frame_ids=fids, kp=25.0, kd=10.0)
    q, v, a = _rand_state(m, 11)
    key = jax.random.PRNGKey(12)
    q_next = model_mod.integrate(
        m, q, 0.05 * jax.random.normal(key, (m.nv,)))
    v_next = v + 0.1 * jax.random.normal(jax.random.fold_in(key, 1),
                                         (m.nv,))
    sw_contact = jnp.asarray([True] * len(fids))
    sw_pos = 0.1 * jax.random.normal(jax.random.fold_in(key, 2),
                                     (len(fids), 3))
    dt = 0.025
    out_cf = stage_mod._state_eq_switching_blocks(
        m, cm, dt, q, v, a, q_next, v_next, sw_contact, sw_pos)
    out_ad = stage_mod._state_eq_switching_blocks_ad(
        m, cm, dt, q, v, a, q_next, v_next, sw_contact, sw_pos)
    names = ("Aq_q", "Aq_v", "Aq_a", "rq_s", "rv0", "h", "Cq", "Cv",
             "Ca", "mask3")
    for name, cf, ad in zip(names, out_cf, out_ad):
        np.testing.assert_allclose(
            np.asarray(cf), np.asarray(ad), rtol=1e-8, atol=1e-9,
            err_msg=name)


def test_point_pva_derivatives_match_autodiff(robot_model):
    m = robot_model
    q, v, a = _rand_state(m, 8)
    fids = _frames(m)
    nc = len(fids)
    f = spatial.fk(m, q)
    p_f, fb = spatial.frame_points(m, f, fids)
    J = spatial.point_jacobians(m, f, p_f, fb)
    mo = spatial.motion(m, f, v, a)
    dvel_q, dvel_v, dacc_q, dacc_v = spatial.point_pva_derivatives(
        f, mo, p_f, fb, J)

    zero = jnp.zeros(m.nv)

    def pva(e, vv):
        return kinematics.frame_pva(m, model_mod.integrate(m, q, e), vv, a,
                                    fids)

    d_q = jax.jacfwd(lambda e: pva(e, v))(zero)
    d_v = jax.jacfwd(lambda vv: pva(zero, vv))(v)
    np.testing.assert_allclose(np.asarray(dvel_q), np.asarray(d_q[1]),
                               rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(np.asarray(dvel_v), np.asarray(d_v[1]),
                               rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(np.asarray(dacc_q), np.asarray(d_q[2]),
                               rtol=1e-7, atol=1e-7)
    np.testing.assert_allclose(np.asarray(dacc_v), np.asarray(d_v[2]),
                               rtol=1e-8, atol=1e-8)
