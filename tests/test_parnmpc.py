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
  3. the switching-constraint hard error (round-1 silent-zero defect).
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


def test_parnmpc_switching_constraint_hard_error(anymal):
    """Round-1 defect: switching rows were silently zeroed on the parallel
    path. Now a schedule with touchdown constraints must raise."""
    import dataclasses

    from idocp_tpu.cost.components import ConfigurationSpaceCost
    from idocp_tpu.hybrid.schedule import static_schedule
    from idocp_tpu.models import anymal as anymal_mod
    from idocp_tpu.robot import kinematics
    from idocp_tpu.robot.contact import ContactModel
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
    sw = np.zeros((N, 4), dtype=bool)
    sw[1, 0] = True
    sched = dataclasses.replace(sched, sw_contact=jnp.asarray(sw))
    solver = ParNMPCSolver(m, cm, cost, [], T=0.08, N=N)
    solver.set_solution(q0, jnp.zeros(m.nv), schedule=sched)
    solver.init_constraints(sched)
    with pytest.raises(ValueError, match="switching"):
        solver.update_solution(0.0, q0, jnp.zeros(m.nv), sched)
