"""Closed-loop MPC tests: receding horizon with events entering/leaving,
batched with per-scenario gait phases (reference: the ANYmal MPC examples
ARE the product — idocp examples/anymal/mpc_benchmark.cpp, SURVEY.md §3.3;
VERDICT r2 next-items #5).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from idocp_tpu.constraints.components import (
    FrictionCone, ImpulseFrictionCone, ImpulseNormalForce,
    JointTorquesLowerLimit, JointTorquesUpperLimit)
from idocp_tpu.cost.components import ConfigurationSpaceCost
from idocp_tpu.models import anymal
from idocp_tpu.parallel.batch import batch_solution
from idocp_tpu.robot import kinematics
from idocp_tpu.robot.contact import ContactModel
from idocp_tpu.solver.mpc import MPC, BatchedMPC, TrotGait
from idocp_tpu.solver.ocp_solver import OCPSolver
from idocp_tpu.solver.options import SolverOptions


def _make_solver(anymal_model, N=8, T=0.4, impulse_cons=False,
                 dtype=jnp.float64):
    m = anymal_model
    cm = ContactModel(frame_ids=(0, 1, 2, 3), kp=25.0, kd=10.0)
    q0 = anymal.standing_configuration(m, dtype=dtype)
    cost = [ConfigurationSpaceCost(
        q_weight=jnp.asarray([0.0] * 3 + [10.0] * 3 + [1.0] * 12, dtype),
        v_weight=jnp.ones(18, dtype),
        a_weight=1e-3 * jnp.ones(18, dtype),
        u_weight=1e-2 * jnp.ones(12, dtype),
        qf_weight=jnp.asarray([0.0] * 3 + [10.0] * 3 + [1.0] * 12, dtype),
        vf_weight=jnp.ones(18, dtype), q_ref=q0)]
    cons = [JointTorquesLowerLimit(m), JointTorquesUpperLimit(m),
            FrictionCone(m, nc=4, mu=0.7)]
    if impulse_cons:
        cons += [ImpulseFrictionCone(m, nc=4, mu=0.7),
                 ImpulseNormalForce(m, nc=4)]
    options = SolverOptions(barrier=1e-3)
    solver = OCPSolver(m, cm, cost, cons, T=T, N=N, options=options,
                      dtype=dtype)
    return solver, q0


def test_closed_loop_batched_mpc_per_scenario_gaits(anymal):
    """>=5 control periods, events entering/leaving the horizon, B=3
    scenarios with phase-shifted gaits through the (native when available)
    batched discretizer. Finite costs + bounded direction norm across
    steps; schedules genuinely differ across the batch."""
    B = 3
    solver, q0 = _make_solver(anymal, N=8, T=0.4)
    feet = np.asarray(kinematics.frame_positions(anymal, q0, (0, 1, 2, 3)))
    gait = TrotGait(swing_time=0.15, double_support_time=0.05,
                    t_start=0.1)
    mpc = BatchedMPC(solver, gait, feet, phase_offsets=[0.0, 0.07, 0.13])

    sched0 = mpc.schedules_at(0.0)
    assert sched0.dt.shape[0] == B
    # phase offsets must produce genuinely different schedules
    assert not np.array_equal(np.asarray(sched0.imp_mask[0]),
                              np.asarray(sched0.imp_mask[1]))

    solver.set_solution(q0, jnp.zeros(anymal.nv),
                        schedule=jax.tree_util.tree_map(
                            lambda x: x[0], sched0))
    solver.init_constraints(jax.tree_util.tree_map(lambda x: x[0], sched0))
    sol_b = batch_solution(solver.solution, B)
    q_b = jnp.tile(q0[None], (B, 1))
    v_b = jnp.zeros((B, anymal.nv))

    dirnorms = []
    for k in range(6):
        t = 0.05 * k
        sol_b, u0_b, stats = mpc.step(t, sol_b, q_b, v_b)
        assert bool(jnp.isfinite(stats.cost).all()), f"step {k}"
        assert bool(jnp.isfinite(u0_b).all())
        dirnorms.append(np.asarray(stats.kkt_direction_norm))
    # warm-started receding horizon must not blow up
    assert np.max(dirnorms[-1]) < 10.0 * max(np.max(dirnorms[0]), 1.0)


def test_impulse_constraints_on_trot(anymal):
    """Impulse friction cone + normal-force positivity on Λ (reference:
    impulse constraint variants, SURVEY.md §2): slack/dual live under the
    component names, the solve stays finite, the KKT error decreases, and
    the gated cone holds at the final iterate."""
    from idocp_tpu.ocp.state_equation import impulse_map
    solver, q0 = _make_solver(anymal, N=8, T=0.4, impulse_cons=True)
    feet = np.asarray(kinematics.frame_positions(anymal, q0, (0, 1, 2, 3)))
    gait = TrotGait(swing_time=0.15, double_support_time=0.05, t_start=0.1)
    mpc = MPC(solver, gait, feet)
    sched = mpc.schedule_at(0.05)
    assert bool(np.asarray(sched.imp_mask).any()), "need a touchdown"

    # slight downward base velocity: a real (nonzero) touchdown impulse.
    # At Λ = 0 exactly the quadratic cone is degenerate (∇g = 0), which is
    # the slowest-converging case for the interior point.
    v0 = np.zeros(anymal.nv)
    v0[2] = -0.05
    v0 = jnp.asarray(v0)
    solver.set_solution(q0, v0, schedule=sched)
    solver.init_constraints(sched)
    assert "impulse_friction_cone" in solver.solution.slack
    assert "impulse_normal_force" in solver.solution.slack

    kkts = []
    for _ in range(20):
        stats = solver.update_solution(0.05, q0, v0, sched)
        kkts.append(float(stats.kkt_error))
        assert np.isfinite(float(stats.cost))
    assert np.all(np.isfinite(kkts))
    # the degenerate cone makes this a slow solve; require overall decrease
    assert kkts[-1] < 0.5 * kkts[0], kkts

    # cone satisfied to interior-point tolerance at the impulse stage
    sol = solver.solution
    cm = solver.cm
    k_imp = int(np.argmax(np.asarray(sched.imp_mask)))
    _, lam = impulse_map(anymal, cm, sol.q[k_imp], sol.v[k_imp],
                         sched.imp_contact[k_imp])
    lc = np.asarray(lam).reshape(4, 3)
    gate = np.asarray(sched.imp_contact[k_imp])
    tol = 1e-2  # impulse-squared units; barrier=1e-3 fixed (no mu schedule)
    for i in range(4):
        if gate[i]:
            assert lc[i, 2] >= -tol
            assert (lc[i, 0] ** 2 + lc[i, 1] ** 2
                    <= 0.49 * lc[i, 2] ** 2 + tol)


def test_parnmpc_closed_loop_trot(anymal):
    """The parallel-in-time solver drives the SAME receding-horizon trot
    loop as the serial one (VERDICT r3 missing #1: the flagship workload
    now has a parallel-in-time option): finite costs/torques across
    control periods with events entering/leaving the horizon."""
    from idocp_tpu.solver.parnmpc_solver import ParNMPCSolver

    m = anymal
    cm = ContactModel(frame_ids=(0, 1, 2, 3), kp=25.0, kd=10.0)
    q0 = anymal_pkg_standing(m)
    cost = [ConfigurationSpaceCost(
        q_weight=jnp.asarray([0.0] * 3 + [10.0] * 3 + [1.0] * 12),
        v_weight=jnp.ones(18), a_weight=1e-3 * jnp.ones(18),
        u_weight=1e-2 * jnp.ones(12),
        qf_weight=jnp.asarray([0.0] * 3 + [10.0] * 3 + [1.0] * 12),
        vf_weight=jnp.ones(18), q_ref=q0)]
    cons = [JointTorquesLowerLimit(m), JointTorquesUpperLimit(m),
            FrictionCone(m, nc=4, mu=0.7)]
    solver = ParNMPCSolver(m, cm, cost, cons, T=0.4, N=8,
                           options=SolverOptions(barrier=1e-3))
    feet = np.asarray(kinematics.frame_positions(m, q0, (0, 1, 2, 3)))
    gait = TrotGait(swing_time=0.15, double_support_time=0.05, t_start=0.1)
    mpc = MPC(solver, gait, feet)
    sched0 = mpc.schedule_at(0.0)
    solver.set_solution(q0, jnp.zeros(m.nv), schedule=sched0)
    solver.init_constraints(sched0)
    saw_touchdown = False
    for k in range(5):
        t = 0.05 * k
        u0, stats = mpc.step(t, q0, jnp.zeros(m.nv))
        saw_touchdown |= bool(
            np.asarray(mpc.schedule_at(t).sw_contact).any())
        assert np.isfinite(float(stats.cost)), f"step {k}"
        assert bool(jnp.isfinite(u0).all())
    assert saw_touchdown, "horizon never carried a switching constraint"


def anymal_pkg_standing(m):
    from idocp_tpu.models import anymal as anymal_mod
    return anymal_mod.standing_configuration(m)


def test_impulse_slot_overflow_guard(anymal):
    """A schedule with more touchdowns than max_impulse_stages must
    hard-error instead of silently treating the overflow impulses as
    plain stages (VERDICT r3 missing #3 / ADVICE r3 medium)."""
    solver, q0 = _make_solver(anymal, N=12, T=1.2)  # max_impulse_stages=4
    feet = np.asarray(kinematics.frame_positions(anymal, q0, (0, 1, 2, 3)))
    # fast gait: touchdown every 0.1 s -> >4 impulses inside T=1.2
    gait = TrotGait(swing_time=0.08, double_support_time=0.02, t_start=0.05)
    mpc = MPC(solver, gait, feet)
    sched = mpc.schedule_at(0.0)
    n_imp, has_sw = sched.host_counts()
    assert n_imp > solver.max_impulse_stages
    solver.set_solution(q0, jnp.zeros(anymal.nv), schedule=sched)
    with pytest.raises(ValueError, match="impulse stages"):
        solver.update_solution(0.0, q0, jnp.zeros(anymal.nv), sched)
    with pytest.raises(ValueError, match="impulse stages"):
        solver.init_constraints(sched)


def test_switching_row_overflow_guard(anymal):
    """sw_contact can be set independently of imp_mask (hand-built
    schedules via dataclasses.replace); the parallel Riccati keeps only
    max_impulse_stages switching-row stages, so an uncounted overflow
    would silently drop constraint rows — check_schedule must raise on
    the switching-row count too (ADVICE r4 medium)."""
    solver, q0 = _make_solver(anymal, N=12, T=0.6)  # max_impulse_stages=4
    feet = np.asarray(kinematics.frame_positions(anymal, q0, (0, 1, 2, 3)))
    gait = TrotGait(swing_time=0.15, double_support_time=0.05, t_start=0.1)
    sched = MPC(solver, gait, feet).schedule_at(0.05)
    n_imp, _ = sched.host_counts()
    assert n_imp <= solver.max_impulse_stages
    # switching rows on MORE stages than the slot budget, no new impulses
    sw = np.zeros_like(np.asarray(sched.sw_contact))
    sw[: solver.max_impulse_stages + 2, 0] = True
    bad = dataclasses.replace(sched, sw_contact=jnp.asarray(sw))
    solver.set_solution(q0, jnp.zeros(anymal.nv), schedule=sched)
    with pytest.raises(ValueError, match="switching-row"):
        solver.update_solution(0.0, q0, jnp.zeros(anymal.nv), bad)


def test_batched_solver_schedule_guard(anymal):
    """BatchedSolver.update must run the same host-side schedule guard as
    the single-scenario path (ADVICE r4 low: it used to bypass
    check_schedule entirely on exactly the batched MPC/bench path)."""
    from idocp_tpu.parallel.batch import BatchedSolver
    solver, q0 = _make_solver(anymal, N=12, T=1.2)  # max_impulse_stages=4
    feet = np.asarray(kinematics.frame_positions(anymal, q0, (0, 1, 2, 3)))
    gait = TrotGait(swing_time=0.08, double_support_time=0.02, t_start=0.05)
    sched = MPC(solver, gait, feet).schedule_at(0.0)
    assert sched.host_counts()[0] > solver.max_impulse_stages
    solver.set_solution(q0, jnp.zeros(anymal.nv), schedule=sched)
    bs = BatchedSolver(solver, extra_axes=(None,))
    sol_b = batch_solution(solver.solution, 2)
    q_b = jnp.tile(q0[None], (2, 1))
    v_b = jnp.zeros((2, anymal.nv))
    with pytest.raises(ValueError, match="impulse stages"):
        bs.update(sol_b, 0.0, q_b, v_b, sched)


def test_lqr_policy_interpolation_improves_tracking(anymal):
    """Applying the stage-0 Riccati feedback gains at sim rate between
    MPC updates (MPC.step_with_policy; reference: the feedback-policy
    getters of riccati/lqr_policy.hpp) must track the plan better than
    zero-order-hold torques (VERDICT r4 next-item #8). Standing
    stabilization from a perturbed state, 4x sim substeps per control
    period."""
    from idocp_tpu.robot import model as model_mod
    from idocp_tpu.utils.simulation import pinned_contact_step

    m = anymal
    solver_cfg = lambda: _make_solver(m, N=8, T=0.4)
    feet0 = None
    dt_mpc, substeps, n_steps = 0.05, 4, 5
    results = {}
    for law in ("zoh", "lqr"):
        solver, q0 = solver_cfg()
        feet = np.asarray(kinematics.frame_positions(m, q0, (0, 1, 2, 3)))
        # stand-only gait: no events, pure stabilization
        gait = TrotGait(t_start=1e6)
        mpc = MPC(solver, gait, feet)
        sched = mpc.schedule_at(0.0)
        # perturbed start: the MPC has to pull the base back
        dq = jnp.zeros(m.nv).at[2].set(0.03).at[4].set(0.05)
        q = model_mod.integrate(m, q0, dq)
        v = jnp.zeros(m.nv).at[0].set(0.1)
        solver.set_solution(q0, jnp.zeros(m.nv), schedule=sched)
        solver.init_constraints(sched)
        err, t = 0.0, 0.0
        for _ in range(n_steps):
            if law == "lqr":
                u0, policy, _ = mpc.step_with_policy(t, q, v)
            else:
                u0, _ = mpc.step(t, q, v)
                policy = None
            for _ in range(substeps):
                u = policy(q, v) if policy is not None else u0
                q, v = pinned_contact_step(
                    m, solver.cm, q, v, u, jnp.ones(4, bool),
                    jnp.asarray(feet), dt_mpc / substeps)
            t += dt_mpc
            dqe = model_mod.difference(m, q0, q)
            err += float(jnp.sum(dqe * dqe)) + float(jnp.sum(v * v))
        assert np.isfinite(err), law
        results[law] = err
    # feedback interpolation must not track worse than ZOH (and in this
    # perturbed setup it should be strictly better)
    assert results["lqr"] < results["zoh"], results


def test_schedule_host_counts_cached(anymal):
    """Builders attach host-side counts (no device fetch on the hot path);
    tree-mapped schedules fall back to one fetch with the same answer."""
    solver, q0 = _make_solver(anymal, N=8, T=0.4)
    feet = np.asarray(kinematics.frame_positions(anymal, q0, (0, 1, 2, 3)))
    gait = TrotGait(swing_time=0.15, double_support_time=0.05, t_start=0.1)
    sched = MPC(solver, gait, feet).schedule_at(0.05)
    assert getattr(sched, "_n_impulse", None) is not None
    n1 = sched.host_counts()
    rebuilt = jax.tree_util.tree_map(lambda x: x, sched)
    assert getattr(rebuilt, "_n_impulse", None) is None
    assert rebuilt.host_counts() == n1


def test_set_solution_component(anymal):
    """Full setSolution parity (reference: setSolution("q"/"v"/"a"/"f"/"u");
    VERDICT r3 missing #4)."""
    solver, q0 = _make_solver(anymal, N=4, T=0.2)
    solver.set_solution(q0, jnp.zeros(anymal.nv))
    a_row = 0.3 * jnp.ones(anymal.nv)
    solver.set_solution_component("a", a_row)
    np.testing.assert_allclose(np.asarray(solver.solution.a),
                               np.tile(np.asarray(a_row)[None], (4, 1)))
    u_full = jnp.arange(4 * anymal.nu, dtype=solver.dtype
                        ).reshape(4, anymal.nu)
    solver.set_solution_component("u", u_full)
    np.testing.assert_allclose(np.asarray(solver.solution.u),
                               np.asarray(u_full))
    with pytest.raises(KeyError):
        solver.set_solution_component("lmd", a_row)
    with pytest.raises(ValueError):
        solver.set_solution_component("f", jnp.ones(3))


def test_impulse_constraint_component_masking():
    """Rows are feasible-inactive wherever the gate is off."""
    m = None
    comp = ImpulseFrictionCone(m, nc=2, mu=0.5)
    lam = jnp.asarray([1.0, 0.0, 1.0, 3.0, 4.0, 1.0])
    gate = jnp.asarray([1.0, 0.0])
    g, J = comp.evaluate_lam(lam, gate)
    assert g.shape == (2,)
    np.testing.assert_allclose(np.asarray(g)[0], 1.0 - 0.25, rtol=1e-12)
    assert float(g[1]) == -1.0
    assert np.all(np.asarray(J)[1] == 0.0)
    np.testing.assert_allclose(np.asarray(J)[0, :3],
                               [2.0, 0.0, -0.5], rtol=1e-12)
