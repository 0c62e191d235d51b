"""Solver-level convergence tests (reference pattern: the examples double
as convergence tests, SURVEY.md §4.6; VERDICT r1 missing-item #4).

Covers: iiwa14 unconstrained (f64 + f32), ANYmal standing (contact path),
and the flagship batched f32 ANYmal trot MPC fragment (impulse + switching
stages) — finite costs and decreasing KKT error at fixed iteration budget.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from idocp_tpu.constraints.components import (FrictionCone,
                                              JointTorquesLowerLimit,
                                              JointTorquesUpperLimit)
from idocp_tpu.cost.components import ConfigurationSpaceCost, ImpulseCost
from idocp_tpu.hybrid.schedule import static_schedule
from idocp_tpu.models import anymal, iiwa14
from idocp_tpu.robot import kinematics
from idocp_tpu.robot import model as model_mod
from idocp_tpu.robot.contact import ContactModel
from idocp_tpu.solver.ocp_solver import OCPSolver
from idocp_tpu.solver.options import SolverOptions
from idocp_tpu.solver.unconstr_ocp_solver import UnconstrOCPSolver


def _iiwa_solver(m, dtype, N=8):
    cost = [ConfigurationSpaceCost(
        q_weight=10.0 * jnp.ones(m.nv, dtype),
        v_weight=0.1 * jnp.ones(m.nv, dtype),
        a_weight=0.01 * jnp.ones(m.nv, dtype),
        u_weight=0.001 * jnp.ones(m.nu, dtype),
        qf_weight=10.0 * jnp.ones(m.nv, dtype),
        vf_weight=1.0 * jnp.ones(m.nv, dtype),
        q_ref=jnp.asarray(0.5 * np.ones(m.nq), dtype))]
    cons = [JointTorquesLowerLimit(m), JointTorquesUpperLimit(m)]
    return UnconstrOCPSolver(m, cost, cons, T=0.8, N=N,
                             options=SolverOptions(barrier=1e-3),
                             dtype=dtype)


@pytest.mark.parametrize("dtype,tol", [(jnp.float64, 1e-6),
                                       (jnp.float32, 5e-2)])
def test_iiwa_unconstr_converges(dtype, tol):
    m = iiwa14.make_model(dtype=dtype)
    solver = _iiwa_solver(m, dtype)
    q0 = jnp.asarray(0.1 * np.ones(m.nq), dtype)
    v0 = jnp.zeros(m.nv, dtype)
    solver.set_solution(q0, v0)
    solver.init_constraints()
    stats, history = solver.solve(0.0, q0, v0, max_iterations=25, tol=tol)
    errs = [float(s.kkt_error) for s in history]
    assert np.all(np.isfinite(errs))
    assert errs[-1] < tol, f"KKT history: {errs}"
    # overall decrease by orders of magnitude
    assert errs[-1] < 1e-3 * errs[0]


def test_anymal_standing_converges(anymal):
    m = anymal
    dtype = jnp.float64
    cm = ContactModel(frame_ids=(0, 1, 2, 3), kp=25.0, kd=10.0)
    q0 = anymal_standing = __import__(
        "idocp_tpu.models.anymal", fromlist=["standing_configuration"]
    ).standing_configuration(m)
    feet = np.asarray(kinematics.frame_positions(m, q0, (0, 1, 2, 3)))
    cost = [ConfigurationSpaceCost(
        q_weight=jnp.asarray([0.0] * 3 + [10.0] * 3 + [1.0] * 12, dtype),
        v_weight=jnp.ones(m.nv, dtype),
        a_weight=1e-3 * jnp.ones(m.nv, dtype),
        u_weight=1e-2 * jnp.ones(m.nu, dtype),
        qf_weight=jnp.asarray([0.0] * 3 + [10.0] * 3 + [1.0] * 12, dtype),
        vf_weight=jnp.ones(m.nv, dtype), q_ref=q0)]
    cons = [JointTorquesLowerLimit(m), JointTorquesUpperLimit(m),
            FrictionCone(m, nc=4, mu=0.7)]
    N = 4
    sched = static_schedule(4, N, 0.02, [True] * 4, feet)
    solver = OCPSolver(m, cm, cost, cons, T=0.08, N=N,
                       options=SolverOptions(barrier=1e-3))
    solver.set_solution(q0, jnp.zeros(m.nv))
    solver.init_constraints(sched)
    stats, history = solver.solve(0.0, q0, jnp.zeros(m.nv), sched,
                                  max_iterations=15, tol=1e-6)
    errs = [float(s.kkt_error) for s in history]
    assert np.all(np.isfinite(errs))
    assert errs[-1] < 1e-4 * errs[0], f"KKT history: {errs}"


def test_anymal_trot_f32_batched():
    """The flagship config (BASELINE #4/#5): batched f32 whole-body trot
    MPC with an impulse + switching event in the horizon. VERDICT r1
    'done' criterion: N=20, >=32 scenarios, >=10 warm-started steps,
    finite costs, decreasing KKT error."""
    from idocp_tpu.parallel.batch import BatchedSolver, batch_solution
    from idocp_tpu.solver.mpc import MPC, TrotGait

    dtype = jnp.float32
    m = anymal.make_model(dtype=dtype)
    cm = ContactModel(frame_ids=(0, 1, 2, 3), kp=25.0, kd=10.0)
    q0 = anymal.standing_configuration(m, dtype=dtype)
    feet = np.asarray(kinematics.frame_positions(m, q0, (0, 1, 2, 3)))
    cost = [ConfigurationSpaceCost(
        q_weight=jnp.asarray([0.0] * 3 + [10.0] * 3 + [1.0] * 12, dtype),
        v_weight=jnp.ones(m.nv, dtype),
        a_weight=1e-3 * jnp.ones(m.nv, dtype),
        u_weight=1e-2 * jnp.ones(m.nu, dtype),
        qf_weight=jnp.asarray([0.0] * 3 + [10.0] * 3 + [1.0] * 12, dtype),
        vf_weight=jnp.ones(m.nv, dtype), q_ref=q0)]
    cons = [JointTorquesLowerLimit(m), JointTorquesUpperLimit(m),
            FrictionCone(m, nc=4, mu=0.7)]
    imp = ImpulseCost(dv_weight=1.0 * jnp.ones(m.nv, dtype),
                      lam_weight=1e-3 * jnp.ones(cm.max_dimf, dtype))
    solver = OCPSolver(m, cm, cost, cons, T=0.5, N=20,
                       options=SolverOptions(barrier=1e-3),
                       dtype=dtype, impulse_cost=imp)
    mpc = MPC(solver, TrotGait(t_start=0.1), feet)
    sched = mpc.schedule_at(0.05)
    solver.set_solution(q0, jnp.zeros(m.nv, dtype), schedule=sched)
    solver.init_constraints(sched)

    BATCH = 32
    key = jax.random.PRNGKey(0)
    sol_b = batch_solution(solver.solution, BATCH)
    dq = 0.02 * jax.random.normal(key, (BATCH, m.nv), dtype)
    q_b = jax.vmap(lambda d: model_mod.integrate(m, q0, d))(dq)
    v_b = 0.05 * jax.random.normal(jax.random.fold_in(key, 1),
                                   (BATCH, m.nv), dtype)
    bs = BatchedSolver(solver, extra_axes=(None,))

    kkt0 = None
    for it in range(10):
        sol_b, stats = bs.update(sol_b, 0.05, q_b, v_b, sched)
        cost_arr = np.asarray(stats.cost)
        kkt_arr = np.asarray(stats.kkt_error)
        assert np.isfinite(cost_arr).all(), f"non-finite cost at iter {it}"
        assert np.isfinite(kkt_arr).all(), f"non-finite KKT at iter {it}"
        if kkt0 is None:
            kkt0 = kkt_arr
    # KKT error decreased markedly across the warm-started iterations
    assert np.mean(kkt_arr) < 0.2 * np.mean(kkt0), \
        f"KKT mean {np.mean(kkt0):.4g} -> {np.mean(kkt_arr):.4g}"


def test_batched_solve_to_tolerance():
    """Jitted masked per-scenario Newton loop (VERDICT r3 missing #3 /
    next-item #5): every scenario converges below tol inside ONE jitted
    while_loop, and scenarios at different distances from the solution
    take different iteration counts."""
    from idocp_tpu.parallel.batch import BatchedSolver, batch_solution

    m = iiwa14.make_model()
    solver = _iiwa_solver(m, jnp.float64, N=6)
    q0 = jnp.asarray(0.1 * np.ones(m.nq))
    v0 = jnp.zeros(m.nv)
    solver.set_solution(q0, v0)
    solver.init_constraints()

    B = 3
    sol_b = batch_solution(solver.solution, B)
    # scenario 0 starts AT the warm start; 2 is far away
    offsets = jnp.asarray([0.0, 0.3, 0.9])
    q_b = q0[None] + offsets[:, None] * jnp.ones((B, m.nq))
    v_b = jnp.tile(v0[None], (B, 1))
    bs = BatchedSolver(solver, extra_axes=())
    sol_b, iters, kkt, done = bs.solve(sol_b, 0.0, q_b, v_b,
                                       tol=1e-5, max_iterations=30)
    assert bool(np.asarray(done).all()), f"kkt={np.asarray(kkt)}"
    assert (np.asarray(kkt) < 1e-5).all()
    it = np.asarray(iters)
    assert it[0] < it[2], f"iteration counts {it}"


def test_barrier_continuation_stages_converge(anymal):
    """solve(barrier_schedule=...) runs warm-started μ-stages (each its
    own cached jitted program) and ends at the final-μ solution: the
    continuation path must reach the same KKT quality as the direct
    solve (f64 standing problem)."""
    m = anymal
    dtype = jnp.float64
    cm = ContactModel(frame_ids=(0, 1, 2, 3), kp=25.0, kd=10.0)
    from idocp_tpu.models import anymal as anymal_mod
    q0 = anymal_mod.standing_configuration(m)
    feet = np.asarray(kinematics.frame_positions(m, q0, (0, 1, 2, 3)))
    cost = [ConfigurationSpaceCost(
        q_weight=jnp.asarray([0.0] * 3 + [10.0] * 3 + [1.0] * 12, dtype),
        v_weight=jnp.ones(m.nv, dtype),
        a_weight=1e-3 * jnp.ones(m.nv, dtype),
        u_weight=1e-2 * jnp.ones(m.nu, dtype),
        qf_weight=jnp.asarray([0.0] * 3 + [10.0] * 3 + [1.0] * 12, dtype),
        vf_weight=jnp.ones(m.nv, dtype), q_ref=q0)]
    cons = [JointTorquesLowerLimit(m), JointTorquesUpperLimit(m),
            FrictionCone(m, nc=4, mu=0.7)]
    N = 4
    sched = static_schedule(4, N, 0.02, [True] * 4, feet)
    solver = OCPSolver(m, cm, cost, cons, T=0.08, N=N,
                       options=SolverOptions(barrier=1e-3))
    solver.set_solution(q0, jnp.zeros(m.nv))
    solver.init_constraints(sched)
    stats, hist = solver.solve(0.0, q0, jnp.zeros(m.nv), sched,
                               max_iterations=10, tol=1e-5,
                               barrier_schedule=(1e-1, 1e-2))
    assert len(solver._fn_cache) == 3  # two continuation stages cached
    errs = [float(s.kkt_error) for s in hist]
    assert np.all(np.isfinite(errs))
    assert errs[-1] < 1e-4, f"KKT history: {errs}"


def test_trot_no_line_search_with_barrier_continuation():
    """Reference-parity config (updateSolution(line_search=false),
    SURVEY.md §3.1) on the f32 trot fragment: diverged in round 3; with
    barrier continuation the cold-start solve and >=5 warm-started MPC
    steps stay finite (VERDICT r3 next-item #7)."""
    from idocp_tpu.solver.mpc import MPC, TrotGait

    dtype = jnp.float32
    from idocp_tpu.models import anymal as anymal_mod
    m = anymal_mod.make_model(dtype=dtype)
    cm = ContactModel(frame_ids=(0, 1, 2, 3), kp=25.0, kd=10.0)
    q0 = anymal_mod.standing_configuration(m, dtype=dtype)
    feet = np.asarray(kinematics.frame_positions(m, q0, (0, 1, 2, 3)))
    cost = [ConfigurationSpaceCost(
        q_weight=jnp.asarray([0.0] * 3 + [10.0] * 3 + [1.0] * 12, dtype),
        v_weight=jnp.ones(m.nv, dtype),
        a_weight=1e-3 * jnp.ones(m.nv, dtype),
        u_weight=1e-2 * jnp.ones(m.nu, dtype),
        qf_weight=jnp.asarray([0.0] * 3 + [10.0] * 3 + [1.0] * 12, dtype),
        vf_weight=jnp.ones(m.nv, dtype), q_ref=q0)]
    cons = [JointTorquesLowerLimit(m), JointTorquesUpperLimit(m),
            FrictionCone(m, nc=4, mu=0.7)]
    options = SolverOptions(barrier=1e-3, use_line_search=False,
                            barrier_schedule=(1e-1, 1e-2),
                            max_step_norm=1.0)
    solver = OCPSolver(m, cm, cost, cons, T=0.4, N=8, options=options,
                       dtype=dtype)
    gait = TrotGait(swing_time=0.15, double_support_time=0.05, t_start=0.1)
    mpc = MPC(solver, gait, feet)
    sched = mpc.schedule_at(0.05)
    assert bool(np.asarray(sched.imp_mask).any())
    solver.set_solution(q0, jnp.zeros(m.nv, dtype), schedule=sched)
    solver.init_constraints(sched)
    # cold-start continuation solve (uses options.barrier_schedule)
    stats, hist = solver.solve(0.05, q0, jnp.zeros(m.nv, dtype), sched,
                               max_iterations=6)
    assert np.isfinite(float(stats.cost))
    # warm-started no-line-search MPC steps
    costs = []
    for k in range(5):
        t = 0.05 + 0.05 * k
        sched_k = mpc.schedule_at(t)
        stats = solver.update_solution(t, q0, jnp.zeros(m.nv, dtype),
                                       sched_k)
        costs.append(float(stats.cost))
    assert np.all(np.isfinite(costs)), costs


def test_nonfinite_direction_freezes_iterate():
    """A non-finite Newton direction must STALL the scenario — iterate
    unchanged, alpha_primal = 0, direction-norm proxy = inf — instead of
    poisoning it with NaN through the slack/dual updates (round-5
    safeguard for the no-line-search f32 tail observed at large batch)."""
    import dataclasses
    dtype = jnp.float32
    m32 = iiwa14.make_model(dtype=dtype)
    solver = UnconstrOCPSolver(
        m32,
        [ConfigurationSpaceCost(
            q_weight=10.0 * jnp.ones(7, dtype),
            v_weight=0.1 * jnp.ones(7, dtype),
            a_weight=0.01 * jnp.ones(7, dtype),
            u_weight=0.001 * jnp.ones(7, dtype),
            qf_weight=10.0 * jnp.ones(7, dtype),
            vf_weight=jnp.ones(7, dtype),
            q_ref=jnp.asarray(0.5 * np.ones(7), dtype))],
        [], T=0.8, N=4,
        options=SolverOptions(barrier=1e-3, use_line_search=False,
                              compute_kkt_error=False),
        dtype=dtype)
    q0 = jnp.zeros(7, dtype)
    solver.set_solution(q0, jnp.zeros(7, dtype))
    solver.init_constraints()
    # inject a non-finite entry: the linearization (and hence the Newton
    # direction) goes NaN, but the stored iterate itself stays as-is
    inf32 = jnp.asarray(jnp.inf, dtype)  # keep the f32 solution dtype
    sick = dataclasses.replace(
        solver.solution, v=solver.solution.v.at[1, 0].set(inf32))
    solver.solution = sick
    before = jax.tree_util.tree_map(np.asarray, sick)
    stats = solver.update_solution(0.0, q0, jnp.zeros(7, dtype))
    after = solver.solution
    assert float(stats.alpha_primal) == 0.0
    assert np.isinf(float(stats.kkt_error))  # dirnorm proxy
    for name in ("q", "a", "u"):
        np.testing.assert_array_equal(
            np.asarray(getattr(after, name)), getattr(before, name),
            err_msg=name)
    # v keeps its injected inf — unchanged, NOT NaN-poisoned
    v_after = np.asarray(after.v)
    assert np.isinf(v_after[1, 0]) and not np.isnan(v_after).any()
    for k in after.slack:
        assert np.isfinite(np.asarray(after.slack[k])).all(), k
        assert np.isfinite(np.asarray(after.dual[k])).all(), k
