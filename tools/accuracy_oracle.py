"""Control-error proxy oracle (BASELINE target #3; VERDICT r3 missing #6,
r4 next-item #4: full BASELINE config coverage + the SHIPPING bench
config + a multi-step closed-loop error trace).

The reference's converged solutions are unreadable (empty mount), so the
buildable accuracy bar is: converged f64 solve (tight tolerance, the
'ground truth' the dense-KKT oracle tests certify) vs the f32 paths at a
matched MPC iteration budget. Cases:

  standing / trot            f32 production (filter line search), N=20
  standing_ship / trot_ship  f32 SHIPPING bench config: no line search +
                             max_step_norm trust cap (bench.py default)
  iiwa_unconstr              iiwa14 N=50 unconstrained (BASELINE #1)
  iiwa_limits                iiwa14 N=50 w/ position+velocity+torque
                             limits (BASELINE #2, PDIPM active)
  closed_loop_trot           12 control periods of receding-horizon trot;
                             per-step |u0_f32 - u0_f64| along the f64-
                             driven state trajectory (pinned-contact sim)

Reports max |u - u_ref| (the torque actually applied by the MPC loop)
and trajectory-level errors. Runs on CPU (f64 required). Usage:
    python tools/accuracy_oracle.py ACCURACY_r05.json
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def build_solver(dtype, N, use_ls=True, shipping=False):
    import jax.numpy as jnp
    import numpy as np

    from idocp_tpu.constraints.components import (
        FrictionCone, JointTorquesLowerLimit, JointTorquesUpperLimit)
    from idocp_tpu.cost.components import ConfigurationSpaceCost
    from idocp_tpu.models import anymal
    from idocp_tpu.robot import kinematics
    from idocp_tpu.robot.contact import ContactModel
    from idocp_tpu.solver.ocp_solver import OCPSolver
    from idocp_tpu.solver.options import SolverOptions

    m = anymal.make_model_urdf(dtype=dtype)
    foot_ids = tuple(m.frame_id(n) for n in anymal.FOOT_FRAMES)
    cm = ContactModel(frame_ids=foot_ids, kp=25.0, kd=10.0)
    q0 = anymal.standing_configuration(m, dtype=dtype)
    feet = np.asarray(kinematics.frame_positions(m, q0, foot_ids))
    cost = [ConfigurationSpaceCost(
        q_weight=jnp.asarray([0.0] * 3 + [10.0] * 3 + [1.0] * 12, dtype),
        v_weight=jnp.ones(18, dtype), a_weight=1e-3 * jnp.ones(18, dtype),
        u_weight=1e-2 * jnp.ones(12, dtype),
        qf_weight=jnp.asarray([0.0] * 3 + [10.0] * 3 + [1.0] * 12, dtype),
        vf_weight=jnp.ones(18, dtype), q_ref=q0)]
    cons = [JointTorquesLowerLimit(m), JointTorquesUpperLimit(m),
            FrictionCone(m, nc=4, mu=0.7)]
    if shipping:
        # EXACTLY the bench.py default (reference-parity no-line-search
        # mode with the max_step_norm trust cap)
        options = SolverOptions(barrier=1e-3, use_line_search=False,
                                max_step_norm=1.0)
    else:
        options = SolverOptions(barrier=1e-3, use_line_search=use_ls)
    solver = OCPSolver(m, cm, cost, cons, T=0.5, N=N, options=options,
                       dtype=dtype)
    return solver, m, cm, q0, feet


def run_case(case, dtype, iters, N=20, shipping=False):
    """Solve one problem; return the final iterate pieces as numpy."""
    import jax.numpy as jnp
    import numpy as np

    from idocp_tpu.hybrid.schedule import static_schedule
    from idocp_tpu.solver.mpc import MPC, TrotGait

    solver, m, cm, q0, feet = build_solver(dtype, N, shipping=shipping)
    if case == "standing":
        sched = static_schedule(cm.nc, N, 0.5 / N, [True] * 4, feet,
                                dtype=dtype)
    else:
        mpc = MPC(solver, TrotGait(t_start=0.1), feet)
        sched = mpc.schedule_at(0.05)
        assert np.asarray(sched.imp_mask).any()
    v0 = jnp.zeros(m.nv, dtype)
    solver.set_solution(q0, v0, schedule=sched)
    solver.init_constraints(sched)
    kkt = None
    for _ in range(iters):
        stats = solver.update_solution(0.05, q0, v0, sched)
        kkt = float(stats.kkt_error)
    sol = solver.solution
    return {
        "u": np.asarray(sol.u, np.float64),
        "q": np.asarray(sol.q, np.float64),
        "v": np.asarray(sol.v, np.float64),
        "f": np.asarray(sol.f, np.float64),
        "kkt": kkt,
    }


def compare(ref, f32):
    import numpy as np
    return {
        "ref_kkt_f64": ref["kkt"],
        "f32_kkt_at_budget": f32["kkt"],
        "max_abs_u0_err": float(np.abs(f32["u"][0] - ref["u"][0]).max()),
        "max_abs_u_err": float(np.abs(f32["u"] - ref["u"]).max()),
        "max_abs_q_err": float(np.abs(f32["q"] - ref["q"]).max()),
        "max_abs_v_err": float(np.abs(f32["v"] - ref["v"]).max()),
        "u_scale": float(np.abs(ref["u"]).max()),
    }


def run_iiwa(with_limits, dtype, iters, N=50):
    import jax.numpy as jnp
    import numpy as np

    from idocp_tpu.constraints.components import (
        JointPositionLowerLimit, JointPositionUpperLimit,
        JointTorquesLowerLimit, JointTorquesUpperLimit,
        JointVelocityLowerLimit, JointVelocityUpperLimit)
    from idocp_tpu.cost.components import ConfigurationSpaceCost
    from idocp_tpu.models import iiwa14
    from idocp_tpu.solver.options import SolverOptions
    from idocp_tpu.solver.unconstr_ocp_solver import UnconstrOCPSolver

    m = iiwa14.make_model_urdf(dtype=dtype)
    q_ref = jnp.asarray([0.0, 0.5, 0.0, -0.5, 0.0, 0.5, 0.0], dtype)
    cost = [ConfigurationSpaceCost(
        q_weight=10.0 * jnp.ones(7, dtype), v_weight=jnp.ones(7, dtype),
        a_weight=0.01 * jnp.ones(7, dtype),
        u_weight=0.01 * jnp.ones(7, dtype),
        qf_weight=10.0 * jnp.ones(7, dtype),
        vf_weight=jnp.ones(7, dtype), q_ref=q_ref)]
    cons = []
    if with_limits:
        cons = [JointPositionLowerLimit(m), JointPositionUpperLimit(m),
                JointVelocityLowerLimit(m), JointVelocityUpperLimit(m),
                JointTorquesLowerLimit(m), JointTorquesUpperLimit(m)]
    solver = UnconstrOCPSolver(m, cost, cons, T=1.0, N=N,
                               options=SolverOptions(barrier=1e-3),
                               dtype=dtype)
    q0 = jnp.zeros(7, dtype)
    v0 = jnp.zeros(7, dtype)
    solver.set_solution(q0, v0)
    solver.init_constraints()
    kkt = None
    for _ in range(iters):
        stats = solver.update_solution(0.0, q0, v0)
        kkt = float(stats.kkt_error)
    sol = solver.solution
    return {"u": np.asarray(sol.u, np.float64),
            "q": np.asarray(sol.q, np.float64),
            "v": np.asarray(sol.v, np.float64),
            "f": np.asarray(sol.f, np.float64), "kkt": kkt}


def run_closed_loop(n_periods=12, dt_mpc=0.05):
    """Receding-horizon trot: f64 and f32 solvers in the SAME shipping
    config (no-LS + trust cap — one warm-started Newton iteration per
    period, the reference MPC semantic) see the SAME measured states
    (driven by the f64 torques through the pinned-contact simulator);
    per-step u0 error then isolates PRECISION accumulation through the
    warm-start trajectory. (Comparing different globalization configs
    here measures config divergence of semi-converged iterates, not
    numerics — both sides must step identically.)"""
    import jax.numpy as jnp
    import numpy as np

    from idocp_tpu.solver.mpc import MPC, TrotGait
    from idocp_tpu.utils.simulation import pinned_contact_step

    gait = TrotGait(t_start=0.25)
    solvers = {}
    for label, dtype, shipping in (("ref", jnp.float64, True),
                                   ("f32", jnp.float32, True)):
        solver, m, cm, q0, feet = build_solver(dtype, 20, shipping=shipping)
        mpc = MPC(solver, gait, feet)
        sched0 = mpc.schedule_at(0.0)
        solver.set_solution(q0, jnp.zeros(m.nv, dtype), schedule=sched0)
        solver.init_constraints(sched0)
        solvers[label] = (solver, mpc)
    m64 = solvers["ref"][0].model
    cm64 = solvers["ref"][0].cm
    q = solvers["ref"][0].solution.q[0]
    v = jnp.zeros(m64.nv)
    feet0 = np.asarray(solvers["ref"][1].feet0)

    errs, u_scales = [], []
    t = 0.0
    for _ in range(n_periods):
        u_by = {}
        for label, (solver, mpc) in solvers.items():
            dtype = solver.dtype
            u0, _ = mpc.step(t, jnp.asarray(q, dtype),
                             jnp.asarray(v, dtype))
            u_by[label] = np.asarray(u0, np.float64)
        errs.append(float(np.abs(u_by["f32"] - u_by["ref"]).max()))
        u_scales.append(float(np.abs(u_by["ref"]).max()))
        # advance the TRUE state with the reference torques
        active, feet_now = gait.build_sequence(feet0, t, t + 1.0).status_at(t)
        q, v = pinned_contact_step(
            m64, cm64, q, v, jnp.asarray(u_by["ref"]),
            jnp.asarray(active), jnp.asarray(feet_now), dt_mpc)
        t += dt_mpc
    return {"per_step_max_abs_u0_err": errs,
            "max_abs_u0_err": max(errs),
            "u_scale": max(u_scales),
            "n_periods": n_periods, "dt_mpc": dt_mpc}


def main(out_path):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/idocp_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    budget = int(os.environ.get("ACC_ITERS", "15"))
    ship_budget = int(os.environ.get("ACC_SHIP_ITERS", "20"))  # bench.py
    report = {}
    for case in ("standing", "trot"):
        ref = run_case(case, jnp.float64, iters=25)   # converged reference
        f32 = run_case(case, jnp.float32, iters=budget)
        report[case] = compare(ref, f32)
        ship = run_case(case, jnp.float32, iters=ship_budget, shipping=True)
        report[case + "_ship"] = compare(ref, ship)
    for label, with_limits in (("iiwa_unconstr", False),
                               ("iiwa_limits", True)):
        ref = run_iiwa(with_limits, jnp.float64, iters=25)
        f32 = run_iiwa(with_limits, jnp.float32, iters=budget)
        report[label] = compare(ref, f32)
    report["closed_loop_trot"] = run_closed_loop()
    payload = {
        "protocol": "converged f64 solve (25 Newton iters, serial path) vs "
                    f"f32 at matched budgets ({budget} iters production "
                    f"line-search path; {ship_budget} iters SHIPPING "
                    "no-line-search+trust-cap bench config); iiwa14 N=50 "
                    "configs per BASELINE #1/#2; closed_loop_trot drives "
                    "12 receding-horizon control periods with the f64 "
                    "torques and reports per-step u0 error",
        "target": "control error <= 1e-4 vs reference (BASELINE #3); the "
                  "reference itself is unreadable, so f64-vs-f32 is the "
                  "proxy bound on the framework's own numerics",
        "cases": report,
    }
    with open(out_path, "w") as fh:
        json.dump(payload, fh, indent=1)
    print(json.dumps(payload))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "ACCURACY_r05.json")
