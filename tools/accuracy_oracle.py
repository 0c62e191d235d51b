"""Control-error proxy oracle (BASELINE target #3; VERDICT r3 missing #6).

The reference's converged solutions are unreadable (empty mount), so the
buildable accuracy bar is: converged f64 solve (tight tolerance, the
'ground truth' the dense-KKT oracle tests certify) vs the f32 PRODUCTION
path at a matched MPC iteration budget, on both the standing and the
trot-fragment whole-body problems. Reports max |u0 - u0_ref| (the torque
actually applied by the MPC loop) and trajectory-level errors.

Runs on CPU (f64 required). Usage:
    python tools/accuracy_oracle.py ACCURACY_r04.json
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def build_solver(dtype, N, use_ls=True):
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
    options = SolverOptions(barrier=1e-3, use_line_search=use_ls)
    solver = OCPSolver(m, cm, cost, cons, T=0.5, N=N, options=options,
                       dtype=dtype)
    return solver, m, cm, q0, feet


def run_case(case, dtype, iters, N=20):
    """Solve one problem; return the final iterate pieces as numpy."""
    import jax.numpy as jnp
    import numpy as np

    from idocp_tpu.hybrid.schedule import static_schedule
    from idocp_tpu.solver.mpc import MPC, TrotGait

    solver, m, cm, q0, feet = build_solver(dtype, N)
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


def main(out_path):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/idocp_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    budget = int(os.environ.get("ACC_ITERS", "15"))
    report = {}
    for case in ("standing", "trot"):
        ref = run_case(case, jnp.float64, iters=25)   # converged reference
        f32 = run_case(case, jnp.float32, iters=budget)
        du0 = np.abs(f32["u"][0] - ref["u"][0]).max()
        report[case] = {
            "ref_kkt_f64": ref["kkt"],
            "f32_kkt_at_budget": f32["kkt"],
            "max_abs_u0_err": float(du0),
            "max_abs_u_err": float(np.abs(f32["u"] - ref["u"]).max()),
            "max_abs_q_err": float(np.abs(f32["q"] - ref["q"]).max()),
            "max_abs_v_err": float(np.abs(f32["v"] - ref["v"]).max()),
            "u_scale": float(np.abs(ref["u"]).max()),
        }
    payload = {
        "protocol": f"converged f64 solve (25 Newton iters, serial path) "
                    f"vs f32 production path at {budget} iters, N=20, "
                    "ANYmal standing + mid-trot window (impulse + "
                    "switching in horizon)",
        "target": "control error <= 1e-4 vs reference (BASELINE #3); the "
                  "reference itself is unreadable, so f64-vs-f32 is the "
                  "proxy bound on the framework's own numerics",
        "cases": report,
    }
    with open(out_path, "w") as fh:
        json.dump(payload, fh, indent=1)
    print(json.dumps(payload))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "ACCURACY_r04.json")
