"""ANYmal trotting MPC (reference: examples/anymal mpc/trot example —
contact-switching schedule + switching constraints, warm-started
updateSolution per control step, simulated with the model's own dynamics).

Run with --policy to compare zero-order-hold torques against stage-0 LQR
feedback interpolation between MPC updates (reference: the feedback-policy
getters of riccati/lqr_policy.hpp applied at sim rate): the simulator
substeps at 4x the control rate and the tracking cost of both control
laws is reported.
"""
import time

import jax.numpy as jnp
import numpy as np

from idocp_tpu.constraints.components import (FrictionCone,
                                              JointTorquesLowerLimit,
                                              JointTorquesUpperLimit)
from idocp_tpu.cost.components import ConfigurationSpaceCost
from idocp_tpu.models import anymal
from idocp_tpu.robot import kinematics
from idocp_tpu.robot.contact import ContactModel
from idocp_tpu.solver.mpc import MPC, TrotGait
from idocp_tpu.solver.ocp_solver import OCPSolver
from idocp_tpu.solver.options import SolverOptions
from idocp_tpu.utils.simulation import pinned_contact_step as simulate_step


def run_policy_comparison():
    """ZOH vs LQR-feedback interpolation between MPC updates: simulate at
    dt_sim = dt_mpc/4; between solver updates either hold u0 (ZOH) or
    evaluate u0 + K0 (x ⊖ x0) (step_with_policy). Reports the summed
    configuration tracking error of each law."""
    m = anymal.make_model_urdf()
    foot_ids = tuple(m.frame_id(n) for n in anymal.FOOT_FRAMES)
    cm = ContactModel(frame_ids=foot_ids, kp=100.0, kd=20.0)
    q0 = anymal.standing_configuration(m)
    feet = np.asarray(kinematics.frame_positions(m, q0, cm.frame_ids))
    gait = TrotGait(swing_time=0.25, double_support_time=0.05,
                    step_length=0.15, t_start=0.5)
    cost = [ConfigurationSpaceCost(
        q_weight=jnp.asarray([0.0, 0.0, 100.0] + [100.0] * 3 + [1.0] * 12),
        v_weight=1.0 * jnp.ones(m.nv), a_weight=1e-3 * jnp.ones(m.nv),
        u_weight=1e-4 * jnp.ones(m.nu),
        qf_weight=jnp.asarray([0.0, 0.0, 100.0] + [100.0] * 3 + [1.0] * 12),
        vf_weight=1.0 * jnp.ones(m.nv), q_ref=q0)]
    cons = [JointTorquesLowerLimit(m), JointTorquesUpperLimit(m),
            FrictionCone(m, nc=4, mu=0.7)]

    dt_mpc, substeps, horizon_steps = 0.02, 4, 40
    dt_sim = dt_mpc / substeps
    results = {}
    for law in ("zoh", "lqr"):
        solver = OCPSolver(m, cm, cost, cons, T=0.5, N=20,
                           options=SolverOptions(barrier=1e-3))
        mpc = MPC(solver, gait, feet)
        v0 = jnp.zeros(m.nv)
        solver.set_solution(q0, v0)
        solver.init_constraints(mpc.schedule_at(0.0))
        q, v, t = q0, v0, 0.0
        err = 0.0
        for _ in range(horizon_steps):
            if law == "lqr":
                u0, policy, _ = mpc.step_with_policy(t, q, v)
            else:
                u0, _ = mpc.step(t, q, v)
                policy = None
            active, feet_now = mpc.gait.build_sequence(
                feet, t, t + 1.0).status_at(t)
            for _ in range(substeps):
                u = policy(q, v) if policy is not None else u0
                q, v = simulate_step(m, cm, q, v, u,
                                     jnp.asarray(active),
                                     jnp.asarray(feet_now), dt_sim)
            t += dt_mpc
            dq = np.asarray(q)[3:] - np.asarray(q0)[3:]  # attitude+joints
            err += float(np.sum(dq * dq)) + float(np.sum(np.asarray(v) ** 2))
        results[law] = err
        print(f"{law}: tracking error {err:.4f}")
    improvement = (results["zoh"] - results["lqr"]) / results["zoh"]
    print(f"LQR interpolation improves tracking by "
          f"{100 * improvement:.1f}% over zero-order hold")
    return results


def main():
    m = anymal.make_model_urdf()
    foot_ids = tuple(m.frame_id(n) for n in anymal.FOOT_FRAMES)
    cm = ContactModel(frame_ids=foot_ids, kp=100.0, kd=20.0)
    q0 = anymal.standing_configuration(m)
    feet = np.asarray(kinematics.frame_positions(m, q0, cm.frame_ids))
    gait = TrotGait(swing_time=0.25, double_support_time=0.05,
                    step_length=0.15, t_start=0.5)
    cost = [ConfigurationSpaceCost(
        q_weight=jnp.asarray([0.0, 0.0, 100.0] + [100.0] * 3 + [1.0] * 12),
        v_weight=1.0 * jnp.ones(m.nv), a_weight=1e-3 * jnp.ones(m.nv),
        u_weight=1e-4 * jnp.ones(m.nu),
        qf_weight=jnp.asarray([0.0, 0.0, 100.0] + [100.0] * 3 + [1.0] * 12),
        vf_weight=1.0 * jnp.ones(m.nv), q_ref=q0)]
    cons = [JointTorquesLowerLimit(m), JointTorquesUpperLimit(m),
            FrictionCone(m, nc=4, mu=0.7)]
    solver = OCPSolver(m, cm, cost, cons, T=0.5, N=20,
                       options=SolverOptions(barrier=1e-3))
    mpc = MPC(solver, gait, feet)
    v0 = jnp.zeros(m.nv)
    solver.set_solution(q0, v0)
    solver.init_constraints(mpc.schedule_at(0.0))

    dt_mpc = 0.01
    q, v = q0, v0
    t = 0.0
    times = []
    for step in range(int(1.5 / dt_mpc)):
        t0 = time.time()
        u, stats = mpc.step(t, q, v)
        times.append(time.time() - t0)
        active, feet_now = mpc.gait.build_sequence(
            feet, t, t + 1.0).status_at(t)
        q, v = simulate_step(m, cm, q, v, u,
                             jnp.asarray(active), jnp.asarray(feet_now),
                             dt_mpc)
        t += dt_mpc
        if step % 25 == 0:
            print(f"t={t:.2f} base=({float(q[0]):+.3f},{float(q[2]):.3f}) "
                  f"cost={float(stats.cost):.4f}")
    print(f"mean MPC step: {1e3 * np.mean(times[2:]):.2f} ms; "
          f"base travelled x={float(q[0]):.3f} m")


if __name__ == "__main__":
    import sys
    if "--policy" in sys.argv:
        run_policy_comparison()
    else:
        main()
