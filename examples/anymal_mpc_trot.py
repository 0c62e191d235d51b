"""ANYmal trotting MPC (reference: examples/anymal mpc/trot example —
contact-switching schedule + switching constraints, warm-started
updateSolution per control step, simulated with the model's own dynamics).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from idocp_tpu.constraints.components import (FrictionCone,
                                              JointTorquesLowerLimit,
                                              JointTorquesUpperLimit)
from idocp_tpu.cost.components import ConfigurationSpaceCost
from idocp_tpu.models import anymal
from idocp_tpu.robot import dynamics, kinematics
from idocp_tpu.robot import model as model_mod
from idocp_tpu.robot.contact import ContactModel
from idocp_tpu.solver.mpc import MPC, TrotGait
from idocp_tpu.solver.ocp_solver import OCPSolver
from idocp_tpu.solver.options import SolverOptions


def simulate_step(m, cm, q, v, u, active, feet, dt):
    """Forward dynamics with pinned active contacts (simple validator)."""
    nv = m.nv
    S_T = jnp.concatenate([jnp.zeros((nv - m.nu, m.nu)), jnp.eye(m.nu)],
                          axis=0)
    from idocp_tpu.ocp.state_equation import contact_block_matrix
    A, Jm, mask3 = contact_block_matrix(m, cm, q, active)
    h = dynamics.nonlinear_effects(m, q, v)
    # contact acceleration stabilization (Baumgarte) on active rows
    accv = kinematics.frame_velocities(m, q, v, cm.frame_ids)
    pos = kinematics.frame_positions(m, q, cm.frame_ids)
    corr = (cm.kd * accv + cm.kp * (pos - feet)).reshape(-1)
    # Jdot v term via jvp of frame velocity
    zero = jnp.zeros(nv)
    _, jdotv = jax.jvp(
        lambda e: kinematics.frame_velocities(
            m, model_mod.integrate(m, q, e), v, cm.frame_ids), (zero,), (v,))
    rhs = jnp.concatenate([S_T @ u - h,
                           -mask3 * (jdotv.reshape(-1) + corr)])
    sol = jnp.linalg.solve(A, rhs)
    a = sol[:nv]
    v1 = v + dt * a
    q1 = model_mod.integrate(m, q, dt * v1)
    return q1, v1


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
    main()
