"""ANYmal standing whole-body OCP benchmark (reference:
examples/anymal/ocp_benchmark.cpp — fixed 4-contact stance, N=20)."""
import time

import jax.numpy as jnp
import numpy as np

from idocp_tpu.constraints.components import (FrictionCone,
                                              JointTorquesLowerLimit,
                                              JointTorquesUpperLimit)
from idocp_tpu.cost.components import ConfigurationSpaceCost
from idocp_tpu.hybrid.schedule import static_schedule
from idocp_tpu.models import anymal
from idocp_tpu.robot import kinematics
from idocp_tpu.robot.contact import ContactModel
from idocp_tpu.solver.ocp_solver import OCPSolver
from idocp_tpu.solver.options import SolverOptions


def main():
    m = anymal.make_model_urdf()
    foot_ids = tuple(m.frame_id(n) for n in anymal.FOOT_FRAMES)
    cm = ContactModel(frame_ids=foot_ids, kp=25.0, kd=10.0)
    q0 = anymal.standing_configuration(m)
    feet = np.asarray(kinematics.frame_positions(m, q0, cm.frame_ids))
    cost = [ConfigurationSpaceCost(
        q_weight=jnp.asarray([0.0] * 3 + [10.0] * 3 + [1.0] * 12),
        v_weight=jnp.ones(m.nv), a_weight=1e-3 * jnp.ones(m.nv),
        u_weight=1e-2 * jnp.ones(m.nu),
        qf_weight=jnp.asarray([0.0] * 3 + [10.0] * 3 + [1.0] * 12),
        vf_weight=jnp.ones(m.nv), q_ref=q0)]
    cons = [JointTorquesLowerLimit(m), JointTorquesUpperLimit(m),
            FrictionCone(m, nc=4, mu=0.7)]
    N = 20
    solver = OCPSolver(m, cm, cost, cons, T=0.5, N=N,
                       options=SolverOptions(barrier=1e-3))
    sched = static_schedule(4, N, 0.5 / N, [True] * 4, feet)
    v0 = jnp.zeros(m.nv)
    solver.set_solution(q0, v0)
    solver.init_constraints(sched)
    solver.update_solution(0.0, q0, v0, sched)  # compile
    num_iters = 20
    t0 = time.time()
    for _ in range(num_iters):
        solver.update_solution(0.0, q0, v0, sched)
    wall = time.time() - t0
    print(f"KKT error: {solver.kkt_error(0.0, q0, v0, sched):.3e}")
    print(f"mean time per Newton iteration: {1e3 * wall / num_iters:.3f} ms")


if __name__ == "__main__":
    main()
