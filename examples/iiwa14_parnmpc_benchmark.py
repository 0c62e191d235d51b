"""iiwa14 parallel-in-time (ParNMPC) benchmark (reference:
examples/iiwa14/parnmpc_benchmark.cpp — the same N=50 reaching problem
through the parallel-in-time solver; here the exact O(log N)
associative-scan engine, solver/parnmpc_solver.py)."""
import time

import jax.numpy as jnp
import numpy as np

from idocp_tpu.cost.components import ConfigurationSpaceCost
from idocp_tpu.models import iiwa14
from idocp_tpu.solver.parnmpc_solver import UnconstrParNMPCSolver


def main():
    m = iiwa14.make_model_urdf()
    q_ref = jnp.asarray([0.0, 0.5 * np.pi, 0.0, 0.5 * np.pi, 0.0,
                         0.5 * np.pi, 0.0])
    cost = [ConfigurationSpaceCost(
        q_weight=10.0 * jnp.ones(m.nv), v_weight=0.01 * jnp.ones(m.nv),
        a_weight=0.01 * jnp.ones(m.nv), u_weight=0.0 * jnp.ones(m.nu),
        qf_weight=10.0 * jnp.ones(m.nv), vf_weight=0.01 * jnp.ones(m.nv),
        q_ref=q_ref)]
    solver = UnconstrParNMPCSolver(m, cost, [], T=3.0, N=50)
    q0 = jnp.asarray([0.5 * np.pi, 0.0, 0.5 * np.pi, 0.0, 0.5 * np.pi,
                      0.0, 0.5 * np.pi])
    v0 = jnp.zeros(m.nv)
    solver.set_solution(q0, v0)
    solver.init_constraints()
    solver.update_solution(0.0, q0, v0)  # compile
    num_iters = 100
    t0 = time.time()
    for _ in range(num_iters):
        stats = solver.update_solution(0.0, q0, v0)
    wall = time.time() - t0
    print(f"ParNMPC updateSolution: {1e3 * wall / num_iters:.3f} ms/iter, "
          f"KKT error {float(stats.kkt_error):.3e}")


if __name__ == "__main__":
    main()
