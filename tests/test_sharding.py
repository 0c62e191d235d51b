"""Multi-device sharding tests on the 8 virtual CPU devices provisioned by
conftest (VERDICT r1 item #7 — essentially dryrun_multichip as a unit test,
plus the psum metric path and a scaling sanity check).

Reference has no distributed layer (single-process OpenMP, SURVEY.md §2
'Parallelism & communication'); scenario-batch DP over a mesh is this
framework's scale-out axis.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from idocp_tpu.cost.components import ConfigurationSpaceCost
from idocp_tpu.models import iiwa14
from idocp_tpu.parallel.batch import (BatchedSolver, batch_solution,
                                      make_mesh)
from idocp_tpu.solver.options import SolverOptions
from idocp_tpu.solver.unconstr_ocp_solver import UnconstrOCPSolver


@pytest.fixture(scope="module")
def small_solver(request):
    m = iiwa14.make_model()
    cost = [ConfigurationSpaceCost(
        q_weight=10.0 * jnp.ones(m.nv), v_weight=0.1 * jnp.ones(m.nv),
        a_weight=0.01 * jnp.ones(m.nv), u_weight=0.001 * jnp.ones(m.nu),
        qf_weight=10.0 * jnp.ones(m.nv), vf_weight=1.0 * jnp.ones(m.nv),
        q_ref=0.4 * jnp.ones(m.nq))]
    solver = UnconstrOCPSolver(m, cost, [], T=0.5, N=4,
                               options=SolverOptions(barrier=1e-3))
    q0 = 0.1 * jnp.ones(m.nq)
    solver.set_solution(q0, jnp.zeros(m.nv))
    solver.init_constraints()
    return m, solver, q0


def test_eight_virtual_devices_present():
    assert len(jax.devices()) >= 8


def test_batched_update_sharded_over_mesh(small_solver):
    m, solver, q0 = small_solver
    n_dev = 8
    mesh = make_mesh(n_dev)
    bs = BatchedSolver(solver, mesh=mesh, extra_axes=())

    BATCH = 2 * n_dev
    sol_b = batch_solution(solver.solution, BATCH)
    sol_b = bs.device_put_batch(sol_b)
    shard = NamedSharding(mesh, P("dp"))
    q_b = jax.device_put(jnp.tile(q0[None], (BATCH, 1)), shard)
    v_b = jax.device_put(jnp.zeros((BATCH, m.nv)), shard)

    new_sol, stats = bs.update(sol_b, 0.0, q_b, v_b)
    jax.block_until_ready(stats.cost)
    # SPMD actually happened: outputs keep the dp sharding over all devices
    assert len(new_sol.q.sharding.device_set) == n_dev, \
        f"got {new_sol.q.sharding}"
    assert np.isfinite(np.asarray(stats.cost)).all()

    # cross-device metric reduction (lowered to an all-reduce on the mesh)
    mean_err = bs.mean_kkt_error(new_sol, 0.0, q_b, v_b)
    assert np.isfinite(float(mean_err))


def test_sharded_matches_unsharded(small_solver):
    """DP sharding must not change the numerics: per-scenario solves are
    independent, so the sharded batch equals the replicated batch."""
    m, solver, q0 = small_solver
    mesh = make_mesh(8)
    BATCH = 16
    key = jax.random.PRNGKey(3)
    q_b = q0[None] + 0.05 * jax.random.normal(key, (BATCH, m.nq))
    v_b = jnp.zeros((BATCH, m.nv))
    sol_b = batch_solution(solver.solution, BATCH)

    bs_plain = BatchedSolver(solver, extra_axes=())
    out_plain, stats_plain = bs_plain.update(sol_b, 0.0, q_b, v_b)

    bs_mesh = BatchedSolver(solver, mesh=mesh, extra_axes=())
    shard = NamedSharding(mesh, P("dp"))
    out_mesh, stats_mesh = bs_mesh.update(
        bs_mesh.device_put_batch(sol_b), 0.0,
        jax.device_put(q_b, shard), jax.device_put(v_b, shard))

    np.testing.assert_allclose(np.asarray(out_mesh.q),
                               np.asarray(out_plain.q), atol=1e-12)
    np.testing.assert_allclose(np.asarray(stats_mesh.kkt_error),
                               np.asarray(stats_plain.kkt_error), atol=1e-10)


def test_pod_mesh_and_scaling_report(small_solver):
    """Multi-host scaffold (SURVEY.md §5 distributed-backend row): the
    (dcn, ici) pod mesh builds on the virtual 8-device topology and the
    scaling-efficiency harness runs end-to-end. CPU timing is too noisy
    for a hard efficiency bar; the TPU bench records the real number."""
    from idocp_tpu.parallel import distributed as dist

    dist.initialize()  # no-op single-process
    mesh = dist.make_pod_mesh()
    assert mesh.axis_names == ("dcn", "ici")
    assert mesh.devices.size >= 8

    m, solver, q0 = small_solver
    bs = BatchedSolver(solver, extra_axes=())

    def make_batch(n):
        sol_b = batch_solution(solver.solution, n)
        q_b = jnp.tile(q0[None], (n, 1))
        v_b = jnp.zeros((n, m.nv))
        return (sol_b, 0.0, q_b, v_b)

    def step(sol_b, t, q_b, v_b):
        new_sol, _ = bs.update(sol_b, t, q_b, v_b)
        return new_sol

    rep = dist.scaling_report(step, make_batch, batch_per_device=4,
                              iters=3, warmup=1)
    assert rep["1_device"] > 0 and rep["8_devices"] > 0
    assert np.isfinite(rep["scaling_efficiency"])
