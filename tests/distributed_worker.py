"""Worker script for the two-process jax.distributed smoke test
(tests/test_distributed.py; SURVEY.md §5 'distributed communication
backend', VERDICT r4 missing #2).

Each of the 2 processes hosts 4 virtual CPU devices; the global (2, 4)
('dcn', 'ici') mesh is built by parallel.distributed.make_pod_mesh.
Checks, per process:
  1. runtime bring-up: jax.process_count() == 2, 8 global devices;
  2. a psum metric across BOTH mesh axes on a globally-sharded array
     equals the host-side reference;
  3. one sharded batched solver update (unconstr iiwa14, batch 8 over all
     8 devices) whose per-scenario costs equal the locally-recomputed
     unsharded single-process result (sharded == unsharded across the
     process boundary).
Prints "DIST_OK <process_id>" on success.
"""
import os
import sys

proc_id = int(sys.argv[1])
coord = sys.argv[2]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")
os.environ["JAX_ENABLE_X64"] = "1"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/idocp_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from idocp_tpu.parallel import distributed as dist  # noqa: E402

dist.initialize(coordinator_address=coord, num_processes=2,
                process_id=proc_id)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())

mesh = dist.make_pod_mesh()
assert mesh.devices.shape == (2, 4), mesh.devices.shape

# --- psum metric across dcn x ici on a globally-sharded array
shard = NamedSharding(mesh, P(("dcn", "ici")))
x_host = np.arange(64, dtype=np.float64).reshape(64 // 8, 8) * 0.5
x_host = np.tile(x_host, (8, 1))  # (64, 8), shardable over 8 devices
arr = jax.make_array_from_callback(x_host.shape, shard,
                                   lambda idx: x_host[idx])
total = jax.jit(lambda a: jnp.sum(2.0 * a))(arr)
ref = 2.0 * x_host.sum()
np.testing.assert_allclose(float(total), ref, rtol=1e-12)

# --- one sharded batched solver update vs the local unsharded reference
from idocp_tpu.cost.components import ConfigurationSpaceCost  # noqa: E402
from idocp_tpu.models import iiwa14  # noqa: E402
from idocp_tpu.parallel.batch import BatchedSolver, batch_solution  # noqa: E402
from idocp_tpu.solver.unconstr_ocp_solver import UnconstrOCPSolver  # noqa: E402

m = iiwa14.make_model()
q_ref = 0.3 * jnp.ones(7)
cost = [ConfigurationSpaceCost(
    q_weight=10.0 * jnp.ones(7), v_weight=jnp.ones(7),
    a_weight=0.1 * jnp.ones(7), u_weight=0.01 * jnp.ones(7),
    qf_weight=10.0 * jnp.ones(7), vf_weight=jnp.ones(7), q_ref=q_ref)]
solver = UnconstrOCPSolver(m, cost, [], T=0.5, N=4)
q0 = jnp.zeros(7)
solver.set_solution(q0, jnp.zeros(7))
solver.init_constraints()

B = 8
key = jax.random.PRNGKey(0)
dq = 0.1 * jax.random.normal(key, (B, 7))
q_b_host = np.asarray(jnp.zeros((B, 7)) + dq)
v_b_host = np.zeros((B, 7))

sol_b = batch_solution(solver.solution, B)
bs_ref = BatchedSolver(solver, extra_axes=())
_, stats_ref = bs_ref.update(sol_b, 0.0, jnp.asarray(q_b_host),
                             jnp.asarray(v_b_host))
cost_ref = np.asarray(stats_ref.cost)

# shard batch over ALL 8 global devices (both mesh axes)
def put(x_host_arr):
    return jax.make_array_from_callback(
        x_host_arr.shape, NamedSharding(mesh, P(("dcn", "ici"))),
        lambda idx: x_host_arr[idx])

sol_np = jax.tree_util.tree_map(np.asarray, sol_b)
sol_sharded = jax.tree_util.tree_map(put, sol_np)
q_b = put(q_b_host)
v_b = put(v_b_host)
bs = BatchedSolver(solver, extra_axes=())
_, stats = bs.update(sol_sharded, 0.0, q_b, v_b)
from jax.experimental import multihost_utils  # noqa: E402
cost_sh = np.asarray(multihost_utils.process_allgather(
    stats.cost, tiled=True))
np.testing.assert_allclose(cost_sh, cost_ref, rtol=1e-10)

print(f"DIST_OK {proc_id}", flush=True)
