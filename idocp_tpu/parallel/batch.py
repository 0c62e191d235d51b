"""Scenario batching + device-mesh sharding.

The reference's only intra-solve parallelism is an OpenMP loop over stages
(idocp `ocp/ocp_linearizer.hpp`); its distributed story is empty (single
process, SURVEY.md §2 'Parallelism & communication'). The TPU-native
scale-out axis is *scenario batching*: thousands of independent MPC
problems (initial states, gaits, disturbances) per chip, vmapped into one
XLA program and sharded over a `jax.sharding.Mesh` (`dp` axis over
ICI/DCN). The per-scenario hot path is communication-free; collectives
(`psum`) appear only in cross-scenario metric reductions.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(np.asarray(devs), (axis,))


def batch_solution(sol, batch: int):
    """Tile a single-scenario Solution along a new leading batch axis."""
    return jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (batch,) + x.shape), sol)


class BatchedSolver:
    """Batched (and optionally mesh-sharded) wrapper around a solver's
    jitted update/kkt functions.

    solver: an OCPSolver / UnconstrOCPSolver (provides _update, _kkt).
    extra_axes: in_axes entries for the solver's extra update args —
        None for a HorizonSchedule shared by the whole batch, 0 for
        per-scenario schedules/gaits (a HorizonSchedule pytree whose
        arrays carry a leading batch axis, e.g. from
        hybrid.native.discretize_batch; BASELINE config #5).
    """

    def __init__(self, solver, mesh: Optional[Mesh] = None,
                 extra_axes=(None,)):
        self.solver = solver
        self.mesh = mesh
        upd = jax.vmap(solver._update.__wrapped__,
                       in_axes=(0, None, 0, 0) + tuple(extra_axes))
        kkt = jax.vmap(solver._kkt.__wrapped__,
                       in_axes=(0, None, 0, 0) + tuple(extra_axes))
        # Sharding: batch-axis placement comes from device_put_batch; XLA
        # propagates it through the whole program (no resharding needed —
        # every per-scenario solve is independent).
        self._update = jax.jit(upd)
        self._kkt = jax.jit(kkt)

    def device_put_batch(self, sol_batched):
        if self.mesh is None:
            return sol_batched
        shard = NamedSharding(self.mesh, P("dp"))
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, shard), sol_batched)

    def update(self, sol_batched, t, q_batch, v_batch, *extra):
        return self._update(sol_batched, t, q_batch, v_batch, *extra)

    def kkt_error(self, sol_batched, t, q_batch, v_batch, *extra):
        return self._kkt(sol_batched, t, q_batch, v_batch, *extra)

    def mean_kkt_error(self, sol_batched, t, q_batch, v_batch, *extra):
        """Cross-scenario metric reduction. Under a mesh this lowers to a
        psum over the dp axis (the only collective on the solve path)."""
        errs = self.kkt_error(sol_batched, t, q_batch, v_batch, *extra)
        return jnp.mean(errs)
