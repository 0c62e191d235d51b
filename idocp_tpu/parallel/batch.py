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
        self._solve = jax.jit(_make_batched_solve(upd))

    def device_put_batch(self, sol_batched):
        if self.mesh is None:
            return sol_batched
        shard = NamedSharding(self.mesh, P("dp"))
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, shard), sol_batched)

    def _check_extras(self, extra):
        """Run the solver's host-side schedule guard on the batched path
        too (ADVICE r4 low: bypassing it here let overflow schedules
        through on exactly the path discretize_batch caches counts for)."""
        check = getattr(self.solver, "check_schedule", None)
        if check is None:
            return
        for e in extra:
            if hasattr(e, "host_counts"):
                check(e)

    def update(self, sol_batched, t, q_batch, v_batch, *extra):
        self._check_extras(extra)
        return self._update(sol_batched, t, q_batch, v_batch, *extra)

    def kkt_error(self, sol_batched, t, q_batch, v_batch, *extra):
        return self._kkt(sol_batched, t, q_batch, v_batch, *extra)

    def mean_kkt_error(self, sol_batched, t, q_batch, v_batch, *extra):
        """Cross-scenario metric reduction. Under a mesh this lowers to a
        psum over the dp axis (the only collective on the solve path)."""
        errs = self.kkt_error(sol_batched, t, q_batch, v_batch, *extra)
        return jnp.mean(errs)

    def solve(self, sol_batched, t, q_batch, v_batch, *extra,
              tol=None, max_iterations=None):
        """Batched solve-to-tolerance: ONE jitted masked Newton loop with
        PER-SCENARIO convergence (reference pattern: iterate
        updateSolution until KKTError < tol, SURVEY.md §3.2; VERDICT r3
        missing #3 'batched solve-to-tolerance'). Converged scenarios are
        frozen (their iterate stops changing) while the rest keep
        stepping; the loop exits when every scenario converged or the cap
        is hit — SURVEY §7 P5 hard part #4 (per-batch control flow) via a
        masked lax.while_loop.

        Requires the solver to be built with
        options.compute_kkt_error=True (otherwise stats.kkt_error is the
        direction-norm proxy and `tol` means that instead).

        Returns (solution, iters (B,), kkt (B,), converged (B,) bool).
        """
        self._check_extras(extra)
        tol = tol or self.solver.options.kkt_tol
        cap = max_iterations or self.solver.options.max_iterations
        return self._solve(sol_batched, t, q_batch, v_batch,
                           jnp.asarray(tol), jnp.asarray(cap), *extra)


def _make_batched_solve(upd_vmapped):
    def solve(sol_b, t, q_b, v_b, tol, cap, *extra):
        B = jax.tree_util.tree_leaves(sol_b)[0].shape[0]
        kdtype = jax.tree_util.tree_leaves(sol_b)[0].dtype

        def cond(carry):
            _, done, _, _, k = carry
            return jnp.logical_and(k < cap,
                                   jnp.logical_not(jnp.all(done)))

        def body(carry):
            sol, done, iters, kkt, k = carry
            new_sol, stats = upd_vmapped(sol, t, q_b, v_b, *extra)

            def merge(old, new):
                d = done.reshape((B,) + (1,) * (new.ndim - 1))
                return jnp.where(d, old, new)

            sol2 = jax.tree_util.tree_map(merge, sol, new_sol)
            iters2 = iters + jnp.logical_not(done).astype(jnp.int32)
            # stats.kkt_error is the PRE-step residual of this iteration's
            # own linearization — matches the host-side solve() loop.
            kkt2 = jnp.where(done, kkt, stats.kkt_error)
            done2 = jnp.logical_or(done, kkt2 <= tol)
            return sol2, done2, iters2, kkt2, k + 1

        init = (sol_b,
                jnp.zeros((B,), bool),
                jnp.zeros((B,), jnp.int32),
                jnp.full((B,), jnp.inf, kdtype),
                jnp.zeros((), jnp.int32))
        sol, done, iters, kkt, _ = jax.lax.while_loop(cond, body, init)
        return sol, iters, kkt, done

    return solve
