"""ParNMPC: parallel-in-time Newton via backward correction.

TPU-native replacement for the reference's `ParNMPCSolver` /
`SplitBackwardCorrection` (idocp `solver/parnmpc_solver.hpp` ⚠,
`ocp/split_backward_correction.hpp` ⚠; SURVEY.md L5'/§3.4): all stage
subproblems are solved concurrently against the previous iterate's
coupling variables, then cheap serial backward/forward correction sweeps
restore consistency. Where the reference gets stage parallelism from
OpenMP threads, here the coarse stage solves are one batched (vmapped)
block factorization and the sweeps are `lax.scan`s with O(nx) work per
stage — the horizon-parallel analogue of the Riccati path.

Scheme (block Gauss–Seidel on the horizon KKT system, per sweep):
  1. coarse (parallel over stages): solve each stage's saddle system in
     (dx_k, du_k, λ_{k+1}) with the couplings (λ_k, dx_{k+1}) frozen at
     the current iterate;
  2. forward correction (scan): roll the state equation from dx0 with the
     coarse controls, making the states dynamically consistent;
  3. backward correction (scan): recompute costates from stationarity at
     the corrected states.
A KKT-consistent point is a fixed point of the sweep; each additional
sweep tightens the direction toward the exact Newton step.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ocp.data import CondensedStage


def coarse_stage_solve(cs: CondensedStage, lam_k, lam_next, dx_k, dx_next):
    """Solve one stage's saddle system with neighbor couplings frozen.

    Unknowns: (dx_k, du_k, λ_{k+1}) — absolute values, not increments;
    frozen: λ_k (enters the dx-row residual), dx_{k+1} (enters the
    state-equation row). lam_next/dx_k are unused (kept for signature
    symmetry with future inexact variants).

        [ Qxx  Qxu  A' ] [dx_k ]    [ lx  - λ_k       ]
        [ Qxu' Quu  B' ] [du_k ] = -[ lu              ]
        [ A    B    0  ] [λ'   ]    [ xres - dx_{k+1} ]
    """
    del lam_next, dx_k
    nx = cs.A.shape[0]
    nu = cs.B.shape[1]
    dtype = cs.A.dtype
    rx = cs.lx - lam_k
    ru = cs.lu
    rse = cs.xres - dx_next
    KKT = jnp.concatenate([
        jnp.concatenate([cs.Qxx, cs.Qxu, cs.A.T], axis=1),
        jnp.concatenate([cs.Qxu.T, cs.Quu, cs.B.T], axis=1),
        jnp.concatenate([cs.A, cs.B, jnp.zeros((nx, nx), dtype)], axis=1),
    ], axis=0)
    rhs = -jnp.concatenate([rx, ru, rse])
    sol = jnp.linalg.solve(KKT, rhs)
    return sol[:nx], sol[nx:nx + nu], sol[nx + nu:]


def parnmpc_direction(stages: CondensedStage, term_H, term_l, lam,
                      dx0, n_sweeps: int = 2):
    """Backward-correction Newton direction on condensed stages.

    lam: (N+1, nx) current costate iterate (λ values, not directions).
    Returns (dx (N+1, nx), du (N, nu), dlam (N+1, nx)); dlam is the
    costate *direction* (new value minus lam), matching the Riccati path's
    `lam_new - lam` convention.
    """
    N = stages.A.shape[0]
    nx = term_H.shape[0]
    dtype = term_H.dtype

    dx = jnp.zeros((N + 1, nx), dtype).at[0].set(dx0)
    du = jnp.zeros((N, stages.B.shape[-1]), dtype)
    lam_cur = lam

    def fwd(carry, inp):
        dxk = carry
        cs, duk = inp
        dx1 = cs.A @ dxk + cs.B @ duk + cs.xres
        return dx1, dx1

    def bwd(carry, inp):
        lam_next_ = carry
        cs, dxk, duk = inp
        lam_k = (cs.lx + cs.Qxx @ dxk + cs.Qxu @ duk + cs.A.T @ lam_next_)
        return lam_k, lam_next_

    for _ in range(max(1, n_sweeps)):
        # 1. coarse parallel stage solves (the reference's OpenMP region)
        _, du, _ = jax.vmap(coarse_stage_solve)(
            stages, lam_cur[:N], lam_cur[1:], dx[:N], dx[1:])
        # 2. forward correction: dynamically consistent states
        _, dx_tail = jax.lax.scan(fwd, dx0, (stages, du))
        dx = jnp.concatenate([dx0[None], dx_tail], axis=0)
        # 3. backward correction: costates from stationarity
        lam_N = term_l + term_H @ dx[N]
        lam_0, lam_tail = jax.lax.scan(
            bwd, lam_N, (stages, dx[:N], du), reverse=True)
        # lam_tail[k] = λ_{k+1}; prepend λ_0 from the final carry
        lam_cur = jnp.concatenate([lam_0[None], lam_tail], axis=0)

    return dx, du, lam_cur - lam
