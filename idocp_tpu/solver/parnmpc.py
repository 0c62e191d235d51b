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

Formulation: for each stage k solve the saddle system of the stage
Lagrangian in (x_k, w_k, λ_{k+1}) with (λ_k, x_{k+1}) frozen at the
previous iterate, i.e. the per-stage KKT matrix

    [ Qxx  Qxw  Fx' ] [dx_k ]     [ rx  ]
    [ Qxw' Qww  Fw' ] [dw_k ]  = -[ rw  ]
    [ Fx   Fw   0   ] [dλ'  ]     [ rse ]

(with the equality-eliminated w-block folded in exactly as in the serial
path), then correct serially. This file implements the method on the
*condensed* stages (x, u): coarse solves invert the small per-stage
saddle matrices in parallel; corrections propagate dx/dλ.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ocp.data import CondensedStage


def coarse_stage_solve(cs: CondensedStage, lam_k, lam_next, dx_prev,
                       dx_next_prev):
    """Solve one stage's saddle system with neighbors frozen.

    Variables: (dx_k, du_k, dlam_{k+1}); frozen: dlam_k = 0 (enters rx via
    current lam_k), dx_{k+1} = dx_next_prev.
    """
    nx = cs.A.shape[0]
    nu = cs.B.shape[1]
    dtype = cs.A.dtype
    # residuals at the frozen point
    rx = cs.lx + cs.A.T @ lam_next - lam_k
    ru = cs.lu + cs.B.T @ lam_next
    rse = cs.A @ dx_prev + cs.B @ jnp.zeros(nu, dtype) + cs.xres \
        - dx_next_prev
    KKT = jnp.concatenate([
        jnp.concatenate([cs.Qxx, cs.Qxu, cs.A.T], axis=1),
        jnp.concatenate([cs.Qxu.T, cs.Quu, cs.B.T], axis=1),
        jnp.concatenate([cs.A, cs.B, jnp.zeros((nx, nx), dtype)], axis=1),
    ], axis=0)
    rhs = -jnp.concatenate([rx, ru, rse])
    sol = jnp.linalg.solve(KKT, rhs)
    return sol[:nx], sol[nx:nx + nu], sol[nx + nu:]


def parnmpc_direction(stages: CondensedStage, term_H, term_l, lam,
                      dx0, n_sweeps: int = 1):
    """One ParNMPC iteration on condensed stages.

    lam: (N+1, nx) current costate iterate. Returns (dx (N+1), du (N),
    dlam (N+1)). The coarse phase is fully horizon-parallel (vmap);
    correction sweeps are cheap scans.
    """
    N = stages.A.shape[0]
    nx = term_H.shape[0]
    dtype = term_H.dtype
    zeros_dx = jnp.zeros((N + 1, nx), dtype)

    dx = zeros_dx
    dlam = jnp.zeros_like(lam)

    for _ in range(max(1, n_sweeps)):
        # ---- coarse parallel solves
        dxs, dus, dlam_next = jax.vmap(coarse_stage_solve)(
            stages, lam[:N] + dlam[:N], lam[1:] + dlam[1:],
            dx[:N], dx[1:])
        # terminal stage: dlam_N from terminal stationarity at dx_N
        dx_term = dx[N]
        dlam_N = term_l + term_H @ dx_term - (lam[N] + dlam[N])

        # ---- forward correction: roll the state equation consistently
        def fwd(carry, inp):
            dxk = carry
            cs, duk = inp
            dx1 = cs.A @ dxk + cs.B @ duk + cs.xres
            return dx1, dxk

        dxN, dx_stages = jax.lax.scan(fwd, dx0, (stages, dus))
        dx = jnp.concatenate([dx_stages, dxN[None]], axis=0)

        # ---- backward correction: propagate costates with corrected states
        def bwd(carry, inp):
            dlam_next_ = carry
            cs, dxk, duk = inp
            dlam_k = (cs.lx + cs.Qxx @ dxk + cs.Qxu @ duk
                      + cs.A.T @ dlam_next_)
            return dlam_k, dlam_next_

        lamN_new = term_l + term_H @ dx[N]
        _, dlam_tail = jax.lax.scan(
            bwd, lamN_new, (stages, dx[:N], dus), reverse=True)
        dlam_full = jnp.concatenate([dlam_tail[1:], lamN_new[None]], axis=0)
        # head costate
        cs0 = jax.tree_util.tree_map(lambda x: x[0], stages)
        dlam0 = (cs0.lx + cs0.Qxx @ dx[0] + cs0.Qxu @ dus[0]
                 + cs0.A.T @ dlam_full[0])
        dlam = jnp.concatenate([dlam0[None], dlam_full], axis=0) - lam
        du = dus
    return dx, du, dlam
