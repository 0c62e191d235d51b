"""Parallel-in-time Riccati recursion via `jax.lax.associative_scan`.

The reference's answer to horizon-length scaling is the ParNMPC
backward-correction solver (idocp `solver/parnmpc_solver.hpp` ⚠,
SURVEY.md §3.4) — an *inexact* Newton direction whose stage solves
parallelize. On TPU we can do better: the *exact* LQR backward pass has an
associative reformulation (temporal parallelization of LQT, Särkkä &
García-Fernández, IEEE TAC 2021), so the serial O(N) Riccati sweep becomes
an O(log N)-depth `associative_scan` of 5-tuple value-function elements,
and the forward rollout becomes an O(log N) prefix composition of affine
maps. Same direction as `recursion.backward_recursion` to solver
precision, with the whole horizon on the MXU at every scan level.

Scope: stages WITHOUT active switching constraints (the constrained step's
inner KKT couples the cost-to-go into the elimination, which breaks the
associative element construction). The solver falls back to the serial
scan when the horizon carries switching-constraint rows; the unconstr fast
path (iiwa14) and fixed-stance contact OCPs (ANYmal standing) use this
path unconditionally.

Element convention (paper eq. (12)-(14)): a conditional value function
V_{i->j}(x_i, x_j) is parameterized by e = (A, b, C, η, J) and the
combination of consecutive segments is

    A_ij = A_j (I + C_i J_j)^{-1} A_i
    b_ij = A_j (I + C_i J_j)^{-1} (b_i + C_i η_j) + b_j
    C_ij = A_j (I + C_i J_j)^{-1} C_i A_j^T + C_j
    η_ij = A_i^T (I + J_j C_i)^{-1} (η_j − J_j b_i) + η_i
    J_ij = A_i^T (I + J_j C_i)^{-1} J_j A_i + J_i

with the suffix combination e_k ⊗ … ⊗ e_N giving the cost-to-go
V_k(x) = ½ xᵀ J x − ηᵀ x, i.e. P_k = J_k and (our convention
V = ½ xᵀPx + sᵀx) s_k = −η_k.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ocp.data import CondensedStage
from .recursion import LQRPolicy, backward_step, chol_rescue


def _make_elements(stages: CondensedStage, reg: float):
    """Per-stage value-function elements after completing the square in u.

    Stage cost ½xᵀQxx x + xᵀQxu u + ½uᵀQuu u + lxᵀx + luᵀu with dynamics
    x' = A x + B u + r is transformed by u = ũ + D x + d,
    D = −Quu⁻¹Qxuᵀ, d = −Quu⁻¹lu, to a cross-term-free stage:
        x' = (A + BD) x + B ũ + (r + Bd)
        cost ½xᵀ(Qxx + Qxu D) x + (lx + Qxu d)ᵀ x + ½ũᵀQuu ũ + const.
    """
    def one(cs: CondensedStage):
        L = chol_rescue(0.5 * (cs.Quu + cs.Quu.T), reg)
        D = -jax.scipy.linalg.cho_solve((L, True), cs.Qxu.T)
        d = -jax.scipy.linalg.cho_solve((L, True), cs.lu)
        A_t = cs.A + cs.B @ D
        b_t = cs.xres + cs.B @ d
        C = cs.B @ jax.scipy.linalg.cho_solve((L, True), cs.B.T)
        J = cs.Qxx + cs.Qxu @ D
        J = 0.5 * (J + J.T)
        eta = -(cs.lx + cs.Qxu @ d)
        return A_t, b_t, C, eta, J

    return jax.vmap(one)(stages)


def _combine(e_i, e_j):
    """Associative combination of temporally ordered elements (i before j)."""
    A_i, b_i, C_i, eta_i, J_i = e_i
    A_j, b_j, C_j, eta_j, J_j = e_j
    nx = A_i.shape[-1]
    I = jnp.eye(nx, dtype=A_i.dtype)
    # batched: leading dims broadcast through linalg.solve
    ICJ = I + C_i @ J_j
    IJC = I + J_j @ C_i
    ICJ_inv_Ai = jnp.linalg.solve(ICJ, A_i)
    A_ij = A_j @ ICJ_inv_Ai
    b_ij = (A_j @ jnp.linalg.solve(
        ICJ, (b_i + (C_i @ eta_j[..., None])[..., 0])[..., None]))[..., 0] \
        + b_j
    C_ij = A_j @ jnp.linalg.solve(ICJ, C_i) @ jnp.swapaxes(A_j, -1, -2) + C_j
    rhs = eta_j - (J_j @ b_i[..., None])[..., 0]
    eta_ij = (jnp.swapaxes(A_i, -1, -2) @ jnp.linalg.solve(
        IJC, rhs[..., None]))[..., 0] + eta_i
    J_ij = jnp.swapaxes(A_i, -1, -2) @ jnp.linalg.solve(IJC, J_j) @ A_i + J_i
    J_ij = 0.5 * (J_ij + jnp.swapaxes(J_ij, -1, -2))
    return A_ij, b_ij, C_ij, eta_ij, J_ij


def parallel_backward(P_term, s_term, stages: CondensedStage, reg=0.0):
    """O(log N)-depth backward pass. Returns (P (N+1,nx,nx), s (N+1,nx),
    policies LQRPolicy stacked (N,...)) identical (to solver precision) to
    `recursion.backward_recursion` with an all-zero switching mask."""
    nx = P_term.shape[0]
    dtype = P_term.dtype
    N = stages.A.shape[0]

    elems = _make_elements(stages, reg)
    zero_m = jnp.zeros((1, nx, nx), dtype)
    term = (zero_m, jnp.zeros((1, nx), dtype), zero_m,
            -s_term[None], P_term[None])
    elems = jax.tree_util.tree_map(
        lambda a, t: jnp.concatenate([a, t], axis=0), elems, term)

    # Suffix products e_k ⊗ … ⊗ e_N. With reverse=True JAX flips the
    # array before a forward scan, so fn receives (later, earlier);
    # swap back to keep _combine's earlier-first convention.
    suffix = jax.lax.associative_scan(
        lambda a, b: _combine(b, a), elems, reverse=True)
    _, _, _, eta, J = suffix
    P = J
    s = -eta

    # per-stage gains from the (now known) cost-to-go — one vmapped pass,
    # reusing the serial factorizer's stage math (sw rows disabled).
    ns = stages.Cx.shape[1]
    sw_zero = jnp.zeros((N, ns), dtype)
    _, _, pols = jax.vmap(
        lambda Pn, sn, cs, m: backward_step(Pn, sn, cs, m, reg=reg)
    )(P[1:], s[1:], stages, sw_zero)
    return P, s, pols


def parallel_rollout(dx0, stages: CondensedStage, pols: LQRPolicy):
    """O(log N)-depth forward rollout: prefix composition of the
    closed-loop affine maps x' = (A + BK) x + (Bk + r)."""
    M = stages.A + stages.B @ pols.K
    c = stages.xres + (stages.B @ pols.k[..., None])[..., 0]

    def comp(e_i, e_j):
        M_i, c_i = e_i
        M_j, c_j = e_j
        return M_j @ M_i, (M_j @ c_i[..., None])[..., 0] + c_j

    Mp, cp = jax.lax.associative_scan(comp, (M, c))
    dx_tail = (Mp @ dx0[..., None])[..., 0] + cp
    dx = jnp.concatenate([dx0[None], dx_tail], axis=0)
    du = (pols.K @ dx[:-1][..., None])[..., 0] + pols.k
    dxi = (pols.Kxi @ dx[:-1][..., None])[..., 0] + pols.kxi
    return dx, du, dxi
