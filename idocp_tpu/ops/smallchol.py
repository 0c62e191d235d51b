"""Unrolled small-matrix Cholesky + triangular inverse (pure JAX).

The solver's dense factorizations are robot-sized (n = 12..30) SPD
matrices in enormous batches (B x N stage instances). XLA lowers
`jnp.linalg.cholesky` / `solve_triangular` to LAPACK-style custom calls
that are serial per matrix and serial over RHS columns — a measured hot
spot on TPU (round-4 profile: `contact_factors` / the impulse sweep;
reference analogue: the hand-tuned Eigen LLT inner loops of idocp
`ocp/contact_dynamics.hpp`).

The TPU-native fix is to have NO factorization kernel at all: unroll the
Cholesky–Banachiewicz recurrence and the forward substitution for L^{-1}
into ~n^3/3 scalar ops on a SINGLE matrix. Under (nested) vmap every
scalar becomes a batched elementwise op, so the whole factorization fuses
into a few VPU kernels with the batch on the lane dimension —
automatically, at any vmap nesting depth, with no layout plumbing. This
out-performed both the XLA custom-call chain and the round-4 Pallas
batch-on-lanes kernel (`ops/chol.py`) on-chip precisely because it
composes with the solver's existing vmap structure instead of fighting it
(measured in PROFILE_r05.json: tools/chol_kernel_bench.py).

Backend selection (trace-time, env `IDOCP_CHOL`):
  - "auto" (default): unrolled for n <= UNROLL_MAX, XLA custom call above;
  - "unrolled" / "xla": force either path (A/B measurement hook);
  - "pallas": route `chol_tri_inv` through the batch-on-lanes Pallas
    kernel (`ops/chol.py`) — wins at explicit (B, n, n) batches of n=18
    (0.62 vs 1.69 ms/10240 on-chip) but loses under the solver's nested
    vmap (1.29 vs 1.12 ms at n=18, 0.83 vs 0.60 at n=12), where its
    batching rule turns vmap axes into grid steps; kept as the measured
    alternative, not the default.
NaN semantics match `jnp.linalg.cholesky`: a non-SPD matrix yields NaN
rows (rsqrt of a negative pivot), which `riccati.recursion.chol_rescue`
relies on for its Levenberg rescue ladder.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp

#: unrolling emits O(n^3/3) scalar ops per factorization; past this size
#: XLA compile time blows up (measured: n=30 is already minutes on CPU)
#: and the custom call wins anyway. The solver's hot factorizations are
#: M (nv<=18), the contact Schur complement S (nf<=12) and the condensed
#: control Hessian G (nu<=12) — all well under the cap.
UNROLL_MAX = 24


def _backend(n: int) -> str:
    mode = os.environ.get("IDOCP_CHOL", "auto")
    if mode == "auto":
        return "unrolled" if n <= UNROLL_MAX else "xla"
    return mode


def _chol_scalars(A):
    """Lower-triangular Cholesky factor as an n x n list-of-lists of
    scalars (entries above the diagonal are None), plus the reciprocal
    diagonal 1/L[i][i] (free byproduct of the rsqrt pivot)."""
    n = A.shape[-1]
    L = [[None] * n for _ in range(n)]
    dinv = [None] * n
    for i in range(n):
        s = A[..., i, i]
        for k in range(i):
            s = s - L[i][k] * L[i][k]
        d = jax.lax.rsqrt(s)
        dinv[i] = d
        L[i][i] = s * d  # sqrt(s)
        for j in range(i + 1, n):
            t = A[..., j, i]
            for k in range(i):
                t = t - L[j][k] * L[i][k]
            L[j][i] = t * d
    return L, dinv


def _stack_lower(L, zero, n):
    rows = [jnp.stack([L[i][j] if j <= i and L[i][j] is not None else zero
                       for j in range(n)], axis=-1) for i in range(n)]
    return jnp.stack(rows, axis=-2)


def chol(A):
    """Lower Cholesky factor of SPD A (..., n, n) — unrolled for small n
    (see module docstring), XLA custom call otherwise."""
    n = A.shape[-1]
    if _backend(n) != "unrolled":
        return jnp.linalg.cholesky(A)
    L, _ = _chol_scalars(A)
    return _stack_lower(L, jnp.zeros_like(A[..., 0, 0]), n)


def _tri_inv_scalars(L, dinv):
    """X = L^{-1} by unrolled forward substitution on the scalar grid."""
    n = len(dinv)
    X = [[None] * n for _ in range(n)]
    for c in range(n):
        X[c][c] = dinv[c]
        for r in range(c + 1, n):
            t = L[r][c] * X[c][c]
            for k in range(c + 1, r):
                t = t + L[r][k] * X[k][c]
            X[r][c] = -t * dinv[r]
    return X


def tri_inv(L):
    """Inverse of a lower-triangular factor (..., n, n)."""
    n = L.shape[-1]
    if _backend(n) != "unrolled":
        eye = jnp.broadcast_to(jnp.eye(n, dtype=L.dtype), L.shape)
        return jax.scipy.linalg.solve_triangular(L, eye, lower=True)
    Ls = [[L[..., i, j] if j <= i else None for j in range(n)]
          for i in range(n)]
    dinv = [1.0 / L[..., i, i] for i in range(n)]
    X = _tri_inv_scalars(Ls, dinv)
    return _stack_lower(X, jnp.zeros_like(L[..., 0, 0]), n)


def chol_tri_inv(A):
    """L^{-1} for A = L L^T in one fused unrolled pass (no intermediate
    L materialization — the factor scalars feed the substitution
    directly)."""
    n = A.shape[-1]
    be = _backend(n)
    if be == "pallas":
        from .chol import chol_tri_inv as _pallas_ctinv
        if A.ndim == 2:
            return _pallas_ctinv(A[None])[0]
        flat = A.reshape((-1, n, n))
        return _pallas_ctinv(flat).reshape(A.shape)
    if be != "unrolled":
        return tri_inv(jnp.linalg.cholesky(A))
    L, dinv = _chol_scalars(A)
    X = _tri_inv_scalars(L, dinv)
    return _stack_lower(X, jnp.zeros_like(A[..., 0, 0]), n)
