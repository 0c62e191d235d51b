"""Batched small-matrix Cholesky + triangular inverse as ONE Pallas
TPU kernel (batch-on-lanes layout).

Problem shape: thousands of independent SPD matrices of robot-sized
dimension (n = 12..32) — MXU-hostile, and through XLA it costs a
`cholesky` kernel plus a `triangular_solve` kernel that is serial over
RHS columns. Here the batch axis is laid out on the 128-wide lane
dimension, so every scalar step of the factorization is a (rows, 128)
vector op over 128 problems at once, and the whole chol + forward
substitution chain runs in one kernel launch from VMEM:

    A (B, n, n)  ->  transpose to (n, n, B)  ->  grid over B/128 tiles
    kernel: unrolled Cholesky-Banachiewicz on (n_i, 128) row slices,
            then forward substitution for L^{-1}
    -> transpose back.

`chol_tri_inv(A)` returns L^{-1} (lower-triangular inverse factor of
A = L L^T, matching ocp.state_equation.tri_inv). Falls back to the
XLA path off-TPU; `interpret=True` is used under the CPU test suite.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _kernel(n: int):
    def kernel(a_ref, out_ref):
        # a_ref: (n, n, LANES) — one tile of problems on the lane axis
        L = [[None] * n for _ in range(n)]
        # Cholesky (unrolled; each op is a (LANES,) vector over problems)
        for i in range(n):
            s = a_ref[i, i, :]
            for k in range(i):
                s = s - L[i][k] * L[i][k]
            d = jax.lax.rsqrt(s)
            L[i][i] = 1.0 / d  # sqrt(s)
            for j in range(i + 1, n):
                t = a_ref[j, i, :]
                for k in range(i):
                    t = t - L[j][k] * L[i][k]
                L[j][i] = t * d
        # forward substitution: X = L^{-1} (unit RHS columns)
        for c in range(n):
            X = [None] * n
            for r in range(n):
                if r < c:
                    continue
                t = (jnp.ones_like(L[0][0]) if r == c
                     else jnp.zeros_like(L[0][0]))
                for k in range(c, r):
                    t = t - L[r][k] * X[k]
                X[r] = t / L[r][r]
                out_ref[r, c, :] = X[r]
            for r in range(c):
                out_ref[r, c, :] = jnp.zeros_like(L[0][0])

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def chol_tri_inv(A, interpret: bool = False):
    """L^{-1} for A = L L^T, batched: A (B, n, n) -> (B, n, n) lower
    triangular. B is padded to a multiple of 128 internally."""
    B, n, _ = A.shape
    dtype = A.dtype
    Bp = ((B + LANES - 1) // LANES) * LANES
    At = jnp.transpose(A, (1, 2, 0))                     # (n, n, B)
    if Bp != B:
        At = jnp.pad(At, ((0, 0), (0, 0), (0, Bp - B)))
        # padded problems must stay factorizable
        eye = jnp.eye(n, dtype=dtype)[:, :, None]
        pad_mask = (jnp.arange(Bp) >= B)[None, None, :]
        At = jnp.where(pad_mask, eye, At)

    out = pl.pallas_call(
        _kernel(n),
        grid=(Bp // LANES,),
        in_specs=[pl.BlockSpec((n, n, LANES), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((n, n, LANES), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, n, Bp), dtype),
        interpret=interpret,
    )(At)
    return jnp.transpose(out[:, :, :B], (2, 0, 1))
