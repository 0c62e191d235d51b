"""Batched small-matrix factorization ops (SURVEY.md §7 P6).

The profile-driven finding (PROFILE_r04/r05) is that the solver is
dispatch/fusion-bound small dense algebra, and the single biggest
kernel-shaped cost was the batched small-matrix Cholesky +
triangular-inverse chain through XLA's `cholesky` + `triangular_solve`
custom calls: 13.7 ms (n=12) / 20.9 ms (n=18) per 10240-instance batch
of chained factorizations on-chip.

Two replacements, both measured (tools/chol_kernel_bench.py):

  - `ops.smallchol` (PRODUCTION, round 5): fully unrolled
    Cholesky–Banachiewicz + forward substitution in pure JAX scalars.
    Under the solver's nested vmap every scalar becomes a batched
    elementwise op and the whole factorization fuses into a few VPU
    kernels: 0.56 ms (n=12) / 1.69 ms (n=18) per 10240 — 12-24x over
    the XLA chain — and it composes with vmap at any nesting depth.
    Wired into ocp/state_equation + riccati/recursion (env `IDOCP_CHOL`
    selects backends for A/B runs).
  - `ops.chol` (alternative): one batch-on-lanes Pallas kernel. Fastest
    at explicit (B, n, n) batches of n=18 (0.62 ms/10240) but its vmap
    batching rule turns outer batch axes into grid steps, so inside the
    solver's vmap structure it loses to the unrolled path (1.29 vs
    1.12 ms at n=18, B=512 x N=20). Selectable via IDOCP_CHOL=pallas.
"""
from .chol import chol_tri_inv  # noqa: F401
from .smallchol import chol, chol_tri_inv as chol_tri_inv_unrolled  # noqa: F401
from .smallchol import tri_inv  # noqa: F401
