"""Parallel-in-time NMPC solver drivers (reference: `ParNMPCSolver` /
`UnconstrParNMPCSolver`, idocp `solver/parnmpc_solver.hpp` ⚠ /
`solver/unconstr_parnmpc_solver.hpp` ⚠; SURVEY.md L5'/L6, call stack §3.4).

Same public API as the Riccati-based drivers; the Newton direction comes
from the backward-correction method (parnmpc.py): all stage saddle systems
are factorized concurrently (one batched vmap — the analogue of the
reference's OpenMP coarse update), coupled by cheap serial correction
sweeps (lax.scan). On TPU this trades the O(N) sequential depth of the
Riccati scan for O(sweeps) batched solves — the win the reference's README
benchmark shows for many threads appears here as shorter scan depth.

Note: the ParNMPC direction ignores switching (pure-state) constraints,
matching the reference's usage (its ParNMPC examples don't carry
switching constraints; use OCPSolver for gaits with touchdown events).
"""
from __future__ import annotations

from .ocp_solver import OCPSolver
from .unconstr_ocp_solver import UnconstrOCPSolver


class ParNMPCSolver(OCPSolver):
    """Whole-body contact ParNMPC (backward-correction) solver."""

    def __init__(self, *args, n_sweeps: int = 2, **kwargs):
        self._parnmpc_sweeps = int(n_sweeps)
        super().__init__(*args, **kwargs)


class UnconstrParNMPCSolver(UnconstrOCPSolver):
    """Fixed-base, contact-free ParNMPC solver (iiwa14 fast path)."""

    def __init__(self, *args, n_sweeps: int = 2, **kwargs):
        self._parnmpc_sweeps = int(n_sweeps)
        super().__init__(*args, **kwargs)
