"""Pallas TPU kernels (SURVEY.md §7 P6).

The profile-driven round-4 finding (PROFILE_r04.json) is that the solver
is dispatch/fusion-bound small dense algebra; the biggest kernel-shaped
residual is the batched small-matrix Cholesky + triangular-inverse chain
(~7-8 ms per 10k instances through XLA's cholesky + triangular_solve).
`ops.chol` implements it as a single batch-on-lanes Pallas kernel.

Measured on the chip (tools/chol_kernel_bench.py, B=10240, amortized
timings include a ~20 ms dispatch floor — subtract it for true compute):

    n=12: xla 30.1 ms  pallas 27.0 ms   (true ~10 -> ~7)
    n=18: xla 28.3 ms  pallas 26.2 ms   (true ~8.3 -> ~6.2)
    n=30: xla 37.7 ms  pallas 26.7 ms   (true ~17.7 -> ~6.7, 2.6x)

Integration note: the solver batches scenarios by OUTER vmap over
unbatched per-stage functions, which composes poorly with a kernel that
wants the batch axis laid out on lanes — production wiring needs
explicit-batch entry points (future work); the kernel, its correctness
test (tests/test_ops.py, interpreter mode), and the TPU micro-benchmark
are the measured groundwork.
"""
from .chol import chol_tri_inv  # noqa: F401
