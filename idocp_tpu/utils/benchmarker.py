"""Benchmark harness (reference: `utils/ocp_benchmarker.hpp` ⚠ —
OCPBenchmarker::testCPUTime / testConvergence; SURVEY.md §5 'tracing').

Times K warm-started solver iterations with proper device synchronization
(block_until_ready, compile excluded) and reports average per-iteration
wall time, solves/s, and final KKT error. Works with any driver exposing
`update_solution(...)` / `kkt_error(...)` (OCPSolver, UnconstrOCPSolver,
ParNMPC variants) and with BatchedSolver (pass batch= the scenario count).
"""
from __future__ import annotations

import dataclasses
import time

import jax


@dataclasses.dataclass
class BenchmarkResult:
    iterations: int
    batch: int
    avg_ms_per_iteration: float
    solves_per_s: float
    kkt_error: float

    def __str__(self):
        return (f"avg {self.avg_ms_per_iteration:.3f} ms/iter, "
                f"{self.solves_per_s:.1f} solves/s "
                f"(batch={self.batch}, iters={self.iterations}), "
                f"KKT error {self.kkt_error:.3e}")


def benchmark_solver(solver, t, q, v, *extra, iterations: int = 20,
                     batch: int = 1) -> BenchmarkResult:
    """Run `iterations` warm-started Newton updates and time them.

    First call compiles and is excluded (reference benchmarks similarly
    warm up before timing). extra = (schedule,) for contact solvers.
    """
    stats = solver.update_solution(t, q, v, *extra)  # compile + warm-up
    jax.block_until_ready(stats.cost)
    t0 = time.perf_counter()
    for _ in range(iterations):
        stats = solver.update_solution(t, q, v, *extra)
    jax.block_until_ready(stats.cost)
    wall = time.perf_counter() - t0
    kkt = float(solver.kkt_error(t, q, v, *extra))
    return BenchmarkResult(
        iterations=iterations, batch=batch,
        avg_ms_per_iteration=1e3 * wall / iterations,
        solves_per_s=batch * iterations / wall,
        kkt_error=kkt)


def benchmark_convergence(solver, t, q, v, *extra, iterations: int = 10):
    """Reference OCPBenchmarker::testConvergence: print per-iteration KKT
    error; returns the list of errors."""
    errs = [float(solver.kkt_error(t, q, v, *extra))]
    for _ in range(iterations):
        solver.update_solution(t, q, v, *extra)
        errs.append(float(solver.kkt_error(t, q, v, *extra)))
    return errs
