"""MPC drivers: gait generation + receding-horizon solving.

Reference: the ANYmal trotting MPC example (idocp `examples/anymal/
mpc_benchmark.cpp` ⚠, SURVEY.md §3.3): a hand-built ContactSequence of
touchdown/lift DiscreteEvents with periodic footholds, shifted as the gait
proceeds, one `update_solution` per control period.
"""
from __future__ import annotations

import dataclasses

import numpy as np

from ..hybrid.schedule import ContactSequence

# leg index order matches models.anymal: LF, LH, RF, RH
_PAIR_A = (0, 3)  # LF + RH
_PAIR_B = (1, 2)  # LH + RF


@dataclasses.dataclass
class TrotGait:
    """Periodic trot schedule generator for a quadruped with 4 contacts."""
    swing_time: float = 0.25
    double_support_time: float = 0.05
    step_length: float = 0.15
    step_height: float = 0.1  # used by swing-foot cost references
    t_start: float = 0.5      # stand still before the first step

    def cycle_time(self):
        return 2 * (self.swing_time + self.double_support_time)

    def build_sequence(self, feet0: np.ndarray, t0: float, t_end: float
                       ) -> ContactSequence:
        """Events covering (t0, t_end]: alternate swing of diagonal pairs.
        feet0: (4, 3) initial foothold positions."""
        seq = ContactSequence(4, [True] * 4, feet0.copy())
        t = self.t_start
        feet = feet0.copy()
        pair_a = True
        half = self.swing_time + self.double_support_time
        while t < t_end:
            pair = _PAIR_A if pair_a else _PAIR_B
            lift_active = np.ones(4, dtype=bool)
            for i in pair:
                lift_active[i] = False
            if t > t0:
                seq.push_back(t, lift_active, feet.copy())
            t_td = t + self.swing_time
            feet = feet.copy()
            for i in pair:
                feet[i, 0] += self.step_length
            if t_td > t0 and t_td <= t_end:
                seq.push_back(t_td, np.ones(4, dtype=bool), feet.copy())
            t += half
            pair_a = not pair_a
        return seq


class MPC:
    """Receding-horizon wrapper: rebuilds the schedule each control step
    and performs one warm-started Newton iteration (reference:
    OCPSolver::updateSolution usage in the MPC loop)."""

    def __init__(self, solver, gait: TrotGait, feet0, t_end=1e9):
        self.solver = solver
        self.gait = gait
        self.feet0 = np.asarray(feet0)
        self.t_end = t_end

    def schedule_at(self, t):
        seq = self.gait.build_sequence(self.feet0, t, t + self.solver.T + 1.0)
        return seq.discretize(t, self.solver.T, self.solver.N,
                              dtype=self.solver.dtype)

    def step(self, t, q, v):
        sched = self.schedule_at(t)
        stats = self.solver.update_solution(t, q, v, sched)
        return self.solver.solution.u[0], stats

    def step_with_policy(self, t, q, v):
        """update_solution + the stage-0 LQR feedback policy around the
        NEW iterate (reference: the feedback-policy getters used to apply
        Riccati gains at sim rate between MPC updates, riccati/
        lqr_policy.hpp; VERDICT r4 next-item #8).

        Returns (u0, policy_fn, stats) where policy_fn(q_sim, v_sim)
        evaluates u0 + K0·(x_sim ⊖ x0) — first-order state feedback that
        tracks the planned trajectory between control updates instead of
        holding u0 constant (zero-order hold)."""
        import jax.numpy as jnp

        from ..robot import model as model_mod
        sched = self.schedule_at(t)
        stats = self.solver.update_solution(t, q, v, sched)
        sol = self.solver.solution
        pols = self.solver.get_lqr_policy(t, q, v, sched)
        K0 = pols.K[0]
        u0, q0s, v0s = sol.u[0], sol.q[0], sol.v[0]
        model = self.solver.model

        def policy(q_sim, v_sim):
            dx = jnp.concatenate([
                model_mod.difference(model, q0s, q_sim), v_sim - v0s])
            return u0 + K0 @ dx

        return u0, policy, stats


class BatchedMPC:
    """Receding-horizon driver over a batch of scenarios with PER-SCENARIO
    gait phases (BASELINE config #5: independent "initial states/gaits"
    per chip). Schedules are built by the native batched discretizer
    (hybrid/native.discretize_batch — the C++ path the per-step Python
    rebuild was the host bottleneck for, VERDICT r2 weak #8) and enter the
    jitted batched update with a leading batch axis (extra_axes=(0,)).
    """

    def __init__(self, solver, gait: TrotGait, feet0, phase_offsets,
                 mesh=None):
        from ..parallel.batch import BatchedSolver
        self.solver = solver
        self.gait = gait
        self.feet0 = np.asarray(feet0)
        #: per-scenario gait phase shifts (B,): scenario b runs the gait
        #: with t_start = gait.t_start + phase_offsets[b]
        self.phase_offsets = np.asarray(phase_offsets, float)
        self.bs = BatchedSolver(solver, mesh=mesh, extra_axes=(0,))

    @property
    def batch(self):
        return len(self.phase_offsets)

    def schedules_at(self, t):
        from ..hybrid.native import discretize_batch
        seqs = []
        for off in self.phase_offsets:
            g = dataclasses.replace(self.gait,
                                    t_start=self.gait.t_start + off)
            seqs.append(g.build_sequence(self.feet0, t,
                                         t + self.solver.T + 1.0))
        return discretize_batch(seqs, np.full(self.batch, t),
                                self.solver.T, self.solver.N,
                                dtype=self.solver.dtype)

    def step(self, t, sol_b, q_b, v_b):
        """One warm-started Newton iteration per scenario; returns
        (new batched Solution, first-interval torques (B, nu), stats)."""
        sched_b = self.schedules_at(t)
        sol_b, stats = self.bs.update(sol_b, t, q_b, v_b, sched_b)
        return sol_b, sol_b.u[:, 0], stats
