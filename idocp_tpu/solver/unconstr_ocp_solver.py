"""Unconstrained (fixed-base, contact-free) OCP solver — the reference's
iiwa14 fast path (idocp `solver/unconstr_ocp_solver.hpp`,
`unconstr/split_unconstr_ocp.hpp`; SURVEY.md L3'/L6, BASELINE config #1).

`update_solution` performs one Newton iteration (the MPC hot path,
reference call stack §3.1); `solve` iterates to tolerance. The object is a
thin stateful wrapper (reference-API parity: setSolution/getSolution/
initConstraints) around pure jitted functions.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..cost.base import EvalContext
from ..ocp import stage as stage_mod
from ..ocp.data import Solution, zero_solution
from ..constraints import pdipm
from .core import make_direction_fn, make_kkt_error_fn, make_update_fn
from .options import SolverOptions


class UnconstrOCPSolver:
    def __init__(self, model, cost, constraints, T, N,
                 options: SolverOptions = SolverOptions(),
                 dtype=jnp.float64):
        self.model = model
        self.cost = tuple(cost)
        self.constraints = tuple(constraints)
        self.T, self.N = float(T), int(N)
        self.dt = self.T / self.N
        self.options = options
        self.dtype = dtype
        self._ctx = EvalContext(model=model, contact_model=None)
        N_ = self.N
        dt = self.dt
        ctx = self._ctx

        def linearize_all(sol: Solution, t, q_meas, v_meas, *extra):
            ts = t + dt * jnp.arange(N_, dtype=dtype)

            def one(tk, qk, vk, ak, uk, qn, vn, sl, dl):
                return stage_mod.linearize_unconstr_stage(
                    model, self.cost, self.constraints, options,
                    tk, dt, qk, vk, ak, uk, qn, vn, sl, dl, ctx)

            return jax.vmap(one)(
                ts, sol.q[:N_], sol.v[:N_], sol.a, sol.u,
                sol.q[1:], sol.v[1:],
                {k: v[:N_] for k, v in sol.slack.items()},
                {k: v[:N_] for k, v in sol.dual.items()})

        def terminal_fn(sol: Solution, t, *extra):
            return stage_mod.terminal_quad(
                model, self.cost, self.constraints, options,
                t + self.T, sol.q[N_], sol.v[N_],
                {k: v[N_] for k, v in sol.slack.items()},
                {k: v[N_] for k, v in sol.dual.items()}, ctx)

        def evaluate_all(sol: Solution, t, q_meas, v_meas, *extra):
            """(cost+barrier, L1 violation) for line-search trials."""
            ts = t + dt * jnp.arange(N_, dtype=dtype)

            def one(tk, qk, vk, ak, uk, qn, vn, sl):
                return stage_mod.evaluate_unconstr_stage(
                    model, self.cost, self.constraints, options,
                    tk, dt, qk, vk, ak, uk, qn, vn, sl, ctx)

            c_st, v_st = jax.vmap(one)(
                ts, sol.q[:N_], sol.v[:N_], sol.a, sol.u,
                sol.q[1:], sol.v[1:],
                {k: v[:N_] for k, v in sol.slack.items()})
            c_t, v_t = stage_mod.evaluate_terminal(
                model, self.cost, self.constraints, options,
                t + self.T, sol.q[N_], sol.v[N_],
                {k: v[N_] for k, v in sol.slack.items()}, ctx)
            from ..robot import model as model_mod
            dq0 = model_mod.difference(model, sol.q[0], q_meas)
            viol = (jnp.sum(v_st) + v_t + jnp.sum(jnp.abs(dq0))
                    + jnp.sum(jnp.abs(v_meas - sol.v[0])))
            return jnp.sum(c_st) + c_t, viol

        self._update = jax.jit(make_update_fn(
            model, options, linearize_all, terminal_fn, N_,
            w_split=model.nv, evaluate_all=evaluate_all))
        self._kkt = jax.jit(make_kkt_error_fn(
            model, options, linearize_all, terminal_fn, N_))
        self._direction = jax.jit(make_direction_fn(
            model, options, linearize_all, terminal_fn))
        self._init_constraints = jax.jit(self._make_init_constraints())
        self.solution: Solution = None

    # ------------------------------------------------------------------
    def _make_init_constraints(self):
        model, options, ctx = self.model, self.options, self._ctx
        N_ = self.N
        comps = self.constraints

        def init(sol: Solution):
            zf = jnp.zeros((0,), sol.q.dtype)
            slack, dual = {}, {}
            for comp in comps:
                def g_at(qk, vk, ak, uk, comp=comp):
                    g, _ = comp.evaluate(ctx, qk, vk, ak, zf, uk, zf)
                    return g
                g_stages = jax.vmap(g_at)(sol.q[:N_], sol.v[:N_], sol.a,
                                          sol.u)
                g_term = g_at(sol.q[N_], sol.v[N_],
                              jnp.zeros_like(sol.a[0]),
                              jnp.zeros_like(sol.u[0]))
                g_all = jnp.concatenate([g_stages, g_term[None]], axis=0)
                s_, d_ = pdipm.init_slack_dual(g_all, options.barrier,
                                               options.min_slack)
                slack[comp.name] = s_
                dual[comp.name] = d_
            return Solution(**{**sol.__dict__, "slack": slack, "dual": dual})

        return init

    # ------------------------------------------------------------------
    def set_solution(self, q0, v0=None):
        """Constant warm start (reference: OCPSolver::setSolution)."""
        m = self.model
        self.solution = zero_solution(
            m.nq, m.nv, m.nu, 0, self.N, jnp.asarray(q0, self.dtype),
            None if v0 is None else jnp.asarray(v0, self.dtype),
            dtype=self.dtype,
            filter_size=(self.options.line_search_filter_size
                         if self.options.use_line_search else 0))

    def init_constraints(self, t=0.0):
        """reference: OCPSolver::initConstraints."""
        self.solution = self._init_constraints(self.solution)

    def update_solution(self, t, q, v):
        """One Newton iteration, warm-started (the MPC call)."""
        q = jnp.asarray(q, self.dtype)
        v = jnp.asarray(v, self.dtype)
        self.solution, stats = self._update(self.solution, t, q, v)
        return stats

    def kkt_error(self, t, q, v):
        return float(self._kkt(self.solution, t, jnp.asarray(q, self.dtype),
                               jnp.asarray(v, self.dtype)))

    def solve(self, t, q, v, max_iterations=None, tol=None):
        """Newton loop to tolerance (reference examples' benchmark loop).
        One linearization per iteration: converges on stats.kkt_error (the
        pre-step residual from the update's own linearization). Returns
        (last_stats, history list)."""
        it_cap = max_iterations or self.options.max_iterations
        tol = tol or self.options.kkt_tol
        stats, history = None, []
        for _ in range(it_cap):
            stats = self.update_solution(t, q, v)
            history.append(stats)
            if float(stats.kkt_error) < tol:
                break
        return stats, history

    def get_solution(self, name: str):
        return getattr(self.solution, name)

    def set_solution_component(self, name: str, value):
        """reference: OCPSolver::setSolution("q"/"v"/"a"/"u", value)."""
        import dataclasses as _dc
        if name not in ("q", "v", "a", "u"):
            raise KeyError(f"unknown solution component {name!r}")
        cur = getattr(self.solution, name)
        value = jnp.asarray(value, self.dtype)
        if value.ndim == cur.ndim - 1:
            value = jnp.broadcast_to(value[None], cur.shape)
        if value.shape != cur.shape:
            raise ValueError(
                f"{name}: expected shape {cur.shape}, got {value.shape}")
        self.solution = _dc.replace(self.solution, **{name: value})

    def get_lqr_policy(self, t, q, v):
        """Per-stage LQR feedback policies da = K dx + k at the current
        iterate (reference: feedback-policy getters; riccati/lqr_policy.hpp)."""
        out = self._direction(self.solution, t,
                              jnp.asarray(q, self.dtype),
                              jnp.asarray(v, self.dtype))
        return out[-1]
