"""Whole-body contact OCP solver (the reference's main `OCPSolver`,
idocp `solver/ocp_solver.hpp`; SURVEY.md L6, call stack §3.1).

Handles floating-base robots with point contacts, impulse events (mask-
gated impulse maps), Baumgarte-stabilized contact constraints, and
switching (touchdown) constraints — all static-shape via HorizonSchedule
masks. One jitted Newton iteration per `update_solution` call.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..constraints import pdipm
from ..cost.base import EvalContext
from ..hybrid.schedule import HorizonSchedule
from ..ocp import stage as stage_mod
from ..ocp.data import Solution, zero_solution
from ..robot.contact import ContactModel
from .core import make_direction_fn, make_kkt_error_fn, make_update_fn
from .options import SolverOptions


class OCPSolver:
    #: if not None, use the parallel-in-time backward-correction direction
    #: with this many sweeps (reference ParNMPCSolver; see parnmpc_solver.py)
    _parnmpc_sweeps = None

    def __init__(self, model, contact_model: ContactModel, cost, constraints,
                 T, N, options: SolverOptions = SolverOptions(),
                 dtype=jnp.float64):
        self.model = model
        self.cm = contact_model
        self.cost = tuple(cost)
        self.constraints = tuple(constraints)
        self.T, self.N = float(T), int(N)
        self.options = options
        self.dtype = dtype
        self._ctx = EvalContext(model=model, contact_model=contact_model)
        N_ = self.N
        cm = contact_model
        ctx = self._ctx

        def linearize_all(sol: Solution, t, q_meas, v_meas,
                          sched: HorizonSchedule):
            ts = t + sched.t_offset

            def one(tk, dtk, qk, vk, ak, fk, uk, qn, vn, sl, dl,
                    ca, cp, im, ic, swc, swp):
                return stage_mod.linearize_contact_stage(
                    model, cm, self.cost, self.constraints, options,
                    tk, dtk, qk, vk, ak, fk, uk, qn, vn, sl, dl,
                    ca, cp, im, ic, None, swc, swp, ctx)

            return jax.vmap(one)(
                ts, sched.dt, sol.q[:N_], sol.v[:N_], sol.a, sol.f, sol.u,
                sol.q[1:], sol.v[1:],
                {k: v[:N_] for k, v in sol.slack.items()},
                {k: v[:N_] for k, v in sol.dual.items()},
                sched.contact_active, sched.contact_pos,
                sched.imp_mask, sched.imp_contact,
                sched.sw_contact, sched.sw_pos)

        def terminal_fn(sol: Solution, t, sched=None):
            return stage_mod.terminal_quad(
                model, self.cost, self.constraints, options,
                t + self.T, sol.q[N_], sol.v[N_],
                {k: v[N_] for k, v in sol.slack.items()},
                {k: v[N_] for k, v in sol.dual.items()}, ctx)

        def evaluate_all(sol: Solution, t, q_meas, v_meas,
                         sched: HorizonSchedule):
            """(cost+barrier, L1 violation) for line-search trials."""
            ts = t + sched.t_offset

            def one(tk, dtk, qk, vk, ak, fk, uk, qn, vn, sl,
                    ca, cp, im, ic, swc, swp):
                return stage_mod.evaluate_contact_stage(
                    model, cm, self.cost, self.constraints, options,
                    tk, dtk, qk, vk, ak, fk, uk, qn, vn, sl,
                    ca, cp, im, ic, swc, swp, ctx)

            c_st, v_st = jax.vmap(one)(
                ts, sched.dt, sol.q[:N_], sol.v[:N_], sol.a, sol.f, sol.u,
                sol.q[1:], sol.v[1:],
                {k: v[:N_] for k, v in sol.slack.items()},
                sched.contact_active, sched.contact_pos,
                sched.imp_mask, sched.imp_contact,
                sched.sw_contact, sched.sw_pos)
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
            w_split=model.nv + cm.max_dimf, evaluate_all=evaluate_all,
            parnmpc_sweeps=self._parnmpc_sweeps))
        self._kkt = jax.jit(make_kkt_error_fn(
            model, options, linearize_all, terminal_fn, N_))
        self._direction = jax.jit(make_direction_fn(
            model, options, linearize_all, terminal_fn))
        self._init_constraints = jax.jit(self._make_init_constraints())
        self.solution: Solution = None

    # ------------------------------------------------------------------
    def _make_init_constraints(self):
        options, ctx = self.options, self._ctx
        N_ = self.N
        comps = self.constraints
        dtype = self.dtype

        def init(sol: Solution, sched: HorizonSchedule):
            fmask = jnp.repeat(
                sched.contact_active.astype(dtype), 3, axis=1)  # (N, nf)
            slack, dual = {}, {}
            for comp in comps:
                def g_at(qk, vk, ak, fk, uk, fm, comp=comp):
                    g, _ = comp.evaluate(ctx, qk, vk, ak, fk, uk, fm)
                    return g
                g_stages = jax.vmap(g_at)(
                    sol.q[:N_], sol.v[:N_], sol.a, sol.f, sol.u, fmask)
                g_term = g_at(sol.q[N_], sol.v[N_],
                              jnp.zeros_like(sol.a[0]),
                              jnp.zeros_like(sol.f[0]),
                              jnp.zeros_like(sol.u[0]),
                              jnp.zeros_like(sol.f[0]))
                g_all = jnp.concatenate([g_stages, g_term[None]], axis=0)
                s_, d_ = pdipm.init_slack_dual(g_all, options.barrier,
                                               options.min_slack)
                slack[comp.name] = s_
                dual[comp.name] = d_
            import dataclasses
            return dataclasses.replace(sol, slack=slack, dual=dual)

        return init

    # ------------------------------------------------------------------
    def set_solution(self, q0, v0=None, f0=None):
        """Constant warm start; f0 defaults to even weight distribution on
        all contact slots (reference examples: setSolution("f", mg/4)."""
        m, cm = self.model, self.cm
        sol = zero_solution(
            m.nq, m.nv, m.nu, cm.max_dimf, self.N,
            jnp.asarray(q0, self.dtype),
            None if v0 is None else jnp.asarray(v0, self.dtype),
            dtype=self.dtype)
        if f0 is None:
            import numpy as np
            total = float(jnp.sum(m.mass)) * 9.81
            f_each = np.zeros(cm.max_dimf)
            for i in range(cm.nc):
                f_each[3 * i + 2] = total / cm.nc
            f0 = jnp.asarray(f_each, self.dtype)
        sol = __import__("dataclasses").replace(
            sol, f=jnp.tile(jnp.asarray(f0, self.dtype)[None], (self.N, 1)))
        self.solution = sol

    def init_constraints(self, schedule: HorizonSchedule):
        self.solution = self._init_constraints(self.solution, schedule)

    def update_solution(self, t, q, v, schedule: HorizonSchedule):
        q = jnp.asarray(q, self.dtype)
        v = jnp.asarray(v, self.dtype)
        self.solution, stats = self._update(self.solution, t, q, v, schedule)
        return stats

    def kkt_error(self, t, q, v, schedule: HorizonSchedule):
        return float(self._kkt(self.solution, t,
                               jnp.asarray(q, self.dtype),
                               jnp.asarray(v, self.dtype), schedule))

    def solve(self, t, q, v, schedule, max_iterations=None, tol=None):
        it_cap = max_iterations or self.options.max_iterations
        tol = tol or self.options.kkt_tol
        stats = None
        for _ in range(it_cap):
            stats = self.update_solution(t, q, v, schedule)
            if self.kkt_error(t, q, v, schedule) < tol:
                break
        return stats

    def get_solution(self, name: str):
        return getattr(self.solution, name)
