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
    def __init__(self, model, contact_model: ContactModel, cost, constraints,
                 T, N, options: SolverOptions = SolverOptions(),
                 dtype=jnp.float64, impulse_cost=None,
                 max_impulse_stages: int = 4):
        self.model = model
        self.cm = contact_model
        self.cost = tuple(cost)
        # impulse-Λ components (ImpulseFrictionCone etc.) chain through the
        # impulse-map Jacobians inside the stage builder, not the named
        # space — split them out of the regular component list here.
        self.constraints = tuple(
            c for c in constraints if not getattr(c, "impulse", False))
        self.impulse_constraints = tuple(
            c for c in constraints if getattr(c, "impulse", False))
        self.T, self.N = float(T), int(N)
        self.options = options
        self.dtype = dtype
        self.impulse_cost = impulse_cost
        self._ctx = EvalContext(model=model, contact_model=contact_model)
        #: number of horizon slots that can carry an impulse map. The
        #: impulse implicit-derivative sweep (the most expensive stage
        #: subgraph) runs ONLY on these gathered slots instead of on every
        #: stage — a trot horizon has <=2 touchdowns in 20 stages.
        self.max_impulse_stages = max(1, min(int(max_impulse_stages),
                                             self.N))
        #: per-options jitted function sets, keyed by the (hashable) frozen
        #: SolverOptions — the barrier-continuation path swaps the static
        #: barrier by building (and caching) a sibling set (VERDICT r3
        #: next-item #7).
        self._fn_cache = {}
        fns = self._fns_for(options)
        self._update = fns["update"]
        self._kkt = fns["kkt"]
        self._direction = fns["direction"]
        self._linearize = fns["linearize"]
        self._imp_values_all = fns["imp_values_all"]
        self._init_constraints = jax.jit(self._make_init_constraints())
        self.solution: Solution = None

    def _fns_for(self, options: SolverOptions):
        if options not in self._fn_cache:
            self._fn_cache[options] = self._build_fns(options)
        return self._fn_cache[options]

    def _build_fns(self, options: SolverOptions):
        model, cm, ctx = self.model, self.cm, self._ctx
        N_ = self.N
        k_imp = self.max_impulse_stages
        impulse_cost = self.impulse_cost

        def _impulse_slots(sched: HorizonSchedule):
            """(slots (k,), slot_mask (k,)): indices of the (up to k)
            impulse stages; extra slots land on arbitrary non-impulse
            stages with mask 0 (their gated quantities are identity)."""
            order = jnp.argsort(jnp.logical_not(sched.imp_mask))
            slots = order[:k_imp]
            return slots, sched.imp_mask[slots]

        def _imp_quants_all(sol, sched):
            """Slot-gathered impulse quantities scattered to (N, ...)."""
            from ..ocp.state_equation import mass_and_contact_jacobian_fk
            from ..robot import spatial
            slots, slot_mask = _impulse_slots(sched)
            ic_s = sched.imp_contact[slots]

            def one(qk, vk, mk, ick):
                fkb = spatial.fk(model, qk)
                mj = mass_and_contact_jacobian_fk(model, cm, fkb)
                return stage_mod._impulse_quantities(
                    model, cm, qk, vk, mk.astype(qk.dtype), ick, mj, fkb)

            outs = jax.vmap(one)(sol.q[slots], sol.v[slots], slot_mask,
                                 ic_s)
            nv, nf = model.nv, cm.max_dimf
            dt_ = sol.v.dtype
            v_eff = sol.v[:N_].at[slots].set(outs[0])
            lam = jnp.zeros((N_, nf), dt_).at[slots].set(outs[1])
            Gq = jnp.zeros((N_, nv, nv), dt_).at[slots].set(outs[2])
            Gv = jnp.tile(jnp.eye(nv, dtype=dt_)[None], (N_, 1, 1)
                          ).at[slots].set(outs[3])
            Lq = jnp.zeros((N_, nf, nv), dt_).at[slots].set(outs[4])
            Lv = jnp.zeros((N_, nf, nv), dt_).at[slots].set(outs[5])
            return v_eff, lam, Gq, Gv, Lq, Lv

        def _imp_values_all(sol, sched):
            """Value-only slot gather: (v_eff (N, nv), lam (N, nf))."""
            from ..ocp.state_equation import impulse_map
            slots, slot_mask = _impulse_slots(sched)

            def one(qk, vk, mk, ick):
                vpost, lamk = impulse_map(model, cm, qk, vk, ick)
                mf = mk.astype(qk.dtype)
                return vk + mf * (vpost - vk), mf * lamk

            v_s, lam_s = jax.vmap(one)(sol.q[slots], sol.v[slots],
                                       slot_mask, sched.imp_contact[slots])
            nf = cm.max_dimf
            v_eff = sol.v[:N_].at[slots].set(v_s)
            lam = jnp.zeros((N_, nf), sol.v.dtype).at[slots].set(lam_s)
            return v_eff, lam

        def linearize_all(sol: Solution, t, q_meas, v_meas,
                          sched: HorizonSchedule):
            ts = t + sched.t_offset
            iq = _imp_quants_all(sol, sched)

            def one(tk, dtk, qk, vk, ak, fk, uk, qn, vn, sl, dl,
                    ca, cp, im, ic, swc, swp, iq_k):
                return stage_mod.linearize_contact_stage(
                    model, cm, self.cost, self.constraints, options,
                    tk, dtk, qk, vk, ak, fk, uk, qn, vn, sl, dl,
                    ca, cp, im, ic, swc, swp, ctx,
                    impulse_cost=impulse_cost,
                    impulse_constraints=self.impulse_constraints,
                    imp_quants=iq_k)

            return jax.vmap(one)(
                ts, sched.dt, sol.q[:N_], sol.v[:N_], sol.a, sol.f, sol.u,
                sol.q[1:], sol.v[1:],
                {k: v[:N_] for k, v in sol.slack.items()},
                {k: v[:N_] for k, v in sol.dual.items()},
                sched.contact_active, sched.contact_pos,
                sched.imp_mask, sched.imp_contact,
                sched.sw_contact, sched.sw_pos, iq)

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
            iv = _imp_values_all(sol, sched)

            def one(tk, dtk, qk, vk, ak, fk, uk, qn, vn, sl,
                    ca, cp, im, ic, swc, swp, iv_k):
                return stage_mod.evaluate_contact_stage(
                    model, cm, self.cost, self.constraints, options,
                    tk, dtk, qk, vk, ak, fk, uk, qn, vn, sl,
                    ca, cp, im, ic, swc, swp, ctx,
                    impulse_cost=impulse_cost,
                    impulse_constraints=self.impulse_constraints,
                    imp_values=iv_k)

            c_st, v_st = jax.vmap(one)(
                ts, sched.dt, sol.q[:N_], sol.v[:N_], sol.a, sol.f, sol.u,
                sol.q[1:], sol.v[1:],
                {k: v[:N_] for k, v in sol.slack.items()},
                sched.contact_active, sched.contact_pos,
                sched.imp_mask, sched.imp_contact,
                sched.sw_contact, sched.sw_pos, iv)
            c_t, v_t = stage_mod.evaluate_terminal(
                model, self.cost, self.constraints, options,
                t + self.T, sol.q[N_], sol.v[N_],
                {k: v[N_] for k, v in sol.slack.items()}, ctx)
            from ..robot import model as model_mod
            dq0 = model_mod.difference(model, sol.q[0], q_meas)
            viol = (jnp.sum(v_st) + v_t + jnp.sum(jnp.abs(dq0))
                    + jnp.sum(jnp.abs(v_meas - sol.v[0])))
            return jnp.sum(c_st) + c_t, viol

        return {
            "update": jax.jit(make_update_fn(
                model, options, linearize_all, terminal_fn, N_,
                w_split=model.nv + cm.max_dimf, evaluate_all=evaluate_all,
                max_sw_stages=k_imp)),
            "kkt": jax.jit(make_kkt_error_fn(
                model, options, linearize_all, terminal_fn, N_)),
            "direction": jax.jit(make_direction_fn(
                model, options, linearize_all, terminal_fn,
                max_sw_stages=k_imp)),
            # stage linearizer handle (diagnostics / tests)
            "linearize": jax.jit(linearize_all),
            "imp_values_all": _imp_values_all,
        }

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
            if self.impulse_constraints:
                from ..ocp.state_equation import impulse_map
                cm_ = self.cm
                model_ = self.model

                def lam_at(qk, vk, ic):
                    _, lam = impulse_map(model_, cm_, qk, vk, ic)
                    return lam

                lam_raw = jax.vmap(lam_at)(sol.q[:N_], sol.v[:N_],
                                           sched.imp_contact)
                m_st = sched.imp_mask.astype(dtype)
                lam_g = m_st[:, None] * lam_raw
                gates = m_st[:, None] * sched.imp_contact.astype(dtype)
                for comp in self.impulse_constraints:
                    g_stages = jax.vmap(
                        lambda l, gt, comp=comp: comp.evaluate_lam(l, gt)[0]
                    )(lam_g, gates)
                    g_term = jnp.full((1, comp.dim), -1.0, dtype)
                    g_all = jnp.concatenate([g_stages, g_term], axis=0)
                    s_, d_ = pdipm.init_slack_dual(g_all, options.barrier,
                                                   options.min_slack)
                    slack[comp.name] = s_
                    dual[comp.name] = d_
            import dataclasses
            return dataclasses.replace(sol, slack=slack, dual=dual)

        return init

    # ------------------------------------------------------------------
    def set_solution(self, q0, v0=None, f0=None, schedule=None):
        """Constant warm start (reference examples: setSolution("q"/"v"/"f")).

        Without a schedule, f0 defaults to even weight distribution over
        all contact slots. With a schedule, the robot's weight is spread
        over each stage's ACTIVE contacts only, and u is initialized to
        the actuated rows of RNEA(q0, v0, 0, f) — a dynamics-consistent
        start that keeps the first Newton step (and hence the
        line-search-accepted step size) small.
        """
        import dataclasses as _dc

        import numpy as np

        m, cm = self.model, self.cm
        dtype = self.dtype
        sol = zero_solution(
            m.nq, m.nv, m.nu, cm.max_dimf, self.N,
            jnp.asarray(q0, dtype),
            None if v0 is None else jnp.asarray(v0, dtype),
            dtype=dtype,
            filter_size=(self.options.line_search_filter_size
                         if self.options.use_line_search else 0))
        total = float(jnp.sum(m.mass)) * 9.81
        if schedule is not None and f0 is None:
            active = np.asarray(schedule.contact_active, dtype=bool)
            n_act = np.maximum(active.sum(axis=1, keepdims=True), 1)
            f = np.zeros((self.N, cm.max_dimf))
            for i in range(cm.nc):
                f[:, 3 * i + 2] = np.where(active[:, i],
                                           total / n_act[:, 0], 0.0)
            f_j = jnp.asarray(f, dtype)
            from ..robot import dynamics as _dyn
            qj = jnp.asarray(q0, dtype)
            vj = sol.v[0]
            zero_a = jnp.zeros(m.nv, dtype)

            def u_of(fk):
                fm = fk.reshape(cm.nc, 3)
                tau = _dyn.rnea(m, qj, vj, zero_a, cm.frame_ids, fm)
                return tau[m.nv - m.nu:]

            u_j = jax.vmap(u_of)(f_j)
            sol = _dc.replace(sol, f=f_j, u=u_j)
        else:
            if f0 is None:
                f_each = np.zeros(cm.max_dimf)
                for i in range(cm.nc):
                    f_each[3 * i + 2] = total / cm.nc
                f0 = jnp.asarray(f_each, dtype)
            sol = _dc.replace(
                sol, f=jnp.tile(jnp.asarray(f0, dtype)[None], (self.N, 1)))
        self.solution = sol

    def init_constraints(self, schedule: HorizonSchedule):
        self.check_schedule(schedule, for_update=False)
        self.solution = self._init_constraints(self.solution, schedule)

    def check_schedule(self, schedule: HorizonSchedule,
                       for_update: bool = True):
        """Host-side schedule validation (no device fetch on the hot path:
        builders cache the counts, see HorizonSchedule.host_counts).

        Guards the impulse-slot gather: a schedule with more touchdowns
        than `max_impulse_stages` would silently treat the overflow
        impulses as plain stages (identity v_eff, zero Λ) while their
        switching rows stayed active (VERDICT r3 missing #3 / ADVICE r3
        medium). The slot budget also sizes the parallel-in-time
        switching correction (riccati/parallel.parallel_constrained), so
        the same bound covers both paths. Switching rows are counted
        separately from impulse stages (ADVICE r4 medium: a hand-built
        schedule can set sw_contact without imp_mask; the parallel path
        keeps only max_impulse_stages switching-row stages, so an
        uncounted overflow would silently drop constraint rows)."""
        n_imp, n_sw = schedule.host_counts()
        if max(n_imp, n_sw) > self.max_impulse_stages:
            raise ValueError(
                f"schedule has {n_imp} impulse stages and {n_sw} "
                f"switching-row stages but the solver was built with "
                f"max_impulse_stages={self.max_impulse_stages}; raise "
                "max_impulse_stages (OCPSolver ctor) to cover the gait's "
                "touchdown count")

    def update_solution(self, t, q, v, schedule: HorizonSchedule):
        self.check_schedule(schedule)
        q = jnp.asarray(q, self.dtype)
        v = jnp.asarray(v, self.dtype)
        self.solution, stats = self._update(self.solution, t, q, v, schedule)
        return stats

    def kkt_error(self, t, q, v, schedule: HorizonSchedule):
        return float(self._kkt(self.solution, t,
                               jnp.asarray(q, self.dtype),
                               jnp.asarray(v, self.dtype), schedule))

    def solve(self, t, q, v, schedule, max_iterations=None, tol=None,
              barrier_schedule=None):
        """Newton loop to tolerance. One linearization per iteration:
        convergence is checked on stats.kkt_error (computed inside the
        update from its own linearization — the pre-step residual), so the
        loop does one extra cheap iteration instead of a second full
        linearize per step.

        barrier_schedule (default options.barrier_schedule): decreasing μ
        values; each runs a Newton stage to the loose tolerance
        max(tol, 10μ) with warm-started slack/dual state before the final
        stage at options.barrier (classic interior-point continuation).
        Returns (last_stats, history list)."""
        import dataclasses as _dc
        self.check_schedule(schedule)
        it_cap = max_iterations or self.options.max_iterations
        tol = tol or self.options.kkt_tol
        q = jnp.asarray(q, self.dtype)
        v = jnp.asarray(v, self.dtype)
        stats, history = None, []
        mus = barrier_schedule if barrier_schedule is not None \
            else self.options.barrier_schedule

        def _reset_filter():
            """The Fletcher–Leyffer filter memory is tied to the merit
            function; a μ switch changes the barrier term, so remembered
            (cost, violation) pairs from the previous μ would wrongly
            dominate trials — clear them at every stage transition."""
            sol = self.solution
            if sol.filter_cost.shape[-1]:
                self.solution = _dc.replace(
                    sol,
                    filter_cost=jnp.full_like(sol.filter_cost, jnp.inf),
                    filter_viol=jnp.full_like(sol.filter_viol, jnp.inf),
                    filter_ptr=jnp.zeros_like(sol.filter_ptr))

        for mu in mus:
            fns = self._fns_for(_dc.replace(self.options, barrier=float(mu)))
            stage_tol = max(tol, 10.0 * float(mu))
            _reset_filter()
            for _ in range(it_cap):
                self.solution, stats = fns["update"](
                    self.solution, t, q, v, schedule)
                history.append(stats)
                if float(stats.kkt_error) < stage_tol:
                    break
        if mus:
            _reset_filter()
        for _ in range(it_cap):
            self.solution, stats = self._update(self.solution, t, q, v,
                                                schedule)
            history.append(stats)
            if float(stats.kkt_error) < tol:
                break
        return stats, history

    def get_solution(self, name: str):
        return getattr(self.solution, name)

    def set_solution_component(self, name: str, value):
        """Overwrite one named solution component across the horizon
        (reference: OCPSolver::setSolution("q"/"v"/"a"/"f"/"u", value)).
        `value` may be a single stage row (broadcast over stages) or a
        full horizon-stacked array."""
        import dataclasses as _dc
        if name not in ("q", "v", "a", "f", "u"):
            raise KeyError(f"unknown solution component {name!r}")
        cur = getattr(self.solution, name)
        value = jnp.asarray(value, self.dtype)
        if value.ndim == cur.ndim - 1:
            value = jnp.broadcast_to(value[None], cur.shape)
        if value.shape != cur.shape:
            raise ValueError(
                f"{name}: expected shape {cur.shape}, got {value.shape}")
        self.solution = _dc.replace(self.solution, **{name: value})

    def get_lqr_policy(self, t, q, v, schedule: HorizonSchedule):
        """Per-stage LQR feedback policies du = K dx + k (and switching
        multipliers ξ = Kxi dx + kxi) from a Riccati factorization at the
        current iterate (reference: the OCPSolver feedback-policy getters
        used to interpolate controls between MPC updates; riccati/
        lqr_policy.hpp). Returns an LQRPolicy pytree stacked over N."""
        self.check_schedule(schedule)
        out = self._direction(self.solution, t,
                              jnp.asarray(q, self.dtype),
                              jnp.asarray(v, self.dtype), schedule)
        return out[-1]
