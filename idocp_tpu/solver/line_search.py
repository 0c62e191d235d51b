"""Filter line search, TPU-style.

TPU-native replacement for the reference's backtracking filter line search
(idocp `line_search/line_search.hpp`, `line_search/line_search_filter.hpp`;
SURVEY.md L6). The reference tries step sizes serially (shrink until the
Fletcher–Leyffer filter accepts) with an OpenMP-parallel cost/violation
evaluation per trial. On TPU, serial data-dependent backtracking under jit
is wasteful; instead the whole geometric trial grid
``alpha_max * 2^{-i}, i = 0..K-1`` is evaluated in ONE vmapped pass (the
trials are tiny value-only stage evaluations) and the largest acceptable
step is selected with a masked argmax — same accepted iterate, one fused
kernel, no host round trips.

Acceptance is the Fletcher–Leyffer filter rule: a trial (cost_t, viol_t)
is acceptable iff, against the current point (cost_0, viol_0) AND against
every remembered filter entry (fc_j, fv_j), it improves either measure by
a margin:

    cost_t <= fc_j - gamma * fv_j     or    viol_t <= (1 - gamma) * fv_j

The filter memory (reference: LineSearchFilter's filter set) is a fixed-
size ring buffer of past iterates carried in the Solution pytree across
Newton iterations (per scenario under vmap); +inf rows are empty slots
and accept everything. It prevents cost/violation cycling — the failure
mode of single-point acceptance in the f32 contact regime. If no trial is
acceptable the smallest step in the grid is taken (the reference
similarly gives up at alpha_min and accepts).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def trial_alphas(alpha_max, n: int, dtype):
    """Geometric grid alpha_max * 2^{-i}."""
    return alpha_max * (2.0 ** -jnp.arange(n, dtype=dtype))


def _acceptable(costs, viols, fc, fv, gamma, margin):
    """(K,) mask: trial k improves on the pair (fc, fv) (scalars or (F,))."""
    if jnp.ndim(fc):
        c = costs[:, None] <= fc[None, :] - gamma * fv[None, :] - margin
        h = viols[:, None] <= (1.0 - gamma) * fv[None, :] - margin
        return jnp.all(c | h, axis=1)
    improves_cost = costs <= fc - gamma * fv - margin
    improves_viol = viols <= (1.0 - gamma) * fv - margin
    return improves_cost | improves_viol


def filter_select(alphas, costs, viols, cost0, viol0, gamma=1e-5,
                  margin=0.0, filter_cost=None, filter_viol=None):
    """Pick the largest acceptable alpha from the evaluated grid.

    alphas/costs/viols: (K,); cost0/viol0/gamma/margin scalars;
    filter_cost/filter_viol: optional (F,) filter memory (+inf = empty).
    Returns (alpha, accepted_any, idx) with idx the chosen trial's index —
    the single source of truth for any downstream classification of the
    accepted step (ADVICE r4 low: recomputing the mask elsewhere would
    desynchronize on future edits to the NaN-fallback rule).
    """
    finite = jnp.isfinite(costs) & jnp.isfinite(viols)
    ok = finite & _acceptable(costs, viols, cost0, viol0, gamma, margin)
    if filter_cost is not None and filter_cost.shape[0]:
        ok = ok & _acceptable(costs, viols, filter_cost, filter_viol,
                              gamma, margin)
    # alphas are sorted descending -> first acceptable index is the largest
    idx = jnp.argmax(ok)
    any_ok = jnp.any(ok)
    # give-up fallback: the smallest step — but NEVER a non-finite trial
    # (a NaN direction must stall the iterate, not poison it; zero keeps
    # the solve alive so the next linearization can recover)
    fallback = jnp.where(finite[-1], alphas[-1], jnp.zeros_like(alphas[-1]))
    alpha = jnp.where(any_ok, alphas[idx], fallback)
    return alpha, any_ok, idx


def filter_insert(filter_cost, filter_viol, filter_ptr, cost0, viol0,
                  do=True):
    """Ring-buffer insert of the (pre-step) iterate into the filter memory.

    `do` (scalar bool, may be traced) gates the insert: the reference
    augments its filter CONDITIONALLY — only for steps accepted through
    the violation-reduction branch (or when the search rejected the whole
    grid). Unconditional insertion lets a remembered near-feasible iterate
    force strict cost decrease on every later trial, permanently stalling
    tail convergence at alpha_min (ADVICE r3 low #3).
    """
    F = filter_cost.shape[0]
    if F == 0:
        return filter_cost, filter_viol, filter_ptr
    do = jnp.asarray(do)
    old_c = filter_cost[filter_ptr]
    old_v = filter_viol[filter_ptr]
    fc = filter_cost.at[filter_ptr].set(jnp.where(do, cost0, old_c))
    fv = filter_viol.at[filter_ptr].set(jnp.where(do, viol0, old_v))
    ptr = jnp.where(do, (filter_ptr + 1) % F, filter_ptr)
    return fc, fv, ptr


def search(evaluate_step, alpha_max, n_trials: int, cost0, viol0,
           gamma=1e-5, margin=0.0, filter_cost=None, filter_viol=None):
    """Run the parallel-grid filter search.

    evaluate_step(alpha) -> (cost_plus_barrier, violation) for a trial
    primal step of size alpha (value-only; vmapped here over the grid).
    Returns (alpha, accepted_any, by_cost) where by_cost says the chosen
    trial satisfies the cost-improvement branch vs the current point —
    the signal that gates filter augmentation (see filter_insert).
    """
    alphas = trial_alphas(alpha_max, n_trials, jnp.asarray(cost0).dtype)
    costs, viols = jax.vmap(evaluate_step)(alphas)
    alpha, any_ok, idx = filter_select(alphas, costs, viols, cost0, viol0,
                                       gamma, margin, filter_cost,
                                       filter_viol)
    # classify the CHOSEN trial via the index filter_select selected
    by_cost = any_ok & (costs[idx] <= cost0 - gamma * viol0 - margin)
    return alpha, any_ok, by_cost
