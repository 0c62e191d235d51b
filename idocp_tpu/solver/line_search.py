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

Acceptance is the standard (per-update) filter rule: a trial (cost_t,
viol_t) is acceptable against the current point (cost_0, viol_0) iff it
improves either measure by a margin:

    cost_t <= cost_0 - gamma * viol_0     or    viol_t <= (1 - gamma) * viol_0

If no trial is acceptable the smallest step in the grid is taken (the
reference similarly gives up at alpha_min and accepts).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def trial_alphas(alpha_max, n: int, dtype):
    """Geometric grid alpha_max * 2^{-i}."""
    return alpha_max * (2.0 ** -jnp.arange(n, dtype=dtype))


def filter_select(alphas, costs, viols, cost0, viol0, gamma=1e-5,
                  margin=0.0):
    """Pick the largest acceptable alpha from the evaluated grid.

    All arguments are arrays of shape (K,) except the scalars
    cost0/viol0/gamma/margin. Returns (alpha, accepted_any).
    """
    finite = jnp.isfinite(costs) & jnp.isfinite(viols)
    improves_cost = costs <= cost0 - gamma * viol0 - margin
    improves_viol = viols <= (1.0 - gamma) * viol0 - margin
    ok = finite & (improves_cost | improves_viol)
    # alphas are sorted descending -> first acceptable index is the largest
    idx = jnp.argmax(ok)
    any_ok = jnp.any(ok)
    # give-up fallback: the smallest step — but NEVER a non-finite trial
    # (a NaN direction must stall the iterate, not poison it; zero keeps
    # the solve alive so the next linearization can recover)
    fallback = jnp.where(finite[-1], alphas[-1], jnp.zeros_like(alphas[-1]))
    alpha = jnp.where(any_ok, alphas[idx], fallback)
    return alpha, any_ok


def search(evaluate_step, alpha_max, n_trials: int, cost0, viol0,
           gamma=1e-5, margin=0.0):
    """Run the parallel-grid filter search.

    evaluate_step(alpha) -> (cost_plus_barrier, violation) for a trial
    primal step of size alpha (value-only; vmapped here over the grid).
    """
    alphas = trial_alphas(alpha_max, n_trials, jnp.asarray(cost0).dtype)
    costs, viols = jax.vmap(evaluate_step)(alphas)
    return filter_select(alphas, costs, viols, cost0, viol0, gamma, margin)
