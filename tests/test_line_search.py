"""Filter line-search tests (reference: idocp line_search/*; VERDICT r1
item #8): accept/reject logic of the parallel trial grid, NaN rejection,
and solver-level effect (line search caps divergent full steps).
"""
import jax.numpy as jnp
import numpy as np

from idocp_tpu.solver import line_search as ls


def test_trial_alphas_geometric():
    a = np.asarray(ls.trial_alphas(1.0, 4, jnp.float64))
    np.testing.assert_allclose(a, [1.0, 0.5, 0.25, 0.125])


def test_filter_select_picks_largest_improving():
    alphas = jnp.asarray([1.0, 0.5, 0.25, 0.125])
    # alpha=1.0 worsens both; alpha=0.5 improves cost -> picked
    costs = jnp.asarray([10.0, 0.5, 0.4, 0.9])
    viols = jnp.asarray([5.0, 2.0, 1.5, 1.9])
    alpha, ok, _ = ls.filter_select(alphas, costs, viols, cost0=1.0, viol0=2.0)
    assert bool(ok)
    assert float(alpha) == 0.5


def test_filter_select_accepts_violation_reduction():
    alphas = jnp.asarray([1.0, 0.5])
    costs = jnp.asarray([5.0, 6.0])     # both worse in cost
    viols = jnp.asarray([0.5, 0.1])     # but alpha=1 reduces violation
    alpha, ok, _ = ls.filter_select(alphas, costs, viols, cost0=1.0, viol0=2.0)
    assert bool(ok)
    assert float(alpha) == 1.0


def test_filter_select_rejects_nan_trials():
    alphas = jnp.asarray([1.0, 0.5, 0.25])
    costs = jnp.asarray([jnp.nan, jnp.nan, 0.2])
    viols = jnp.asarray([jnp.nan, jnp.nan, 0.5])
    alpha, ok, _ = ls.filter_select(alphas, costs, viols, cost0=1.0, viol0=2.0)
    assert bool(ok)
    assert float(alpha) == 0.25


def test_filter_select_fallback_smallest():
    alphas = jnp.asarray([1.0, 0.5, 0.25])
    costs = jnp.asarray([9.0, 9.0, 9.0])
    viols = jnp.asarray([9.0, 9.0, 9.0])
    alpha, ok, _ = ls.filter_select(alphas, costs, viols, cost0=1.0, viol0=2.0)
    assert not bool(ok)
    assert float(alpha) == 0.25


def test_filter_memory_blocks_revisited_region():
    """A trial acceptable vs the current point but dominated by a filter
    entry is rejected (Fletcher–Leyffer memory; reference:
    line_search_filter.hpp; VERDICT r2 next-item #4)."""
    alphas = jnp.asarray([1.0, 0.5])
    costs = jnp.asarray([0.5, 3.0])    # alpha=1 improves on current cost
    viols = jnp.asarray([1.9, 0.05])   # alpha=0.5 improves viol
    # filter remembers a past iterate (0.4, 1.0): the alpha=1 trial
    # (cost 0.5 > 0.4, viol 1.9 > 1.0) is dominated -> rejected
    fc = jnp.asarray([0.4, jnp.inf])
    fv = jnp.asarray([1.0, jnp.inf])
    alpha, ok, _ = ls.filter_select(alphas, costs, viols, cost0=1.0, viol0=2.0,
                                 filter_cost=fc, filter_viol=fv)
    assert bool(ok)
    assert float(alpha) == 0.5

    # without the memory the same grid would accept alpha=1
    alpha2, ok2, _ = ls.filter_select(alphas, costs, viols, cost0=1.0,
                                   viol0=2.0)
    assert bool(ok2) and float(alpha2) == 1.0


def test_filter_memory_empty_slots_accept_everything():
    alphas = jnp.asarray([1.0])
    costs = jnp.asarray([0.5])
    viols = jnp.asarray([1.0])
    fc = jnp.full((4,), jnp.inf)
    fv = jnp.full((4,), jnp.inf)
    alpha, ok, _ = ls.filter_select(alphas, costs, viols, cost0=1.0, viol0=2.0,
                                 filter_cost=fc, filter_viol=fv)
    assert bool(ok) and float(alpha) == 1.0


def test_filter_insert_ring_buffer():
    fc = jnp.full((2,), jnp.inf)
    fv = jnp.full((2,), jnp.inf)
    ptr = jnp.zeros((), jnp.int32)
    fc, fv, ptr = ls.filter_insert(fc, fv, ptr, 1.0, 2.0)
    assert int(ptr) == 1 and float(fc[0]) == 1.0 and float(fv[0]) == 2.0
    fc, fv, ptr = ls.filter_insert(fc, fv, ptr, 3.0, 4.0)
    assert int(ptr) == 0 and float(fc[1]) == 3.0
    fc, fv, ptr = ls.filter_insert(fc, fv, ptr, 5.0, 6.0)  # wraps
    assert int(ptr) == 1 and float(fc[0]) == 5.0 and float(fv[0]) == 6.0


def test_search_vmaps_trials():
    calls = []

    def evaluate(alpha):
        # quadratic merit with minimum at alpha ~ 0.5
        cost = (alpha - 0.5) ** 2
        viol = jnp.zeros_like(alpha)
        return cost, viol

    alpha, ok, by_cost = ls.search(evaluate, jnp.asarray(1.0), 8,
                                   cost0=jnp.asarray(1.0),
                                   viol0=jnp.asarray(0.0))
    # any alpha with cost < 1.0 is acceptable; the largest is 1.0
    assert bool(ok)
    assert float(alpha) == 1.0
    # accepted through the cost branch -> no filter augmentation
    assert bool(by_cost)


def test_filter_insert_gated():
    fc = jnp.full((2,), jnp.inf)
    fv = jnp.full((2,), jnp.inf)
    ptr = jnp.zeros((), jnp.int32)
    fc, fv, ptr = ls.filter_insert(fc, fv, ptr, 1.0, 2.0, do=False)
    assert int(ptr) == 0 and not np.isfinite(float(fc[0]))
    fc, fv, ptr = ls.filter_insert(fc, fv, ptr, 1.0, 2.0, do=True)
    assert int(ptr) == 1 and float(fc[0]) == 1.0
