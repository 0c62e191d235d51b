"""Solver-state checkpoint / resume (SURVEY.md §5: the reference has no
checkpointing; its nearest analogue is get/setSolution warm-start state.
Here the full primal-dual iterate — one pytree — serializes to a single
.npz, enabling MPC warm-start hand-off and restartable batch runs).
"""
from __future__ import annotations

import numpy as np

from ..ocp.data import Solution

_ARRAY_FIELDS = ("q", "v", "a", "f", "u", "lmd", "gmm", "beta", "mu", "xi",
                 "filter_cost", "filter_viol")


def save_solution(path: str, sol: Solution) -> None:
    """Serialize a Solution (or a batched Solution) to an .npz file."""
    payload = {name: np.asarray(getattr(sol, name))
               for name in _ARRAY_FIELDS}
    payload["filter_ptr"] = np.asarray(sol.filter_ptr)
    for k, v in sol.slack.items():
        payload[f"slack.{k}"] = np.asarray(v)
    for k, v in sol.dual.items():
        payload[f"dual.{k}"] = np.asarray(v)
    np.savez(path, **payload)


def load_solution(path: str, dtype=None, filter_size: int = 0) -> Solution:
    """Load a Solution saved by save_solution.

    filter_size: line-search filter memory length to BACKFILL when the
    checkpoint predates the filter fields (pass the target solver's
    options.line_search_filter_size). Backfilled entries are +inf (empty
    filter slots), so the restored solution is shape-compatible with a
    filter-enabled solver instead of silently disabling its line-search
    memory (ADVICE r4 low). Ignored when the checkpoint carries filter
    state of its own.
    """
    import jax.numpy as jnp
    with np.load(path) as data:
        cast = (lambda x: jnp.asarray(x, dtype)) if dtype is not None \
            else jnp.asarray
        # filter-memory fields were added after the first checkpoint
        # format: backfill for old .npz files (ADVICE r3: keep old
        # checkpoints loadable); all other fields remain required.
        kwargs = {}
        for name in _ARRAY_FIELDS:
            if name in data.files:
                kwargs[name] = cast(data[name])
            elif name.startswith("filter_"):
                kwargs[name] = cast(np.full((filter_size,), np.inf))
            else:
                raise KeyError(f"checkpoint {path} missing field {name!r}")
        # integer ring pointer: never dtype-cast
        kwargs["filter_ptr"] = (
            jnp.asarray(data["filter_ptr"], jnp.int32)
            if "filter_ptr" in data.files else jnp.zeros((), jnp.int32))
        slack = {k[len("slack."):]: cast(data[k]) for k in data.files
                 if k.startswith("slack.")}
        dual = {k[len("dual."):]: cast(data[k]) for k in data.files
                if k.startswith("dual.")}
    return Solution(slack=slack, dual=dual, **kwargs)
