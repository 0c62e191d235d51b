"""Horizon-stacked solver data pytrees.

TPU-native replacement for the reference's per-stage Split* object zoo
(idocp `ocp/split_solution.hpp`, `ocp/split_direction.hpp`,
`ocp/split_kkt_matrix.hpp`, `ocp/split_kkt_residual.hpp`, and the hybrid
containers of SURVEY.md L3/L4): one dataclass per concept with a leading
stage axis; scenario batching adds one more leading axis via vmap.
"""
from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Solution:
    """Primal-dual iterate over the horizon (single scenario).

    Shapes (N = number of intervals):
      q: (N+1, nq)   configurations
      v: (N+1, nv)   generalized velocities (pre-impulse at impulse stages)
      a: (N, nv)     generalized accelerations
      f: (N, nf)     contact forces (world frame, stacked per contact, padded)
      u: (N, nu)     joint torques (actuated)
      lmd, gmm: (N+1, nv) costates for the q- / v-rows of the state equation
      beta: (N, nv)  multiplier of the inverse-dynamics equality
      mu: (N, nf)    multiplier of the contact (Baumgarte) equality
      xi: (N, nf)    multiplier of the switching constraint (masked stages)
      slack, dual: dict name -> (N+1, m) interior-point pairs per component
      filter_cost/filter_viol: (F,) Fletcher–Leyffer filter memory carried
        across Newton iterations (reference: line_search_filter.hpp);
        +inf rows are empty slots. filter_ptr: ring-buffer write index.
    """
    q: jnp.ndarray
    v: jnp.ndarray
    a: jnp.ndarray
    f: jnp.ndarray
    u: jnp.ndarray
    lmd: jnp.ndarray
    gmm: jnp.ndarray
    beta: jnp.ndarray
    mu: jnp.ndarray
    xi: jnp.ndarray
    slack: Dict[str, jnp.ndarray]
    dual: Dict[str, jnp.ndarray]
    filter_cost: jnp.ndarray
    filter_viol: jnp.ndarray
    filter_ptr: jnp.ndarray


jax.tree_util.register_dataclass(
    Solution,
    data_fields=["q", "v", "a", "f", "u", "lmd", "gmm", "beta", "mu", "xi",
                 "slack", "dual", "filter_cost", "filter_viol",
                 "filter_ptr"],
    meta_fields=[],
)


def zero_solution(nq, nv, nu, nf, N, q0, v0=None, dtype=None,
                  filter_size=0) -> Solution:
    """Warm-startable initial solution: q/v held at (q0, v0), rest zero."""
    dtype = dtype or q0.dtype
    v0 = jnp.zeros(nv, dtype=dtype) if v0 is None else v0
    return Solution(
        q=jnp.tile(q0[None, :], (N + 1, 1)).astype(dtype),
        v=jnp.tile(v0[None, :], (N + 1, 1)).astype(dtype),
        a=jnp.zeros((N, nv), dtype),
        f=jnp.zeros((N, nf), dtype),
        u=jnp.zeros((N, nu), dtype),
        lmd=jnp.zeros((N + 1, nv), dtype),
        gmm=jnp.zeros((N + 1, nv), dtype),
        beta=jnp.zeros((N, nv), dtype),
        mu=jnp.zeros((N, nf), dtype),
        xi=jnp.zeros((N, nf), dtype),
        slack={},
        dual={},
        filter_cost=jnp.full((filter_size,), jnp.inf, dtype),
        filter_viol=jnp.full((filter_size,), jnp.inf, dtype),
        filter_ptr=jnp.zeros((), jnp.int32),
    )


@dataclasses.dataclass(frozen=True)
class StageQuad:
    """Quadratic model of one stage's Lagrangian over z = (x, w):
    x = (dq, dv) tangent state (2nv), w = stage inner variables
    (contact stages: (a, f, u); unconstrained stages: (u, a)).

    value + lx'x + lw'w + 1/2 x'Qxx x + x'Qxw w + 1/2 w'Qww w
    """
    value: jnp.ndarray
    lx: jnp.ndarray
    lw: jnp.ndarray
    Qxx: jnp.ndarray
    Qxw: jnp.ndarray
    Qww: jnp.ndarray

    @staticmethod
    def zeros(nx, nw, dtype):
        z = jnp.zeros
        return StageQuad(z((), dtype), z((nx,), dtype), z((nw,), dtype),
                         z((nx, nx), dtype), z((nx, nw), dtype),
                         z((nw, nw), dtype))

    def __add__(self, o: "StageQuad") -> "StageQuad":
        return StageQuad(self.value + o.value, self.lx + o.lx,
                         self.lw + o.lw, self.Qxx + o.Qxx,
                         self.Qxw + o.Qxw, self.Qww + o.Qww)


jax.tree_util.register_dataclass(
    StageQuad,
    data_fields=["value", "lx", "lw", "Qxx", "Qxw", "Qww"],
    meta_fields=[],
)


@dataclasses.dataclass(frozen=True)
class CondensedStage:
    """Stage data after eliminating the equality-constrained inner block:
    an LQR stage in (dx, du_k) plus expansion operators.

    x' = A dx + B du + xres
    cost: lx'dx + lu'du + 1/2 dx'Qxx dx + dx'Qxu du + 1/2 du'Quu du
    eliminated block: w_e = Wx dx + Wk du + w0 (for expandPrimal)
    dual expansion solves E_we^T nu_e = -(rhs) (see condensing.py).
    switching constraint (masked): Cx dx + Cu du + h = 0.
    """
    A: jnp.ndarray
    B: jnp.ndarray
    xres: jnp.ndarray
    lx: jnp.ndarray
    lu: jnp.ndarray
    Qxx: jnp.ndarray
    Qxu: jnp.ndarray
    Quu: jnp.ndarray
    Wx: jnp.ndarray
    Wk: jnp.ndarray
    w0: jnp.ndarray
    Cx: jnp.ndarray
    Cu: jnp.ndarray
    h: jnp.ndarray


jax.tree_util.register_dataclass(
    CondensedStage,
    data_fields=["A", "B", "xres", "lx", "lu", "Qxx", "Qxu", "Quu",
                 "Wx", "Wk", "w0", "Cx", "Cu", "h"],
    meta_fields=[],
)


