"""Cost-function component architecture.

TPU-native replacement for the reference's `CostFunctionComponentBase` /
`CostFunction` virtual-dispatch containers (idocp `cost/cost_function.hpp`,
`cost/cost_function_component_base.hpp`; SURVEY.md L2). Components are
frozen dataclasses of weights/references; each returns per-variable-block
gradients and Gauss-Newton Hessians as dicts keyed by variable name
('q','v','a','f','u'), which the stage builder assembles into the (x, w)
layout of the current stage type. References may be constants or jittable
callables of t (subsumes the reference's TimeVarying*Ref classes).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

from ..robot import model as model_mod
from ..robot.contact import ContactModel
from ..robot.model import RobotModel

Ref = Union[jnp.ndarray, Callable]


def resolve_ref(ref: Ref, t):
    return ref(t) if callable(ref) else ref


@dataclasses.dataclass(frozen=True)
class BlockQuad:
    """Gradients l[name] and Hessian blocks Q[(name1, name2)] (canonical
    key order: name1 <= name2 in the fixed order q,v,a,f,u)."""
    value: jnp.ndarray
    l: dict
    Q: dict


_ORDER = {"q": 0, "v": 1, "a": 2, "f": 3, "u": 4}


def block_quad(value=0.0, l=None, Q=None) -> BlockQuad:
    return BlockQuad(value=value, l=l or {}, Q=Q or {})


def merge(a: BlockQuad, b: BlockQuad) -> BlockQuad:
    l = dict(a.l)
    for k, v in b.l.items():
        l[k] = l[k] + v if k in l else v
    Q = dict(a.Q)
    for k, v in b.Q.items():
        Q[k] = Q[k] + v if k in Q else v
    return BlockQuad(value=a.value + b.value, l=l, Q=Q)


@dataclasses.dataclass(frozen=True)
class EvalContext:
    """Static per-problem context handed to components."""
    model: RobotModel
    contact_model: ContactModel


class CostComponent:
    """Interface. Subclasses are registered pytree dataclasses."""

    def stage(self, ctx: EvalContext, t, dt, q, v, a, f, u, fmask=None) -> BlockQuad:
        raise NotImplementedError

    def terminal(self, ctx: EvalContext, t, q, v) -> BlockQuad:
        raise NotImplementedError


def weighted_diff_quad(w, r, J=None):
    """1/2 ||r||_W^2 with optional Jacobian chain J (r = J z + ...):
    returns (value, grad, hessian) = (.5 r'Wr, J'Wr, J'WJ) (J=None -> identity)."""
    val = 0.5 * jnp.sum(w * r * r)
    if J is None:
        return val, w * r, jnp.diag(w)
    return val, J.T @ (w * r), J.T @ (w[:, None] * J)
