"""Inequality-constraint components (reference inventory, SURVEY.md §2
L2-constraints). Each component defines g(z) ≤ 0 of fixed dimension with
Jacobians per variable block; the PDIPM fold-in happens in the stage builder
via `pdipm.condense_terms`.

Components are static configuration (closure-captured, not pytrees), like
cost components.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax.numpy as jnp

from .pdipm import init_slack_dual


class ConstraintComponent:
    """g(z) ≤ 0. evaluate returns (g, {var_name: Jacobian (m × dim_var)}).
    Variable names: 'q' (tangent), 'v', 'a', 'f', 'u'."""

    name: str
    dim: int

    def evaluate(self, ctx, q, v, a, f, u, fmask):
        raise NotImplementedError

    def is_terminal(self) -> bool:
        """Whether this constraint also applies at the terminal stage
        (position/velocity limits do; torque/acceleration/force don't)."""
        return False


def _act_selector(model, dtype):
    """(nu × nv) selector of actuated tangent coordinates."""
    nu, nv = model.nu, model.nv
    return jnp.concatenate(
        [jnp.zeros((nu, nv - nu), dtype), jnp.eye(nu, dtype=dtype)], axis=1)


@dataclasses.dataclass(frozen=True)
class JointPositionLowerLimit(ConstraintComponent):
    """q_min − q ≤ 0 on actuated joints (reference:
    constraints/joint_position_lower_limit.hpp)."""
    model: object
    name: str = "q_lower"

    @property
    def dim(self):
        return self.model.nu

    def evaluate(self, ctx, q, v, a, f, u, fmask):
        m = self.model
        qj = q[..., m.nq - m.nu:]
        qmin = m.q_min[m.nq - m.nu:]
        J = -_act_selector(m, q.dtype)
        return qmin - qj, {"q": J}

    def is_terminal(self):
        return True


@dataclasses.dataclass(frozen=True)
class JointPositionUpperLimit(ConstraintComponent):
    model: object
    name: str = "q_upper"

    @property
    def dim(self):
        return self.model.nu

    def evaluate(self, ctx, q, v, a, f, u, fmask):
        m = self.model
        qj = q[..., m.nq - m.nu:]
        qmax = m.q_max[m.nq - m.nu:]
        return qj - qmax, {"q": _act_selector(m, q.dtype)}

    def is_terminal(self):
        return True


@dataclasses.dataclass(frozen=True)
class JointVelocityLowerLimit(ConstraintComponent):
    model: object
    name: str = "v_lower"

    @property
    def dim(self):
        return self.model.nu

    def evaluate(self, ctx, q, v, a, f, u, fmask):
        m = self.model
        vj = v[..., m.nv - m.nu:]
        vmax = m.v_limit[m.nv - m.nu:]
        return -vj - vmax, {"v": -_act_selector(m, q.dtype)}

    def is_terminal(self):
        return True


@dataclasses.dataclass(frozen=True)
class JointVelocityUpperLimit(ConstraintComponent):
    model: object
    name: str = "v_upper"

    @property
    def dim(self):
        return self.model.nu

    def evaluate(self, ctx, q, v, a, f, u, fmask):
        m = self.model
        vj = v[..., m.nv - m.nu:]
        vmax = m.v_limit[m.nv - m.nu:]
        return vj - vmax, {"v": _act_selector(m, q.dtype)}

    def is_terminal(self):
        return True


@dataclasses.dataclass(frozen=True)
class JointTorquesLowerLimit(ConstraintComponent):
    """−u − u_max ≤ 0 (reference: constraints/joint_torques_lower_limit.hpp).
    Because u is the condensed control, this lands directly on Quu."""
    model: object
    name: str = "u_lower"

    @property
    def dim(self):
        return self.model.nu

    def evaluate(self, ctx, q, v, a, f, u, fmask):
        m = self.model
        return -u - m.u_limit, {"u": -jnp.eye(m.nu, dtype=q.dtype)}


@dataclasses.dataclass(frozen=True)
class JointTorquesUpperLimit(ConstraintComponent):
    model: object
    name: str = "u_upper"

    @property
    def dim(self):
        return self.model.nu

    def evaluate(self, ctx, q, v, a, f, u, fmask):
        m = self.model
        return u - m.u_limit, {"u": jnp.eye(m.nu, dtype=q.dtype)}


@dataclasses.dataclass(frozen=True)
class JointAccelerationLowerLimit(ConstraintComponent):
    """−a − a_max ≤ 0 on actuated joints (reference ⚠:
    constraints/joint_acceleration_lower_limit.hpp)."""
    model: object
    a_max: jnp.ndarray = None  # (nu,)
    name: str = "a_lower"

    @property
    def dim(self):
        return self.model.nu

    def _amax(self, dtype):
        if self.a_max is not None:
            return self.a_max
        # no URDF field for acceleration bounds; generous default keeps an
        # explicitly-added component well-defined (reference ⚠ requires an
        # explicit vector)
        return jnp.full(self.model.nu, 1e3, dtype)

    def evaluate(self, ctx, q, v, a, f, u, fmask):
        m = self.model
        aj = a[..., m.nv - m.nu:]
        return -aj - self._amax(a.dtype), {"a": -_act_selector(m, q.dtype)}


@dataclasses.dataclass(frozen=True)
class JointAccelerationUpperLimit(ConstraintComponent):
    model: object
    a_max: jnp.ndarray = None
    name: str = "a_upper"

    @property
    def dim(self):
        return self.model.nu

    _amax = JointAccelerationLowerLimit._amax

    def evaluate(self, ctx, q, v, a, f, u, fmask):
        m = self.model
        aj = a[..., m.nv - m.nu:]
        return aj - self._amax(a.dtype), {"a": _act_selector(m, q.dtype)}


@dataclasses.dataclass(frozen=True)
class FrictionCone(ConstraintComponent):
    """f_x² + f_y² − μ² f_z² ≤ 0 per active contact (quadratic cone,
    reference: constraints/friction_cone.hpp). Inactive contacts are
    masked to a feasible constant (g = −1, ∇g = 0)."""
    model: object
    nc: int
    mu: float = 0.7
    name: str = "friction_cone"

    @property
    def dim(self):
        return self.nc

    def evaluate(self, ctx, q, v, a, f, u, fmask):
        fc = f.reshape(self.nc, 3)
        active = fmask.reshape(self.nc, 3)[:, 0]
        g = fc[:, 0] ** 2 + fc[:, 1] ** 2 - (self.mu ** 2) * fc[:, 2] ** 2
        grad = jnp.stack(
            [2 * fc[:, 0], 2 * fc[:, 1], -2 * (self.mu ** 2) * fc[:, 2]],
            axis=-1)  # (nc, 3)
        g = jnp.where(active, g, -1.0)
        grad = jnp.where(active[:, None], grad, 0.0)
        # scatter per-contact gradients into (nc, 3*nc)
        J = jnp.zeros((self.nc, 3 * self.nc), dtype=q.dtype)
        for i in range(self.nc):
            J = J.at[i, 3 * i:3 * i + 3].set(grad[i])
        return g, {"f": J}


@dataclasses.dataclass(frozen=True)
class ContactNormalForce(ConstraintComponent):
    """−f_z ≤ 0 per active contact (reference ⚠: contact normal force
    positivity; robotoc names it ContactWrenchCone/NormalForce)."""
    model: object
    nc: int
    fz_min: float = 0.0
    name: str = "normal_force"

    @property
    def dim(self):
        return self.nc

    def evaluate(self, ctx, q, v, a, f, u, fmask):
        fc = f.reshape(self.nc, 3)
        active = fmask.reshape(self.nc, 3)[:, 0]
        g = jnp.where(active, self.fz_min - fc[:, 2], -1.0)
        J = jnp.zeros((self.nc, 3 * self.nc), dtype=q.dtype)
        for i in range(self.nc):
            J = J.at[i, 3 * i + 2].set(jnp.where(active[i], -1.0, 0.0))
        return g, {"f": J}


class ImpulseConstraintComponent:
    """g(Λ) ≤ 0 on the impact impulse at impulse stages (reference:
    the impulse constraint variants, SURVEY.md §2 constraints "Impulse
    variants"; idocp `constraints/impulse_friction_cone.hpp` ⚠).

    Λ is eliminated (an explicit function of the pre-impulse state via the
    impulse map), so these constraints chain through the impulse-map
    Jacobians Lx = [Lq, Lv] inside the stage builder rather than through
    the named-variable space. evaluate_lam returns (g, dg/dΛ) with rows
    mask-gated to a feasible constant (g = −1, ∇g = 0) wherever the stage
    is not an impulse stage or the contact does not impact.
    """

    name: str
    dim: int
    impulse = True

    def evaluate_lam(self, lam, gate):
        raise NotImplementedError


@dataclasses.dataclass(frozen=True)
class ImpulseFrictionCone(ImpulseConstraintComponent):
    """Λ_x² + Λ_y² − μ² Λ_z² ≤ 0 per impacting contact."""
    model: object
    nc: int
    mu: float = 0.7
    name: str = "impulse_friction_cone"

    @property
    def dim(self):
        return self.nc

    def evaluate_lam(self, lam, gate):
        lc = lam.reshape(self.nc, 3)
        active = gate > 0.5
        g = lc[:, 0] ** 2 + lc[:, 1] ** 2 - (self.mu ** 2) * lc[:, 2] ** 2
        grad = jnp.stack(
            [2 * lc[:, 0], 2 * lc[:, 1], -2 * (self.mu ** 2) * lc[:, 2]],
            axis=-1)
        g = jnp.where(active, g, -1.0)
        grad = jnp.where(active[:, None], grad, 0.0)
        J = jnp.zeros((self.nc, 3 * self.nc), dtype=lam.dtype)
        for i in range(self.nc):
            J = J.at[i, 3 * i:3 * i + 3].set(grad[i])
        return g, J


@dataclasses.dataclass(frozen=True)
class ImpulseNormalForce(ImpulseConstraintComponent):
    """−Λ_z ≤ 0 per impacting contact (the impact impulse must push)."""
    model: object
    nc: int
    lz_min: float = 0.0
    name: str = "impulse_normal_force"

    @property
    def dim(self):
        return self.nc

    def evaluate_lam(self, lam, gate):
        lc = lam.reshape(self.nc, 3)
        active = gate > 0.5
        g = jnp.where(active, self.lz_min - lc[:, 2], -1.0)
        J = jnp.zeros((self.nc, 3 * self.nc), dtype=lam.dtype)
        for i in range(self.nc):
            J = J.at[i, 3 * i + 2].set(jnp.where(active[i], -1.0, 0.0))
        return g, J


def default_joint_limits(model):
    """The reference's standard constraint set for joint-limited robots
    (examples build exactly these six; SURVEY.md §3.3)."""
    return [
        JointPositionLowerLimit(model), JointPositionUpperLimit(model),
        JointVelocityLowerLimit(model), JointVelocityUpperLimit(model),
        JointTorquesLowerLimit(model), JointTorquesUpperLimit(model),
    ]
