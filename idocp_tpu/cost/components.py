"""Concrete cost components (reference inventory, SURVEY.md §2 L2-cost).

All references (`*_ref`) accept either a constant array or a jittable
callable of t — this subsumes the reference's TimeVarying* component
variants (idocp `cost/time_varying_configuration_space_cost.hpp`).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..robot import kinematics, lie
from ..robot import model as model_mod
from .base import BlockQuad, CostComponent, EvalContext, Ref, resolve_ref


def _tangent_jac(fn, model, q):
    zero = jnp.zeros((model.nv,), dtype=q.dtype)
    return jax.jacfwd(lambda e: fn(model_mod.integrate(model, q, e)))(zero)


@dataclasses.dataclass(frozen=True)
class ConfigurationSpaceCost(CostComponent):
    """Weighted quadratics on q ⊖ q_ref (Lie difference), v, a, u, with
    separate terminal weights (reference: cost/configuration_space_cost.hpp).

    Weights are per-coordinate vectors (tangent-dim for q).
    """
    q_weight: jnp.ndarray  # (nv,)
    v_weight: jnp.ndarray  # (nv,)
    a_weight: jnp.ndarray  # (nv,)
    u_weight: jnp.ndarray  # (nu,)
    qf_weight: jnp.ndarray  # (nv,)
    vf_weight: jnp.ndarray  # (nv,)
    q_ref: Ref = None  # (nq,) or t -> (nq,)
    v_ref: Ref = None  # (nv,) or t -> (nv,)

    def _refs(self, ctx, t, dtype):
        m = ctx.model
        qr = resolve_ref(self.q_ref, t)
        if qr is None:
            qr = m.neutral_q(dtype)
        vr = resolve_ref(self.v_ref, t)
        if vr is None:
            vr = jnp.zeros(m.nv, dtype)
        return qr, vr

    def stage(self, ctx, t, dt, q, v, a, f, u, fmask=None) -> BlockQuad:
        m = ctx.model
        qr, vr = self._refs(ctx, t, q.dtype)
        dq = model_mod.difference(m, qr, q)
        J = _tangent_jac(lambda qq: model_mod.difference(m, qr, qq), m, q)
        wq = dt * self.q_weight
        val = 0.5 * jnp.sum(wq * dq * dq)
        lq = J.T @ (wq * dq)
        Qqq = J.T @ (wq[:, None] * J)
        ev = v - vr
        val += 0.5 * dt * jnp.sum(self.v_weight * ev * ev)
        val += 0.5 * dt * jnp.sum(self.a_weight * a * a)
        val += 0.5 * dt * jnp.sum(self.u_weight * u * u)
        return BlockQuad(
            value=val,
            l={"q": lq, "v": dt * self.v_weight * ev,
               "a": dt * self.a_weight * a, "u": dt * self.u_weight * u},
            Q={("q", "q"): Qqq,
               ("v", "v"): dt * jnp.diag(self.v_weight),
               ("a", "a"): dt * jnp.diag(self.a_weight),
               ("u", "u"): dt * jnp.diag(self.u_weight)},
        )

    def terminal(self, ctx, t, q, v) -> BlockQuad:
        m = ctx.model
        qr, vr = self._refs(ctx, t, q.dtype)
        dq = model_mod.difference(m, qr, q)
        J = _tangent_jac(lambda qq: model_mod.difference(m, qr, qq), m, q)
        val = (0.5 * jnp.sum(self.qf_weight * dq * dq)
               + 0.5 * jnp.sum(self.vf_weight * (v - vr) ** 2))
        return BlockQuad(
            value=val,
            l={"q": J.T @ (self.qf_weight * dq),
               "v": self.vf_weight * (v - vr)},
            Q={("q", "q"): J.T @ (self.qf_weight[:, None] * J),
               ("v", "v"): jnp.diag(self.vf_weight)},
        )


@dataclasses.dataclass(frozen=True)
class TaskSpace3DCost(CostComponent):
    """Quadratic on a frame's world position vs a reference
    (reference: cost/task_space_3d_cost.hpp)."""
    frame_id: int
    weight: jnp.ndarray  # (3,)
    weight_terminal: jnp.ndarray  # (3,)
    pos_ref: Ref = None  # (3,) or t -> (3,)

    def _quad(self, ctx, t, q, w):
        m = ctx.model
        ref = resolve_ref(self.pos_ref, t)
        if ref is None:
            ref = jnp.zeros(3, q.dtype)
        r = kinematics.frame_position(m, q, self.frame_id) - ref
        J = _tangent_jac(
            lambda qq: kinematics.frame_position(m, qq, self.frame_id), m, q)
        return (0.5 * jnp.sum(w * r * r),
                {"q": J.T @ (w * r)},
                {("q", "q"): J.T @ (w[:, None] * J)})

    def stage(self, ctx, t, dt, q, v, a, f, u, fmask=None) -> BlockQuad:
        val, l, Q = self._quad(ctx, t, q, dt * self.weight)
        return BlockQuad(value=val, l=l, Q=Q)

    def terminal(self, ctx, t, q, v) -> BlockQuad:
        val, l, Q = self._quad(ctx, t, q, self.weight_terminal)
        return BlockQuad(value=val, l=l, Q=Q)


@dataclasses.dataclass(frozen=True)
class TaskSpace6DCost(CostComponent):
    """Quadratic on the SE(3) log error of a frame pose vs a reference pose
    (reference: cost/task_space_6d_cost.hpp). weight = (6,) on [rot, trans]."""
    frame_id: int
    weight: jnp.ndarray
    weight_terminal: jnp.ndarray
    rot_ref: Ref = None  # (3,3) or t -> (3,3)
    pos_ref: Ref = None  # (3,)

    def _error(self, ctx, t, q):
        m = ctx.model
        Rr = resolve_ref(self.rot_ref, t)
        pr = resolve_ref(self.pos_ref, t)
        if Rr is None:
            Rr = jnp.eye(3, dtype=q.dtype)
        if pr is None:
            pr = jnp.zeros(3, q.dtype)
        R, p = kinematics.frame_pose(m, q, self.frame_id)
        # log6 of ref^-1 * actual, using quaternion form
        qr = _matrix_to_quat(Rr)
        qa = _matrix_to_quat(R)
        return lie.se3_difference(qr, pr, qa, p)

    def _quad(self, ctx, t, q, w):
        m = ctx.model
        r = self._error(ctx, t, q)
        J = _tangent_jac(lambda qq: self._error(ctx, t, qq), m, q)
        return (0.5 * jnp.sum(w * r * r),
                {"q": J.T @ (w * r)},
                {("q", "q"): J.T @ (w[:, None] * J)})

    def stage(self, ctx, t, dt, q, v, a, f, u, fmask=None) -> BlockQuad:
        val, l, Q = self._quad(ctx, t, q, dt * self.weight)
        return BlockQuad(value=val, l=l, Q=Q)

    def terminal(self, ctx, t, q, v) -> BlockQuad:
        val, l, Q = self._quad(ctx, t, q, self.weight_terminal)
        return BlockQuad(value=val, l=l, Q=Q)


@dataclasses.dataclass(frozen=True)
class CoMCost(CostComponent):
    """Quadratic on the whole-body center of mass (reference: cost/com_cost)."""
    weight: jnp.ndarray
    weight_terminal: jnp.ndarray
    com_ref: Ref = None

    def _quad(self, ctx, t, q, w):
        m = ctx.model
        ref = resolve_ref(self.com_ref, t)
        if ref is None:
            ref = jnp.zeros(3, q.dtype)
        r = kinematics.com(m, q) - ref
        J = _tangent_jac(lambda qq: kinematics.com(m, qq), m, q)
        return (0.5 * jnp.sum(w * r * r),
                {"q": J.T @ (w * r)},
                {("q", "q"): J.T @ (w[:, None] * J)})

    def stage(self, ctx, t, dt, q, v, a, f, u, fmask=None) -> BlockQuad:
        val, l, Q = self._quad(ctx, t, q, dt * self.weight)
        return BlockQuad(value=val, l=l, Q=Q)

    def terminal(self, ctx, t, q, v) -> BlockQuad:
        val, l, Q = self._quad(ctx, t, q, self.weight_terminal)
        return BlockQuad(value=val, l=l, Q=Q)


@dataclasses.dataclass(frozen=True)
class ContactForceCost(CostComponent):
    """Quadratic on active contact forces vs reference forces
    (reference: cost/contact_force_cost.hpp). Inactive slots masked via the
    stage's contact status (passed through ctx extras by the stage builder)."""
    f_weight: jnp.ndarray  # (nf,) stacked per-contact weights
    f_ref: Ref = None  # (nf,) or t -> (nf,)

    def stage(self, ctx, t, dt, q, v, a, f, u, fmask=None) -> BlockQuad:
        ref = resolve_ref(self.f_ref, t)
        if ref is None:
            ref = jnp.zeros_like(f)
        mask = jnp.ones_like(f) if fmask is None else fmask
        w = dt * self.f_weight * mask
        r = f - ref
        return BlockQuad(
            value=0.5 * jnp.sum(w * r * r),
            l={"f": w * r},
            Q={("f", "f"): jnp.diag(w)},
        )

    def terminal(self, ctx, t, q, v) -> BlockQuad:
        dtype = q.dtype
        return BlockQuad(value=jnp.zeros((), dtype), l={}, Q={})


def _matrix_to_quat(R):
    """Rotation matrix -> quaternion (w,x,y,z), branch-free Shepperd-style
    (works under jit for all sign cases)."""
    m00, m01, m02 = R[0, 0], R[0, 1], R[0, 2]
    m10, m11, m12 = R[1, 0], R[1, 1], R[1, 2]
    m20, m21, m22 = R[2, 0], R[2, 1], R[2, 2]
    tr = m00 + m11 + m22
    # four candidate constructions; pick the best-conditioned
    qw = jnp.stack([1 + tr, 1 + m00 - m11 - m22, 1 - m00 + m11 - m22,
                    1 - m00 - m11 + m22])
    case = jnp.argmax(qw)
    s = jnp.sqrt(jnp.clip(qw, 1e-16)) * 2.0

    c0 = jnp.stack([0.25 * s[0], (m21 - m12) / s[0], (m02 - m20) / s[0],
                    (m10 - m01) / s[0]])
    c1 = jnp.stack([(m21 - m12) / s[1], 0.25 * s[1], (m01 + m10) / s[1],
                    (m02 + m20) / s[1]])
    c2 = jnp.stack([(m02 - m20) / s[2], (m01 + m10) / s[2], 0.25 * s[2],
                    (m12 + m21) / s[2]])
    c3 = jnp.stack([(m10 - m01) / s[3], (m02 + m20) / s[3],
                    (m12 + m21) / s[3], 0.25 * s[3]])
    q = jnp.stack([c0, c1, c2, c3])[case]
    return q / jnp.linalg.norm(q)


# NOTE: cost components are static configuration captured by closure at
# solver construction (never passed across the jit boundary), so they are
# deliberately NOT registered as pytrees.


@dataclasses.dataclass(frozen=True)
class ImpulseCost:
    """Impulse-stage cost on the impact quantities (reference: the impulse
    cost components consumed by idocp `impulse/impulse_split_ocp.hpp` —
    weights on the post-impact velocity jump dv and the impact impulse Λ;
    SURVEY.md §2 L3 'ImpulseSplitOCP').

    Since (dv, Λ) are eliminated exactly as functions of the pre-impulse
    state (state_equation.impulse_map), this cost contributes directly in
    stage x-space through the impulse-map Jacobians — see
    `ocp/stage.linearize_contact_stage`. Gated by the stage impulse mask.
    """
    dv_weight: jnp.ndarray   # (nv,) quadratic weight on v⁺ − v⁻
    lam_weight: jnp.ndarray  # (nf,) quadratic weight on Λ
