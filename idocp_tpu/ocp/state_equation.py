"""State equation on the configuration Lie group + impulse map.

TPU-native replacement for the reference's `StateEquation` and
`ImpulseDynamics` state maps (idocp `ocp/state_equation.hpp`,
`impulse/impulse_dynamics.hpp`; SURVEY.md L3). The impulse is an explicit
function of the pre-impulse state — [M, −Jᵀ; J, Σ] is invertible, so
(dv, Λ) are *eliminated exactly* rather than kept as decision variables
(a simplification the reference's full-KKT architecture could not make;
the resulting Newton directions coincide).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..robot import dynamics, spatial
from ..robot import model as model_mod
from ..robot.contact import ContactModel
from ..robot.model import RobotModel


def contact_block_matrix(model: RobotModel, cm: ContactModel, q, active):
    """[[M, −J̃ᵀ], [J̃, Σ]] with J̃ = mask·J and Σ = diag(1 − mask):
    invertible for any active set, decoupling inactive slots (df = 0).
    Shared by impulse dynamics and contact condensing."""
    nv, nf = model.nv, cm.max_dimf
    M = dynamics.mass_matrix(model, q)
    J = dynamics.contact_velocity_jacobian(model, q, cm.frame_ids)
    mask3 = jnp.repeat(active.astype(q.dtype), 3)
    Jm = mask3[:, None] * J
    Sigma = jnp.diag(1.0 - mask3)
    top = jnp.concatenate([M, -Jm.T], axis=1)
    bot = jnp.concatenate([Jm, Sigma], axis=1)
    return jnp.concatenate([top, bot], axis=0), Jm, mask3


def mass_and_contact_jacobian_fk(model: RobotModel, cm: ContactModel,
                                 fkb: "spatial.FK"):
    """(M, LM, J) from a shared world-frame FK bundle: dense CRBA mass
    matrix + analytic point Jacobians (robot/spatial.py) — no autodiff
    towers (VERDICT r3 missing #2)."""
    M = spatial.mass_matrix(model, fkb)
    p_f, fb = spatial.frame_points(model, fkb, cm.frame_ids)
    J = spatial.point_jacobians(model, fkb, p_f, fb).reshape(
        3 * cm.nc, model.nv)
    LM = jnp.linalg.cholesky(M)
    return M, LM, J


def mass_and_contact_jacobian(model: RobotModel, cm: ContactModel, q):
    """(M, LM, J): mass matrix, its Cholesky factor, and the unmasked
    stacked contact-velocity Jacobian. Computed ONCE per stage and shared
    between the impulse-gate and stance factorizations."""
    return mass_and_contact_jacobian_fk(model, cm, spatial.fk(model, q))


def factors_from_mj(M, LM, J, active):
    """Schur factorization of [[M, −J̃ᵀ], [J̃, Σ]] for a given active mask,
    reusing the shared (M, LM, J). Returns (LM, LS, Jm, mask3, M)."""
    mask3 = jnp.repeat(active.astype(J.dtype), 3)
    Jm = mask3[:, None] * J
    MinvJt = jax.scipy.linalg.cho_solve((LM, True), Jm.T)
    S = Jm @ MinvJt + jnp.diag(1.0 - mask3)
    LS = jnp.linalg.cholesky(0.5 * (S + S.T))
    return LM, LS, Jm, mask3, M


def contact_factors(model: RobotModel, cm: ContactModel, q, active):
    """Structured factorization of the contact block [[M, −J̃ᵀ], [J̃, Σ]]
    via two Cholesky decompositions (M and the SPD Schur complement
    S = J̃ M⁻¹ J̃ᵀ + Σ) — the f32-stable / MXU-friendly replacement for a
    dense LU/inverse of the (nv+nf) block (reference: the contact-dynamics
    condensing LLT inside idocp `ocp/contact_dynamics.hpp`).

    Returns (LM, LS, Jm, mask3, M): lower-Cholesky factors of M and S, the
    masked contact Jacobian, the 3·nc mask, and M itself (for callers that
    assemble the raw block, e.g. the dense-KKT oracle path).
    """
    M, LM, J = mass_and_contact_jacobian(model, cm, q)
    return factors_from_mj(M, LM, J, active)


def contact_solve(LM, LS, Jm, b1, b2):
    """Solve [[M, −J̃ᵀ], [J̃, Σ]] [x; y] = [b1; b2] (multi-RHS along the
    last axis if b1/b2 are matrices)."""
    Minvb1 = jax.scipy.linalg.cho_solve((LM, True), b1)
    y = jax.scipy.linalg.cho_solve((LS, True), b2 - Jm @ Minvb1)
    x = jax.scipy.linalg.cho_solve((LM, True), b1 + Jm.T @ y)
    return x, y


def contact_solve_T(LM, LS, Jm, b1, b2):
    """Solve the transposed block [[M, J̃ᵀ], [−J̃, Σ]] [x; y] = [b1; b2]
    (same Schur factorization; used by dual expansion)."""
    Minvb1 = jax.scipy.linalg.cho_solve((LM, True), b1)
    y = jax.scipy.linalg.cho_solve((LS, True), b2 + Jm @ Minvb1)
    x = jax.scipy.linalg.cho_solve((LM, True), b1 - Jm.T @ y)
    return x, y


def impulse_map(model: RobotModel, cm: ContactModel, q, v, active):
    """(v⁺, Λ): perfectly inelastic impact on the newly-active contacts:
    M (v⁺ − v) = J̃ᵀ Λ, J̃ v⁺ = 0 (reference: ImpulseDynamics)."""
    LM, LS, Jm, _, _ = contact_factors(model, cm, q, active)
    dv, lam = contact_solve(LM, LS, Jm, jnp.zeros(model.nv, q.dtype),
                            -Jm @ v)
    return v + dv, lam


def linearize_transition(model: RobotModel, dt, q, v_eff, a, q_next, v_next):
    """Linearize the Euler step q' = q ⊕ dt·v_eff, v' = v_eff + dt·a.

    Returns (A_q blocks in the form x' = ... ): specifically
      rq0: residual difference(q_next, q ⊕ dt v_eff)   [tangent at q_next]
      Jq (nv×nv), Jv (nv×nv), Jn (nv×nv): d rq / d(δq, δv_eff, δq_next)
    The v-row is exact/linear: rv0 = v_eff + dt a − v_next.
    """
    nv = model.nv
    zero = jnp.zeros((nv,), dtype=q.dtype)

    def res(eq, dv_, en):
        qp = model_mod.integrate(model, model_mod.integrate(model, q, eq),
                                 dt * (v_eff + dv_))
        qn = model_mod.integrate(model, q_next, en)
        return model_mod.difference(model, qn, qp)

    rq0 = res(zero, zero, zero)
    Jq = jax.jacfwd(lambda e: res(e, zero, zero))(zero)
    Jv = jax.jacfwd(lambda e: res(zero, e, zero))(zero)
    Jn = jax.jacfwd(lambda e: res(zero, zero, e))(zero)
    rv0 = v_eff + dt * a - v_next
    return rq0, Jq, Jv, Jn, rv0
