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

from ..ops import smallchol
from ..robot import dynamics, lie, spatial
from ..robot import model as model_mod
from ..robot.contact import ContactModel
from ..robot.model import FREE, RobotModel


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
    """(M, LMi, J) from a shared world-frame FK bundle: dense CRBA mass
    matrix (with its inverse Cholesky factor, see tri_inv) + analytic
    point Jacobians (robot/spatial.py) — no autodiff towers (VERDICT r3
    missing #2)."""
    M = spatial.mass_matrix(model, fkb)
    p_f, fb = spatial.frame_points(model, fkb, cm.frame_ids)
    J = spatial.point_jacobians(model, fkb, p_f, fb).reshape(
        3 * cm.nc, model.nv)
    LMi = smallchol.chol_tri_inv(M)
    return M, LMi, J


def mass_and_contact_jacobian(model: RobotModel, cm: ContactModel, q):
    """(M, LM, J): mass matrix, its Cholesky factor, and the unmasked
    stacked contact-velocity Jacobian. Computed ONCE per stage and shared
    between the impulse-gate and stance factorizations."""
    return mass_and_contact_jacobian_fk(model, cm, spatial.fk(model, q))


def tri_inv(L):
    """Explicit inverse of a lower-triangular Cholesky factor.

    Every subsequent cho-solve application becomes two fusable (MXU)
    matmuls Linv.T @ (Linv @ b); the factored-inverse form keeps the
    two-triangular-factor numerics (no dense M⁻¹/S⁻¹ is ever formed).
    Round 5: the substitution itself is the UNROLLED elementwise pass of
    ops/smallchol (the XLA triangular_solve custom call was a measured
    hot spot — 13.7-20.9 ms per 10240-instance chol+inv chain on-chip vs
    0.6-1.7 ms unrolled; PROFILE_r05)."""
    return smallchol.tri_inv(L)


def factors_from_mj(M, LMi, J, active):
    """Schur factorization of [[M, −J̃ᵀ], [J̃, Σ]] for a given active mask,
    reusing the shared (M, LMi, J) with LMi the INVERSE lower-Cholesky
    factor of M (mass_and_contact_jacobian). Returns
    (LMi, LSi, Jm, mask3, M) with LSi the inverse factor of the SPD Schur
    complement S = J̃ M⁻¹ J̃ᵀ + Σ (see tri_inv)."""
    mask3 = jnp.repeat(active.astype(J.dtype), 3)
    Jm = mask3[:, None] * J
    MinvJt = LMi.T @ (LMi @ Jm.T)
    S = Jm @ MinvJt + jnp.diag(1.0 - mask3)
    LSi = smallchol.chol_tri_inv(0.5 * (S + S.T))
    return LMi, LSi, Jm, mask3, M


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


def _apply_chol_inv(Li, b):
    """A⁻¹ b from the inverse Cholesky factor Li = L⁻¹ (A = L Lᵀ)."""
    return Li.T @ (Li @ b)


def contact_solve(LMi, LSi, Jm, b1, b2):
    """Solve [[M, −J̃ᵀ], [J̃, Σ]] [x; y] = [b1; b2] (multi-RHS along the
    last axis if b1/b2 are matrices). LMi/LSi are inverse Cholesky
    factors (factors_from_mj) — the solves are pure matmuls."""
    Minvb1 = _apply_chol_inv(LMi, b1)
    y = _apply_chol_inv(LSi, b2 - Jm @ Minvb1)
    x = _apply_chol_inv(LMi, b1 + Jm.T @ y)
    return x, y


def contact_solve_T(LMi, LSi, Jm, b1, b2):
    """Solve the transposed block [[M, J̃ᵀ], [−J̃, Σ]] [x; y] = [b1; b2]
    (same Schur factorization; used by dual expansion)."""
    Minvb1 = _apply_chol_inv(LMi, b1)
    y = _apply_chol_inv(LSi, b2 + Jm @ Minvb1)
    x = _apply_chol_inv(LMi, b1 - Jm.T @ y)
    return x, y


def impulse_map(model: RobotModel, cm: ContactModel, q, v, active):
    """(v⁺, Λ): perfectly inelastic impact on the newly-active contacts:
    M (v⁺ − v) = J̃ᵀ Λ, J̃ v⁺ = 0 (reference: ImpulseDynamics)."""
    LM, LS, Jm, _, _ = contact_factors(model, cm, q, active)
    dv, lam = contact_solve(LM, LS, Jm, jnp.zeros(model.nv, q.dtype),
                            -Jm @ v)
    return v + dv, lam


def transition_blocks(model: RobotModel, dt, q, v_eff, a, q_next, qp0=None):
    """CLOSED-FORM scaled state-equation blocks for the Lie-group Euler
    step qp = q ⊕ w, w = dt (v_eff + dt a) (round 4; replaces a
    54-tangent jacfwd tower + an 18x18 multi-RHS LU solve that were the
    largest linearize sub-phase on the chip).

    With D = qp ⊖ q_next, the row-scaled (−Jn⁻¹-premultiplied) blocks
    collapse via the identities Jl(D)Jr⁻¹(D) = Ad_{Exp(D)} and
    Jl(D) D = D to
        Aq_q = Ad(q_next⁻¹ q),   Aq_v = dt · Ad(q_next⁻¹ qp) · Jr6(w),
        rq_s = D,
    and the qp-tangent maps (chaining the switching rows through the
    analytic frame Jacobian at qp) are
        D1q = Ad(Exp(−w)),       D1v = dt · Jr6(w).
    1-dof joints are the abelian special case (identity / dt·identity).
    Returns (Aq_q, Aq_v, rq_s, D1q, D1v); Aq_a = dt · Aq_v exactly
    (a enters only through dt²·δa alongside dt·δv). Verified against the
    autodiff tower in tests/test_oracle.py::test_transition_blocks_*.
    """
    nv = model.nv
    dtype = q.dtype
    w0 = dt * (v_eff + dt * a)
    if qp0 is None:
        qp0 = model_mod.integrate(model, q, w0)
    D = model_mod.difference(model, q_next, qp0)

    I_v = jnp.eye(nv, dtype=dtype)
    Aq_q = I_v
    Aq_v_base = I_v
    D1q = I_v
    D1v_base = I_v
    for i, jt in enumerate(model.joint_types):
        if jt != FREE:
            continue
        qo, vo = model.q_offset[i], model.v_offset[i]
        pq, qq = q[qo:qo + 3], q[qo + 3:qo + 7]
        pn, qn_ = q_next[qo:qo + 3], q_next[qo + 3:qo + 7]
        pp, qp_ = qp0[qo:qo + 3], qp0[qo + 3:qo + 7]
        w_f = w0[vo:vo + 6]
        qi, pi = lie.se3_inverse(qn_, pn)
        rel1 = lie.se3_compose(qi, pi, qq, pq)     # qn⁻¹ q
        rel2 = lie.se3_compose(qi, pi, qp_, pp)    # qn⁻¹ qp
        Jr = lie.se3_jr(w_f)
        qe, pe = lie.se3_exp(-w_f)
        blk = lambda M: M.astype(dtype)
        Aq_q = Aq_q.at[vo:vo + 6, vo:vo + 6].set(
            blk(lie.ad6(rel1[0], rel1[1])))
        Aq_v_base = Aq_v_base.at[vo:vo + 6, vo:vo + 6].set(
            blk(lie.ad6(rel2[0], rel2[1]) @ Jr))
        D1q = D1q.at[vo:vo + 6, vo:vo + 6].set(blk(lie.ad6(qe, pe)))
        D1v_base = D1v_base.at[vo:vo + 6, vo:vo + 6].set(blk(Jr))
    return Aq_q, dt * Aq_v_base, D, D1q, dt * D1v_base
