"""Stage linearization + condensing: the per-stage hot path.

TPU-native replacement for the reference's `SplitOCP` / `ImpulseSplitOCP` /
`SplitUnconstrOCP` orchestration (idocp `ocp/split_ocp.hpp`,
`impulse/impulse_split_ocp.hpp`, `unconstr/split_unconstr_ocp.hpp`;
SURVEY.md L3). One pure function per stage type, vmapped over the horizon
(replacing the reference's OpenMP stage loop, `ocp/ocp_linearizer.hpp`).

Everything is assembled in the *named variable space*
    z_named = (δq, δv_eff, a, f, u)   (dims nv, nv, nv, nf, nu)
where v_eff is the post-impulse velocity (= v at non-impulse stages); the
chain matrices Tx/Tw then map named-space quantities into the stage's
(x, w) layout, including the impulse-map Jacobians (Gq, Gv). Layouts:
  contact stage:  w = (a, f, u), eliminated (a, f), control u
  unconstr stage: w = (u, a),   eliminated u,       control a

Numerical-robustness invariants (f32 hot path):
  * no dense matrix inverse anywhere — the contact block is factorized by
    Cholesky + SPD Schur complement (state_equation.contact_factors), the
    state-equation row scaling is a linear solve;
  * impulse-map Jacobians are computed by the implicit-function rule
    against the already-computed factorization (never by differentiating
    through a Cholesky);
  * derivative sweeps are fused: one jacfwd per residual family over the
    concatenated tangent instead of one per argument.
"""
from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp

from ..constraints import pdipm
from ..robot import dynamics, kinematics, spatial
from ..robot import model as model_mod
from ..robot.contact import ContactModel
from ..robot.model import RobotModel
from .data import StageQuad
from .state_equation import (contact_factors, contact_solve,
                             factors_from_mj as contact_factors_from_mj,
                             mass_and_contact_jacobian,
                             mass_and_contact_jacobian_fk)

_ORDER = ("q", "v", "a", "f", "u")


@dataclasses.dataclass(frozen=True)
class StageLin:
    """Raw + condensed stage linearization."""
    quad: StageQuad          # over (x, w), incl. PDIPM condensing
    cost: jnp.ndarray        # stage cost value (no barrier)
    barrier: jnp.ndarray     # -mu sum log slack
    E_x: jnp.ndarray
    E_we: jnp.ndarray
    E_wk: jnp.ndarray
    e: jnp.ndarray
    T_x: jnp.ndarray         # elimination operators: w_e = T_x x + T_k u + t0
    T_k: jnp.ndarray
    t0: jnp.ndarray
    fac_LM: jnp.ndarray      # contact-block INVERSE Cholesky factors
    fac_LS: jnp.ndarray      # (tri_inv; dual expansion reapplies them)
    fac_Jm: jnp.ndarray
    F_x: jnp.ndarray         # scaled (A-form) state-eq Jacobians
    F_w: jnp.ndarray
    xres: jnp.ndarray
    Cx_raw: jnp.ndarray
    Cw_raw: jnp.ndarray
    h: jnp.ndarray
    sw_mask: jnp.ndarray
    g: Dict[str, jnp.ndarray]       # per-constraint-component values
    Jz: Dict[str, jnp.ndarray]      # per-component Jacobians over (x|w)
    lnamed: jnp.ndarray      # cost gradient in named space (for KKT error)
    lx_extra: jnp.ndarray    # x-space cost gradient (impulse dv/Λ cost)
    E_named: jnp.ndarray
    C_named: jnp.ndarray
    F_named: jnp.ndarray     # scaled state-eq Jacobian in named space
    Tx: jnp.ndarray
    Tw: jnp.ndarray


jax.tree_util.register_dataclass(
    StageLin,
    data_fields=[f.name for f in dataclasses.fields(StageLin)],
    meta_fields=[])


def _named_offsets(nv, nf, nu):
    return {"q": 0, "v": nv, "a": 2 * nv, "f": 3 * nv, "u": 3 * nv + nf}, \
        3 * nv + nf + nu


def _accumulate_named(blocks_list, offs, nn, dtype):
    """Sum BlockQuads into dense named-space (value, l, H)."""
    val = jnp.zeros((), dtype)
    l = jnp.zeros((nn,), dtype)
    H = jnp.zeros((nn, nn), dtype)
    for b in blocks_list:
        val = val + b.value
        for name, g in b.l.items():
            o = offs[name]
            l = l.at[o:o + g.shape[0]].add(g)
        for (n1, n2), Q in b.Q.items():
            o1, o2 = offs[n1], offs[n2]
            H = H.at[o1:o1 + Q.shape[0], o2:o2 + Q.shape[1]].add(Q)
            if n1 != n2:
                H = H.at[o2:o2 + Q.shape[1], o1:o1 + Q.shape[0]].add(Q.T)
    return val, l, H


def _ord(name):
    return _ORDER.index(name)


def _accumulate_blocks(blocks_list, dtype):
    """Sum BlockQuads in BLOCK space: (value, l dict, H dict keyed by
    _ORDER-canonical name pairs). The dense named-space H is assembled
    exactly ONCE at the end (_assemble_named) — the previous per-block
    `.at[].add` pattern rematerialized the 78x78 H for every block and
    every constraint (measured as a linearize hot spot)."""
    val = jnp.zeros((), dtype)
    lb, Hb = {}, {}
    for b in blocks_list:
        val = val + b.value
        for name, g in b.l.items():
            lb[name] = lb[name] + g if name in lb else g
        for (n1, n2), Q in b.Q.items():
            key, Qc = ((n1, n2), Q) if _ord(n1) <= _ord(n2) else \
                ((n2, n1), Q.T)
            Hb[key] = Hb[key] + Qc if key in Hb else Qc
    return val, lb, Hb


def _add_outer_blocks(Hb, Jblocks, sigma):
    """Hb += Jᵀ diag(sigma) J restricted to the constraint's nonzero
    named blocks (joint-limit / cone Jacobians touch 1-2 names, so this
    avoids dense (dim, nn) matmuls)."""
    for na, Ja in Jblocks.items():
        for nb_, Jb in Jblocks.items():
            if _ord(na) > _ord(nb_):
                continue
            contrib = Ja.T @ (sigma[:, None] * Jb)
            key = (na, nb_)
            Hb[key] = Hb[key] + contrib if key in Hb else contrib


def _assemble_vec(lb, sizes, dtype):
    """Dense named-space vector from a block dict (missing names zero)."""
    return jnp.concatenate([
        lb[name] if name in lb else jnp.zeros((dim,), dtype)
        for name, dim in sizes])


def _assemble_mat(Hb, sizes, dtype):
    """ONE dense assembly of H from the block dict; missing blocks are
    zeros. sizes: ordered list of (name, dim)."""
    rows = []
    for rname, rdim in sizes:
        row = []
        for cname, cdim in sizes:
            key = (rname, cname) if _ord(rname) <= _ord(cname) else \
                (cname, rname)
            if key in Hb:
                blk = Hb[key] if key[0] == rname else Hb[key].T
            else:
                blk = jnp.zeros((rdim, cdim), dtype)
            row.append(blk)
        rows.append(jnp.concatenate(row, axis=1))
    return jnp.concatenate(rows, axis=0)


def _impulse_quantities(model, cm, q, v, imp_mask, imp_contact, mj,
                        fkb=None):
    """v_eff, Λ and their tangent Jacobians (Gq, Gv, Lq, Lv), mask-gated.

    Implicit-function derivatives against the contact-block factorization
    (no autodiff through the Cholesky): with A(q) [dv; Λ] = [0; −J̃v],
      ∂sol/∂v = A⁻¹ [0; −J̃],
      ∂sol/∂q = −A⁻¹ ∂q[A(q)·sol − rhs(q)]
    where the q-sweep is ANALYTIC (robot/spatial.py): the top rows
    M(q)dv − J̃ᵀΛ = RNEA(q,0,dv,f=Λ) gravity-free use the closed-form
    RNEA q-derivative, the bottom rows J̃(q)v⁺ use the closed-form point-
    velocity q-derivative. mj = (M, LM, J) shared with the stance
    factorization; fkb = the stage's world-frame FK bundle.
    """
    nv, nf = model.nv, cm.max_dimf
    dtype = q.dtype
    m = imp_mask.astype(dtype)
    if fkb is None:
        fkb = spatial.fk(model, q)

    M_, LM_, J_ = mj
    LM, LS, Jm, mask3i, _ = contact_factors_from_mj(M_, LM_, J_,
                                                    imp_contact)
    dv0, lam0 = contact_solve(LM, LS, Jm, jnp.zeros(nv, dtype), -Jm @ v)

    # ∂/∂v: linear in the rhs
    Dv_dv, Dv_lam = contact_solve(LM, LS, Jm,
                                  jnp.zeros((nv, nv), dtype), -Jm)

    # ∂/∂q: implicit-function rule, residual r(q) = A(q) sol0 − rhs(q)
    fm = (mask3i * lam0).reshape(cm.nc, 3)
    v_post = v + dv0
    zero_v = jnp.zeros(nv, dtype)

    p_f, fb = spatial.frame_points(model, fkb, cm.frame_ids)
    Jpts = spatial.point_jacobians(model, fkb, p_f, fb)
    fext = spatial.contact_forces_to_body(model, p_f, fb, fm,
                                          model.nbodies)
    dfext_q = spatial.contact_forces_dq(model, Jpts, fb, fm,
                                        model.nbodies)
    mo_top = spatial.motion(model, fkb, zero_v, dv0, no_gravity=True)
    _, _, F_top = spatial.rnea(model, fkb, mo_top, fext)
    dtop_q, _ = spatial.rnea_derivatives(model, fkb, mo_top, F_top,
                                         dfext_q)
    mo_vel = spatial.motion(model, fkb, v_post, zero_v,
                            acc_derivatives=False)
    dvel_q, _, _, _ = spatial.point_pva_derivatives(
        fkb, mo_vel, p_f, fb, Jpts, acc=False)
    dbot_q = mask3i[:, None] * dvel_q.reshape(3 * cm.nc, nv)
    Dq_dv, Dq_lam = contact_solve(LM, LS, Jm, -dtop_q, -dbot_q)

    v_eff = v + m * dv0
    lam = m * lam0
    I_v = jnp.eye(nv, dtype=dtype)
    Gq = m * Dq_dv
    Gv = I_v + m * Dv_dv
    Lq = m * Dq_lam
    Lv = m * Dv_lam
    return v_eff, lam, Gq, Gv, Lq, Lv


def _dynamics_blocks(model, cm, q, v_eff, a, f, u, contact_active, p_ref,
                     factors, fkb):
    """ID + Baumgarte residuals and named-space Jacobian blocks.

    Fully ANALYTIC (robot/spatial.py; VERDICT r3 missing #2): the RNEA
    q/v-derivatives and the Baumgarte point pos/vel/acc derivatives are
    closed-form dense tensors from the shared FK bundle — no autodiff
    tangent tower. The (a, f, u) blocks are the contact block matrix
    (from `factors`) and −Sᵀ.
    """
    nv, nf, nu = model.nv, cm.max_dimf, model.nu
    dtype = q.dtype
    mask3 = jnp.repeat(contact_active.astype(dtype), 3)
    S_T = jnp.concatenate(
        [jnp.zeros((nv - nu, nu), dtype), jnp.eye(nu, dtype=dtype)], axis=0)

    fm = (mask3 * f).reshape(cm.nc, 3)
    p_f, fb = spatial.frame_points(model, fkb, cm.frame_ids)
    Jpts = spatial.point_jacobians(model, fkb, p_f, fb)
    fext = spatial.contact_forces_to_body(model, p_f, fb, fm,
                                          model.nbodies)
    dfext_q = spatial.contact_forces_dq(model, Jpts, fb, fm,
                                        model.nbodies)
    mo = spatial.motion(model, fkb, v_eff, a)
    tau, _, F = spatial.rnea(model, fkb, mo, fext)
    dtau_q, dtau_v = spatial.rnea_derivatives(model, fkb, mo, F, dfext_q)
    pos, vel, acc = spatial.point_pva(fkb, mo, p_f, fb)
    dvel_q, dvel_v, dacc_q, dacc_v = spatial.point_pva_derivatives(
        fkb, mo, p_f, fb, Jpts)

    id_res = tau - S_T @ u
    baum = (acc + cm.kd * vel + cm.kp * (pos - p_ref)).reshape(3 * cm.nc)
    baum = mask3 * baum + (1.0 - mask3) * f
    baum_q = (dacc_q + cm.kd * dvel_q + cm.kp * Jpts).reshape(
        3 * cm.nc, nv) * mask3[:, None]
    baum_v = (dacc_v + cm.kd * dvel_v).reshape(
        3 * cm.nc, nv) * mask3[:, None]

    e = jnp.concatenate([id_res, baum])
    Dq = jnp.concatenate([dtau_q, baum_q], axis=0)
    Dv = jnp.concatenate([dtau_v, baum_v], axis=0)
    # a/f/u blocks: the contact block matrix [[M, -Jm^T],[Jm, Sigma]]
    LM, _, Jm, m3, M = factors
    E_af = jnp.concatenate([
        jnp.concatenate([M, -Jm.T], axis=1),
        jnp.concatenate([Jm, jnp.diag(1.0 - m3)], axis=1),
    ], axis=0)
    E_u = jnp.concatenate([-S_T, jnp.zeros((nf, nu), dtype)], axis=0)
    return e, Dq, Dv, E_af, E_u


def _state_eq_blocks(model, dt, q, v_eff, a, q_next, v_next):
    """Scaled (A-form) state-equation blocks in named space.

    Semi-implicit Euler (reference variant, SURVEY.md §0.1):
        v' = v_eff + dt a;  q' = q ⊕ dt v' = q ⊕ dt (v_eff + dt a)
    q-row scaled by -Jn^{-1} so x' appears with identity coefficient
    (solved, never inverted). One fused jacfwd over (δq, δv, δq_next).
    """
    out = _state_eq_switching_blocks(model, None, dt, q, v_eff, a, q_next,
                                     v_next, None, None)
    return out[:5]


def _state_eq_switching_blocks(model, cm, dt, q, v_eff, a, q_next, v_next,
                               sw_contact, sw_pos):
    """State-equation AND switching-constraint blocks, fully CLOSED FORM.

    The row-scaled state-equation Jacobians come from
    state_equation.transition_blocks (SE(3) adjoints + right Jacobian;
    no autodiff, no linear solve), and the switching rows chain the
    analytic frame Jacobian at the predicted configuration
    qp = q ⊕ dt (v_eff + dt a) through the qp-tangent maps D1q/D1v
    (exact identity pos(qp(z)) = pos(qp0 ⊕ d(z))). Switching rows
    (reference: ocp/switching_constraint.hpp): masked touchdown positions
    of qp must equal planned footholds; Ca = dt·Cv exactly (a enters only
    via dt²·δa alongside dt·δv). cm=None disables the switching rows.
    The forward-mode variant `_state_eq_switching_blocks_ad` is kept as
    the test oracle.
    """
    from .state_equation import transition_blocks
    nv = model.nv
    dtype = q.dtype
    with_sw = cm is not None
    qp0 = model_mod.integrate(model, q, dt * (v_eff + dt * a))
    Aq_q, Aq_v, rq_s, D1q, D1v = transition_blocks(
        model, dt, q, v_eff, a, q_next, qp0=qp0)
    Aq_a = dt * Aq_v
    rv0 = v_eff + dt * a - v_next
    if not with_sw:
        return Aq_q, Aq_v, Aq_a, rq_s, rv0, None, None, None, None, None
    mask3 = jnp.repeat(sw_contact.astype(dtype), 3)
    fkp = spatial.fk(model, qp0)
    p_f, fb = spatial.frame_points(model, fkp, cm.frame_ids)
    Jf = spatial.point_jacobians(model, fkp, p_f, fb).reshape(
        3 * cm.nc, nv)
    h = mask3 * (p_f.reshape(3 * cm.nc) - sw_pos.reshape(3 * cm.nc))
    Cq = mask3[:, None] * (Jf @ D1q)
    Cv = mask3[:, None] * (Jf @ D1v)
    Ca = dt * Cv
    return Aq_q, Aq_v, Aq_a, rq_s, rv0, h, Cq, Cv, Ca, mask3


def _state_eq_switching_blocks_ad(model, cm, dt, q, v_eff, a, q_next,
                                  v_next, sw_contact, sw_pos):
    """Forward-mode oracle for _state_eq_switching_blocks (one jacfwd
    over the Lie-ops residual + an LU row scaling — the round-3..4
    production path, retained for the two-algorithm cross-check)."""
    nv = model.nv
    dtype = q.dtype
    with_sw = cm is not None
    qp0 = model_mod.integrate(model, q, dt * (v_eff + dt * a))

    def res(z):
        eq, dvv, en = z[:nv], z[nv:2 * nv], z[2 * nv:]
        qp = model_mod.integrate(
            model, model_mod.integrate(model, q, eq),
            dt * (v_eff + dvv + dt * a))
        qn = model_mod.integrate(model, q_next, en)
        rq = model_mod.difference(model, qn, qp)
        if not with_sw:
            return rq
        dp = model_mod.difference(model, qp0, qp)  # qp tangent at qp0
        return jnp.concatenate([rq, dp])

    zero3 = jnp.zeros((3 * nv,), dtype)
    r0 = res(zero3)
    J = jax.jacfwd(res)(zero3)
    rq0, Jq, Jv, Jn = r0[:nv], J[:nv, :nv], J[:nv, nv:2 * nv], \
        J[:nv, 2 * nv:]
    rhs = jnp.concatenate([Jq, Jv, rq0[:, None]], axis=1)
    sol = -jnp.linalg.solve(Jn, rhs)
    Aq_q, Aq_v, rq_s = sol[:, :nv], sol[:, nv:2 * nv], sol[:, 2 * nv]
    Aq_a = dt * Aq_v
    rv0 = v_eff + dt * a - v_next
    if not with_sw:
        return Aq_q, Aq_v, Aq_a, rq_s, rv0, None, None, None, None, None
    mask3 = jnp.repeat(sw_contact.astype(dtype), 3)
    fkp = spatial.fk(model, qp0)
    p_f, fb = spatial.frame_points(model, fkp, cm.frame_ids)
    Jf = spatial.point_jacobians(model, fkp, p_f, fb).reshape(
        3 * cm.nc, nv)
    h = mask3 * (p_f.reshape(3 * cm.nc) - sw_pos.reshape(3 * cm.nc))
    Dq_p, Dv_p = J[nv:, :nv], J[nv:, nv:2 * nv]
    Cq = mask3[:, None] * (Jf @ Dq_p)
    Cv = mask3[:, None] * (Jf @ Dv_p)
    Ca = dt * Cv
    return Aq_q, Aq_v, Aq_a, rq_s, rv0, h, Cq, Cv, Ca, mask3


def linearize_contact_stage(
        model: RobotModel, cm: ContactModel, costs, constraints, options,
        t, dt, q, v, a, f, u, q_next, v_next, slack, dual,
        contact_active, p_ref, imp_mask, imp_contact,
        sw_contact, sw_pos, ctx=None,
        impulse_cost=None, impulse_constraints=(),
        imp_quants=None) -> StageLin:
    """Linearize + condense one whole-body stage (reference:
    SplitOCP::computeKKTSystem + ContactDynamics::condense).

    imp_quants: optional precomputed (v_eff, lam, Gq, Gv, Lq, Lv) from the
    solver's impulse-slot gather (only the few stages that can carry an
    impulse run the implicit-derivative sweep — the per-stage default
    recomputes it everywhere, which is 10x wasted work at N=20 horizons
    with <=2 touchdowns).
    """
    nv, nf, nu = model.nv, cm.max_dimf, model.nu
    nx, nw = 2 * nv, nv + nf + nu
    dtype = q.dtype
    offs, nn = _named_offsets(nv, nf, nu)

    # shared per-stage dynamics quantities: ONE world-frame FK bundle
    # feeds the mass matrix, contact Jacobians, impulse gate and all the
    # analytic dynamics derivatives (robot/spatial.py)
    fkb = spatial.fk(model, q)
    mj = mass_and_contact_jacobian_fk(model, cm, fkb)

    # impulse gate: post-impulse velocity + impact impulse and Jacobians
    if imp_quants is None:
        v_eff, lam, Gq, Gv, Lq, Lv = _impulse_quantities(
            model, cm, q, v, imp_mask, imp_contact, mj, fkb)
    else:
        v_eff, lam, Gq, Gv, Lq, Lv = imp_quants

    # ---- costs in named BLOCK space (one dense assembly at the end —
    # the per-block .at[].add pattern rematerialized the 78x78 H per
    # block/constraint, a measured linearize hot spot)
    fmask = jnp.repeat(contact_active.astype(dtype), 3)
    blocks = [c.stage(ctx, t, dt, q, v_eff, a, f, u, fmask) for c in costs]
    val, lb, Hb = _accumulate_blocks(blocks, dtype)
    lcond_b = dict(lb)

    # ---- PDIPM: evaluate, condense into the named blocks (constraint
    # Jacobians touch 1-2 named blocks, so JᵀΣJ stays block-sparse)
    g_all, Jz_all = {}, {}
    barrier = jnp.zeros((), dtype)
    for comp in constraints:
        g, Jblocks = comp.evaluate(ctx, q, v_eff, a, f, u, fmask)
        Jn_ = jnp.zeros((comp.dim, nn), dtype)
        for name, Jb in Jblocks.items():
            o = offs[name]
            Jn_ = Jn_.at[:, o:o + Jb.shape[1]].add(Jb)
        s_, d_ = slack[comp.name], dual[comp.name]
        sigma, rhs = pdipm.condense_terms(g, s_, d_, options.barrier)
        _add_outer_blocks(Hb, Jblocks, sigma)
        for name, Jb in Jblocks.items():
            contrib = Jb.T @ rhs
            lcond_b[name] = lcond_b[name] + contrib if name in lcond_b \
                else contrib
        barrier = barrier + pdipm.barrier_value(s_, options.barrier)
        g_all[comp.name] = g
        Jz_all[comp.name] = Jn_  # full row (slack/dual expansion + KKT)

    sizes = [("q", nv), ("v", nv), ("a", nv), ("f", nf), ("u", nu)]
    lnamed = _assemble_vec(lb, sizes, dtype)
    lcond = _assemble_vec(lcond_b, sizes, dtype)
    H = _assemble_mat(Hb, sizes, dtype)

    # ---- contact-block factorization (shared: E_af, elimination, duals)
    factors = contact_factors_from_mj(*mj, contact_active)
    LM, LS, Jm, _, _ = factors

    # ---- dynamics equality in named space
    e, Dq, Dv, E_af, E_u = _dynamics_blocks(
        model, cm, q, v_eff, a, f, u, contact_active, p_ref, factors, fkb)
    E_named = jnp.concatenate([Dq, Dv, jnp.concatenate([E_af, E_u], axis=1)],
                              axis=1)

    # ---- state equation + switching constraint (one fused jacfwd tower)
    (Aq_q, Aq_v, Aq_a, rq_s, rv0, h, Cq, Cv, Ca,
     swm3) = _state_eq_switching_blocks(
        model, cm, dt, q, v_eff, a, q_next, v_next, sw_contact, sw_pos)
    Z_qf = jnp.zeros((nv, nf), dtype)
    Z_qu = jnp.zeros((nv, nu), dtype)
    I_v = jnp.eye(nv, dtype=dtype)
    F_named = jnp.concatenate([
        jnp.concatenate([Aq_q, Aq_v, Aq_a, Z_qf, Z_qu], axis=1),
        jnp.concatenate([jnp.zeros((nv, nv), dtype), I_v, dt * I_v, Z_qf,
                         Z_qu], axis=1),
    ], axis=0)
    xres = jnp.concatenate([rq_s, rv0])

    # ---- switching constraint (blocks from the fused tower above)
    C_named = jnp.concatenate(
        [Cq, Cv, Ca, jnp.zeros((3 * cm.nc, nf + nu), dtype)], axis=1)

    # ---- chain matrices named <- (x | w). Tx has block structure
    # [[I, 0], [Gq, Gv], [0, 0]] and Tw is a row selector, so every chain
    # product is computed STRUCTURALLY (nv-wide blocks / slices) instead
    # of dense nn-wide matmuls — ~2-3x fewer chain flops and ops (the
    # full Tx/Tw are still stored on StageLin for the KKT-residual path,
    # where XLA dead-code-eliminates them on the MPC hot path).
    Tx = jnp.zeros((nn, nx), dtype)
    Tx = Tx.at[0:nv, 0:nv].set(jnp.eye(nv, dtype=dtype))
    Tx = Tx.at[nv:2 * nv, 0:nv].set(Gq)
    Tx = Tx.at[nv:2 * nv, nv:2 * nv].set(Gv)
    Tw = jnp.zeros((nn, nw), dtype)
    Tw = Tw.at[2 * nv:, :].set(jnp.eye(nv + nf + nu, dtype=dtype))

    def chain_x(Amat):
        """A @ Tx for A (r, nn): [A_q + A_v Gq | A_v Gv]."""
        Aq_, Av_ = Amat[..., :nv], Amat[..., nv:2 * nv]
        return jnp.concatenate([Aq_ + Av_ @ Gq, Av_ @ Gv], axis=-1)

    def chain_xT(Xmat):
        """Tx.T @ X for X (nn, k) or (nn,)."""
        top = Xmat[:nv] + Gq.T @ Xmat[nv:2 * nv]
        bot = Gv.T @ Xmat[nv:2 * nv]
        return jnp.concatenate([top, bot], axis=0)

    def chain_w(Amat):
        """A @ Tw = the named (a, f, u) columns."""
        return Amat[..., 2 * nv:]

    quad_lx = chain_xT(lcond)
    quad_Qxx = chain_xT(chain_x(H))
    quad_Qxx = 0.5 * (quad_Qxx + quad_Qxx.T)
    lx_extra = jnp.zeros((nx,), dtype)
    cost_extra = jnp.zeros((), dtype)

    # ---- impulse-stage cost on (dv, Λ) in x-space (reference:
    # ImpulseSplitOCP cost components; VERDICT r1 missing-item #2)
    if impulse_cost is not None:
        dvi = v_eff - v                     # masked already (= m·dv0)
        Jdv = jnp.concatenate([Gq, Gv - I_v], axis=1)   # (nv, nx)
        Lx = jnp.concatenate([Lq, Lv], axis=1)           # (nf, nx)
        w_dv = jnp.asarray(impulse_cost.dv_weight, dtype)
        w_lm = jnp.asarray(impulse_cost.lam_weight, dtype)
        cost_extra = (0.5 * jnp.sum(w_dv * dvi * dvi)
                      + 0.5 * jnp.sum(w_lm * lam * lam))
        lx_extra = Jdv.T @ (w_dv * dvi) + Lx.T @ (w_lm * lam)
        quad_lx = quad_lx + lx_extra
        quad_Qxx = (quad_Qxx + Jdv.T @ (w_dv[:, None] * Jdv)
                    + Lx.T @ (w_lm[:, None] * Lx))
    val = val + cost_extra

    # ---- impulse-stage constraints on Λ (reference: the impulse friction
    # cone / normal-force variants, SURVEY.md §2 "Impulse variants").
    # Λ is an explicit function of x, so these condense in x-space through
    # the impulse-map Jacobian Lx = [Lq, Lv]; the (x|w)-space Jacobians
    # [Jg·Lx, 0] feed the shared slack/dual expansion and KKT residual.
    Jxw_imp = {}
    if impulse_constraints:
        Lx_imp = jnp.concatenate([Lq, Lv], axis=1)       # (nf, nx)
        gate = imp_mask.astype(dtype) * imp_contact.astype(dtype)  # (nc,)
        for comp in impulse_constraints:
            g_i, dgdlam = comp.evaluate_lam(lam, gate)
            Jx_i = dgdlam @ Lx_imp                        # (dim, nx)
            s_, d_ = slack[comp.name], dual[comp.name]
            sigma, rhs = pdipm.condense_terms(g_i, s_, d_, options.barrier)
            quad_Qxx = quad_Qxx + Jx_i.T @ (sigma[:, None] * Jx_i)
            quad_lx = quad_lx + Jx_i.T @ rhs
            barrier = barrier + pdipm.barrier_value(s_, options.barrier)
            g_all[comp.name] = g_i
            Jxw_imp[comp.name] = jnp.concatenate(
                [Jx_i, jnp.zeros((comp.dim, nw), dtype)], axis=1)

    quad = StageQuad(
        value=val,
        lx=quad_lx, lw=lcond[2 * nv:],
        Qxx=quad_Qxx, Qxw=chain_xT(chain_w(H)),
        Qww=H[2 * nv:, 2 * nv:],
    )
    E_x = chain_x(E_named)
    E_w = chain_w(E_named)
    E_we, E_wk = E_w[:, :nv + nf], E_w[:, nv + nf:]
    F_x = chain_x(F_named)
    F_w = chain_w(F_named)
    Cx_raw = chain_x(C_named)
    Cw_raw = chain_w(C_named)
    Jz = {k: jnp.concatenate([chain_x(Jn_), chain_w(Jn_)], axis=1)
          for k, Jn_ in Jz_all.items()}
    Jz.update(Jxw_imp)  # impulse-Λ constraints: already in (x|w) space

    # ---- elimination operators: w_e = T_x x + T_k u + t0 with
    # E_we w_e = −(E_x x + E_wk u + e); E_we IS the factorized contact
    # block, so this is two Cholesky backsubstitutions (multi-RHS).
    R1 = -jnp.concatenate([E_x[:nv], E_wk[:nv], e[:nv, None]], axis=1)
    R2 = -jnp.concatenate([E_x[nv:], E_wk[nv:], e[nv:, None]], axis=1)
    Xs, Ys = contact_solve(LM, LS, Jm, R1, R2)
    Tmat = jnp.concatenate([Xs, Ys], axis=0)   # (nv+nf, nx+nu+1)
    T_x = Tmat[:, :nx]
    T_k = Tmat[:, nx:nx + nu]
    t0 = Tmat[:, nx + nu]

    return StageLin(
        quad=quad, cost=val, barrier=barrier,
        E_x=E_x, E_we=E_we, E_wk=E_wk, e=e,
        T_x=T_x, T_k=T_k, t0=t0,
        fac_LM=LM, fac_LS=LS, fac_Jm=Jm,
        F_x=F_x, F_w=F_w, xres=xres,
        Cx_raw=Cx_raw, Cw_raw=Cw_raw, h=h, sw_mask=swm3,
        g=g_all, Jz=Jz, lnamed=lnamed, lx_extra=lx_extra,
        E_named=E_named, C_named=C_named,
        F_named=F_named, Tx=Tx, Tw=Tw,
    )


def linearize_unconstr_stage(
        model: RobotModel, costs, constraints, options,
        t, dt, q, v, a, u, q_next, v_next, slack, dual, ctx=None) -> StageLin:
    """Fixed-base contact-free fast path (reference: SplitUnconstrOCP +
    UnconstrDynamics): w = (u, a), eliminate u, control a. nf = 0.
    E_we = −I, so the elimination operators are free: T = (E_x, E_wk, e)."""
    nv, nu = model.nv, model.nu
    assert nu == nv, "unconstr path requires a fully-actuated fixed base"
    nx, nw = 2 * nv, 2 * nv
    dtype = q.dtype
    # named space with nf=0: (q, v, a, f:0, u)
    offs, nn = _named_offsets(nv, 0, nu)
    f = jnp.zeros((0,), dtype)
    fmask = jnp.zeros((0,), dtype)

    blocks = [c.stage(ctx, t, dt, q, v, a, f, u, fmask) for c in costs]
    val, lb, Hb = _accumulate_blocks(blocks, dtype)
    lcond_b = dict(lb)

    g_all, Jz_all = {}, {}
    barrier = jnp.zeros((), dtype)
    for comp in constraints:
        g, Jblocks = comp.evaluate(ctx, q, v, a, f, u, fmask)
        Jn_ = jnp.zeros((comp.dim, nn), dtype)
        for name, Jb in Jblocks.items():
            o = offs[name]
            Jn_ = Jn_.at[:, o:o + Jb.shape[1]].add(Jb)
        s_, d_ = slack[comp.name], dual[comp.name]
        sigma, rhs = pdipm.condense_terms(g, s_, d_, options.barrier)
        _add_outer_blocks(Hb, Jblocks, sigma)
        for name, Jb in Jblocks.items():
            contrib = Jb.T @ rhs
            lcond_b[name] = lcond_b[name] + contrib if name in lcond_b \
                else contrib
        barrier = barrier + pdipm.barrier_value(s_, options.barrier)
        g_all[comp.name] = g
        Jz_all[comp.name] = Jn_
    sizes = [("q", nv), ("v", nv), ("a", nv), ("f", 0), ("u", nu)]
    lnamed = _assemble_vec(lb, sizes, dtype)
    lcond = _assemble_vec(lcond_b, sizes, dtype)
    H = _assemble_mat(Hb, sizes, dtype)

    # ID equality: ID(q, v, a) - u = 0; analytic RNEA derivatives + dense
    # CRBA from one world-frame FK bundle (robot/spatial.py)
    fkb = spatial.fk(model, q)
    mo = spatial.motion(model, fkb, v, a)
    tau, _, F_sub = spatial.rnea(model, fkb, mo)
    Dq, Dv = spatial.rnea_derivatives(model, fkb, mo, F_sub)
    e = tau - u
    M = spatial.mass_matrix(model, fkb)
    E_named = jnp.concatenate(
        [Dq, Dv, M, -jnp.eye(nv, dtype=dtype)], axis=1)

    Aq_q, Aq_v, Aq_a, rq_s, rv0 = _state_eq_blocks(
        model, dt, q, v, a, q_next, v_next)
    I_v = jnp.eye(nv, dtype=dtype)
    Zv = jnp.zeros((nv, nv), dtype)
    F_named = jnp.concatenate([
        jnp.concatenate([Aq_q, Aq_v, Aq_a, Zv], axis=1),
        jnp.concatenate([Zv, I_v, dt * I_v, Zv], axis=1),
    ], axis=0)
    xres = jnp.concatenate([rq_s, rv0])

    # chains: x identity (no impulse); w = (u, a) permutation of named
    # (a, u) — all chain products are pure slices/permutations (the dense
    # Tx/Tw below are only stored for the KKT-residual path)
    Tx = jnp.concatenate(
        [jnp.eye(nx, dtype=dtype), jnp.zeros((nn - nx, nx), dtype)], axis=0)
    Tw = jnp.zeros((nn, nw), dtype)
    Tw = Tw.at[2 * nv:3 * nv, nv:2 * nv].set(I_v)  # named a <- w[nv:] (a)
    Tw = Tw.at[3 * nv:, 0:nv].set(I_v)             # named u <- w[:nv] (u)

    def chain_w(Amat):
        """A @ Tw: columns reordered named (a, u) -> w = (u, a)."""
        return jnp.concatenate(
            [Amat[..., 3 * nv:4 * nv], Amat[..., 2 * nv:3 * nv]], axis=-1)

    def chain_wT(X):
        """Tw.T @ X: rows [named u; named a]."""
        return jnp.concatenate([X[3 * nv:4 * nv], X[2 * nv:3 * nv]],
                               axis=0)

    quad = StageQuad(
        value=val, lx=lcond[:nx], lw=chain_wT(lcond),
        Qxx=H[:nx, :nx], Qxw=chain_w(H)[:nx], Qww=chain_wT(chain_w(H)),
    )
    E_x = E_named[:, :nx]
    E_w = chain_w(E_named)
    E_we, E_wk = E_w[:, :nv], E_w[:, nv:]
    F_x = F_named[:, :nx]
    F_w = chain_w(F_named)
    Jz = {k: jnp.concatenate([Jn_[:, :nx], chain_w(Jn_)], axis=1)
          for k, Jn_ in Jz_all.items()}
    Z0x = jnp.zeros((0, nx), dtype)
    Z0w = jnp.zeros((0, nw), dtype)
    z0 = jnp.zeros((0,), dtype)
    Z0 = jnp.zeros((0, 0), dtype)

    return StageLin(
        quad=quad, cost=val, barrier=barrier,
        E_x=E_x, E_we=E_we, E_wk=E_wk, e=e,
        T_x=E_x, T_k=E_wk, t0=e,      # E_we = −I
        fac_LM=Z0, fac_LS=Z0, fac_Jm=Z0,
        F_x=F_x, F_w=F_w, xres=xres,
        Cx_raw=Z0x, Cw_raw=Z0w, h=z0, sw_mask=z0,
        g=g_all, Jz=Jz, lnamed=lnamed,
        lx_extra=jnp.zeros((nx,), dtype),
        E_named=E_named,
        C_named=jnp.zeros((0, nn), dtype), F_named=F_named, Tx=Tx, Tw=Tw,
    )


def evaluate_contact_stage(
        model: RobotModel, cm: ContactModel, costs, constraints, options,
        t, dt, q, v, a, f, u, q_next, v_next, slack,
        contact_active, p_ref, imp_mask, imp_contact,
        sw_contact, sw_pos, ctx=None, impulse_cost=None,
        impulse_constraints=(), imp_values=None):
    """Value-only stage evaluation for line-search trials (reference:
    SplitOCP::stageCost + constraintViolation, used by LineSearch;
    idocp `line_search/line_search.hpp`). Returns
    (cost + barrier, L1 constraint violation). No Jacobians — cheap
    enough to vmap over a grid of trial step sizes."""
    nv, nf, nu = model.nv, cm.max_dimf, model.nu
    dtype = q.dtype

    # shared FK bundle for the whole value-only evaluation
    fkb = spatial.fk(model, q)

    # impulse gate (values only, structured solve; or slot-precomputed)
    m = imp_mask.astype(dtype)
    if imp_values is None:
        M_, LM_, J_ = mass_and_contact_jacobian_fk(model, cm, fkb)
        LMi, LSi, Jmi, m3i, _ = contact_factors_from_mj(M_, LM_, J_,
                                                        imp_contact)
        dv0, lam0 = contact_solve(LMi, LSi, Jmi, jnp.zeros(nv, dtype),
                                  -Jmi @ v)
        v_eff = v + m * dv0
        lam = m * lam0
    else:
        v_eff, lam = imp_values

    fmask = jnp.repeat(contact_active.astype(dtype), 3)
    cost = jnp.zeros((), dtype)
    for c in costs:
        cost = cost + c.stage(ctx, t, dt, q, v_eff, a, f, u, fmask).value
    if impulse_cost is not None:
        dvi = v_eff - v
        w_dv = jnp.asarray(impulse_cost.dv_weight, dtype)
        w_lm = jnp.asarray(impulse_cost.lam_weight, dtype)
        cost = cost + (0.5 * jnp.sum(w_dv * dvi * dvi)
                       + 0.5 * jnp.sum(w_lm * lam * lam))

    barrier = jnp.zeros((), dtype)
    viol = jnp.zeros((), dtype)
    for comp in constraints:
        g, _ = comp.evaluate(ctx, q, v_eff, a, f, u, fmask)
        s_ = slack[comp.name]
        barrier = barrier + pdipm.barrier_value(s_, options.barrier)
        # actual infeasibility only (NOT |g + s|): the slack-slaving error
        # is cancelled linearly by the Newton step itself, and counting it
        # injects the cone's quadratic curvature into the filter measure,
        # capping accepted steps at ~viol/|df|^2 (r2 standing-convergence
        # defect). Reference: LineSearch uses the equality residual norms.
        viol = viol + jnp.sum(jnp.maximum(g, 0.0))
    for comp in impulse_constraints:
        gate = m * imp_contact.astype(dtype)
        g_i, _ = comp.evaluate_lam(lam, gate)
        barrier = barrier + pdipm.barrier_value(slack[comp.name],
                                                options.barrier)
        viol = viol + jnp.sum(jnp.maximum(g_i, 0.0))

    # dynamics equality residuals (ID + Baumgarte) — value-only spatial
    # path (no jvp towers in the line-search trial grid)
    mask3 = fmask
    S_T = jnp.concatenate(
        [jnp.zeros((nv - nu, nu), dtype), jnp.eye(nu, dtype=dtype)], axis=0)
    fm = (mask3 * f).reshape(cm.nc, 3)
    p_f, fb = spatial.frame_points(model, fkb, cm.frame_ids)
    fext = spatial.contact_forces_to_body(model, p_f, fb, fm,
                                          model.nbodies)
    mo = spatial.motion(model, fkb, v_eff, a, derivatives=False)
    tau, _, _ = spatial.rnea(model, fkb, mo, fext)
    id_res = tau - S_T @ u
    pos, vel, acc = spatial.point_pva(fkb, mo, p_f, fb)
    baum = (acc + cm.kd * vel + cm.kp * (pos - p_ref)).reshape(3 * cm.nc)
    baum = mask3 * baum + (1.0 - mask3) * f
    viol = viol + jnp.sum(jnp.abs(id_res)) + jnp.sum(jnp.abs(baum))

    # state equation residuals
    qp = model_mod.integrate(model, q, dt * (v_eff + dt * a))
    rq = model_mod.difference(model, q_next, qp)
    rv = v_eff + dt * a - v_next
    viol = viol + jnp.sum(jnp.abs(rq)) + jnp.sum(jnp.abs(rv))

    # switching constraint residual (masked)
    swm3 = jnp.repeat(sw_contact.astype(dtype), 3)
    fkp = spatial.fk(model, qp)
    pos_sw, _ = spatial.frame_points(model, fkp, cm.frame_ids)
    h = swm3 * (pos_sw - sw_pos).reshape(3 * cm.nc)
    viol = viol + jnp.sum(jnp.abs(h))
    return cost + barrier, viol


def evaluate_unconstr_stage(
        model: RobotModel, costs, constraints, options,
        t, dt, q, v, a, u, q_next, v_next, slack, ctx=None):
    """Value-only evaluation of one fixed-base stage (line-search trials)."""
    nv = model.nv
    dtype = q.dtype
    f = jnp.zeros((0,), dtype)
    fmask = jnp.zeros((0,), dtype)
    cost = jnp.zeros((), dtype)
    for c in costs:
        cost = cost + c.stage(ctx, t, dt, q, v, a, f, u, fmask).value
    barrier = jnp.zeros((), dtype)
    viol = jnp.zeros((), dtype)
    for comp in constraints:
        g, _ = comp.evaluate(ctx, q, v, a, f, u, fmask)
        s_ = slack[comp.name]
        barrier = barrier + pdipm.barrier_value(s_, options.barrier)
        viol = viol + jnp.sum(jnp.maximum(g, 0.0))  # see contact variant
    fkb = spatial.fk(model, q)
    mo = spatial.motion(model, fkb, v, a, derivatives=False)
    tau, _, _ = spatial.rnea(model, fkb, mo)
    id_res = tau - u
    qp = model_mod.integrate(model, q, dt * (v + dt * a))
    rq = model_mod.difference(model, q_next, qp)
    rv = v + dt * a - v_next
    viol = (viol + jnp.sum(jnp.abs(id_res)) + jnp.sum(jnp.abs(rq))
            + jnp.sum(jnp.abs(rv)))
    return cost + barrier, viol


def evaluate_terminal(model, costs, constraints, options, t, q, v, slack,
                      ctx=None):
    """Value-only terminal evaluation (cost + barrier, violation)."""
    nv = model.nv
    dtype = q.dtype
    cost = jnp.zeros((), dtype)
    for c in costs:
        cost = cost + c.terminal(ctx, t, q, v).value
    barrier = jnp.zeros((), dtype)
    viol = jnp.zeros((), dtype)
    zf = jnp.zeros((0,), dtype)
    za = jnp.zeros((nv,), dtype)
    zu = jnp.zeros((model.nu,), dtype)
    for comp in constraints:
        if not comp.is_terminal():
            continue
        g, _ = comp.evaluate(ctx, q, v, za, zf, zu, zf)
        s_ = slack[comp.name]
        barrier = barrier + pdipm.barrier_value(s_, options.barrier)
        viol = viol + jnp.sum(jnp.maximum(g, 0.0))  # see contact variant
    return cost + barrier, viol


def terminal_quad(model, costs, constraints, options, t, q, v, slack, dual,
                  ctx=None):
    """Terminal-stage quadratic model (reference: ocp/terminal_ocp.hpp),
    including terminal-applicable inequality components."""
    nv = model.nv
    dtype = q.dtype
    blocks = [c.terminal(ctx, t, q, v) for c in costs]
    offs = {"q": 0, "v": nv}
    nn = 2 * nv
    val, l, H = _accumulate_named(blocks, offs, nn, dtype)
    lraw = l
    barrier = jnp.zeros((), dtype)
    g_all, Jz_all = {}, {}
    zf = jnp.zeros((0,), dtype)
    za = jnp.zeros((nv,), dtype)
    zu = jnp.zeros((model.nu,), dtype)
    for comp in constraints:
        if not comp.is_terminal():
            continue
        g, Jblocks = comp.evaluate(ctx, q, v, za, zf, zu, zf)
        Jn_ = jnp.zeros((comp.dim, nn), dtype)
        for name, Jb in Jblocks.items():
            if name not in offs:
                continue
            o = offs[name]
            Jn_ = Jn_.at[:, o:o + Jb.shape[1]].add(Jb)
        s_, d_ = slack[comp.name], dual[comp.name]
        sigma, rhs = pdipm.condense_terms(g, s_, d_, options.barrier)
        H = H + Jn_.T @ (sigma[:, None] * Jn_)
        l = l + Jn_.T @ rhs
        barrier = barrier + pdipm.barrier_value(s_, options.barrier)
        g_all[comp.name] = g
        Jz_all[comp.name] = Jn_
    return val, l, 0.5 * (H + H.T), barrier, g_all, Jz_all, lraw
