"""World-frame spatial dynamics with ANALYTICAL derivatives, dense form.

TPU-native replacement for the jacfwd towers that dominated the stage
linearization (VERDICT r3 missing #2 / next-item 1b; reference:
Pinocchio's computeRNEADerivatives / getFrameAccelerationDerivatives used
by idocp `robot/robot.hpp`). Design:

  * All spatial quantities live in the WORLD frame, referenced at the
    world origin, angular-first: motion m = [omega, v_origin], force
    f = [torque_about_origin, force]. In this frame the kinematic-tree
    recursions collapse to DENSE MASKED CONTRACTIONS with static
    ancestor/descendant 0-1 matrices:
        V_i   = sum_j anc[i,j] * S_j qdot_j
        F_i   = sum_k desc[i,k] * f^B_k
        M     = S^T I^composite S  (masked)
    i.e. einsums over (nv, 6)/(nb, 6) arrays — no per-body scatter, no
    level loop except the shallow FK pose pass. The XLA graph is O(1) in
    the tree depth and every contraction batches over scenarios x stages
    onto the MXU.

  * Derivatives are exact closed forms from the world-frame identities
        dS_m/dq_l   = crossS[l,m] * (S_l x S_m)
        dV_i/dq_j   = anc[i,j] * S_j x (V_i - B_j)
        dV_i/dqd_j  = anc[i,j] * S_j
        dI_i/dq_j   = anc[i,j] * (S_j x* I_i  -  I_i S_j x)
    (x = spatial motion cross, x* = force cross; B_j = V of joint j's
    body for 1-dof joints, 0 for free-base columns). With nv <= ~20 the
    full sensitivity tensors (nv, nb, 6) are materialized densely — the
    O(n^2) the reference's recursive algorithms avoid is ~2k floats here
    and vastly cheaper than pushing 2*nv autodiff tangents through the
    recursion (the round-1..3 implementation).

Every function is validated against the autodiff path in
tests/test_spatial.py (two-algorithm cross-check, SURVEY.md §4).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import lie
from .kinematics import body_poses_stacked
from .model import FREE, PRISMATIC, REVOLUTE, RobotModel


# ---------------------------------------------------------------------------
# broadcast-safe spatial algebra
# ---------------------------------------------------------------------------

def cross_m(m1, m2):
    """Spatial motion cross product m1 x m2, broadcasting leading dims."""
    w1, v1 = m1[..., :3], m1[..., 3:]
    w2, v2 = m2[..., :3], m2[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w1, w2), jnp.cross(w1, v2) + jnp.cross(v1, w2)], axis=-1)


def cross_f(m, f):
    """Spatial force cross product m x* f, broadcasting leading dims."""
    w, v = m[..., :3], m[..., 3:]
    n, fo = f[..., :3], f[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w, n) + jnp.cross(v, fo), jnp.cross(w, fo)], axis=-1)


def _mv3(A, x):
    """(...,3,3) @ (...,3) elementwise (no dot_general: XLA miscompiles
    batched tiny dots with 3+ batch dims — see lie.mm3). All contractions
    in this module use broadcast-multiply + sum for the same reason; at
    nb<=20/nv<=20 sizes the VPU path is as fast as a degenerate MXU dot
    and fuses into the surrounding elementwise graph."""
    return jnp.sum(A * x[..., None, :], axis=-1)


def _contract(mask, X):
    """sum_j mask[i, j] * X[..., j, :] -> [..., i, :] without dot_general.

    mask: (ni, nj) static 0-1 matrix; X: (..., nj, c). The broadcasted
    intermediate is (..., ni, nj, c) — tiny for robot-sized nj."""
    return jnp.sum(mask[:, :, None] * X[..., None, :, :], axis=-2)


def apply_inertia(mass, c, Ic, m):
    """h = I m for inertia (mass, com position c, rotational inertia Ic
    about the com) and motion m, ALL in the same (world) frame referenced
    at the origin. Broadcasts leading dims of m against (nb,)-shaped
    inertia data."""
    w, v = m[..., :3], m[..., 3:]
    p = mass[..., None] * (v + jnp.cross(w, c))
    L = _mv3(Ic, w) + jnp.cross(c, p)
    return jnp.concatenate([L, p], axis=-1)


# ---------------------------------------------------------------------------
# static topology masks (numpy, cached per model topology)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class Topology:
    dof_body: np.ndarray      # (nv,) body owning each dof
    base_dof: np.ndarray      # (nv,) bool: dof belongs to a FREE joint
    anc_bd: np.ndarray        # (nb, nv) dof j on path world->body i
    desc_bb: np.ndarray       # (nb, nb) [i,k]=1 iff i is ancestor-or-self of k
    crossS: np.ndarray        # (nv, nv) [l,m]=1 iff dS_m/dq_l = S_l x S_m
    samebody_dd: np.ndarray   # (nv, nv) dofs on the same body
    path_dd: np.ndarray       # (nv, nv) [i,j]=1 iff dof i on path to body(j)
    parent: np.ndarray        # (nb,)


def _topo_key(model: RobotModel):
    return (model.parent, model.joint_types, model.v_offset)


@functools.lru_cache(maxsize=32)
def _topology_cached(parent, joint_types, v_offset) -> Topology:
    nb = len(parent)
    nv = v_offset[-1] + (6 if joint_types[-1] == FREE else 1)
    dof_body = np.zeros(nv, np.int32)
    base_dof = np.zeros(nv, bool)
    for i, jt in enumerate(joint_types):
        nd = 6 if jt == FREE else 1
        dof_body[v_offset[i]:v_offset[i] + nd] = i
        if jt == FREE:
            base_dof[v_offset[i]:v_offset[i] + nd] = True

    # ancestor (body x body): anc_bb[i, k] = k is ancestor-or-self of i
    anc_bb = np.zeros((nb, nb), bool)
    for i in range(nb):
        k = i
        while k >= 0:
            anc_bb[i, k] = True
            k = parent[k]
    anc_bd = anc_bb[:, dof_body]          # (nb, nv)
    desc_bb = anc_bb.T.astype(np.float64)  # [i,k]=1 iff i anc-or-self of k

    body_d = dof_body
    strict_anc_dd = np.zeros((nv, nv), bool)
    samebody_dd = np.zeros((nv, nv), bool)
    for l in range(nv):
        for m in range(nv):
            bl, bm = body_d[l], body_d[m]
            if bl == bm:
                samebody_dd[l, m] = True
            elif anc_bb[bm, bl]:
                strict_anc_dd[l, m] = True
    # dS_m/dq_l = S_l x S_m when l's body is a strict ancestor of m's, or
    # when both belong to the same FREE joint (the base columns rotate
    # with the base; a 1-dof joint's own axis is invariant to its motion).
    crossS = strict_anc_dd | (samebody_dd & base_dof[:, None]
                              & base_dof[None, :])
    path_dd = anc_bd[dof_body].T          # [i, j] = dof i on path to body(j)
    return Topology(
        dof_body=dof_body, base_dof=base_dof,
        anc_bd=anc_bd.astype(np.float64),
        desc_bb=desc_bb,
        crossS=crossS.astype(np.float64),
        samebody_dd=samebody_dd.astype(np.float64),
        path_dd=path_dd.astype(np.float64),
        parent=np.asarray(parent, np.int32))


def topology(model: RobotModel) -> Topology:
    return _topology_cached(*_topo_key(model))


# ---------------------------------------------------------------------------
# FK bundle: poses, world motion subspaces, world inertias
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class FK:
    """Configuration-dependent world-frame quantities shared by all the
    dynamics/derivative computations at one q."""
    Rw: jnp.ndarray     # (nb, 3, 3)
    pw: jnp.ndarray     # (nb, 3)
    S: jnp.ndarray      # (nv, 6) world motion subspace columns
    c_w: jnp.ndarray    # (nb, 3) world com positions
    Ic_w: jnp.ndarray   # (nb, 3, 3) world rotational inertia about com


jax.tree_util.register_dataclass(
    FK, data_fields=["Rw", "pw", "S", "c_w", "Ic_w"], meta_fields=[])


@functools.lru_cache(maxsize=32)
def _s_perm_cached(joint_types, v_offset):
    """Static dof permutation: [free dofs..., one_dof dofs...] -> v order."""
    order = []
    for i, jt in enumerate(joint_types):
        if jt == FREE:
            order.extend(range(v_offset[i], v_offset[i] + 6))
    for i, jt in enumerate(joint_types):
        if jt != FREE:
            order.append(v_offset[i])
    return np.argsort(np.asarray(order, np.int32)).astype(np.int32)


def fk(model: RobotModel, q) -> FK:
    """One FK pass -> the world-frame bundle. The pose pass is the only
    level-recursive computation left on the hot path; the subspace
    assembly is scatter-free (concat + one static-permutation gather —
    scatter kernels dominated the round-4 profile, see kinematics._fk_meta).
    """
    dtype = q.dtype
    Rw, pw = body_poses_stacked(model, q)

    S_parts = []
    for i in range(model.nbodies):
        if model.joint_types[i] == FREE:
            R, p = Rw[i], pw[i]
            # Ad_X = [[R, 0], [hat(p) R, R]] columns: world twist of the
            # local unit twists (matches integrate's local-frame tangent)
            hpR = lie.mm3(lie.hat(p), R)
            top = jnp.concatenate([R, jnp.zeros((3, 3), dtype)], axis=1)
            bot = jnp.concatenate([hpR, R], axis=1)
            Ad = jnp.concatenate([top, bot], axis=0)      # (6, 6)
            S_parts.append(Ad.T)                           # rows = columns
    one_dof = np.asarray([i for i in range(model.nbodies)
                          if model.joint_types[i] != FREE], np.int32)
    if one_dof.size:
        rev = np.asarray([model.joint_types[i] == REVOLUTE
                          for i in one_dof])
        ax_w = lie.mv3(Rw[one_dof], model.joint_axis[one_dof])  # (n1, 3)
        o_w = pw[one_dof]
        lin_rev = jnp.cross(o_w, ax_w)
        zero3 = jnp.zeros_like(ax_w)
        rev_j = jnp.asarray(rev)
        ang = jnp.where(rev_j[:, None], ax_w, zero3)
        lin = jnp.where(rev_j[:, None], lin_rev, ax_w)
        S_parts.append(jnp.concatenate([ang, lin], axis=-1))
    perm = _s_perm_cached(model.joint_types, model.v_offset)
    S = jnp.concatenate(S_parts, axis=0)[perm]

    c_w = pw + lie.mv3(Rw, model.com)
    Ic_w = lie.mm3(lie.mm3(Rw, model.inertia), jnp.swapaxes(Rw, -1, -2))
    return FK(Rw=Rw, pw=pw, S=S, c_w=c_w, Ic_w=Ic_w)


def frame_points(model: RobotModel, f: FK, frame_ids):
    """World positions of frame origins, (nc, 3)."""
    fb = np.asarray([model.frame_body[i] for i in frame_ids], np.int32)
    fp = model.frame_pos[np.asarray(frame_ids, np.int32)]
    return f.pw[fb] + lie.mv3(f.Rw[fb], fp), fb


def point_jacobians(model: RobotModel, f: FK, p_f, fb):
    """(nc, 3, nv) world linear-velocity Jacobians of the points p_f on
    bodies fb — the analytic replacement for jacfwd-through-FK
    (reference: Robot::frameJacobian via pinocchio::getFrameJacobian)."""
    topo = topology(model)
    mask = jnp.asarray(topo.anc_bd[fb], p_f.dtype)        # (nc, nv)
    S_ang, S_lin = f.S[:, :3], f.S[:, 3:]
    # column j at point p: S_lin_j + S_ang_j x p
    cols = S_lin[None, :, :] + jnp.cross(
        S_ang[None, :, :], p_f[:, None, :])               # (nc, nv, 3)
    return jnp.swapaxes(cols * mask[:, :, None], 1, 2)     # (nc, 3, nv)


def mass_matrix(model: RobotModel, f: FK):
    """Joint-space mass matrix via world-frame CRBA, fully dense:
    M[i,j] = S_i^T I^c_{body(j)} S_j masked to tree paths (reference:
    Robot::crba). No per-edge transforms — world-frame composite inertias
    are plain subtree sums."""
    topo = topology(model)
    dtype = f.S.dtype
    ch = lie.hat(f.c_w)
    mch = model.mass[:, None, None] * ch
    eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), ch.shape)
    I6 = jnp.concatenate([
        jnp.concatenate([f.Ic_w - lie.mm3(mch, ch), mch], axis=-1),
        jnp.concatenate([-mch, model.mass[:, None, None] * eye], axis=-1),
    ], axis=-2)                                            # (nb, 6, 6)
    desc = jnp.asarray(topo.desc_bb, dtype)
    nb = I6.shape[0]
    Icomp = _contract(desc, I6.reshape(nb, 36)).reshape(nb, 6, 6)
    F = jnp.sum(Icomp[topo.dof_body] * f.S[:, None, :], axis=-1)  # (nv, 6)
    A = jnp.sum(f.S[:, None, :] * F[None, :, :], axis=-1)  # (nv, nv) raw
    path = jnp.asarray(topo.path_dd, dtype)                # mask i on path j
    same = jnp.asarray(topo.samebody_dd, dtype)
    Am = A * path
    M = Am + Am.T - Am * same
    return 0.5 * (M + M.T)


# ---------------------------------------------------------------------------
# velocities / accelerations / RNEA and their analytic derivatives
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class Motion:
    """Velocity/acceleration state and (optionally) its sensitivities.
    A includes the gravity-trick base acceleration a0 (right for RNEA);
    point_pva removes it again for true kinematic accelerations."""
    V: jnp.ndarray       # (nb, 6) world body spatial velocities
    A: jnp.ndarray       # (nb, 6) world body spatial accelerations
    a0: jnp.ndarray      # (6,) gravity-trick offset included in A
    dVq: jnp.ndarray     # (nv, nb, 6) dV_i/dq_j   (or ())
    dVv: jnp.ndarray     # (nv, nb, 6) dV_i/dqdot_j
    dAq: jnp.ndarray     # (nv, nb, 6)
    dAv: jnp.ndarray     # (nv, nb, 6)


jax.tree_util.register_dataclass(
    Motion, data_fields=["V", "A", "a0", "dVq", "dVv", "dAq", "dAv"],
    meta_fields=[])


def motion(model: RobotModel, f: FK, v, a, derivatives: bool = True,
           no_gravity: bool = False,
           acc_derivatives: bool = True) -> Motion:
    """Forward velocity/acceleration pass + closed-form sensitivities.

    Gravity trick: the root's spatial acceleration gets a0 = [0, -g]
    (uniform field == accelerating reference), exactly as the recursion-
    based rnea() does.
    """
    topo = topology(model)
    dtype = v.dtype
    S = f.S
    anc = jnp.asarray(topo.anc_bd, dtype)                  # (nb, nv)
    c_v = S * v[:, None]                                   # (nv, 6)
    V = _contract(anc, c_v)                                # (nb, 6)
    Vdof = V[topo.dof_body]                                # (nv, 6)
    c_a = S * a[:, None] + cross_m(Vdof, S) * v[:, None]
    g_vec = jnp.zeros(3, dtype) if no_gravity else -model.gravity
    a0 = jnp.concatenate([jnp.zeros(3, dtype), g_vec])
    A = _contract(anc, c_a) + a0[None]

    if not derivatives:
        z = jnp.zeros((0,), dtype)
        return Motion(V=V, A=A, a0=a0, dVq=z, dVv=z, dAq=z, dAv=z)

    base = jnp.asarray(topo.base_dof, bool)
    # B_j: V of joint j's own body for 1-dof joints, 0 for base columns
    Bv = jnp.where(base[:, None], 0.0, Vdof)               # (nv, 6)
    # Bp_j: V of the PARENT body of joint j's body (0 at world/base)
    par_of_dof = topo.parent[topo.dof_body]                # (nv,)
    Vpar = jnp.where((par_of_dof >= 0)[:, None],
                     V[np.maximum(par_of_dof, 0)], 0.0)    # (nv, 6)

    dVq = anc.T[:, :, None] * cross_m(S[:, None, :],
                                      V[None, :, :] - Bv[:, None, :])
    dVv = anc.T[:, :, None] * S[:, None, :]                # (nv, nb, 6)

    if not acc_derivatives:  # velocity sensitivities only (impulse sweep)
        z = jnp.zeros((0,), dtype)
        return Motion(V=V, A=A, a0=a0, dVq=dVq, dVv=dVv, dAq=z, dAv=z)

    # dA/dqdot: anc[i,j] * (V_{b(j)} x S_j + S_j x (V_i - V_{parent(b(j))}))
    t1 = cross_m(Vdof, S)                                  # (nv, 6)
    dAv = anc.T[:, :, None] * (
        t1[:, None, :]
        + cross_m(S[:, None, :], V[None, :, :] - Vpar[:, None, :]))

    # dA/dq via per-dof generator g[j,k] summed over ancestors of i
    crossS = jnp.asarray(topo.crossS, dtype)               # (nv, nv)
    dS = crossS[:, :, None] * cross_m(S[:, None, :], S[None, :, :])
    dVq_dof = dVq[:, topo.dof_body, :]                     # (nv, nv, 6)
    g = (dS * a[None, :, None]
         + cross_m(dVq_dof, S[None, :, :]) * v[None, :, None]
         + cross_m(Vdof[None, :, :], dS) * v[None, :, None])
    dAq = _contract(anc, g)                                # (nv, nb, 6)
    return Motion(V=V, A=A, a0=a0, dVq=dVq, dVv=dVv, dAq=dAq, dAv=dAv)


def rnea(model: RobotModel, f: FK, mo: Motion, f_ext_b=None):
    """tau = S^T F with F the subtree force sums (dense masked einsums).

    f_ext_b: optional (nb, 6) world-frame external spatial forces ALREADY
    accumulated per body (subtracted, reference sign convention).
    Returns (tau (nv,), fB (nb, 6), F (nb, 6)).
    """
    topo = topology(model)
    dtype = mo.V.dtype
    P = apply_inertia(model.mass, f.c_w, f.Ic_w, mo.V)
    fB = apply_inertia(model.mass, f.c_w, f.Ic_w, mo.A) + cross_f(mo.V, P)
    if f_ext_b is not None:
        fB = fB - f_ext_b
    desc = jnp.asarray(topo.desc_bb, dtype)
    F = _contract(desc, fB)                                # (nb, 6)
    tau = jnp.sum(f.S * F[topo.dof_body], axis=-1)
    return tau, fB, F


def rnea_derivatives(model: RobotModel, f: FK, mo: Motion, F,
                     dfext_q=None):
    """(dtau/dq, dtau/dv) tangent-space Jacobians, fully analytic.

    F: subtree force sums from rnea(). dfext_q: optional (nv, nb, 6)
    q-sensitivity of the per-body external forces (subtracted like fB).
    Reference: pinocchio computeRNEADerivatives (Carpentier-Mansard 2018);
    here in dense world-frame form (module docstring).
    """
    topo = topology(model)
    dtype = mo.V.dtype
    S = f.S
    mass, c_w, Ic_w = model.mass, f.c_w, f.Ic_w
    P = apply_inertia(mass, c_w, Ic_w, mo.V)               # (nb, 6)
    IA = apply_inertia(mass, c_w, Ic_w, mo.A)
    anc_t = jnp.asarray(topo.anc_bd, dtype).T[:, :, None]  # (nv, nb, 1)

    # dI_j acting on A_i and V_i: anc * (S_j x* (I m) - I (S_j x m))
    SxA = cross_m(S[:, None, :], mo.A[None, :, :])         # (nv, nb, 6)
    SxV = cross_m(S[:, None, :], mo.V[None, :, :])
    dI_A = anc_t * (cross_f(S[:, None, :], IA[None, :, :])
                    - apply_inertia(mass, c_w, Ic_w, SxA))
    dI_V = anc_t * (cross_f(S[:, None, :], P[None, :, :])
                    - apply_inertia(mass, c_w, Ic_w, SxV))

    dfq = (dI_A + apply_inertia(mass, c_w, Ic_w, mo.dAq)
           + cross_f(mo.dVq, P[None, :, :])
           + cross_f(mo.V[None, :, :],
                     dI_V + apply_inertia(mass, c_w, Ic_w, mo.dVq)))
    if dfext_q is not None:
        dfq = dfq - dfext_q
    dfv = (apply_inertia(mass, c_w, Ic_w, mo.dAv)
           + cross_f(mo.dVv, P[None, :, :])
           + cross_f(mo.V[None, :, :],
                     apply_inertia(mass, c_w, Ic_w, mo.dVv)))

    desc = jnp.asarray(topo.desc_bb, dtype)
    dFq = _contract(desc, dfq)                             # (nv, nb, 6)
    dFv = _contract(desc, dfv)

    crossS = jnp.asarray(topo.crossS, dtype)
    dS = crossS[:, :, None] * cross_m(S[:, None, :], S[None, :, :])
    Fdof = F[topo.dof_body]                                # (nv, 6)
    # rows m (tau component), cols j (input dof)
    dtau_q = (jnp.sum(dS * Fdof[None, :, :], axis=-1).T
              + jnp.sum(S[None, :, :] * dFq[:, topo.dof_body, :],
                        axis=-1).T)
    dtau_v = jnp.sum(S[None, :, :] * dFv[:, topo.dof_body, :], axis=-1).T
    return dtau_q, dtau_v


@functools.lru_cache(maxsize=64)
def _scatter_matrix(fb_tuple, nb):
    """(nb, nc) static 0-1 matrix accumulating per-contact values onto
    bodies — a fusable contraction instead of a scatter kernel."""
    Sc = np.zeros((nb, len(fb_tuple)))
    for c, b in enumerate(fb_tuple):
        Sc[b, c] = 1.0
    return Sc


def contact_forces_to_body(model: RobotModel, p_f, fb, f_world, nb):
    """World point forces at p_f on bodies fb -> per-body spatial forces
    (nb, 6), torque about the world origin. Scatter-free (static
    body-accumulation matrix)."""
    g = jnp.concatenate([jnp.cross(p_f, f_world), f_world], axis=-1)
    Sc = jnp.asarray(_scatter_matrix(tuple(int(b) for b in fb), nb),
                     f_world.dtype)
    return _contract(Sc, g)


def contact_forces_dq(model: RobotModel, J, fb, f_world, nb):
    """q-sensitivity (nv, nb, 6) of contact_forces_to_body: only the
    torque arm p_f(q) moves; dp_f/dq_j = J columns."""
    # (nc, 3, nv) -> (nv, nc, 3)
    Jt = jnp.transpose(J, (2, 0, 1))
    dn = jnp.cross(Jt, f_world[None, :, :])                # (nv, nc, 3)
    dg = jnp.concatenate([dn, jnp.zeros_like(dn)], axis=-1)
    Sc = jnp.asarray(_scatter_matrix(tuple(int(b) for b in fb), nb),
                     f_world.dtype)
    return _contract(Sc, dg)                               # (nv, nb, 6)


# ---------------------------------------------------------------------------
# frame point kinematics (position/velocity/classical acceleration) + derivs
# ---------------------------------------------------------------------------

def point_pva(f: FK, mo: Motion, p_f, fb):
    """(pos, vel, classical acc) of the points p_f on bodies fb.
    vel = v_o + w x p;  acc = a_o + alpha x p + w x vel. The gravity-trick
    offset a0 baked into mo.A is removed — this is the TRUE kinematic
    acceleration (what the Baumgarte constraint uses)."""
    Vb, Ab = mo.V[fb], mo.A[fb] - mo.a0[None]
    w, vo = Vb[:, :3], Vb[:, 3:]
    al, ao = Ab[:, :3], Ab[:, 3:]
    vel = vo + jnp.cross(w, p_f)
    acc = ao + jnp.cross(al, p_f) + jnp.cross(w, vel)
    return p_f, vel, acc


def point_pva_derivatives(f: FK, mo: Motion, p_f, fb, J, acc: bool = True):
    """Tangent-space Jacobians of point velocity/acceleration:
    (dvel_q, dvel_v, dacc_q, dacc_v), each (nc, 3, nv). J = dpos/dq.
    acc=False skips the acceleration rows (returns None for them) and
    needs no dAq/dAv in mo."""
    Vb = mo.V[fb]
    w, vo = Vb[:, :3], Vb[:, 3:]
    vel = vo + jnp.cross(w, p_f)

    # sensitivities gathered at the contact bodies: (nv, nc, 6)
    dVq, dVv = mo.dVq[:, fb, :], mo.dVv[:, fb, :]
    Jt = jnp.transpose(J, (2, 0, 1))                       # (nv, nc, 3)

    dvel_q = (dVq[..., 3:] + jnp.cross(dVq[..., :3], p_f[None])
              + jnp.cross(w[None], Jt))
    dvel_v = dVv[..., 3:] + jnp.cross(dVv[..., :3], p_f[None])
    to_j = lambda T: jnp.transpose(T, (1, 2, 0))           # (nc, 3, nv)
    if not acc:
        return to_j(dvel_q), to_j(dvel_v), None, None

    al = mo.A[fb][:, :3]
    dAq, dAv = mo.dAq[:, fb, :], mo.dAv[:, fb, :]
    dacc_q = (dAq[..., 3:] + jnp.cross(dAq[..., :3], p_f[None])
              + jnp.cross(al[None], Jt)
              + jnp.cross(dVq[..., :3], vel[None])
              + jnp.cross(w[None], dvel_q))
    dacc_v = (dAv[..., 3:] + jnp.cross(dAv[..., :3], p_f[None])
              + jnp.cross(dVv[..., :3], vel[None])
              + jnp.cross(w[None], dvel_v))
    return to_j(dvel_q), to_j(dvel_v), to_j(dacc_q), to_j(dacc_v)
