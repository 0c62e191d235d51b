"""Rigid-body dynamics: RNEA, CRBA, derivatives, impulse quantities.

TPU-native replacement for the reference's Pinocchio dynamics calls
(idocp `robot/robot.hpp`: RNEA, RNEADerivatives, RNEAImpulse, crba,
dRNEAPartialdFext; SURVEY.md L1). Spatial 6-vectors are angular-first
[omega, v]; wrenches are [torque, force] (DESIGN.md).

The hot-path RNEA is unrolled over tree DEPTH (level-batched gathers /
scatter-adds, see kinematics.py's graph-size note): ANYmal's four legs
advance in lockstep per level instead of 13 sequential body steps, which
keeps the XLA graph — and with it the jitted solver's compile time —
small, while vmap supplies batching over scenarios/stages. The original
body-unrolled implementation is kept as `rnea_unrolled` (test oracle).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import lie
from .kinematics import (body_poses, body_poses_stacked, frame_positions,
                         local_transforms, local_transforms_stacked,
                         tree_levels)
from .model import FREE, PRISMATIC, REVOLUTE, RobotModel, integrate


def _motion_subspace(jt: int, axis, dtype):
    """S (6 x ndof) in the child body frame."""
    if jt == FREE:
        return jnp.eye(6, dtype=dtype)
    if jt == REVOLUTE:
        return jnp.concatenate([axis, jnp.zeros_like(axis)])[:, None]
    if jt == PRISMATIC:
        return jnp.concatenate([jnp.zeros_like(axis), axis])[:, None]
    raise ValueError(jt)


def _ad_inv_motion(R, p, m):
    """Motion vector from parent coords to child coords, child pose (R, p):
    [R^T w, R^T (v - p x w)]."""
    w, v = m[:3], m[3:]
    return jnp.concatenate([R.T @ w, R.T @ (v - jnp.cross(p, w))])


def _ad_force(R, p, f):
    """Wrench from child coords to parent coords: [R n + p x (R f), R f]."""
    n, fo = f[:3], f[3:]
    Rf = R @ fo
    return jnp.concatenate([R @ n + jnp.cross(p, Rf), Rf])


def _cross_motion(m1, m2):
    w1, v1 = m1[:3], m1[3:]
    w2, v2 = m2[:3], m2[3:]
    return jnp.concatenate([jnp.cross(w1, w2), jnp.cross(w1, v2) + jnp.cross(v1, w2)])


def _cross_force(m, f):
    w, v = m[:3], m[3:]
    n, fo = f[:3], f[3:]
    return jnp.concatenate([jnp.cross(w, n) + jnp.cross(v, fo), jnp.cross(w, fo)])


def _apply_inertia(mass, c, Ic, m):
    """Spatial momentum h = I6 @ m for inertia (mass, com c, rot inertia Ic
    about com), all in the body frame."""
    w, v = m[:3], m[3:]
    p_lin = mass * (v + jnp.cross(w, c))
    L = Ic @ w + jnp.cross(c, p_lin)
    return jnp.concatenate([L, p_lin])


def _spatial_inertia_matrix(mass, c, Ic, dtype):
    """Dense 6x6 spatial inertia [[Ic - m c^ c^, m c^], [-m c^, m I]]."""
    ch = lie.hat(c)
    top = jnp.concatenate([Ic - mass * ch @ ch, mass * ch], axis=1)
    bot = jnp.concatenate([-mass * ch, mass * jnp.eye(3, dtype=dtype)], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def _ad_motion_matrix(R, p):
    """6x6 motion transform child->parent: [[R, 0], [p^ R, R]]."""
    Z = jnp.zeros_like(R)
    return jnp.concatenate(
        [jnp.concatenate([R, Z], axis=1),
         jnp.concatenate([lie.hat(p) @ R, R], axis=1)], axis=0)


def _ad_force_matrix(R, p):
    """6x6 force transform child->parent: [[R, p^ R], [0, R]]."""
    Z = jnp.zeros_like(R)
    return jnp.concatenate(
        [jnp.concatenate([R, lie.hat(p) @ R], axis=1),
         jnp.concatenate([Z, R], axis=1)], axis=0)


def _ad_motion_matrix_inv(R, p):
    """Analytic inverse of the motion transform for pose (R, p):
    Ad(X)^-1 = Ad(X^-1) with X^-1 = (R^T, -R^T p) — no linear solve."""
    Rt = R.T
    Z = jnp.zeros_like(R)
    return jnp.concatenate(
        [jnp.concatenate([Rt, Z], axis=1),
         jnp.concatenate([lie.hat(-Rt @ p) @ Rt, Rt], axis=1)], axis=0)


# ---------------------------------------------------------------------------
# Batched (per-level) spatial algebra helpers: leading axis = bodies-in-level
# ---------------------------------------------------------------------------

def _ad_inv_motion_b(R, p, m):
    """Motion vectors parent->child coords, batched: (n,3,3),(n,3),(n,6)."""
    w, v = m[..., :3], m[..., 3:]
    wi = lie.mtv3(R, w)
    vi = lie.mtv3(R, v - jnp.cross(p, w))
    return jnp.concatenate([wi, vi], axis=-1)


def _ad_force_b(R, p, f):
    """Wrenches child->parent coords, batched."""
    n_, fo = f[..., :3], f[..., 3:]
    Rf = lie.mv3(R, fo)
    Rn = lie.mv3(R, n_)
    return jnp.concatenate([Rn + jnp.cross(p, Rf), Rf], axis=-1)


def _cross_motion_b(m1, m2):
    w1, v1 = m1[..., :3], m1[..., 3:]
    w2, v2 = m2[..., :3], m2[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w1, w2), jnp.cross(w1, v2) + jnp.cross(v1, w2)], axis=-1)


def _cross_force_b(m, f):
    w, v = m[..., :3], m[..., 3:]
    n_, fo = f[..., :3], f[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w, n_) + jnp.cross(v, fo), jnp.cross(w, fo)], axis=-1)


def _apply_inertia_b(mass, c, Ic, m):
    """Spatial momenta h = I6 @ m, batched over bodies: mass (n,), c (n,3),
    Ic (n,3,3), m (n,6)."""
    w, v = m[..., :3], m[..., 3:]
    p_lin = mass[:, None] * (v + jnp.cross(w, c))
    L = lie.mv3(Ic, w) + jnp.cross(c, p_lin)
    return jnp.concatenate([L, p_lin], axis=-1)


# ---------------------------------------------------------------------------
# RNEA (level-batched hot path)
# ---------------------------------------------------------------------------

def _level_meta(model: RobotModel, idx):
    """Static per-level gather arrays (numpy) + the stacked 1-dof motion
    subspaces for the bodies in `idx`."""
    par = np.asarray([model.parent[i] for i in idx], dtype=np.int32)
    vo = np.asarray([model.v_offset[i] for i in idx], dtype=np.int32)
    from .kinematics import _axis_s6
    s6 = _axis_s6(model, idx)
    return par, vo, s6


def rnea(model: RobotModel, q, v, a, contact_frames=(), f_world=None,
         no_gravity: bool = False):
    """Inverse dynamics tau = ID(q, v, a) - sum_i J_i^T f_i.

    Returns the full (nv,) generalized force; for a floating base the first
    6 rows are the passive base wrench (zero along any physical motion).
    External point forces `f_world[i]` (world coords, (nc, 3)) act at
    `contact_frames[i]` (static frame ids), applied directly in the backward
    pass (no Jacobian materialization). Level-batched: O(depth) graph.

    no_gravity (static): drop the gravity bias — RNEA(q,v,a) − RNEA(q,0,0)
    when v = 0 collapses to one pass (M a − Jᵀ f), used by the impulse
    implicit-derivative sweep.
    """
    dtype = q.dtype
    nb = model.nbodies
    Rl, pl = local_transforms_stacked(model, q)
    levels = tree_levels(model)
    g_vec = jnp.zeros(3, dtype=dtype) if no_gravity else -model.gravity
    a0 = jnp.concatenate([jnp.zeros(3, dtype=dtype), g_vec])

    V = jnp.zeros((nb, 6), dtype)
    A = jnp.zeros((nb, 6), dtype)

    # roots: vp = 0, ap = a0 (gravity trick)
    for i in levels[0]:
        jt = model.joint_types[i]
        vo = model.v_offset[i]
        nd = 6 if jt == FREE else 1
        S = _motion_subspace(jt, model.joint_axis[i], dtype)
        vj = S @ v[vo:vo + nd]
        aj = S @ a[vo:vo + nd]
        acc = _ad_inv_motion(Rl[i], pl[i], a0) + aj + _cross_motion(vj, vj)
        V = V.at[i].set(vj)
        A = A.at[i].set(acc)

    for idx in levels[1:]:
        par, vo, s6 = _level_meta(model, idx)
        vj = s6 * v[vo][:, None]
        aj = s6 * a[vo][:, None]
        Ri, pi = Rl[idx], pl[idx]
        vel = _ad_inv_motion_b(Ri, pi, V[par]) + vj
        acc = (_ad_inv_motion_b(Ri, pi, A[par]) + aj
               + _cross_motion_b(vel, vj))
        V = V.at[idx].set(vel)
        A = A.at[idx].set(acc)

    # body wrenches — fully parallel over bodies
    F = (_apply_inertia_b(model.mass, model.com, model.inertia, A)
         + _cross_force_b(V, _apply_inertia_b(model.mass, model.com,
                                              model.inertia, V)))

    if contact_frames:
        Rw, pw = body_poses_stacked(model, q)
        fb = np.asarray([model.frame_body[f] for f in contact_frames],
                        dtype=np.int32)
        fp = model.frame_pos[np.asarray(contact_frames, dtype=np.int32)]
        Rb, pb = Rw[fb], pw[fb]
        pf = pb + lie.mv3(Rb, fp)
        n_w = jnp.cross(pf - pb, f_world)
        wrench = jnp.concatenate(
            [lie.mtv3(Rb, n_w), lie.mtv3(Rb, f_world)], axis=1)
        F = F.at[fb].add(-wrench)

    # backward pass: deepest level first; scatter-add into parents
    tau = jnp.zeros(model.nv, dtype=dtype)
    for idx in levels[:0:-1]:
        par, vo, s6 = _level_meta(model, idx)
        fi = F[idx]
        tau = tau.at[vo].set(jnp.sum(s6 * fi, axis=1))
        F = F.at[par].add(_ad_force_b(Rl[idx], pl[idx], fi))
    for i in levels[0]:
        jt = model.joint_types[i]
        vo = model.v_offset[i]
        nd = 6 if jt == FREE else 1
        S = _motion_subspace(jt, model.joint_axis[i], dtype)
        tau = tau.at[vo:vo + nd].set(S.T @ F[i])
    return tau


def rnea_unrolled(model: RobotModel, q, v, a, contact_frames=(),
                  f_world=None):
    """Body-unrolled RNEA — independent implementation kept as the test
    oracle for the level-batched `rnea` (two-algorithm cross-check).
    """
    dtype = q.dtype
    nb = model.nbodies
    Rl, pl = local_transforms(model, q)

    # Forward pass: velocities/accelerations in body coords. Gravity trick:
    # the world "acceleration" is -g.
    vel = [None] * nb
    acc = [None] * nb
    S = [None] * nb
    a0 = jnp.concatenate([jnp.zeros(3, dtype=dtype), -model.gravity])
    for i in range(nb):
        jt = model.joint_types[i]
        vo = model.v_offset[i]
        nd = 6 if jt == FREE else 1
        S[i] = _motion_subspace(jt, model.joint_axis[i], dtype)
        vj = S[i] @ v[vo:vo + nd]
        aj = S[i] @ a[vo:vo + nd]
        par = model.parent[i]
        vp = jnp.zeros(6, dtype=dtype) if par < 0 else vel[par]
        ap = a0 if par < 0 else acc[par]
        vel[i] = _ad_inv_motion(Rl[i], pl[i], vp) + vj
        acc[i] = (_ad_inv_motion(Rl[i], pl[i], ap) + aj
                  + _cross_motion(vel[i], vj))

    # Body forces, minus external contact wrenches.
    f = [
        _apply_inertia(model.mass[i], model.com[i], model.inertia[i], acc[i])
        + _cross_force(vel[i],
                       _apply_inertia(model.mass[i], model.com[i],
                                      model.inertia[i], vel[i]))
        for i in range(nb)
    ]
    if contact_frames:
        Rw, pw = body_poses(model, q)
        for k, fid in enumerate(contact_frames):
            b = model.frame_body[fid]
            fw = f_world[k]
            pf = pw[b] + Rw[b] @ model.frame_pos[fid]
            n_w = jnp.cross(pf - pw[b], fw)
            f[b] = f[b] - jnp.concatenate([Rw[b].T @ n_w, Rw[b].T @ fw])

    # Backward pass.
    tau = jnp.zeros(model.nv, dtype=dtype)
    for i in reversed(range(nb)):
        jt = model.joint_types[i]
        vo = model.v_offset[i]
        nd = 6 if jt == FREE else 1
        tau = tau.at[vo:vo + nd].set(S[i].T @ f[i])
        par = model.parent[i]
        if par >= 0:
            f[par] = f[par] + _ad_force(Rl[i], pl[i], f[i])
    return tau


def rnea_derivatives(model: RobotModel, q, v, a, contact_frames=(),
                     f_world=None):
    """(dID/dq, dID/dv, dID/da) with dq the tangent-space derivative.

    Forward-mode autodiff through `rnea` (exact, Pinocchio-convention).
    Reference: Robot::RNEADerivatives. dID/da == the joint-space mass matrix.
    """
    zero = jnp.zeros((model.nv,), dtype=q.dtype)

    def fq(e):
        return rnea(model, integrate(model, q, e), v, a, contact_frames,
                    f_world)

    dq = jax.jacfwd(fq)(zero)
    dv = jax.jacfwd(lambda vv: rnea(model, q, vv, a, contact_frames,
                                    f_world))(v)
    da = jax.jacfwd(lambda aa: rnea(model, q, v, aa, contact_frames,
                                    f_world))(a)
    return dq, dv, da


def mass_matrix(model: RobotModel, q):
    """M(q) = dRNEA/da (exact; RNEA is affine in a)."""
    zero = jnp.zeros((model.nv,), dtype=q.dtype)
    return jax.jacfwd(lambda aa: rnea(model, q, jnp.zeros_like(zero), aa))(zero)


def crba(model: RobotModel, q):
    """Composite-rigid-body mass matrix — independent algorithm used as the
    test oracle for `mass_matrix` (two-algorithm cross-check, SURVEY §4)."""
    dtype = q.dtype
    nb = model.nbodies
    Rl, pl = local_transforms(model, q)
    Ic = [
        _spatial_inertia_matrix(model.mass[i], model.com[i], model.inertia[i],
                                dtype)
        for i in range(nb)
    ]
    for i in reversed(range(nb)):
        par = model.parent[i]
        if par >= 0:
            AdF = _ad_force_matrix(Rl[i], pl[i])
            AdMinv = _ad_motion_matrix_inv(Rl[i], pl[i])
            Ic[par] = Ic[par] + AdF @ Ic[i] @ AdMinv
    M = jnp.zeros((model.nv, model.nv), dtype=dtype)
    for i in range(nb):
        jt = model.joint_types[i]
        nd = 6 if jt == FREE else 1
        vo = model.v_offset[i]
        S = _motion_subspace(jt, model.joint_axis[i], dtype)
        F = Ic[i] @ S
        M = M.at[vo:vo + nd, vo:vo + nd].set(S.T @ F)
        j = i
        while model.parent[j] >= 0:
            F = _ad_force_matrix(Rl[j], pl[j]) @ F
            j = model.parent[j]
            jt_j = model.joint_types[j]
            nd_j = 6 if jt_j == FREE else 1
            vo_j = model.v_offset[j]
            Sj = _motion_subspace(jt_j, model.joint_axis[j], dtype)
            blk = Sj.T @ F
            M = M.at[vo_j:vo_j + nd_j, vo:vo + nd].set(blk)
            M = M.at[vo:vo + nd, vo_j:vo_j + nd_j].set(blk.T)
    return M


def kinetic_energy(model: RobotModel, q, v):
    return 0.5 * v @ mass_matrix(model, q) @ v


def nonlinear_effects(model: RobotModel, q, v):
    """h(q, v) = C(q,v)v + g(q) = RNEA(q, v, 0)."""
    return rnea(model, q, v, jnp.zeros_like(v))


def contact_velocity_jacobian(model: RobotModel, q, frame_ids):
    """Stacked (3*nc, nv) linear-velocity Jacobian of the contact frames
    (the impulse-dynamics J; reference: Robot::computeImpulseVelocityJacobian)."""
    zero = jnp.zeros((model.nv,), dtype=q.dtype)
    J = jax.jacfwd(
        lambda e: frame_positions(model, integrate(model, q, e), frame_ids)
    )(zero)
    return J.reshape(3 * len(frame_ids), model.nv)
