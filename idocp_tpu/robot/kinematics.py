"""Forward kinematics, frame placements/velocities/Jacobians, COM.

TPU-native replacement for the reference's Pinocchio kinematics calls
(idocp `robot/robot.hpp`: updateKinematics, framePosition, frameJacobian;
SURVEY.md L1). All functions are pure and take manifold derivatives via
tangent-space autodiff.

Graph-size discipline (the round-2 compile-time fix): recursions over the
kinematic tree are unrolled over tree DEPTH, not over bodies — each level
processes all its bodies as one batched gather/compute/scatter step
(ANYmal: 4 levels x 4 legs instead of 13 sequential bodies). The XLA
graph is O(depth) while the runtime work stays fully vectorized across
sibling chains; autodiff (jvp/jacfwd) composes through the same compact
graph, which is what keeps the jitted solver's compile time bounded.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import lie
from .model import FREE, PRISMATIC, REVOLUTE, RobotModel, integrate


def joint_transform(jt: int, axis, qi):
    """Child-in-parent-joint-frame pose (R, p) from the joint configuration."""
    if jt == FREE:
        p, quat = qi[..., :3], qi[..., 3:7]
        return lie.quat_to_matrix(quat), p
    if jt == REVOLUTE:
        R = lie.so3_exp(axis * qi)
        return R, jnp.zeros_like(axis)
    if jt == PRISMATIC:
        eye = jnp.broadcast_to(jnp.eye(3, dtype=axis.dtype), axis.shape[:-1] + (3, 3))
        return eye, axis * qi
    raise ValueError(f"unknown joint type {jt}")


# ---------------------------------------------------------------------------
# Static topology metadata (from the model's static tuples; numpy only)
# ---------------------------------------------------------------------------

def tree_levels(model: RobotModel):
    """Bodies grouped by tree depth: a tuple of np index arrays. Level 0
    holds the world-rooted bodies; every body's parent is in a strictly
    shallower level. All non-FREE bodies must be 1-dof (REVOLUTE/PRISMATIC);
    a FREE joint may only appear at the root."""
    depth = []
    for i, p in enumerate(model.parent):
        depth.append(0 if p < 0 else depth[p] + 1)
        if model.joint_types[i] == FREE and p >= 0:
            raise NotImplementedError("FREE joint below the root")
    nlev = max(depth) + 1 if depth else 0
    return tuple(
        np.asarray([i for i in range(model.nbodies) if depth[i] == lv],
                   dtype=np.int32)
        for lv in range(nlev))


def _axis_s6(model: RobotModel, idx):
    """(len(idx), 6) motion-subspace vectors of 1-dof bodies: [axis, 0] for
    revolute, [0, axis] for prismatic."""
    rows = []
    for i in idx:
        ax = model.joint_axis[i]
        z = jnp.zeros_like(ax)
        if model.joint_types[i] == REVOLUTE:
            rows.append(jnp.concatenate([ax, z]))
        elif model.joint_types[i] == PRISMATIC:
            rows.append(jnp.concatenate([z, ax]))
        else:
            raise ValueError("1-dof body expected")
    return jnp.stack(rows)


def _fk_meta(model: RobotModel):
    """Static gather/permutation metadata for the scatter-free FK.

    Scatters (`.at[idx].set`) break XLA fusion and cost a kernel each —
    on the axon platform per-op overhead made FK ~45 ms/5120 instances,
    half the whole linearize phase (round-4 profile). The scatter-free
    formulation computes per-group/per-level blocks, CONCATENATES them in
    traversal order, and applies ONE static-permutation gather at the
    end."""
    nb = model.nbodies
    one_dof = np.asarray([i for i in range(nb)
                          if model.joint_types[i] != FREE], dtype=np.int32)
    free = np.asarray([i for i in range(nb)
                       if model.joint_types[i] == FREE], dtype=np.int32)
    grp_order = np.concatenate([free, one_dof]) if nb else free
    # body index -> position in the [free..., one_dof...] concat
    grp_pos = np.argsort(grp_order)
    levels = tree_levels(model)
    lvl_order = np.concatenate(levels) if levels else np.zeros(0, np.int32)
    lvl_pos_of_body = np.argsort(lvl_order)  # body -> pos in level concat
    # per-level: local-transform rows (grp positions) + parent rows in the
    # running level concat
    lvl_local_rows = tuple(
        np.asarray(grp_pos[idx], np.int32) for idx in levels)
    lvl_parent_rows = tuple(
        np.asarray([lvl_pos_of_body[model.parent[i]] for i in idx],
                   np.int32) for idx in levels[1:])
    return (one_dof, free, np.asarray(grp_pos, np.int32), levels,
            tuple(lvl_local_rows), tuple(lvl_parent_rows),
            np.asarray(lvl_pos_of_body, np.int32))


_FK_META_CACHE = {}


def fk_meta(model: RobotModel):
    key = (model.parent, model.joint_types, model.q_offset)
    if key not in _FK_META_CACHE:
        _FK_META_CACHE[key] = _fk_meta(model)
    return _FK_META_CACHE[key]


def local_transforms_stacked(model: RobotModel, q):
    """Per-body pose relative to its parent body, stacked: (nb,3,3), (nb,3).
    X_pc = X_tree * X_joint. Scatter-free: one concat + one static gather
    (see _fk_meta)."""
    dtype = q.dtype
    one_dof, free, grp_pos, *_ = fk_meta(model)

    R_parts, p_parts = [], []
    for i in free:  # at most one (the root)
        qo = model.q_offset[i]
        Rj, pj = joint_transform(FREE, model.joint_axis[i], q[qo:qo + 7])
        R_parts.append((model.jpl_rot[i] @ Rj)[None])
        p_parts.append((model.jpl_pos[i] + model.jpl_rot[i] @ pj)[None])

    if one_dof.size:
        qo = np.asarray([model.q_offset[i] for i in one_dof])
        rev = jnp.asarray([model.joint_types[i] == REVOLUTE
                           for i in one_dof])
        ax = model.joint_axis[one_dof]
        qi = q[qo]                                      # (n1,)
        Rrev = lie.so3_exp(ax * qi[:, None])            # (n1,3,3)
        eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), Rrev.shape)
        Rj = jnp.where(rev[:, None, None], Rrev, eye)
        pj = jnp.where(rev[:, None], jnp.zeros_like(ax), ax * qi[:, None])
        Rt = model.jpl_rot[one_dof]
        pt = model.jpl_pos[one_dof]
        R_parts.append(lie.mm3(Rt, Rj))
        p_parts.append(pt + lie.mv3(Rt, pj))
    Rl = jnp.concatenate(R_parts, axis=0)[grp_pos]
    pl = jnp.concatenate(p_parts, axis=0)[grp_pos]
    return Rl, pl


def _local_transforms_grouped(model: RobotModel, q):
    """Local transforms in [free..., one_dof...] group order (no final
    permutation — body_poses_stacked regathers per level anyway)."""
    dtype = q.dtype
    one_dof, free, *_ = fk_meta(model)
    R_parts, p_parts = [], []
    for i in free:
        qo = model.q_offset[i]
        Rj, pj = joint_transform(FREE, model.joint_axis[i], q[qo:qo + 7])
        R_parts.append((model.jpl_rot[i] @ Rj)[None])
        p_parts.append((model.jpl_pos[i] + model.jpl_rot[i] @ pj)[None])
    if one_dof.size:
        qo = np.asarray([model.q_offset[i] for i in one_dof])
        rev = jnp.asarray([model.joint_types[i] == REVOLUTE
                           for i in one_dof])
        ax = model.joint_axis[one_dof]
        qi = q[qo]
        Rrev = lie.so3_exp(ax * qi[:, None])
        eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), Rrev.shape)
        Rj = jnp.where(rev[:, None, None], Rrev, eye)
        pj = jnp.where(rev[:, None], jnp.zeros_like(ax), ax * qi[:, None])
        Rt = model.jpl_rot[one_dof]
        pt = model.jpl_pos[one_dof]
        R_parts.append(lie.mm3(Rt, Rj))
        p_parts.append(pt + lie.mv3(Rt, pj))
    return (jnp.concatenate(R_parts, axis=0),
            jnp.concatenate(p_parts, axis=0))


def body_poses_stacked(model: RobotModel, q):
    """World pose of every body, stacked (nb,3,3), (nb,3).

    Scatter-free level recursion: each level's poses are computed from a
    gather of the ALREADY-CONCATENATED earlier levels, appended, and the
    final body-order is restored with one static-permutation gather —
    ~2 ops per level instead of ~6 scatter kernels (see _fk_meta)."""
    (one_dof, free, grp_pos, levels, lvl_local_rows, lvl_parent_rows,
     lvl_pos_of_body) = fk_meta(model)
    Rg, pg = _local_transforms_grouped(model, q)

    Rw_cat = Rg[lvl_local_rows[0]]
    pw_cat = pg[lvl_local_rows[0]]
    for li, idx in enumerate(levels[1:]):
        Rl_i = Rg[lvl_local_rows[li + 1]]
        pl_i = pg[lvl_local_rows[li + 1]]
        par = lvl_parent_rows[li]
        Rp, pp = Rw_cat[par], pw_cat[par]
        Rw_cat = jnp.concatenate([Rw_cat, lie.mm3(Rp, Rl_i)], axis=0)
        pw_cat = jnp.concatenate([pw_cat, pp + lie.mv3(Rp, pl_i)], axis=0)
    return Rw_cat[lvl_pos_of_body], pw_cat[lvl_pos_of_body]


# --- legacy list-returning variants (test oracles: crba, cross-checks) ----

def local_transforms(model: RobotModel, q):
    """Per-body pose relative to its parent body: X_pc = X_tree * X_joint.
    List-returning unrolled variant (oracle/tests; hot path uses
    local_transforms_stacked)."""
    Rs, ps = [], []
    for i, jt in enumerate(model.joint_types):
        qo = model.q_offset[i]
        qi = q[..., qo:qo + (7 if jt == FREE else 1)]
        Rj, pj = joint_transform(jt, model.joint_axis[i], qi)
        Rt, pt = model.jpl_rot[i], model.jpl_pos[i]
        Rs.append(Rt @ Rj)
        ps.append(pt + jnp.einsum("...ij,...j->...i", Rt, pj))
    return Rs, ps


def body_poses(model: RobotModel, q):
    """World pose (R, p) of every body frame. Returns (list, list).
    Unrolled variant (oracle/tests)."""
    Rl, pl = local_transforms(model, q)
    Rw, pw = [], []
    for i in range(model.nbodies):
        par = model.parent[i]
        if par < 0:
            Rw.append(Rl[i])
            pw.append(pl[i])
        else:
            Rw.append(Rw[par] @ Rl[i])
            pw.append(pw[par] + jnp.einsum("...ij,...j->...i", Rw[par], pl[i]))
    return Rw, pw


# ---------------------------------------------------------------------------
# Frame quantities (hot path — all via the stacked level-based FK)
# ---------------------------------------------------------------------------

def frame_pose(model: RobotModel, q, frame_id: int):
    Rw, pw = body_poses_stacked(model, q)
    b = model.frame_body[frame_id]
    R = Rw[b] @ model.frame_rot[frame_id]
    p = pw[b] + Rw[b] @ model.frame_pos[frame_id]
    return R, p


def frame_position(model: RobotModel, q, frame_id: int):
    return frame_pose(model, q, frame_id)[1]


def frame_positions(model: RobotModel, q, frame_ids):
    """Stacked world positions of several frames, shape (len(frame_ids), 3)."""
    Rw, pw = body_poses_stacked(model, q)
    fb = np.asarray([model.frame_body[f] for f in frame_ids], dtype=np.int32)
    fp = model.frame_pos[np.asarray(frame_ids, dtype=np.int32)]
    return pw[fb] + lie.mv3(Rw[fb], fp)


def frame_velocity(model: RobotModel, q, v, frame_id: int):
    """World-frame linear velocity of the frame origin."""
    zero = jnp.zeros((model.nv,), dtype=q.dtype)
    _, vel = jax.jvp(
        lambda e: frame_position(model, integrate(model, q, e), frame_id),
        (zero,), (v,))
    return vel


def frame_velocities(model: RobotModel, q, v, frame_ids):
    zero = jnp.zeros((model.nv,), dtype=q.dtype)
    _, vel = jax.jvp(
        lambda e: frame_positions(model, integrate(model, q, e), frame_ids),
        (zero,), (v,))
    return vel


def frame_accelerations(model: RobotModel, q, v, a, frame_ids):
    """Classical linear acceleration of frame origins (d/dt of velocity
    along q' = v, v' = a) — what the Baumgarte contact constraint needs."""
    zero = jnp.zeros((model.nv,), dtype=q.dtype)
    _, acc = jax.jvp(
        lambda e, vv: frame_velocities(model, integrate(model, q, e), vv,
                                       frame_ids),
        (zero, v), (v, a))
    return acc


def frame_pva(model: RobotModel, q, v, a, frame_ids):
    """(positions, velocities, classical accelerations) of frame origins
    from ONE jvp tower — the innermost primal is the position and the
    first-order primal is the velocity, so the Baumgarte residual costs a
    single 4-copy FK graph instead of the 7 copies that separate
    positions/velocities/accelerations calls would trace (compile-time
    discipline, see the module docstring)."""
    zero = jnp.zeros((model.nv,), dtype=q.dtype)

    def pos_vel(e, vv):
        p, dp = jax.jvp(
            lambda ee: frame_positions(model, integrate(model, q, ee),
                                       frame_ids),
            (e,), (vv,))
        return p, dp

    (pos, vel), (_, acc) = jax.jvp(pos_vel, (zero, v), (v, a))
    return pos, vel, acc


def frame_linear_jacobian(model: RobotModel, q, frame_id: int):
    """(3, nv) world-frame linear-velocity Jacobian of the frame origin
    (tangent-space derivative: v_f = J(q) @ v for any generalized v)."""
    zero = jnp.zeros((model.nv,), dtype=q.dtype)
    return jax.jacfwd(
        lambda e: frame_position(model, integrate(model, q, e), frame_id)
    )(zero)


def frame_linear_jacobians(model: RobotModel, q, frame_ids):
    """(len(frame_ids), 3, nv) stacked linear Jacobians."""
    zero = jnp.zeros((model.nv,), dtype=q.dtype)
    return jax.jacfwd(
        lambda e: frame_positions(model, integrate(model, q, e), frame_ids)
    )(zero)


def com(model: RobotModel, q):
    """World center of mass (reference: Robot::CoM via pinocchio)."""
    Rw, pw = body_poses_stacked(model, q)
    ci = pw + lie.mv3(Rw, model.com)
    return jnp.sum(model.mass[:, None] * ci, axis=0) / jnp.sum(model.mass)


def potential_energy(model: RobotModel, q):
    """Total gravitational PE (oracle for gravity-torque tests)."""
    Rw, pw = body_poses_stacked(model, q)
    ci = pw + lie.mv3(Rw, model.com)
    return -jnp.sum(model.mass * (ci @ model.gravity))
