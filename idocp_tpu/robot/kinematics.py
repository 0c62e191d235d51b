"""Forward kinematics, frame placements/velocities/Jacobians, COM.

TPU-native replacement for the reference's Pinocchio kinematics calls
(idocp `robot/robot.hpp`: updateKinematics, framePosition, frameJacobian;
SURVEY.md L1). All functions are pure, unrolled over the static topology,
and take manifold derivatives via tangent-space autodiff.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

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


def local_transforms(model: RobotModel, q):
    """Per-body pose relative to its parent body: X_pc = X_tree * X_joint."""
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
    """World pose (R, p) of every body frame. Returns (list, list)."""
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


def frame_pose(model: RobotModel, q, frame_id: int):
    Rw, pw = body_poses(model, q)
    b = model.frame_body[frame_id]
    R = Rw[b] @ model.frame_rot[frame_id]
    p = pw[b] + jnp.einsum("...ij,...j->...i", Rw[b], model.frame_pos[frame_id])
    return R, p


def frame_position(model: RobotModel, q, frame_id: int):
    return frame_pose(model, q, frame_id)[1]


def frame_positions(model: RobotModel, q, frame_ids):
    """Stacked world positions of several frames, shape (len(frame_ids), 3)."""
    Rw, pw = body_poses(model, q)
    out = []
    for fid in frame_ids:
        b = model.frame_body[fid]
        out.append(pw[b] + jnp.einsum("...ij,...j->...i", Rw[b],
                                      model.frame_pos[fid]))
    return jnp.stack(out, axis=-2)


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
    Rw, pw = body_poses(model, q)
    total = jnp.zeros(3, dtype=q.dtype)
    for i in range(model.nbodies):
        ci = pw[i] + jnp.einsum("...ij,...j->...i", Rw[i], model.com[i])
        total = total + model.mass[i] * ci
    return total / jnp.sum(model.mass)


def potential_energy(model: RobotModel, q):
    """Total gravitational PE (oracle for gravity-torque tests)."""
    Rw, pw = body_poses(model, q)
    pe = jnp.zeros((), dtype=q.dtype)
    for i in range(model.nbodies):
        ci = pw[i] + jnp.einsum("...ij,...j->...i", Rw[i], model.com[i])
        pe = pe - model.mass[i] * jnp.dot(model.gravity, ci)
    return pe
