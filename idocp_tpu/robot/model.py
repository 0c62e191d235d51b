"""RobotModel: a frozen pytree describing a rigid-body kinematic tree.

TPU-native replacement for the reference's `Robot` wrapper over
`pinocchio::Model/Data` (idocp `robot/robot.hpp`, SURVEY.md L1). Topology
(parents, joint types, offsets) is static pytree metadata so every function
of the model unrolls to straight-line code under `jit`; numeric parameters
(placements, inertias, limits) are array leaves, so the whole model is
differentiable and batchable.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import lie

# Joint types
FREE = 0
REVOLUTE = 1
PRISMATIC = 2

_QDIM = {FREE: 7, REVOLUTE: 1, PRISMATIC: 1}
_VDIM = {FREE: 6, REVOLUTE: 1, PRISMATIC: 1}


@dataclasses.dataclass(frozen=True)
class RobotModel:
    """Kinematic tree. Body i is the child of joint i; parent[i] is a body
    index (-1 = world). Body frame == joint frame (Featherstone convention).
    """

    # --- static metadata ---
    name: str
    joint_types: Tuple[int, ...]
    parent: Tuple[int, ...]
    q_offset: Tuple[int, ...]
    v_offset: Tuple[int, ...]
    joint_names: Tuple[str, ...]
    frame_names: Tuple[str, ...]
    frame_body: Tuple[int, ...]
    # --- array leaves ---
    jpl_rot: jnp.ndarray  # (nb, 3, 3) joint placement in parent body frame
    jpl_pos: jnp.ndarray  # (nb, 3)
    joint_axis: jnp.ndarray  # (nb, 3) (unused rows for free joints)
    mass: jnp.ndarray  # (nb,)
    com: jnp.ndarray  # (nb, 3) body-frame COM
    inertia: jnp.ndarray  # (nb, 3, 3) rotational inertia about COM, body frame
    frame_rot: jnp.ndarray  # (nf, 3, 3) frame placement in body frame
    frame_pos: jnp.ndarray  # (nf, 3)
    gravity: jnp.ndarray  # (3,) world gravity acceleration
    q_min: jnp.ndarray  # (nq,) -inf where unbounded (free-joint slots)
    q_max: jnp.ndarray  # (nq,)
    v_limit: jnp.ndarray  # (nv,) +inf where unbounded
    u_limit: jnp.ndarray  # (nu,) actuated-joint effort limits

    # ------------------------------------------------------------------
    @property
    def nbodies(self) -> int:
        return len(self.joint_types)

    @property
    def nq(self) -> int:
        return self.q_offset[-1] + _QDIM[self.joint_types[-1]]

    @property
    def nv(self) -> int:
        return self.v_offset[-1] + _VDIM[self.joint_types[-1]]

    @property
    def has_floating_base(self) -> bool:
        return self.joint_types[0] == FREE

    @property
    def dim_passive(self) -> int:
        return 6 if self.has_floating_base else 0

    @property
    def nu(self) -> int:
        return self.nv - self.dim_passive

    def frame_id(self, name: str) -> int:
        return self.frame_names.index(name)

    def neutral_q(self, dtype=jnp.float64) -> jnp.ndarray:
        q = np.zeros(self.nq)
        for i, jt in enumerate(self.joint_types):
            if jt == FREE:
                q[self.q_offset[i] + 3] = 1.0  # quaternion w
        return jnp.asarray(q, dtype=dtype)


jax.tree_util.register_dataclass(
    RobotModel,
    data_fields=[
        "jpl_rot", "jpl_pos", "joint_axis", "mass", "com", "inertia",
        "frame_rot", "frame_pos", "gravity", "q_min", "q_max", "v_limit",
        "u_limit",
    ],
    meta_fields=[
        "name", "joint_types", "parent", "q_offset", "v_offset",
        "joint_names", "frame_names", "frame_body",
    ],
)


# ---------------------------------------------------------------------------
# Configuration-space Lie-group operations
# (reference: Robot::integrateConfiguration / subtractConfiguration)
# ---------------------------------------------------------------------------

def integrate(model: RobotModel, q: jnp.ndarray, dq: jnp.ndarray) -> jnp.ndarray:
    """q ⊕ dq: local integration on SE(3) x R^n. dq has dim nv."""
    out = []
    for i, jt in enumerate(model.joint_types):
        qo, vo = model.q_offset[i], model.v_offset[i]
        if jt == FREE:
            p, quat = q[..., qo:qo + 3], q[..., qo + 3:qo + 7]
            xi = dq[..., vo:vo + 6]
            quat2, p2 = lie.se3_integrate(quat, p, xi)
            out.append(p2)
            out.append(lie.quat_normalize(quat2))
        else:
            out.append(q[..., qo:qo + 1] + dq[..., vo:vo + 1])
    return jnp.concatenate(out, axis=-1)


def difference(model: RobotModel, q0: jnp.ndarray, q1: jnp.ndarray) -> jnp.ndarray:
    """q1 ⊖ q0 ∈ R^nv such that integrate(q0, difference(q0, q1)) == q1."""
    out = []
    for i, jt in enumerate(model.joint_types):
        qo = model.q_offset[i]
        if jt == FREE:
            p0, quat0 = q0[..., qo:qo + 3], q0[..., qo + 3:qo + 7]
            p1, quat1 = q1[..., qo:qo + 3], q1[..., qo + 3:qo + 7]
            out.append(lie.se3_difference(quat0, p0, quat1, p1))
        else:
            out.append(q1[..., qo:qo + 1] - q0[..., qo:qo + 1])
    return jnp.concatenate(out, axis=-1)


def tangent_jacobian(fn, model: RobotModel, q: jnp.ndarray):
    """d/dε fn(q ⊕ ε)|_{ε=0}: Jacobian of fn in the tangent space at q.

    This is the manifold-consistent ∂/∂q used throughout (the reference gets
    the same object from Pinocchio's analytical derivatives; we start with
    forward-mode autodiff and swap in analytical recursions where hot).
    """
    dtype = q.dtype
    zero = jnp.zeros((model.nv,), dtype=dtype)
    return jax.jacfwd(lambda eps: fn(integrate(model, q, eps)))(zero)


def random_configuration(model: RobotModel, key, dtype=jnp.float64):
    """Lie-group-aware random configuration (reference:
    Robot::generateFeasibleConfiguration)."""
    k1, k2 = jax.random.split(key)
    q = []
    for i, jt in enumerate(model.joint_types):
        qo = model.q_offset[i]
        ki = jax.random.fold_in(k1, i)
        if jt == FREE:
            p = jax.random.uniform(ki, (3,), dtype, -1.0, 1.0)
            quat = jax.random.normal(jax.random.fold_in(k2, i), (4,), dtype)
            quat = lie.quat_normalize(quat)
            q.append(p)
            q.append(quat)
        else:
            lo = np.maximum(np.asarray(model.q_min)[qo], -np.pi)
            hi = np.minimum(np.asarray(model.q_max)[qo], np.pi)
            q.append(jax.random.uniform(ki, (1,), dtype, lo, hi))
    return jnp.concatenate(q, axis=-1)


# ---------------------------------------------------------------------------
# Model construction helper
# ---------------------------------------------------------------------------

class ModelBuilder:
    """Imperative builder producing a frozen RobotModel pytree."""

    def __init__(self, name: str, gravity=(0.0, 0.0, -9.81)):
        self.name = name
        self.gravity = np.asarray(gravity, dtype=np.float64)
        self._joints = []  # dicts
        self._frames = []

    def add_body(
        self,
        name: str,
        parent: int,
        joint_type: int,
        placement_pos=(0.0, 0.0, 0.0),
        placement_rpy=(0.0, 0.0, 0.0),
        axis=(0.0, 0.0, 1.0),
        mass=1.0,
        com=(0.0, 0.0, 0.0),
        inertia=None,
        q_limits=(-np.inf, np.inf),
        v_limit=np.inf,
        u_limit=np.inf,
    ) -> int:
        """Returns the new body's index. `parent` is a body index (-1=world)."""
        if inertia is None:
            inertia = 1e-3 * np.eye(3)
        self._joints.append(
            dict(
                name=name, parent=parent, joint_type=joint_type,
                placement_pos=np.asarray(placement_pos, dtype=np.float64),
                placement_rot=rpy_matrix(*placement_rpy),
                axis=np.asarray(axis, dtype=np.float64),
                mass=float(mass), com=np.asarray(com, dtype=np.float64),
                inertia=np.asarray(inertia, dtype=np.float64),
                q_limits=q_limits, v_limit=float(v_limit),
                u_limit=float(u_limit),
            )
        )
        return len(self._joints) - 1

    def add_frame(self, name: str, body: int, pos=(0.0, 0.0, 0.0),
                  rpy=(0.0, 0.0, 0.0)) -> int:
        self._frames.append(
            dict(name=name, body=body,
                 pos=np.asarray(pos, dtype=np.float64),
                 rot=rpy_matrix(*rpy))
        )
        return len(self._frames) - 1

    def build(self, dtype=jnp.float64) -> RobotModel:
        nb = len(self._joints)
        q_offset, v_offset = [], []
        qo = vo = 0
        for j in self._joints:
            q_offset.append(qo)
            v_offset.append(vo)
            qo += _QDIM[j["joint_type"]]
            vo += _VDIM[j["joint_type"]]
        nq, nv = qo, vo
        q_min = np.full(nq, -np.inf)
        q_max = np.full(nq, np.inf)
        v_limit = np.full(nv, np.inf)
        u_lims = []
        for i, j in enumerate(self._joints):
            if j["joint_type"] != FREE:
                q_min[q_offset[i]] = j["q_limits"][0]
                q_max[q_offset[i]] = j["q_limits"][1]
                v_limit[v_offset[i]] = j["v_limit"]
                u_lims.append(j["u_limit"])
        u_limit = np.asarray(u_lims) if u_lims else np.zeros(0)
        asleaf = lambda x: jnp.asarray(np.asarray(x), dtype=dtype)
        return RobotModel(
            name=self.name,
            joint_types=tuple(j["joint_type"] for j in self._joints),
            parent=tuple(j["parent"] for j in self._joints),
            q_offset=tuple(q_offset),
            v_offset=tuple(v_offset),
            joint_names=tuple(j["name"] for j in self._joints),
            frame_names=tuple(f["name"] for f in self._frames),
            frame_body=tuple(f["body"] for f in self._frames),
            jpl_rot=asleaf(np.stack([j["placement_rot"] for j in self._joints])
                           if nb else np.zeros((0, 3, 3))),
            jpl_pos=asleaf(np.stack([j["placement_pos"] for j in self._joints])
                           if nb else np.zeros((0, 3))),
            joint_axis=asleaf(np.stack([j["axis"] for j in self._joints])
                              if nb else np.zeros((0, 3))),
            mass=asleaf([j["mass"] for j in self._joints]),
            com=asleaf(np.stack([j["com"] for j in self._joints])
                       if nb else np.zeros((0, 3))),
            inertia=asleaf(np.stack([j["inertia"] for j in self._joints])
                           if nb else np.zeros((0, 3, 3))),
            frame_rot=asleaf(np.stack([f["rot"] for f in self._frames])
                             if self._frames else np.zeros((0, 3, 3))),
            frame_pos=asleaf(np.stack([f["pos"] for f in self._frames])
                             if self._frames else np.zeros((0, 3))),
            gravity=asleaf(self.gravity),
            q_min=asleaf(q_min),
            q_max=asleaf(q_max),
            v_limit=asleaf(v_limit),
            u_limit=asleaf(u_limit),
        )


def rpy_matrix(roll=0.0, pitch=0.0, yaw=0.0) -> np.ndarray:
    cr, sr = np.cos(roll), np.sin(roll)
    cp, sp = np.cos(pitch), np.sin(pitch)
    cy, sy = np.cos(yaw), np.sin(yaw)
    Rx = np.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]])
    Ry = np.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]])
    Rz = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]])
    return Rz @ Ry @ Rx
