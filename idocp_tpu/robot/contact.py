"""Point contacts: status masks and Baumgarte-stabilized constraints.

TPU-native replacement for the reference's `PointContact`, `ContactStatus`,
`ImpulseStatus` (idocp `robot/point_contact.hpp`, `robot/contact_status.hpp`;
SURVEY.md L1). Where the reference stores a dynamic set of active contacts,
here the active set is a fixed-size boolean mask (static shapes for XLA) and
inactive slots are padded out in the condensing step.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from . import kinematics
from .model import RobotModel, integrate


@dataclasses.dataclass(frozen=True)
class ContactStatus:
    """Mask over the robot's contact slots + planned contact positions.

    active: (nc,) bool — which point contacts are closed.
    position: (nc, 3) — planned contact points (footholds), used by the
        Baumgarte position term and the switching constraint.
    """
    active: jnp.ndarray
    position: jnp.ndarray

    @property
    def nc(self) -> int:
        return self.active.shape[-1]

    @staticmethod
    def make(active, position=None, dtype=jnp.float64):
        active = jnp.asarray(active, dtype=bool)
        nc = active.shape[-1]
        if position is None:
            position = jnp.zeros(active.shape + (3,), dtype=dtype)
        return ContactStatus(active=active, position=jnp.asarray(position,
                                                                 dtype=dtype))


jax.tree_util.register_dataclass(
    ContactStatus, data_fields=["active", "position"], meta_fields=[])

# An impulse status is structurally identical (mask + impact footholds);
# reference keeps a separate ImpulseStatus class (robot/impulse_status.hpp).
ImpulseStatus = ContactStatus


@dataclasses.dataclass(frozen=True)
class ContactModel:
    """Static contact configuration of a robot: which frames can touch the
    world, plus Baumgarte gains (reference: Robot ctor's contact_frames and
    baumgarte time step)."""
    frame_ids: Tuple[int, ...]
    kp: float  # position gain (beta^2)
    kd: float  # velocity gain (2*alpha)

    @property
    def nc(self) -> int:
        return len(self.frame_ids)

    @property
    def max_dimf(self) -> int:
        return 3 * len(self.frame_ids)


def baumgarte_residual(model: RobotModel, cm: ContactModel,
                       status: ContactStatus, q, v, a):
    """Stacked (nc*3,) Baumgarte-stabilized contact acceleration residual
    a_f + kd * v_f + kp * (p_f - p_ref), rows of inactive contacts zeroed.
    Reference: PointContact::computeBaumgarteResidual."""
    fids = cm.frame_ids
    acc = kinematics.frame_accelerations(model, q, v, a, fids)
    vel = kinematics.frame_velocities(model, q, v, fids)
    pos = kinematics.frame_positions(model, q, fids)
    res = acc + cm.kd * vel + cm.kp * (pos - status.position)
    res = jnp.where(status.active[:, None], res, 0.0)
    return res.reshape(cm.max_dimf)


def contact_position_residual(model: RobotModel, cm: ContactModel,
                              status: ContactStatus, q):
    """(nc*3,) frame position minus planned foothold, masked — used by the
    switching constraint (reference: PointContact::computeContactPositionResidual)."""
    pos = kinematics.frame_positions(model, q, cm.frame_ids)
    res = jnp.where(status.active[:, None], pos - status.position, 0.0)
    return res.reshape(cm.max_dimf)


def contact_velocity_residual(model: RobotModel, cm: ContactModel,
                              status: ContactStatus, q, v):
    """(nc*3,) frame velocity, masked — the impulse-stage constraint J v+ = 0
    (reference: PointContact::computeContactVelocityResidual)."""
    vel = kinematics.frame_velocities(model, q, v, cm.frame_ids)
    res = jnp.where(status.active[:, None], vel, 0.0)
    return res.reshape(cm.max_dimf)


def contact_jacobian(model: RobotModel, cm: ContactModel, q):
    """(max_dimf, nv) stacked linear Jacobian of all contact frames
    (unmasked; masking happens in the condensing step)."""
    J = kinematics.frame_linear_jacobians(model, q, cm.frame_ids)
    return J.reshape(cm.max_dimf, model.nv)
