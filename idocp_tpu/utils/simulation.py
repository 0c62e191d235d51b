"""Pinned-contact forward-dynamics simulator (validation utility).

The reference validates its MPC examples by integrating the robot's own
dynamics under the computed torques (idocp examples' simulation helpers,
SURVEY.md §3.3). This is the same validator used by
examples/anymal_mpc_trot.py and the closed-loop tests: constrained
forward dynamics with the active contacts pinned via the contact-block
KKT system and Baumgarte acceleration stabilization, semi-implicit Euler
integration. NOT a physics engine — no impact resolution or friction
saturation; its purpose is to close the MPC loop consistently with the
solver's own contact model.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..robot import dynamics, kinematics
from ..robot import model as model_mod


def pinned_contact_step(m, cm, q, v, u, active, feet, dt):
    """One semi-implicit Euler step of constrained forward dynamics with
    the `active` contacts pinned at `feet` (Baumgarte-stabilized).
    Returns (q_next, v_next)."""
    nv = m.nv
    S_T = jnp.concatenate([jnp.zeros((nv - m.nu, m.nu)), jnp.eye(m.nu)],
                          axis=0)
    from ..ocp.state_equation import contact_block_matrix
    A, Jm, mask3 = contact_block_matrix(m, cm, q, active)
    h = dynamics.nonlinear_effects(m, q, v)
    # contact acceleration stabilization (Baumgarte) on active rows
    accv = kinematics.frame_velocities(m, q, v, cm.frame_ids)
    pos = kinematics.frame_positions(m, q, cm.frame_ids)
    corr = (cm.kd * accv + cm.kp * (pos - feet)).reshape(-1)
    # Jdot v term via jvp of frame velocity
    zero = jnp.zeros(nv, q.dtype)
    _, jdotv = jax.jvp(
        lambda e: kinematics.frame_velocities(
            m, model_mod.integrate(m, q, e), v, cm.frame_ids), (zero,), (v,))
    rhs = jnp.concatenate([S_T @ u - h,
                           -mask3 * (jdotv.reshape(-1) + corr)])
    sol = jnp.linalg.solve(A, rhs)
    a = sol[:nv]
    v1 = v + dt * a
    q1 = model_mod.integrate(m, q, dt * v1)
    return q1, v1
