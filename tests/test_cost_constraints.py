"""Cost-component derivative checks (finite differences in the tangent
space) and PDIPM invariants — the reference's test patterns §4.2/§4.5
(idocp `test/cost/*`, `test/constraints/*`): gradients/Hessians of every
cost component vs finite differences; slack/dual positivity, barrier
condensing algebra, fraction-to-boundary rule."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from idocp_tpu.constraints import pdipm
from idocp_tpu.constraints.components import (
    FrictionCone, JointAccelerationLowerLimit, JointAccelerationUpperLimit,
    JointPositionLowerLimit, JointPositionUpperLimit,
    JointTorquesLowerLimit, JointTorquesUpperLimit,
    JointVelocityLowerLimit, JointVelocityUpperLimit)
from idocp_tpu.cost.base import EvalContext
from idocp_tpu.cost.components import (CoMCost, ConfigurationSpaceCost,
                                       ContactForceCost, TaskSpace3DCost,
                                       TaskSpace6DCost)
from idocp_tpu.robot import model as model_mod
from idocp_tpu.robot.contact import ContactModel

EPS = 1e-6


def _rand_point(m, key, nf=0):
    ks = jax.random.split(key, 5)
    q = model_mod.integrate(
        m, m.neutral_q(jnp.float64),
        0.4 * jax.random.normal(ks[0], (m.nv,), jnp.float64))
    v = jax.random.normal(ks[1], (m.nv,), jnp.float64)
    a = jax.random.normal(ks[2], (m.nv,), jnp.float64)
    f = jax.random.normal(ks[3], (nf,), jnp.float64)
    u = jax.random.normal(ks[4], (m.nu,), jnp.float64)
    return q, v, a, f, u


def _cost_components(m, nc):
    comps = [ConfigurationSpaceCost(
        q_weight=2.0 * jnp.ones(m.nv), v_weight=1.5 * jnp.ones(m.nv),
        a_weight=0.3 * jnp.ones(m.nv), u_weight=0.2 * jnp.ones(m.nu),
        qf_weight=3.0 * jnp.ones(m.nv), vf_weight=1.0 * jnp.ones(m.nv),
        q_ref=model_mod.integrate(m, m.neutral_q(jnp.float64),
                                  0.1 * jnp.ones(m.nv))),
        TaskSpace3DCost(frame_id=0, weight=jnp.ones(3),
                        weight_terminal=2.0 * jnp.ones(3),
                        pos_ref=0.2 * jnp.ones(3)),
        TaskSpace6DCost(frame_id=0, weight=jnp.ones(6),
                        weight_terminal=jnp.ones(6)),
        CoMCost(weight=jnp.ones(3), weight_terminal=jnp.ones(3),
                com_ref=0.1 * jnp.ones(3))]
    if nc:
        comps.append(ContactForceCost(
            f_weight=0.5 * jnp.ones(3 * nc), f_ref=jnp.zeros(3 * nc)))
    return comps


def test_cost_stage_gradients_vs_fd(robot_model):
    m = robot_model
    nc = 4 if m.has_floating_base else 0
    cm = ContactModel(frame_ids=tuple(range(nc)), kp=1.0, kd=1.0) if nc \
        else None
    ctx = EvalContext(model=m, contact_model=cm)
    nf = 3 * nc
    q, v, a, f, u = _rand_point(m, jax.random.PRNGKey(3), nf)
    fmask = jnp.ones(3 * nc) if nc else None
    t, dt = 0.3, 0.02
    for comp in _cost_components(m, nc):
        bq = comp.stage(ctx, t, dt, q, v, a, f, u, fmask)

        def value_at(dq, dv, da, df, du):
            qq = model_mod.integrate(m, q, dq)
            return comp.stage(ctx, t, dt, qq, v + dv, a + da, f + df,
                              u + du, fmask).value

        name = type(comp).__name__
        grads = jax.grad(value_at, argnums=(0, 1, 2, 3, 4))(
            jnp.zeros(m.nv), jnp.zeros(m.nv), jnp.zeros(m.nv),
            jnp.zeros(nf), jnp.zeros(m.nu))
        for key, gref in zip(("q", "v", "a", "f", "u"), grads):
            got = bq.l.get(key)
            if got is None:
                np.testing.assert_allclose(np.asarray(gref), 0.0, atol=1e-12,
                                           err_msg=f"{name} l[{key}]")
            else:
                np.testing.assert_allclose(
                    np.asarray(got), np.asarray(gref), rtol=1e-6, atol=1e-9,
                    err_msg=f"{name} l[{key}]")


def test_cost_terminal_gradients_vs_fd(robot_model):
    m = robot_model
    nc = 4 if m.has_floating_base else 0
    ctx = EvalContext(model=m, contact_model=None)
    q, v, _, _, _ = _rand_point(m, jax.random.PRNGKey(5))
    for comp in _cost_components(m, 0):
        bq = comp.terminal(ctx, 0.7, q, v)

        def value_at(dq, dv):
            return comp.terminal(
                ctx, 0.7, model_mod.integrate(m, q, dq), v + dv).value

        gq, gv = jax.grad(value_at, argnums=(0, 1))(
            jnp.zeros(m.nv), jnp.zeros(m.nv))
        name = type(comp).__name__
        np.testing.assert_allclose(np.asarray(bq.l.get("q", jnp.zeros(m.nv))),
                                   np.asarray(gq), rtol=1e-6, atol=1e-9,
                                   err_msg=f"{name} terminal q")
        np.testing.assert_allclose(np.asarray(bq.l.get("v", jnp.zeros(m.nv))),
                                   np.asarray(gv), rtol=1e-6, atol=1e-9,
                                   err_msg=f"{name} terminal v")


def _constraint_components(m, nc):
    comps = [JointPositionLowerLimit(m), JointPositionUpperLimit(m),
             JointVelocityLowerLimit(m), JointVelocityUpperLimit(m),
             JointTorquesLowerLimit(m), JointTorquesUpperLimit(m),
             JointAccelerationLowerLimit(m), JointAccelerationUpperLimit(m)]
    if nc:
        comps.append(FrictionCone(m, nc=nc, mu=0.6))
    return comps


def test_constraint_jacobians_vs_fd(robot_model):
    m = robot_model
    nc = 4 if m.has_floating_base else 0
    nf = 3 * nc
    ctx = None
    q, v, a, f, u = _rand_point(m, jax.random.PRNGKey(11), nf)
    fmask = jnp.ones(3 * nc) if nc else None
    for comp in _constraint_components(m, nc):
        g, J = comp.evaluate(ctx, q, v, a, f, u, fmask)
        assert g.shape == (comp.dim,), type(comp).__name__

        def g_at(dq, dv, da, df, du):
            return comp.evaluate(
                ctx, model_mod.integrate(m, q, dq), v + dv, a + da,
                f + df, u + du, fmask)[0]

        Jref = jax.jacfwd(g_at, argnums=(0, 1, 2, 3, 4))(
            jnp.zeros(m.nv), jnp.zeros(m.nv), jnp.zeros(m.nv),
            jnp.zeros(nf), jnp.zeros(m.nu))
        name = type(comp).__name__
        for key, jr in zip(("q", "v", "a", "f", "u"), Jref):
            got = J.get(key)
            if got is None:
                np.testing.assert_allclose(np.asarray(jr), 0.0, atol=1e-12,
                                           err_msg=f"{name} J[{key}]")
            else:
                np.testing.assert_allclose(
                    np.asarray(got), np.asarray(jr), rtol=1e-6, atol=1e-9,
                    err_msg=f"{name} J[{key}]")


# ---------------------------------------------------------------- PDIPM

def test_pdipm_init_positive():
    g = jnp.asarray([-2.0, -1e-9, 0.5])
    s, d = pdipm.init_slack_dual(g, barrier=1e-3)
    assert (np.asarray(s) > 0).all() and (np.asarray(d) > 0).all()


def test_pdipm_condense_expand_consistency():
    """The condensed Newton system must be the Schur complement of the
    full (primal, slack, dual) system: eliminating (ds, dnu) from
        g + ∇g dz + s + ds = 0
        (s + ds)(ν + dν) ≈ sν + ν ds + s dν = μ
    and re-expanding must reproduce residual-consistent (ds, dν)."""
    key = jax.random.PRNGKey(0)
    mdim, nz = 5, 7
    g = -jnp.abs(jax.random.normal(key, (mdim,), jnp.float64)) - 0.1
    s, d = pdipm.init_slack_dual(g, barrier=1e-2)
    # perturb so residuals are nonzero
    s = s * 1.3
    d = d * 0.8
    Jz = jax.random.normal(jax.random.fold_in(key, 1), (mdim, nz),
                           jnp.float64)
    dz = 0.1 * jax.random.normal(jax.random.fold_in(key, 2), (nz,),
                                 jnp.float64)
    mu = 1e-2
    ds, dnu = pdipm.expand(g, s, d, mu, Jz @ dz)
    # primal feasibility row: g + Jz dz + s + ds = 0 (linearized)
    np.testing.assert_allclose(np.asarray(g + Jz @ dz + s + ds), 0.0,
                               atol=1e-12)
    # complementarity row: s∘ν − μ + ν ds + s dν = 0 (linearized)
    np.testing.assert_allclose(np.asarray(s * d - mu + d * ds + s * dnu),
                               0.0, atol=1e-12)
    # condense_terms must equal the Schur complement of those two rows
    sigma, rhs = pdipm.condense_terms(g, s, d, mu)
    np.testing.assert_allclose(np.asarray(sigma), np.asarray(d / s))
    # folded gradient: ∇gᵀ(ν + dν(dz=0)) — check against direct elimination
    dnu0 = pdipm.expand(g, s, d, mu, jnp.zeros(mdim))[1]
    np.testing.assert_allclose(np.asarray(rhs), np.asarray(d + dnu0),
                               rtol=1e-12)


def test_fraction_to_boundary():
    """The fraction-to-boundary rule used by the update step
    (solver/core._ftb; reference: pdipm::FractionToBoundaryRule)."""
    from idocp_tpu.solver.core import _ftb
    x = jnp.asarray([1.0, 2.0, 3.0])
    dx = jnp.asarray([-2.0, 1.0, -0.1])
    tau = 0.995
    alpha = float(_ftb(x, dx, tau))
    # binding row is 0: alpha = tau * 1.0 / 2.0
    assert abs(alpha - tau / 2.0) < 1e-12
    xa = x + alpha * dx
    assert (np.asarray(xa) >= (1 - tau) * np.asarray(x) - 1e-12).all()
    # all-positive directions: full step
    assert float(_ftb(x, jnp.abs(dx), tau)) == 1.0


def test_pdipm_barrier_value_masked():
    s = jnp.asarray([0.5, 2.0])
    mask = jnp.asarray([1.0, 0.0])
    b = float(pdipm.barrier_value(s, 1e-2, mask))
    assert abs(b - (-1e-2 * np.log(0.5))) < 1e-12
