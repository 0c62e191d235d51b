"""Associative-scan (parallel-in-time) Riccati vs the serial lax.scan
recursion — exact same Newton direction on random LQR horizons.

This is the TPU-native analogue of the reference's ParNMPC-vs-OCPSolver
consistency (idocp `solver/parnmpc_solver.hpp` ⚠ vs `riccati/
riccati_recursion.hpp`, SURVEY.md §3.4), except our parallel path is
*exact*, so the assertion is equality to solver precision rather than
convergence of an inexact scheme.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from idocp_tpu.ocp.data import CondensedStage
from idocp_tpu.riccati import parallel, recursion


def random_stages(key, N, nx, nu, ns=0, dtype=jnp.float64):
    ks = jax.random.split(key, 8)

    def spd(k, n, m):
        M = jax.random.normal(k, (N, n, n), dtype)
        return M @ jnp.swapaxes(M, -1, -2) + m * jnp.eye(n, dtype=dtype)

    Qxx = spd(ks[0], nx, 0.5)
    Quu = spd(ks[1], nu, 1.0)
    Qxu = 0.1 * jax.random.normal(ks[2], (N, nx, nu), dtype)
    A = jnp.eye(nx, dtype=dtype) + 0.1 * jax.random.normal(
        ks[3], (N, nx, nx), dtype)
    B = jax.random.normal(ks[4], (N, nx, nu), dtype)
    lx = jax.random.normal(ks[5], (N, nx), dtype)
    lu = jax.random.normal(ks[6], (N, nu), dtype)
    xres = 0.1 * jax.random.normal(ks[7], (N, nx), dtype)
    z = jnp.zeros
    return CondensedStage(
        A=A, B=B, xres=xres, lx=lx, lu=lu, Qxx=Qxx, Qxu=Qxu, Quu=Quu,
        Wx=z((N, 0, nx), dtype), Wk=z((N, 0, nu), dtype),
        w0=z((N, 0), dtype),
        Cx=z((N, ns, nx), dtype), Cu=z((N, ns, nu), dtype),
        h=z((N, ns), dtype))


@pytest.mark.parametrize("N", [1, 5, 16])
def test_parallel_backward_matches_serial(N):
    nx, nu = 6, 3
    key = jax.random.PRNGKey(N)
    cs = random_stages(key, N, nx, nu)
    kP = jax.random.fold_in(key, 99)
    Mt = jax.random.normal(kP, (nx, nx), jnp.float64)
    P_term = Mt @ Mt.T + jnp.eye(nx)
    s_term = jax.random.normal(jax.random.fold_in(key, 98), (nx,),
                               jnp.float64)
    sw = jnp.zeros((N, 0), jnp.float64)

    P_s, s_s, pol_s = recursion.backward_recursion(P_term, s_term, cs, sw)
    P_p, s_p, pol_p = parallel.parallel_backward(P_term, s_term, cs)

    np.testing.assert_allclose(np.asarray(P_p), np.asarray(P_s),
                               rtol=1e-9, atol=1e-8)
    np.testing.assert_allclose(np.asarray(s_p), np.asarray(s_s),
                               rtol=1e-9, atol=1e-8)
    np.testing.assert_allclose(np.asarray(pol_p.K), np.asarray(pol_s.K),
                               rtol=1e-9, atol=1e-8)
    np.testing.assert_allclose(np.asarray(pol_p.k), np.asarray(pol_s.k),
                               rtol=1e-9, atol=1e-8)

    dx0 = jax.random.normal(jax.random.fold_in(key, 97), (nx,), jnp.float64)
    dx_s, du_s, _ = recursion.forward_rollout(dx0, cs, pol_s)
    dx_p, du_p, _ = parallel.parallel_rollout(dx0, cs, pol_p)
    np.testing.assert_allclose(np.asarray(dx_p), np.asarray(dx_s),
                               rtol=1e-9, atol=1e-8)
    np.testing.assert_allclose(np.asarray(du_p), np.asarray(du_s),
                               rtol=1e-9, atol=1e-8)


def test_parallel_backward_with_switch_columns_present():
    """ns > 0 columns exist (static shapes) but no active rows: the
    parallel path must still agree with the serial path's masked-off
    constrained factorization."""
    N, nx, nu, ns = 8, 4, 2, 3
    key = jax.random.PRNGKey(7)
    cs = random_stages(key, N, nx, nu, ns=ns)
    P_term = 2.0 * jnp.eye(nx, dtype=jnp.float64)
    s_term = jnp.ones(nx, jnp.float64)
    sw = jnp.zeros((N, ns), jnp.float64)

    P_s, s_s, pol_s = recursion.backward_recursion(P_term, s_term, cs, sw)
    P_p, s_p, pol_p = parallel.parallel_backward(P_term, s_term, cs)
    np.testing.assert_allclose(np.asarray(P_p), np.asarray(P_s),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(s_p), np.asarray(s_s),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(pol_p.K), np.asarray(pol_s.K),
                               rtol=1e-9, atol=1e-9)


def test_unconstr_solver_parallel_riccati_matches_serial(iiwa):
    """Solver-level integration: one Newton update with the associative-
    scan Riccati equals the serial-scan update bit-for-bit (to fp64
    solver precision) on the iiwa14 fast path."""
    from idocp_tpu.cost.components import ConfigurationSpaceCost
    from idocp_tpu.solver.options import SolverOptions
    from idocp_tpu.solver.unconstr_ocp_solver import UnconstrOCPSolver

    m = iiwa
    cost = [ConfigurationSpaceCost(
        q_weight=10.0 * jnp.ones(m.nv), v_weight=0.1 * jnp.ones(m.nv),
        a_weight=0.01 * jnp.ones(m.nv), u_weight=0.01 * jnp.ones(m.nu),
        qf_weight=10.0 * jnp.ones(m.nv), vf_weight=1.0 * jnp.ones(m.nv),
        q_ref=0.3 * jnp.ones(m.nq))]
    q0 = 0.1 * jnp.ones(m.nq)
    args = (0.0, q0 + 0.05, 0.02 * jnp.ones(m.nv))

    sols = []
    for par in (False, True):
        s = UnconstrOCPSolver(m, cost, [], T=0.4, N=6,
                              options=SolverOptions(parallel_riccati=par))
        s.set_solution(q0, jnp.zeros(m.nv))
        s.init_constraints()
        new_sol, stats = s._update(s.solution, *args)
        sols.append(new_sol)
    for fa, fb in zip(jax.tree_util.tree_leaves(sols[0]),
                      jax.tree_util.tree_leaves(sols[1])):
        np.testing.assert_allclose(np.asarray(fa), np.asarray(fb),
                                   rtol=1e-8, atol=1e-9)
