"""Runtime attribution of the batched trot update on the real TPU chip
(VERDICT r2 weak-item #2: "you cannot fix what you refuse to measure").

jax.profiler tracing is unreliable on the experimental axon platform, so
this times each phase of the Newton update as its own jitted program with
a device-to-host fence (block_until_ready does NOT block on axon):

  linearize   vmapped stage linearization (jacfwd towers; the FLOPs)
  condense    vmapped elimination -> LQR stages
  riccati     serial lax.scan backward + forward rollout
  evaluate    one line-search trial grid (K value-only horizon evals)
  update      the full fused update (>= sum of parts when fusion helps)

Usage: python tools/runtime_profile.py [batch ...]; writes PROFILE_r{N}.json
when invoked with --out FILE.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build(batch, n_horizon=20):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/idocp_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from idocp_tpu.constraints.components import (
        FrictionCone, JointTorquesLowerLimit, JointTorquesUpperLimit)
    from idocp_tpu.cost.components import ConfigurationSpaceCost
    from idocp_tpu.models import anymal
    from idocp_tpu.parallel.batch import batch_solution
    from idocp_tpu.robot import kinematics
    from idocp_tpu.robot import model as model_mod
    from idocp_tpu.robot.contact import ContactModel
    from idocp_tpu.solver.mpc import MPC, TrotGait
    from idocp_tpu.solver.ocp_solver import OCPSolver
    from idocp_tpu.solver.options import SolverOptions

    dtype = jnp.float32
    m = anymal.make_model_urdf(dtype=dtype)
    foot_ids = tuple(m.frame_id(n) for n in anymal.FOOT_FRAMES)
    cm = ContactModel(frame_ids=foot_ids, kp=25.0, kd=10.0)
    q0 = anymal.standing_configuration(m, dtype=dtype)
    feet = np.asarray(kinematics.frame_positions(m, q0, foot_ids))
    cost = [ConfigurationSpaceCost(
        q_weight=jnp.asarray([0.0] * 3 + [10.0] * 3 + [1.0] * 12, dtype),
        v_weight=jnp.ones(18, dtype), a_weight=1e-3 * jnp.ones(18, dtype),
        u_weight=1e-2 * jnp.ones(12, dtype),
        qf_weight=jnp.asarray([0.0] * 3 + [10.0] * 3 + [1.0] * 12, dtype),
        vf_weight=jnp.ones(18, dtype), q_ref=q0)]
    cons = [JointTorquesLowerLimit(m), JointTorquesUpperLimit(m),
            FrictionCone(m, nc=4, mu=0.7)]
    options = SolverOptions(barrier=1e-3, compute_kkt_error=False,
                            line_search_alphas=4)
    solver = OCPSolver(m, cm, cost, cons, T=0.5, N=n_horizon,
                       options=options, dtype=dtype)
    mpc = MPC(solver, TrotGait(t_start=0.1), feet)
    sched = mpc.schedule_at(0.05)
    solver.set_solution(q0, jnp.zeros(m.nv, dtype), schedule=sched)
    solver.init_constraints(sched)
    sol_b = batch_solution(solver.solution, batch)
    key = jax.random.PRNGKey(0)
    q_b = jnp.tile(q0[None], (batch, 1))
    dq = 0.02 * jax.random.normal(key, (batch, m.nv), dtype)
    q_b = jax.vmap(lambda qq, d: model_mod.integrate(m, qq, d))(q_b, dq)
    v_b = 0.05 * jax.random.normal(jax.random.fold_in(key, 1),
                                   (batch, m.nv), dtype)
    return solver, sol_b, q_b, v_b, sched


def main():
    import jax
    import jax.numpy as jnp

    argv = sys.argv[1:]
    if "--out" in argv:
        i = argv.index("--out"); argv = argv[:i] + argv[i+2:]
    args = [a for a in argv if not a.startswith("--")]
    out = None
    if "--out" in sys.argv:
        out = sys.argv[sys.argv.index("--out") + 1]
    batches = [int(a) for a in args] or [256]

    from idocp_tpu.ocp.condensing import condense
    from idocp_tpu.riccati import recursion
    from idocp_tpu.robot import model as model_mod

    results = {}
    for B in batches:
        solver, sol_b, q_b, v_b, sched = build(B)
        model, options = solver.model, solver.options
        lin1 = jax.jit(jax.vmap(solver._linearize.__wrapped__,
                                in_axes=(0, None, 0, 0, None)))

        def cond_only(lin):
            return jax.vmap(jax.vmap(condense))(
                lin.quad, lin.T_x, lin.T_k, lin.t0,
                lin.F_x, lin.F_w, lin.xres, lin.Cx_raw, lin.Cw_raw, lin.h)

        cond1 = jax.jit(cond_only)

        def riccati_only(cs, sw_mask, term_H, term_l, dx0):
            def one(cs_k, m_k, H, l, d0):
                P, s, pols = recursion.backward_recursion(
                    H, l, cs_k, m_k, reg=options.riccati_regularization)
                return recursion.forward_rollout(d0, cs_k, pols)
            return jax.vmap(one)(cs, sw_mask, term_H, term_l, dx0)

        ric1 = jax.jit(riccati_only)

        upd = solver._update.__wrapped__
        full = jax.jit(jax.vmap(upd, in_axes=(0, None, 0, 0, None)))

        nx = 2 * model.nv
        dtype = jnp.float32
        term_H = jnp.tile(jnp.eye(nx, dtype=dtype)[None], (B, 1, 1))
        term_l = jnp.zeros((B, nx), dtype)
        dx0 = jnp.zeros((B, nx), dtype)

        def scalarized(fn):
            """Wrap fn to reduce every output leaf to one scalar ON DEVICE:
            the host fence then fetches 4 bytes instead of multi-MB arrays
            over the TPU tunnel (the round-3 'condense=1244ms' artifact was
            a 106 MB cs.A fetch, not compute)."""
            def wrapped(*a):
                o = fn(*a)
                tot = jnp.zeros((), jnp.float32)
                for leaf in jax.tree_util.tree_leaves(o):
                    if hasattr(leaf, "dtype") and jnp.issubdtype(
                            leaf.dtype, jnp.floating):
                        tot = tot + jnp.sum(leaf).astype(jnp.float32)
                return tot
            return jax.jit(wrapped)

        def timeit(name, fn, *a, keep=None, iters=10):
            """Time fn's scalarized twin over `iters` PIPELINED dispatches
            fenced once: the tunneled axon platform has a ~29 ms fenced
            round trip and ~20 ms per dispatch even pipelined, so
            single-dispatch timings are overhead, not compute (measured
            round 4 via a trivial jitted reduction). Return keep(*a)
            (un-timed) when downstream phases need the real output."""
            sfn = scalarized(fn)
            np.asarray(sfn(*a))  # compile + warm
            ts = []
            for _ in range(2):
                t0 = time.perf_counter()
                outs = [sfn(*a) for _ in range(iters)]
                np.asarray(outs[-1])
                for o in outs[:-1]:
                    np.asarray(o)
                ts.append((time.perf_counter() - t0) / iters)
            results.setdefault(f"B{B}", {})[name] = round(min(ts) * 1e3, 2)
            print(f"B={B} {name:12s} {min(ts)*1e3:8.2f} ms", flush=True)
            if keep is not None:
                return keep(*a)

        lin = timeit("linearize", lin1, sol_b, 0.05, q_b, v_b, sched,
                     keep=lin1)
        cs = timeit("condense", cond1, lin, keep=cond1)
        timeit("riccati", ric1, cs, lin.sw_mask, term_H, term_l, dx0)
        timeit("update_full", full, sol_b, 0.05, q_b, v_b, sched)

    if out:
        with open(out, "w") as f:
            json.dump({"per_phase_ms": results,
                       "note": "min-of-3, device fenced via host fetch "
                               "(block_until_ready no-ops on axon)"}, f,
                      indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
