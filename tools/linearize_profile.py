"""Fine-grained runtime attribution INSIDE the stage linearization
(the dominant update phase). Times each sub-computation as its own jitted
program vmapped over batch*stages instances, fenced on a device-reduced
scalar. Usage: python tools/linearize_profile.py [flat_batch]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/idocp_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from idocp_tpu.models import anymal
    from idocp_tpu.ocp import stage as stage_mod
    from idocp_tpu.ocp.state_equation import (
        factors_from_mj as contact_factors_from_mj,
        mass_and_contact_jacobian_fk)
    from idocp_tpu.robot import model as model_mod
    from idocp_tpu.robot import spatial
    from idocp_tpu.robot.contact import ContactModel

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 5120
    dtype = jnp.float32
    m = anymal.make_model_urdf(dtype=dtype)
    foot_ids = tuple(m.frame_id(n) for n in anymal.FOOT_FRAMES)
    cm = ContactModel(frame_ids=foot_ids, kp=25.0, kd=10.0)
    q0 = anymal.standing_configuration(m, dtype=dtype)
    nv, nf, nu = m.nv, cm.max_dimf, m.nu

    key = jax.random.PRNGKey(0)
    dq = 0.05 * jax.random.normal(key, (B, nv), dtype)
    q = jax.vmap(lambda d: model_mod.integrate(m, q0, d))(dq)
    v = 0.1 * jax.random.normal(jax.random.fold_in(key, 1), (B, nv), dtype)
    a = 0.1 * jax.random.normal(jax.random.fold_in(key, 2), (B, nv), dtype)
    f = 10.0 * jax.random.normal(jax.random.fold_in(key, 3), (B, nf), dtype)
    u = 1.0 * jax.random.normal(jax.random.fold_in(key, 4), (B, nu), dtype)
    qn = jax.vmap(lambda qq, vv: model_mod.integrate(m, qq, 0.02 * vv))(q, v)
    vn = v
    ca = jnp.ones((B, cm.nc), bool)
    p_ref = jnp.zeros((B, cm.nc, 3), dtype)
    sw_pos = jnp.zeros((B, cm.nc, 3), dtype)
    sw_c = jnp.zeros((B, cm.nc), bool)
    im = jnp.zeros((B,), bool)
    ic = jnp.zeros((B, cm.nc), bool)

    results = {}

    def timeit(name, fn, *args, iters=10):
        """Amortized over pipelined dispatches — the tunneled platform has
        ~20-29 ms fixed per-dispatch overhead (see runtime_profile)."""
        jfn = jax.jit(lambda *aa: sum(
            jnp.sum(l).astype(jnp.float32)
            for l in jax.tree_util.tree_leaves(fn(*aa))
            if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)))
        np.asarray(jfn(*args))
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            outs = [jfn(*args) for _ in range(iters)]
            for o in outs:
                np.asarray(o)
            ts.append((time.perf_counter() - t0) / iters)
        results[name] = round(min(ts) * 1e3, 2)
        print(f"{name:28s} {min(ts)*1e3:8.2f} ms", flush=True)

    timeit("fk", jax.vmap(lambda qq: spatial.fk(m, qq)), q)

    def motion_full(qq, vv, aa):
        fkb = spatial.fk(m, qq)
        return spatial.motion(m, fkb, vv, aa)
    timeit("fk+motion_derivs", jax.vmap(motion_full), q, v, a)

    def rnea_full(qq, vv, aa, ff):
        fkb = spatial.fk(m, qq)
        p_f, fb = spatial.frame_points(m, fkb, cm.frame_ids)
        J = spatial.point_jacobians(m, fkb, p_f, fb)
        fm = ff.reshape(cm.nc, 3)
        fext = spatial.contact_forces_to_body(m, p_f, fb, fm, m.nbodies)
        dfext = spatial.contact_forces_dq(m, J, fb, fm, m.nbodies)
        mo = spatial.motion(m, fkb, vv, aa)
        tau, _, F = spatial.rnea(m, fkb, mo, fext)
        dtq, dtv = spatial.rnea_derivatives(m, fkb, mo, F, dfext)
        dvq, dvv_, daq, dav = spatial.point_pva_derivatives(fkb, mo, p_f,
                                                            fb, J)
        return tau, dtq, dtv, dvq, daq
    timeit("dyn_derivs_bundle", jax.vmap(rnea_full), q, v, a, f)

    def mcj(qq):
        fkb = spatial.fk(m, qq)
        return mass_and_contact_jacobian_fk(m, cm, fkb)
    timeit("mass+J+chol", jax.vmap(mcj), q)

    def factors(qq, act):
        fkb = spatial.fk(m, qq)
        mj = mass_and_contact_jacobian_fk(m, cm, fkb)
        return contact_factors_from_mj(*mj, act)
    timeit("contact_factors", jax.vmap(factors), q, ca)

    def state_sw(qq, vv, aa, qnn, vnn, swc, swp):
        return stage_mod._state_eq_switching_blocks(
            m, cm, 0.025, qq, vv, aa, qnn, vnn, swc, swp)
    timeit("state_eq+switching", jax.vmap(state_sw), q, v, a, qn, vn,
           sw_c, sw_pos)

    def imp(qq, vv, mk, ick):
        fkb = spatial.fk(m, qq)
        mj = mass_and_contact_jacobian_fk(m, cm, fkb)
        return stage_mod._impulse_quantities(m, cm, qq, vv, mk, ick, mj,
                                             fkb)
    # impulse slots: B/5 instances (the solver gathers ~4 of 20 stages)
    Bi = max(B // 5, 1)
    timeit("impulse_quants(B/5)", jax.vmap(imp), q[:Bi],
           v[:Bi], im[:Bi].astype(dtype), ic[:Bi])

    from idocp_tpu.constraints.components import (
        FrictionCone, JointTorquesLowerLimit, JointTorquesUpperLimit)
    from idocp_tpu.cost.base import EvalContext
    from idocp_tpu.cost.components import ConfigurationSpaceCost
    from idocp_tpu.solver.options import SolverOptions
    from idocp_tpu.constraints import pdipm

    cost = [ConfigurationSpaceCost(
        q_weight=jnp.ones(nv, dtype), v_weight=jnp.ones(nv, dtype),
        a_weight=1e-3 * jnp.ones(nv, dtype),
        u_weight=1e-2 * jnp.ones(nu, dtype),
        qf_weight=jnp.ones(nv, dtype), vf_weight=jnp.ones(nv, dtype),
        q_ref=q0)]
    cons = [JointTorquesLowerLimit(m), JointTorquesUpperLimit(m),
            FrictionCone(m, nc=4, mu=0.7)]
    options = SolverOptions(barrier=1e-3)
    ctx = EvalContext(model=m, contact_model=cm)
    slack = {c.name: 0.1 * jnp.ones((B, c.dim), dtype) for c in cons}
    dual = {c.name: 0.1 * jnp.ones((B, c.dim), dtype) for c in cons}

    def full_stage(qq, vv, aa, ff, uu, qnn, vnn, sl, dl, cca, cp, imm,
                   icc, swc, swp):
        return stage_mod.linearize_contact_stage(
            m, cm, cost, cons, options, 0.0, 0.025, qq, vv, aa, ff, uu,
            qnn, vnn, sl, dl, cca, cp, imm, icc, swc, swp, ctx)
    timeit("linearize_stage_full", jax.vmap(full_stage), q, v, a, f, u,
           qn, vn, slack, dual, ca, p_ref, im, ic, sw_c, sw_pos)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
