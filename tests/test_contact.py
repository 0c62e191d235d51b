"""Contact + impulse physics tests (reference: test/robot/, test/impulse/
patterns, SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import numpy as np

from idocp_tpu.ocp.state_equation import impulse_map
from idocp_tpu.robot import dynamics, kinematics
from idocp_tpu.robot import model as model_mod
from idocp_tpu.robot.contact import (ContactModel, ContactStatus,
                                     baumgarte_residual,
                                     contact_velocity_residual)


def _setup(anymal, seed=0):
    m = anymal
    cm = ContactModel(frame_ids=(0, 1, 2, 3), kp=25.0, kd=10.0)
    key = jax.random.PRNGKey(seed)
    q = model_mod.random_configuration(m, key)
    v = jax.random.normal(jax.random.fold_in(key, 1), (m.nv,))
    return m, cm, q, v


def test_impulse_map_constraints(anymal):
    """v+ satisfies J v+ = 0 on impacting rows and M(v+ - v) = J^T Lam."""
    m, cm, q, v = _setup(anymal)
    active = jnp.asarray([True, False, True, False])
    v_plus, lam = impulse_map(m, cm, q, v, active)
    # contact velocity of active frames vanishes
    cs = ContactStatus.make(active)
    cv = contact_velocity_residual(m, cm, cs, q, v_plus)
    np.testing.assert_allclose(np.asarray(cv), 0.0, atol=1e-9)
    # momentum balance
    M = dynamics.mass_matrix(m, q)
    J = dynamics.contact_velocity_jacobian(m, q, cm.frame_ids)
    mask3 = jnp.repeat(active.astype(q.dtype), 3)
    np.testing.assert_allclose(
        np.asarray(M @ (v_plus - v)), np.asarray(J.T @ (mask3 * lam)),
        atol=1e-9)
    # inactive slots carry no impulse
    np.testing.assert_allclose(np.asarray(lam[3:6]), 0.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(lam[9:12]), 0.0, atol=1e-12)


def test_impulse_map_no_contacts_is_identity(anymal):
    m, cm, q, v = _setup(anymal, 1)
    active = jnp.zeros(4, dtype=bool)
    v_plus, lam = impulse_map(m, cm, q, v, active)
    np.testing.assert_allclose(np.asarray(v_plus), np.asarray(v), atol=1e-12)
    np.testing.assert_allclose(np.asarray(lam), 0.0, atol=1e-12)


def test_impulse_dissipates_energy(anymal):
    """Inelastic impact cannot increase kinetic energy."""
    m, cm, q, v = _setup(anymal, 2)
    active = jnp.asarray([True, True, True, True])
    v_plus, _ = impulse_map(m, cm, q, v, active)
    ke_before = float(dynamics.kinetic_energy(m, q, v))
    ke_after = float(dynamics.kinetic_energy(m, q, v_plus))
    assert ke_after <= ke_before + 1e-10


def test_baumgarte_residual_zero_at_rest(anymal):
    """A held contact at the reference position with zero velocity and the
    exactly-compensating acceleration has zero Baumgarte residual."""
    m, cm, q, _ = _setup(anymal, 3)
    v = jnp.zeros(m.nv)
    pos = kinematics.frame_positions(m, q, cm.frame_ids)
    status = ContactStatus.make(jnp.asarray([True] * 4), pos)
    # with v=0 and p=p_ref the residual reduces to the frame acceleration:
    # choose a s.t. frame accelerations vanish -> solve J a = -Jdot v = 0
    a = jnp.zeros(m.nv)
    res = baumgarte_residual(m, cm, status, q, v, a)
    # frame acc at v=0, a=0 is zero
    np.testing.assert_allclose(np.asarray(res), 0.0, atol=1e-10)


def test_schedule_trot_discretization():
    from idocp_tpu.solver.mpc import TrotGait
    feet = np.array([[0.3, 0.2, 0], [-0.3, 0.2, 0],
                     [0.3, -0.2, 0], [-0.3, -0.2, 0]])
    gait = TrotGait(swing_time=0.25, double_support_time=0.05,
                    step_length=0.15, t_start=0.1)
    seq = gait.build_sequence(feet, 0.0, 2.0)
    sched = seq.discretize(0.0, 0.5, 20)
    dt = np.asarray(sched.dt)
    assert dt.shape == (20,)
    assert np.all(dt > 0)
    np.testing.assert_allclose(dt.sum(), 0.5, atol=1e-9)
    imp = np.asarray(sched.imp_mask)
    sw = np.asarray(sched.sw_contact)
    # horizon [0, 0.5] with t_start=0.1: lift at 0.1 (no impulse),
    # touchdown at 0.35 (impulse) -> exactly one impulse stage
    assert imp.sum() == 1
    k = int(np.argmax(imp))
    # boundary snapped to the touchdown time
    np.testing.assert_allclose(
        np.asarray(sched.t_offset)[k], 0.35, atol=1e-9)
    # switching constraint sits on the stage before, on the impacting pair
    assert sw[k - 1].sum() == 2
    # contacts of the swinging pair are open between lift and touchdown
    ca = np.asarray(sched.contact_active)
    lift_k = int(np.searchsorted(np.asarray(sched.t_offset), 0.1))
    assert ca[lift_k:k, 0].sum() == 0 and ca[lift_k:k, 3].sum() == 0
    # full stance holds from the touchdown until the next pair lifts (0.40)
    lift2_k = int(np.searchsorted(np.asarray(sched.t_offset), 0.4 - 1e-9))
    assert ca[k:lift2_k, :].all()
    assert ca[lift2_k:, 1].sum() == 0 and ca[lift2_k:, 2].sum() == 0
    # foothold advanced by the step length for the swung pair
    np.testing.assert_allclose(
        np.asarray(sched.sw_pos)[k - 1, 0, 0], feet[0, 0] + 0.15, atol=1e-9)


def test_native_discretizer_matches_python():
    """The C++ batched discretizer must agree bit-for-bit with the Python
    reference implementation (native/schedule.cpp)."""
    import pytest
    from idocp_tpu.hybrid import native
    from idocp_tpu.solver.mpc import TrotGait
    if not native.native_available():
        pytest.skip("native toolchain unavailable")
    feet = np.array([[0.3, 0.2, 0], [-0.3, 0.2, 0],
                     [0.3, -0.2, 0], [-0.3, -0.2, 0]])
    gait = TrotGait(t_start=0.1)
    seqs = [gait.build_sequence(feet, 0.0, 3.0) for _ in range(5)]
    t0 = np.array([0.0, 0.07, 0.2, 0.55, 1.3])
    sp = native.discretize_batch(seqs, t0, 0.5, 20, force_python=True)
    sn = native.discretize_batch(seqs, t0, 0.5, 20)
    for name in ["dt", "t_offset", "contact_active", "contact_pos",
                 "imp_mask", "imp_contact", "sw_contact", "sw_pos"]:
        a = np.asarray(getattr(sp, name)).astype(float)
        b = np.asarray(getattr(sn, name)).astype(float)
        np.testing.assert_allclose(a, b, atol=1e-12, err_msg=name)


def test_schedule_event_pileup_right_edge():
    """Events crowding the right horizon edge must still yield a monotone
    grid with dt > 0 summing to T (round-1 defect: the forward-only fixup
    could push bounds[N-1] past t0+T). Cross-checked native vs Python."""
    from idocp_tpu.hybrid import native
    from idocp_tpu.hybrid.schedule import ContactSequence

    nc = 4
    feet = np.zeros((nc, 3))
    T, N = 0.5, 10  # dt0 = 0.05, min_dt = 0.005
    # four events within the last half-stage of the horizon
    seq = ContactSequence(nc, [True] * nc, feet)
    alt = [True, False, True, False]
    for i, te in enumerate([0.478, 0.483, 0.488, 0.493]):
        seq.push_back(te, [alt[(i + j) % 2] for j in range(nc)], feet)
    sched = seq.discretize(0.0, T, N)
    dt = np.asarray(sched.dt)
    assert np.all(dt > 0), dt
    np.testing.assert_allclose(dt.sum(), T, atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(sched.t_offset)[0], 0.0, atol=1e-12)
    # same pileup at the LEFT edge
    seq2 = ContactSequence(nc, [True] * nc, feet)
    for i, te in enumerate([0.004, 0.009, 0.014, 0.019]):
        seq2.push_back(te, [alt[(i + j) % 2] for j in range(nc)], feet)
    sched2 = seq2.discretize(0.0, T, N)
    dt2 = np.asarray(sched2.dt)
    assert np.all(dt2 > 0), dt2
    np.testing.assert_allclose(dt2.sum(), T, atol=1e-9)
    if native.native_available():
        for seq_, t0_ in [(seq, 0.0), (seq2, 0.0)]:
            sp = native.discretize_batch([seq_], np.array([t0_]), T, N,
                                         force_python=True)
            sn = native.discretize_batch([seq_], np.array([t0_]), T, N)
            for name in ["dt", "t_offset", "contact_active", "imp_mask",
                         "imp_contact", "sw_contact"]:
                np.testing.assert_allclose(
                    np.asarray(getattr(sp, name)).astype(float),
                    np.asarray(getattr(sn, name)).astype(float),
                    atol=1e-12, err_msg=name)


def test_native_build_failure_warns(tmp_path, caplog, monkeypatch):
    """A failed native build must emit a visible warning (captured make
    stderr) before falling back to Python — never a silent slow path
    (VERDICT r4 weak #7)."""
    import logging

    from idocp_tpu.hybrid import native

    broken = tmp_path / "native"
    broken.mkdir()
    (broken / "Makefile").write_text(
        "all:\n\t@echo 'deliberate build failure' >&2; exit 1\n")
    monkeypatch.setattr(native, "_NATIVE_DIR", str(broken))
    monkeypatch.setattr(native, "_LIB_PATH",
                        str(broken / "libidocp_schedule.so"))
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_load_failed", False)
    with caplog.at_level(logging.WARNING, logger="idocp_tpu.hybrid.native"):
        assert native._load() is None
    assert any("build failed" in r.message and "deliberate build failure"
               in r.message for r in caplog.records)
    # fallback still works end-to-end through discretize_batch
    from idocp_tpu.solver.mpc import TrotGait
    feet = np.array([[0.3, 0.2, 0], [-0.3, 0.2, 0],
                     [0.3, -0.2, 0], [-0.3, -0.2, 0]])
    seqs = [TrotGait(t_start=0.1).build_sequence(feet, 0.0, 1.0)]
    sched = native.discretize_batch(seqs, np.array([0.0]), 0.5, 10)
    assert np.asarray(sched.dt).shape == (1, 10)
