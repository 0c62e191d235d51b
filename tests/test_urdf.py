"""URDF loader tests (VERDICT r1 item #6): the loader and the hand-built
ModelBuilder models are two independent construction paths for the same
robot — FK, mass matrix, and RNEA must agree on random configurations.
Also covers fixed-joint fusion (inertia composition + frame registration)
and inertial-origin rotation handling on a hand-checkable 2-link chain.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from idocp_tpu.models import anymal, iiwa14
from idocp_tpu.robot import dynamics, kinematics
from idocp_tpu.robot import model as model_mod
from idocp_tpu.robot.urdf import load_urdf


def _rand_qva(m, key):
    q = model_mod.random_configuration(m, key)
    v = jax.random.normal(jax.random.fold_in(key, 1), (m.nv,))
    a = jax.random.normal(jax.random.fold_in(key, 2), (m.nv,))
    return q, v, a


@pytest.mark.parametrize("name", ["iiwa14", "anymal"])
def test_urdf_matches_handbuilt(name):
    if name == "iiwa14":
        m_hand, m_urdf = iiwa14.make_model(), iiwa14.make_model_urdf()
        frames_hand = [m_hand.frame_id("ee_frame")]
        frames_urdf = [m_urdf.frame_id("ee_frame")]
    else:
        m_hand, m_urdf = anymal.make_model(), anymal.make_model_urdf()
        frames_hand = [m_hand.frame_id(f) for f in anymal.FOOT_FRAMES]
        frames_urdf = [m_urdf.frame_id(f) for f in anymal.FOOT_FRAMES]

    assert m_hand.nq == m_urdf.nq and m_hand.nv == m_urdf.nv
    assert m_hand.nu == m_urdf.nu
    np.testing.assert_allclose(np.asarray(m_urdf.u_limit),
                               np.asarray(m_hand.u_limit))

    for seed in range(3):
        q, v, a = _rand_qva(m_hand, jax.random.PRNGKey(seed))
        # frame positions
        p1 = kinematics.frame_positions(m_hand, q, tuple(frames_hand))
        p2 = kinematics.frame_positions(m_urdf, q, tuple(frames_urdf))
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p2),
                                   atol=1e-12)
        # mass matrix (two independent paths incl. inertia bookkeeping)
        M1 = dynamics.crba(m_hand, q)
        M2 = dynamics.crba(m_urdf, q)
        np.testing.assert_allclose(np.asarray(M1), np.asarray(M2),
                                   atol=1e-10)
        # full inverse dynamics
        t1 = dynamics.rnea(m_hand, q, v, a)
        t2 = dynamics.rnea(m_urdf, q, v, a)
        np.testing.assert_allclose(np.asarray(t1), np.asarray(t2),
                                   atol=1e-10)


_TWO_LINK = """
<robot name="two_link">
  <link name="base"/>
  <joint name="j1" type="revolute">
    <origin xyz="0 0 0.5" rpy="0 0 0"/>
    <parent link="base"/>
    <child link="l1"/>
    <axis xyz="0 1 0"/>
    <limit lower="-1.5" upper="1.5" velocity="2.0" effort="10.0"/>
  </joint>
  <link name="l1">
    <inertial>
      <origin xyz="0 0 -0.25" rpy="0 0 1.5707963267948966"/>
      <mass value="2.0"/>
      <inertia ixx="0.02" ixy="0" ixz="0" iyy="0.04" iyz="0" izz="0.01"/>
    </inertial>
  </link>
  <joint name="fuse" type="fixed">
    <origin xyz="0 0 -0.5" rpy="0 0 0"/>
    <parent link="l1"/>
    <child link="tip"/>
  </joint>
  <link name="tip">
    <inertial>
      <origin xyz="0 0 0" rpy="0 0 0"/>
      <mass value="1.0"/>
      <inertia ixx="0.001" ixy="0" ixz="0" iyy="0.001" iyz="0" izz="0.001"/>
    </inertial>
  </link>
</robot>
"""


def test_fixed_joint_fusion_and_inertial_rotation():
    m = load_urdf(_TWO_LINK)
    assert m.nq == m.nv == 1
    # fused mass
    np.testing.assert_allclose(float(m.mass[0]), 3.0)
    # combined com: (2*(0,0,-0.25) + 1*(0,0,-0.5)) / 3
    np.testing.assert_allclose(np.asarray(m.com[0]), [0, 0, -1.0 / 3.0],
                               atol=1e-12)
    # inertial-origin rotation: Rz(pi/2) swaps ixx <-> iyy for link 1;
    # parallel-axis shifts add m*d^2 to the xx/yy rows
    I = np.asarray(m.inertia[0])
    d1, d2 = -0.25 + 1.0 / 3.0, -0.5 + 1.0 / 3.0
    exp_xx = 0.04 + 2.0 * d1 ** 2 + 0.001 + 1.0 * d2 ** 2
    exp_yy = 0.02 + 2.0 * d1 ** 2 + 0.001 + 1.0 * d2 ** 2
    exp_zz = 0.01 + 0.001
    np.testing.assert_allclose(I[0, 0], exp_xx, atol=1e-12)
    np.testing.assert_allclose(I[1, 1], exp_yy, atol=1e-12)
    np.testing.assert_allclose(I[2, 2], exp_zz, atol=1e-12)
    # fused frame position: j1 at z=0.5, tip 0.5 below the joint
    fid = m.frame_id("tip")
    q = jnp.zeros(1)
    p = kinematics.frame_positions(m, q, (fid,))[0]
    np.testing.assert_allclose(np.asarray(p), [0, 0, 0.0], atol=1e-12)
    # limits picked up
    np.testing.assert_allclose(float(m.u_limit[0]), 10.0)
    np.testing.assert_allclose(float(m.v_limit[0]), 2.0)


def test_floating_base_root_inertia():
    urdf = """
    <robot name="fb">
      <link name="body">
        <inertial>
          <origin xyz="0.1 0 0" rpy="0 0 0"/>
          <mass value="5.0"/>
          <inertia ixx="0.1" ixy="0" ixz="0" iyy="0.2" iyz="0" izz="0.3"/>
        </inertial>
      </link>
    </robot>
    """
    m = load_urdf(urdf, floating_base=True)
    assert m.nq == 7 and m.nv == 6 and m.has_floating_base
    np.testing.assert_allclose(float(m.mass[0]), 5.0)
    np.testing.assert_allclose(np.asarray(m.com[0]), [0.1, 0, 0])
    # free-fall: com acceleration equals gravity (RNEA residual zero for
    # a = g in the base frame at identity orientation)
    q = m.neutral_q()
    v = jnp.zeros(6)
    a = jnp.concatenate([jnp.zeros(3), jnp.asarray([0.0, 0.0, -9.81])])
    tau = dynamics.rnea(m, q, v, a)
    np.testing.assert_allclose(np.asarray(tau), np.zeros(6), atol=1e-10)
