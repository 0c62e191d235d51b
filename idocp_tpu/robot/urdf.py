"""URDF loader: parse a URDF file into a RobotModel pytree.

Offline, pure-Python (xml.etree) — runs once at model-build time, outside
jit. Covers the URDF subset the reference consumes through Pinocchio's
buildModel (idocp `robot/robot.hpp` ctor; SURVEY.md L1):

  * links with inertial data (mass, com origin with rpy, inertia tensor);
  * revolute / continuous / prismatic joints with origin + axis + limits;
  * fixed joints, fused into the parent movable body: the fused link's
    inertia (shifted/rotated into the body frame) is composed in, and a
    named frame is registered at the fused link's frame;
  * optional floating root (free joint), matching Pinocchio's
    JointModelFreeFlyer root convention for ANYmal-class robots.

Every link gets a registered frame, so contact frames can be referenced
by link name (e.g. "LF_FOOT").
"""
from __future__ import annotations

import xml.etree.ElementTree as ET

import numpy as np

from .model import FREE, PRISMATIC, REVOLUTE, ModelBuilder, RobotModel, \
    rpy_matrix


def _parse_origin(el):
    if el is None:
        return np.zeros(3), np.eye(3)
    xyz = np.fromstring(el.get("xyz", "0 0 0"), sep=" ")
    rpy = np.fromstring(el.get("rpy", "0 0 0"), sep=" ")
    return xyz, rpy_matrix(*rpy)


def _parse_inertial(link_el):
    """(mass, com position in link frame, inertia about com in link frame).

    The <inertial><origin> rpy rotates the inertia tensor into the link
    frame: I_link = R I R^T.
    """
    el = link_el.find("inertial")
    if el is None:
        return 0.0, np.zeros(3), np.zeros((3, 3))
    mass = float(el.find("mass").get("value"))
    pos, rot = _parse_origin(el.find("origin"))
    iel = el.find("inertia")
    if iel is None:
        I = np.zeros((3, 3))
    else:
        g = lambda k: float(iel.get(k, "0"))
        I = np.array([
            [g("ixx"), g("ixy"), g("ixz")],
            [g("ixy"), g("iyy"), g("iyz")],
            [g("ixz"), g("iyz"), g("izz")],
        ])
    return mass, pos, rot @ I @ rot.T


def _compose_inertia(m1, c1, I1, m2, c2, I2):
    """Merge two (mass, com, inertia-about-own-com) triples expressed in a
    common frame into one triple about the combined com."""
    m = m1 + m2
    if m == 0.0:
        return 0.0, np.zeros(3), np.zeros((3, 3))
    c = (m1 * c1 + m2 * c2) / m

    def shift(mi, ci, Ii):
        d = ci - c
        return Ii + mi * (np.dot(d, d) * np.eye(3) - np.outer(d, d))

    return m, c, shift(m1, c1, I1) + shift(m2, c2, I2)


def load_urdf(path_or_string: str, floating_base: bool = False,
              root_joint_name: str = "root_joint", dtype=None) -> RobotModel:
    """Build a RobotModel from a URDF file path or XML string.

    floating_base=True roots the tree with a free joint carrying the root
    link's inertia (Pinocchio FreeFlyer convention). floating_base=False
    welds the root link to the world; its inertia is immobile and dropped,
    but frames on it (and on links fused to it by fixed joints) are NOT
    representable and raise if the URDF needs them for a moving chain.
    """
    import jax.numpy as jnp
    dtype = dtype or jnp.float64
    if path_or_string.lstrip().startswith("<"):
        root = ET.fromstring(path_or_string)
    else:
        root = ET.parse(path_or_string).getroot()

    links = {l.get("name"): l for l in root.findall("link")}
    joints = list(root.findall("joint"))
    children_of = {}  # parent link name -> [joint el]
    parent_of = {}
    for j in joints:
        child = j.find("child").get("link")
        parent = j.find("parent").get("link")
        children_of.setdefault(parent, []).append(j)
        parent_of[child] = parent
    root_links = [n for n in links if n not in parent_of]
    if len(root_links) != 1:
        raise ValueError(f"expected one root link, got {root_links}")
    root_link = root_links[0]

    b = ModelBuilder(root.get("name", "urdf_robot"))

    def add_movable(joint_el, parent_body, pos, rot):
        """Add the movable joint `joint_el` whose frame sits at (pos, rot)
        within the parent body; returns the new body index. The child
        link's inertia is attached in the new body frame (== joint frame).
        """
        child_link = joint_el.find("child").get("link")
        mass, com, I = _parse_inertial(links[child_link])
        jt = joint_el.get("type")
        axis_el = joint_el.find("axis")
        axis = (np.fromstring(axis_el.get("xyz"), sep=" ")
                if axis_el is not None else np.array([1.0, 0.0, 0.0]))
        limit = joint_el.find("limit")

        def lim(attr, default):
            if limit is None or limit.get(attr) is None:
                return default
            return float(limit.get(attr))

        lo, hi = lim("lower", -np.inf), lim("upper", np.inf)
        if jt == "continuous":
            lo, hi = -np.inf, np.inf
        jtype = REVOLUTE if jt in ("revolute", "continuous") else PRISMATIC
        body = b.add_body(
            name=joint_el.get("name"), parent=parent_body,
            joint_type=jtype, placement_pos=pos, axis=axis,
            mass=mass, com=com, inertia=I,
            q_limits=(lo, hi), v_limit=lim("velocity", np.inf),
            u_limit=lim("effort", np.inf))
        b._joints[body]["placement_rot"] = rot  # full matrix, not rpy
        return body

    def process_link(link_name, body, pos, rot):
        """Register the link's frame on `body` at (pos, rot) and walk its
        child joints: fixed joints fuse inertia + recurse on the same
        body; movable joints start a new body."""
        if body >= 0:
            b.add_frame(link_name, body=body, pos=pos, rpy=(0, 0, 0))
            b._frames[-1]["rot"] = rot
        for j in children_of.get(link_name, []):
            cname = j.find("child").get("link")
            opos, orot = _parse_origin(j.find("origin"))
            cpos = pos + rot @ opos
            crot = rot @ orot
            if j.get("type") == "fixed":
                cmass, ccom, cI = _parse_inertial(links[cname])
                if body >= 0 and cmass > 0.0:
                    ccom_b = cpos + crot @ ccom
                    cI_b = crot @ cI @ crot.T
                    jd = b._joints[body]
                    jd["mass"], jd["com"], jd["inertia"] = _compose_inertia(
                        jd["mass"], jd["com"], jd["inertia"],
                        cmass, ccom_b, cI_b)
                process_link(cname, body, cpos, crot)
            else:
                nb = add_movable(j, body, cpos, crot)
                process_link(cname, nb, np.zeros(3), np.eye(3))

    mass, com, I = _parse_inertial(links[root_link])
    if floating_base:
        base = b.add_body(name=root_joint_name, parent=-1, joint_type=FREE,
                          mass=mass, com=com, inertia=I)
        process_link(root_link, base, np.zeros(3), np.eye(3))
    else:
        # world-welded root: immobile inertia is dropped (it cannot affect
        # the dynamics); moving children attach directly to the world.
        process_link(root_link, -1, np.zeros(3), np.eye(3))

    return b.build(dtype=dtype)
