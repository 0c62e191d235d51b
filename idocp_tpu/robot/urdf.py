"""URDF loader: parse a URDF file into a RobotModel pytree.

Offline, pure-Python (xml.etree) — runs once at model-build time, outside
jit. Covers the URDF subset the reference consumes through Pinocchio's
buildModel (idocp `robot/robot.hpp` ctor; SURVEY.md L1): links with inertial
data, revolute/continuous/prismatic/fixed joints, an optional floating root,
joint limits. Fixed joints are fused into their parent (their subtree inertia
is composed in, and a named frame is kept for each fused link).
"""
from __future__ import annotations

import xml.etree.ElementTree as ET

import numpy as np

from .model import FREE, PRISMATIC, REVOLUTE, ModelBuilder, RobotModel, rpy_matrix


def _parse_origin(el):
    if el is None:
        return np.zeros(3), np.eye(3)
    xyz = np.fromstring(el.get("xyz", "0 0 0"), sep=" ")
    rpy = np.fromstring(el.get("rpy", "0 0 0"), sep=" ")
    return xyz, rpy_matrix(*rpy)


def _parse_inertial(link_el):
    el = link_el.find("inertial")
    if el is None:
        return 0.0, np.zeros(3), np.zeros((3, 3)), np.eye(3)
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
    return mass, pos, I, rot


def _compose_inertia(m1, c1, I1, m2, c2, I2):
    """Merge two (mass, com, inertia-about-com) triples in a common frame."""
    m = m1 + m2
    if m == 0.0:
        return 0.0, np.zeros(3), np.zeros((3, 3))
    c = (m1 * c1 + m2 * c2) / m

    def shift(mi, ci, Ii):
        d = ci - c
        return Ii + mi * (np.dot(d, d) * np.eye(3) - np.outer(d, d))

    return m, c, shift(m1, c1, I1) + shift(m2, c2, I2)


def load_urdf(path_or_string: str, floating_base: bool = False,
              dtype=None) -> RobotModel:
    """Build a RobotModel from a URDF file path or XML string."""
    import jax.numpy as jnp
    dtype = dtype or jnp.float64
    if path_or_string.lstrip().startswith("<"):
        root = ET.fromstring(path_or_string)
    else:
        root = ET.parse(path_or_string).getroot()

    links = {l.get("name"): l for l in root.findall("link")}
    joints = list(root.findall("joint"))
    child_of = {}  # link name -> joint el
    parent_of = {}
    for j in joints:
        child = j.find("child").get("link")
        parent = j.find("parent").get("link")
        child_of[child] = j
        parent_of[child] = parent
    root_links = [n for n in links if n not in parent_of]
    if len(root_links) != 1:
        raise ValueError(f"expected one root link, got {root_links}")
    root_link = root_links[0]

    b = ModelBuilder(root.get("name", "urdf_robot"))

    # body bookkeeping: link name -> (body index, pos, rot of link frame in
    # that body's frame). Fixed joints fuse into the parent body.
    link_body = {}

    def add_link_subtree(link_name, parent_body, pos, rot, pending_joint):
        """pending_joint: the movable joint element whose child is this link
        (None for the root link)."""
        link_el = links[link_name]
        mass, com, I, irot = _parse_inertial(link_el)
        com_b = pos + rot @ com
        I_b = (rot @ irot) @ I @ (rot @ irot).T

        if pending_joint is None and parent_body == -1:
            # root link: floating base or world-fixed base
            if floating_base:
                body = b.add_body(
                    name="root_joint", parent=-1, joint_type=FREE,
                    mass=mass, com=com_b, inertia=I_b)
            else:
                body = -1  # world-welded; drop inertia (immobile)
        else:
            jt = pending_joint.get("type")
            jpos, jrot_ = pos, rot
            axis_el = pending_joint.find("axis")
            axis = (np.fromstring(axis_el.get("xyz"), sep=" ")
                    if axis_el is not None else np.array([1.0, 0, 0]))
            limit = pending_joint.find("limit")
            lo = float(limit.get("lower", "-inf")) if limit is not None else -np.inf
            hi = float(limit.get("upper", "inf")) if limit is not None else np.inf
            vel = float(limit.get("velocity", "inf")) if limit is not None else np.inf
            eff = float(limit.get("effort", "inf")) if limit is not None else np.inf
            if jt == "continuous":
                lo, hi = -np.inf, np.inf
            jtype = REVOLUTE if jt in ("revolute", "continuous") else PRISMATIC
            body = b.add_body(
                name=pending_joint.get("name"), parent=parent_body,
                joint_type=jtype, placement_pos=jpos,
                placement_rpy=(0, 0, 0), axis=axis, mass=mass, com=com,
                inertia=I, q_limits=(lo, hi), v_limit=vel, u_limit=eff)
            # placement rotation set directly (rpy arg bypassed):
            b._joints[body]["placement_rot"] = jrot_
            b._joints[body]["axis"] = axis
            pos, rot = np.zeros(3), np.eye(3)  # link frame == body frame

        link_body[link_name] = (body, pos, rot)
        if body >= 0 and pending_joint is None and floating_base:
            pass
        b.add_frame(link_name, body=max(body, 0) if body >= 0 else 0,
                    pos=pos) if False else None

        # recurse into children
        for j in joints:
            if j.find("parent").get("link") != link_name:
                continue
            cname = j.find("child").get("link")
            opos, orot = _parse_origin(j.find("origin"))
            if j.get("type") == "fixed":
                # fuse: child link frame placement within current body
                cpos = pos + rot @ opos
                crot = rot @ _parse_origin(j.find("origin"))[1]
                # compose child's inertia into this body
                cmass, ccom, cI, cirot = _parse_inertial(links[cname])
                if body >= 0 and cmass > 0:
                    ccom_b = cpos + crot @ ccom
                    cI_b = (crot @ cirot) @ cI @ (crot @ cirot).T
                    jd = b._joints[body]
                    m, c, Im = _compose_inertia(
                        jd["mass"], jd["com"], jd["inertia"],
                        cmass, ccom_b, cI_b)
                    jd["mass"], jd["com"], jd["inertia"] = m, c, Im
                link_body[cname] = (body, cpos, crot)
                b.add_frame(cname, body=max(body, 0), pos=cpos)
                # recurse with same body
                _recurse_fixed(cname, body, cpos, crot)
            else:
                add_link_subtree(cname, body, pos + rot @ opos, rot @ orot, j)

    def _recurse_fixed(link_name, body, pos, rot):
        for j in joints:
            if j.find("parent").get("link") != link_name:
                continue
            cname = j.find("child").get("link")
            opos, orot = _parse_origin(j.find("origin"))
            if j.get("type") == "fixed":
                cpos = pos + rot @ opos
                crot = rot @ orot
                cmass, ccom, cI, cirot = _parse_inertial(links[cname])
                if body >= 0 and cmass > 0:
                    ccom_b = cpos + crot @ ccom
                    cI_b = (crot @ cirot) @ cI @ (crot @ cirot).T
                    jd = b._joints[body]
                    m, c, Im = _compose_inertia(
                        jd["mass"], jd["com"], jd["inertia"],
                        cmass, ccom_b, cI_b)
                    jd["mass"], jd["com"], jd["inertia"] = m, c, Im
                link_body[cname] = (body, cpos, crot)
                b.add_frame(cname, body=max(body, 0), pos=cpos)
                _recurse_fixed(cname, body, cpos, crot)
            else:
                add_link_subtree(cname, body, pos + rot @ opos, rot @ orot, j)

    add_link_subtree(root_link, -1, np.zeros(3), np.eye(3), None)
    return b.build(dtype=dtype)
