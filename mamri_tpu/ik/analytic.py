"""Closed-form IK seeding for the MAMRI 6R chain.

The reference solves full-chain IK purely numerically (scipy TRF from two
guesses, Mamri/Mamri.py:1425-1433) and silently depends on which basin the
local optimizer enters. The chain's geometry admits a classical closed-form
decomposition, which this module exploits to seed the on-device LM polisher
with ALL eight IK branches at once:

  * the detected Joint6 L-shape triplet fixes the Joint6 frame (Kabsch);
  * the wrist center is a fixed offset along that frame's z axis
    (J6 = J5 . Tz(d6) . Rz(a6), so z5 == z6);
  * Joint1 is the azimuth of the wrist center (2 branches);
  * Joint2/Joint3 are a planar 2R problem in the Joint1 plane (elbow up/down);
  * Joint4/5/6 are a ZYZ Euler decomposition of the residual rotation
    (2 wrist branches).

Axis conventions are the reference's (IS -> RotZ(theta), PA -> RotY(-theta),
Mamri/Mamri.py:1760-1769); link offsets are read from the model so the math
tracks the config file. Everything is jit/vmap-compatible: 8 seeds come out
as a static (8, 6) array; degenerate poses (wrist on the shoulder axis,
unreachable radii) produce NaN-free garbage seeds that the LM polish + cost
scoring simply ignores.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from mamri_tpu.core import transforms
from mamri_tpu.core.robot import RobotModel
from mamri_tpu.registration.kabsch import kabsch_rigid_transform

_IS_PA_PATTERN = (1, 2, 2, 1, 2, 1)  # AXIS_IS, AXIS_PA codes of Joint1..Joint6


def chain_is_analytic(model: RobotModel) -> bool:
    """True iff the articulated chain matches the IS-PA-PA-IS-PA-IS pattern
    with pure z offsets (the MAMRI geometry)."""
    arts = model.articulated_links
    if len(arts) != 6:
        return False
    codes = tuple(model.specs[i].axis_code for i in arts)
    if codes != _IS_PA_PATTERN:
        return False
    for i in arts:
        off = model.specs[i].offset_mm
        if abs(off[0]) > 1e-6 or abs(off[1]) > 1e-6:
            return False
    return True


def joint6_frame_from_markers(model: RobotModel, joint6_targets, apply_correction):
    """World pose of the Joint6 link frame implied by its detected triplet."""
    idx6 = model.link_index("Joint6")
    local = model.marker_local[idx6]
    local = jnp.where(
        jnp.asarray(apply_correction), local * jnp.asarray([-1.0, -1.0, 1.0]), local
    )
    return kabsch_rigid_transform(local, jnp.asarray(joint6_targets))


def _rigid_inverse(tf):
    r = tf[:3, :3]
    t = tf[:3, 3]
    inv = jnp.eye(4, dtype=tf.dtype)
    inv = inv.at[:3, :3].set(r.T)
    inv = inv.at[:3, 3].set(-jnp.matmul(r.T, t, precision=transforms._HIGHEST))
    return inv


def analytic_ik_seeds(model: RobotModel, joint6_frame_world, base_tf):
    """(8, 6) closed-form joint-angle candidates reaching the given Joint6
    world frame: {2 shoulder azimuths} x {elbow up/down} x {2 wrist flips}.

    Exact when the frame is exactly reachable; near-exact under marker noise.
    Unreachable targets yield clamped-acos solutions that land near the best
    reachable pose — still useful LM seeds.
    """
    arts = model.articulated_links
    dz = [model.fixed_offsets[i][2, 3] for i in arts]  # z offsets of J1..J6
    shoulder_z = dz[0] + dz[1]  # J2 origin height above base
    l_upper = dz[2] + dz[3]  # J2 -> J4 (elbow); J4 offset is 0 in the config
    l_fore = dz[4]  # J4 -> J5 (wrist center)
    d6 = dz[5]  # J5 -> J6

    m = transforms.matmul(_rigid_inverse(jnp.asarray(base_tf)), jnp.asarray(joint6_frame_world))
    p6 = m[:3, 3]
    r6 = m[:3, :3]
    p5 = p6 - d6 * r6[:, 2]  # wrist center: z5 == z6 (Rz articulation)

    v = p5 - jnp.asarray([0.0, 0.0, 1.0], dtype=p5.dtype) * shoulder_z
    a1_base = jnp.arctan2(v[1], v[0])

    seeds = []
    for a1_flip in (0.0, np.pi):
        a1 = jnp.arctan2(jnp.sin(a1_base + a1_flip), jnp.cos(a1_base + a1_flip))
        ca, sa = jnp.cos(a1), jnp.sin(a1)
        r = ca * v[0] + sa * v[1]  # signed in-plane radius
        h = v[2]
        # planar 2R (measured from vertical): r = L1 sin(t1) + L2 sin(t1+t2),
        # h = L1 cos(t1) + L2 cos(t1+t2), with t1 = -a2, t2 = -a3
        c2 = (r * r + h * h - l_upper**2 - l_fore**2) / (2.0 * l_upper * l_fore)
        c2 = jnp.clip(c2, -1.0, 1.0)
        for elbow in (1.0, -1.0):
            t2 = elbow * jnp.arccos(c2)
            t1 = jnp.arctan2(r, h) - jnp.arctan2(
                l_fore * jnp.sin(t2), l_upper + l_fore * jnp.cos(t2)
            )
            a2 = -t1
            a3 = -t2
            # residual wrist rotation: Rz(a4) Ry(-a5) Rz(a6)
            r_arm = jnp.matmul(
                _rotz(a1), _roty(-(a2 + a3)), precision=transforms._HIGHEST
            )
            rw = jnp.matmul(r_arm.T, r6, precision=transforms._HIGHEST)
            cphi = jnp.clip(rw[2, 2], -1.0, 1.0)
            phi0 = jnp.arccos(cphi)
            for wrist in (1.0, -1.0):
                phi = wrist * phi0
                sphi = jnp.sin(phi)
                # guard the sin(phi)=0 singularity: fall back to a4=0 split
                safe = jnp.abs(sphi) > 1e-6
                a4 = jnp.where(safe, jnp.arctan2(rw[1, 2] * wrist, rw[0, 2] * wrist), 0.0)
                a6 = jnp.where(
                    safe,
                    jnp.arctan2(rw[2, 1] * wrist, -rw[2, 0] * wrist),
                    jnp.arctan2(-rw[0, 1], rw[0, 0]),
                )
                a5 = -phi
                seeds.append(jnp.stack([a1, a2, a3, a4, a5, a6]))
    return jnp.stack(seeds)


def _rotz(a):
    c, s = jnp.cos(a), jnp.sin(a)
    z = jnp.zeros_like(c)
    o = jnp.ones_like(c)
    return jnp.stack([
        jnp.stack([c, -s, z]),
        jnp.stack([s, c, z]),
        jnp.stack([z, z, o]),
    ])


def _roty(a):
    c, s = jnp.cos(a), jnp.sin(a)
    z = jnp.zeros_like(c)
    o = jnp.ones_like(c)
    return jnp.stack([
        jnp.stack([c, z, s]),
        jnp.stack([z, o, z]),
        jnp.stack([-s, z, c]),
    ])
