"""Self-contained demo scene: the full workflow with zero input data.

The reference needs a real MR scan in the Slicer scene before any button
works; for evaluation, CI, and first contact this module builds the
canonical synthetic scene instead — the robot upright on the bed (mount
convention: local +Z along world +Y), petroleum-jelly-style fiducial
spheres rendered at the FK marker positions of a known pose, and an
ellipsoid body phantom. The same scene (and pose) backs `__graft_entry__`
and the bench's scene 0, so `python -m mamri_tpu demo` exercises exactly
the measured path.
"""

from __future__ import annotations

import numpy as np

DEMO_ANGLES = (0.3, -0.7, 0.5, 0.2, -0.4, 0.6)
DEMO_BODY_CENTER_RAS = (-60.0, -40.0, 130.0)
DEMO_BODY_RADII_MM = (45.0, 55.0, 65.0)


def build_demo_scene(engine, spacing: float = 3.0, angles=None, yaw: float = 0.15):
    """-> (volume, true_angles, base_tf, target_ras).

    `spacing` trades fidelity for speed (3 mm default; larger for smoke
    runs). The grid is auto-fit to the FK marker bounding box + body
    phantom, so markers always render inside the volume. `target_ras` is a
    biopsy-style point inside the body phantom for entry-search/planning
    demos."""
    import jax.numpy as jnp

    from mamri_tpu.core import transforms as T
    from mamri_tpu.core.robot import marker_world_positions
    from mamri_tpu.perception.volume import synthetic_volume

    true_angles = np.asarray(
        DEMO_ANGLES if angles is None else angles, dtype=np.float32
    )
    base = np.asarray(
        T.translate(jnp.array([-60.0, -120.0, 0.0]))
        @ T.rot_x(jnp.float32(-np.pi / 2))
        @ T.rot_z(jnp.float32(yaw))
    )
    links = ["Baseplate", "Joint2", "Joint4", "Joint6"]
    pts = np.concatenate(
        [
            np.asarray(
                marker_world_positions(engine.model, jnp.asarray(true_angles), ln, jnp.asarray(base))
            )
            for ln in links
        ]
    )
    body_center = np.asarray(DEMO_BODY_CENTER_RAS)
    lo = np.minimum(pts.min(0) - 40, body_center - 70)
    hi = np.maximum(pts.max(0) + 40, body_center + 70)
    lps_lo = np.array([-hi[0], -hi[1], lo[2]], dtype=np.float32)
    lps_hi = np.array([-lo[0], -lo[1], hi[2]], dtype=np.float32)
    sp = np.array([spacing] * 3, dtype=np.float32)
    shape = tuple(int(np.ceil(e)) for e in (lps_hi - lps_lo) / sp)
    volume = synthetic_volume(
        shape=shape,
        spacing=sp,
        origin=lps_lo,
        fiducials_ras=pts,
        fiducial_radius_mm=5.0,
        body_center_ras=list(body_center),
        body_radii_mm=list(DEMO_BODY_RADII_MM),
    )
    target_ras = (body_center + np.array([0.0, 0.0, -15.0])).astype(np.float32)
    return volume, true_angles, base, target_ras
