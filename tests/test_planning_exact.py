"""Runtime triangle-exact plan validation (planning/exact.py).

The fast on-device checker is conservative (dilated occupancy + sparse part
sampling, safe direction proven in tests/test_collision_conservative.py);
`MamriEngine.validate_plan_exact` re-checks a FINAL plan with dense hulls
against the undilated body — the reference's vtkCollisionDetectionFilter
fidelity (Mamri/Mamri.py:1555-1575) — and reports over-conservative
rejections.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mamri_tpu.api import MamriEngine
from mamri_tpu.core import transforms as T
from mamri_tpu.core.robot import load_robot_model, marker_world_positions
from mamri_tpu.perception.volume import synthetic_volume
from mamri_tpu.planning.collision import build_collision_world, config_collides
from mamri_tpu.planning.exact import build_exact_parts, validate_path_exact


@pytest.fixture(scope="module")
def model():
    return load_robot_model()


@pytest.fixture(scope="module")
def parts(model):
    return build_exact_parts(model)  # capsule-dense (no mesh pack needed)


def _cube_mask(shape, spacing, origin, center_lps, half):
    gi, gj, gk = np.mgrid[: shape[0], : shape[1], : shape[2]]
    lx = origin[0] + spacing[0] * gi
    ly = origin[1] + spacing[1] * gj
    lz = origin[2] + spacing[2] * gk
    return (
        (np.abs(lx - center_lps[0]) < half)
        & (np.abs(ly - center_lps[1]) < half)
        & (np.abs(lz - center_lps[2]) < half)
    )


def test_exact_validator_hits_and_clears(model, parts):
    """A body cube ON the arm collides; the same cube 500 mm away is free."""
    shape = (64, 64, 64)
    spacing = np.full(3, 3.0, dtype=np.float32)
    origin = np.array([-96.0, -96.0, 100.0], dtype=np.float32)  # LPS
    # RAS (0, 0, 200) = LPS (0, 0, 200): on the zero-pose arm column
    mask = _cube_mask(shape, spacing, origin, (0.0, 0.0, 200.0), 30.0)
    assert mask.any()
    base_hit = np.eye(4, dtype=np.float32)
    base_far = np.asarray(T.translate(jnp.array([500.0, 0.0, 0.0])))
    path = np.zeros((1, 6), dtype=np.float32)

    hit = validate_path_exact(model, parts, mask, spacing, origin, base_hit, path)
    far = validate_path_exact(model, parts, mask, spacing, origin, base_far, path)
    assert not hit["collision_free"] and hit["colliding_samples"] == [0]
    assert far["collision_free"] and far["colliding_samples"] == []
    assert hit["mode"] == "capsule-dense"


def test_exact_never_stricter_than_fast_checker(model, parts):
    """Implication over random configs: every config the FAST (conservative)
    checker calls free must also be exact-free — the exact check only
    removes conservatism, it never adds contacts."""
    from mamri_tpu.planning.geometry import build_arm_geometry

    geometry = build_arm_geometry(model)
    shape = (48, 48, 48)
    spacing = np.full(3, 3.0, dtype=np.float32)
    origin = np.array([-72.0, -72.0, 60.0], dtype=np.float32)
    mask = _cube_mask(shape, spacing, origin, (-60.0, 0.0, 160.0), 40.0)
    world = build_collision_world(jnp.asarray(mask), spacing, origin)
    base = np.eye(4, dtype=np.float32)

    rng = np.random.default_rng(3)
    lo = np.asarray(model.limits_rad[:, 0]) * 0.8
    hi = np.asarray(model.limits_rad[:, 1]) * 0.8
    configs = rng.uniform(lo, hi, size=(24, 6)).astype(np.float32)

    import jax

    fast = np.asarray(
        jax.jit(
            jax.vmap(
                lambda a: config_collides(
                    model, geometry.part_points, geometry.part_link_idx, a, jnp.asarray(base), world
                )
            )
        )(jnp.asarray(configs))
    )
    exact = validate_path_exact(model, parts, mask, spacing, origin, base, configs)
    exact_hits = np.asarray(exact["per_sample"])
    # fast-free => exact-free
    assert not np.any(~fast & exact_hits), np.nonzero(~fast & exact_hits)
    # and the scene exercises both outcomes somewhere
    assert exact_hits.any() or fast.any()


@pytest.fixture(scope="module")
def planned_engine():
    """Small end-to-end scene: estimate -> entry -> plan."""
    eng = MamriEngine()
    base = np.asarray(
        T.translate(jnp.array([-60.0, -120.0, 0.0]))
        @ T.rot_x(jnp.float32(-np.pi / 2))
        @ T.rot_z(jnp.float32(0.15))
    )
    angles = np.array([0.3, -0.7, 0.5, 0.2, -0.4, 0.6], dtype=np.float32)
    links = ("Baseplate", "Joint2", "Joint4", "Joint6")
    pts = np.concatenate(
        [np.asarray(marker_world_positions(eng.model, jnp.asarray(angles), ln, jnp.asarray(base))) for ln in links]
    )
    body_center = np.array([-60.0, -40.0, 130.0])
    lo = np.minimum(pts.min(0) - 40, body_center - 70)
    hi = np.maximum(pts.max(0) + 40, body_center + 70)
    sp = np.full(3, 3.0, dtype=np.float32)
    lps_lo = np.array([-hi[0], -hi[1], lo[2]], dtype=np.float32)
    shape = tuple(int(np.ceil(e)) for e in (np.array([-lo[0], -lo[1], hi[2]]) - lps_lo) / sp)
    vol = synthetic_volume(
        shape=shape, spacing=sp, origin=lps_lo, fiducials_ras=pts, fiducial_radius_mm=4.0,
        body_center_ras=body_center, body_radii_mm=[45.0, 55.0, 65.0],
    )
    est = eng.estimate_pose(vol)
    assert est.success, est.message
    ep = eng.find_entry_point(body_center.astype(np.float32))
    assert bool(ep.found)
    plan = eng.plan_heuristic_path(body_center.astype(np.float32), np.asarray(ep.point_ras), 5.0, start_pose_steps=est.steps)
    assert plan.success, plan.message
    return eng, plan


def test_validate_plan_exact_end_to_end(planned_engine):
    eng, plan = planned_engine
    out = eng.validate_plan_exact(plan)
    assert out["checked_samples"] == len(plan.path)
    assert out["fast_checker_flagged"] == plan.collision_detected
    if not plan.collision_detected:
        # conservatism implication on the real planned path
        assert out["collision_free"], out["colliding_samples"]
        assert out["over_conservative"] is False
    # uses the engine's stored path when no plan is passed
    out2 = eng.validate_plan_exact()
    assert out2["checked_samples"] == out["checked_samples"]


def test_validate_plan_exact_requires_state():
    eng = MamriEngine()
    with pytest.raises(RuntimeError, match="no planned path"):
        eng.validate_plan_exact()
