"""Collision conservatism vs the reference's actual collision hulls.

SURVEY §7 / VERDICT r1 #5: the reference's check is triangle-exact
(vtkCollisionDetectionFilter, Mamri/Mamri.py:1555-1575). Our voxel check
samples part surfaces at finite density, so it must err COLLIDING, never
free. Oracle: the same STL hulls densified to sub-voxel triangle point
clouds, FK-placed, tested against the UNdilated body voxels — any oracle
contact that our (dilated-occupancy, 1024-point) checker calls free is a
safety failure. Uses the reference asset pack read-only; skipped when absent.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mamri_tpu.core.robot import load_robot_model, fk_all_links
from mamri_tpu.planning.collision import build_collision_world, config_collides
from mamri_tpu.planning.geometry import PARTS_TO_CHECK, build_arm_geometry
from mamri_tpu.utils.stl import load_stl

REF_MESH_DIR = "/root/reference/Mamri/Resources/Robot"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_MESH_DIR), reason="reference asset pack not present"
)

N_CONFIGS = 1000
SPACING = 2.0  # mm


def _densify(tris: np.ndarray, max_edge: float) -> np.ndarray:
    """Subdivide triangles into a barycentric point grid with spacing <=
    max_edge — includes vertices and edges, so thin features are covered."""
    out = []
    for tri in tris:
        a, b, c = tri
        n = int(np.ceil(max(np.linalg.norm(b - a), np.linalg.norm(c - a), np.linalg.norm(c - b)) / max_edge))
        n = max(n, 1)
        for i in range(n + 1):
            for j in range(n + 1 - i):
                u, v = i / n, j / n
                out.append(a + u * (b - a) + v * (c - a))
    return np.asarray(out, dtype=np.float32)


@pytest.fixture(scope="module")
def setup():
    model = load_robot_model()
    geometry = build_arm_geometry(model, mesh_dir=REF_MESH_DIR)

    # dense oracle clouds from the same hulls (visual fallback for Joint4,
    # exactly like the reference's missing Elbow1_collision.STL handling)
    dense = []
    for name in PARTS_TO_CHECK:
        spec = model.spec(name)
        for mesh_name in (spec.collision_mesh, spec.visual_mesh):
            path = os.path.join(REF_MESH_DIR, mesh_name or "")
            if mesh_name and os.path.exists(path):
                tris = load_stl(path)
                dense.append(_densify(tris, SPACING * 0.5))
                break
        else:
            raise AssertionError(f"no mesh for {name}")

    # body: ellipsoid phantom in front of the arm, at a distance where the
    # random configs split into colliding and free subsets
    base = np.eye(4, dtype=np.float32)
    shape = (96, 96, 96)
    spacing = np.full(3, SPACING, dtype=np.float32)
    origin = np.array([-96.0, -96.0, 40.0], dtype=np.float32)  # LPS
    gi, gj, gk = np.mgrid[: shape[0], : shape[1], : shape[2]]
    lx = origin[0] + SPACING * gi
    ly = origin[1] + SPACING * gj
    lz = origin[2] + SPACING * gk
    center_lps = np.array([-90.0, 0.0, 170.0])
    mask = (
        ((lx - center_lps[0]) / 45.0) ** 2
        + ((ly - center_lps[1]) / 45.0) ** 2
        + ((lz - center_lps[2]) / 60.0) ** 2
    ) < 1.0
    world = build_collision_world(jnp.asarray(mask), spacing, origin)
    return model, geometry, dense, mask, spacing, origin, base, world


def _oracle_collides(model, dense, mask, spacing, origin, base, angles) -> bool:
    tfs = np.asarray(fk_all_links(model, jnp.asarray(angles), jnp.asarray(base)))
    idx_map = [model.link_index(nm) for nm in PARTS_TO_CHECK]
    shape = np.asarray(mask.shape)
    for cloud, li in zip(dense, idx_map):
        tf = tfs[li]
        world_ras = cloud @ tf[:3, :3].T + tf[:3, 3]
        lps = world_ras * np.array([-1.0, -1.0, 1.0])
        vox = np.round((lps - origin) / spacing).astype(np.int64)
        ok = np.all((vox >= 0) & (vox < shape), axis=1)
        if ok.any() and mask[vox[ok, 0], vox[ok, 1], vox[ok, 2]].any():
            return True
    return False


def test_no_false_free_over_random_configs(setup):
    model, geometry, dense, mask, spacing, origin, base, world = setup
    lo = np.asarray(model.limits_rad[:, 0]) * 0.9
    hi = np.asarray(model.limits_rad[:, 1]) * 0.9
    rng = np.random.default_rng(123)
    configs = rng.uniform(lo, hi, size=(N_CONFIGS, 6)).astype(np.float32)

    check = jax.jit(
        jax.vmap(
            lambda a: config_collides(
                model, geometry.part_points, geometry.part_link_idx, a, jnp.asarray(base), world
            )
        )
    )
    ours = np.asarray(check(jnp.asarray(configs)))

    # the scene must actually exercise both outcomes
    assert ours.any() and (~ours).any(), f"degenerate scene: {ours.sum()}/{N_CONFIGS} collide"

    # safety direction: every config we call FREE must be free per the
    # triangle-dense oracle on the undilated body
    false_free = []
    for cfg, mine in zip(configs, ours):
        if not mine and _oracle_collides(model, dense, mask, spacing, origin, base, cfg):
            false_free.append(cfg)
    assert not false_free, (
        f"{len(false_free)} configs classified free but colliding per the "
        f"triangle-dense oracle; first: {np.degrees(false_free[0]).round(1)}"
    )


def test_conservatism_is_bounded(setup):
    """Over-conservatism check: configs whose hulls stay >2 dilation shells
    clear of the body must be classified free."""
    model, geometry, dense, mask, spacing, origin, base, world = setup
    lo = np.asarray(model.limits_rad[:, 0]) * 0.9
    hi = np.asarray(model.limits_rad[:, 1]) * 0.9
    rng = np.random.default_rng(7)
    configs = rng.uniform(lo, hi, size=(200, 6)).astype(np.float32)

    # oracle against a GROWN body (margin = dilation + 1 voxel): anything
    # clear of even the grown body must be free in our checker
    from scipy import ndimage

    grow = world.dilation_vox + 1
    # match the engine's 26-neighborhood (L-inf) dilation metric
    grown = ndimage.binary_dilation(mask, structure=np.ones((3, 3, 3), bool), iterations=grow)

    check = jax.jit(
        jax.vmap(
            lambda a: config_collides(
                model, geometry.part_points, geometry.part_link_idx, a, jnp.asarray(base), world
            )
        )
    )
    ours = np.asarray(check(jnp.asarray(configs)))
    over = 0
    for cfg, mine in zip(configs, ours):
        if mine and not _oracle_collides(model, dense, grown, spacing, origin, base, cfg):
            over += 1
    assert over == 0, f"{over}/200 configs flagged colliding while > {grow} voxels clear"
