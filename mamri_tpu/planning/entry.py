"""Skin entry-point search on the body surface.

Replaces the reference's VTK pipeline — vtkPolyDataNormals point normals +
vtkStaticPointLocator 80 mm radius query + Python scoring loop
(Mamri/Mamri.py:987-1033) — with a fully on-device masked reduction over the
segmentation's voxel grid:

  surface voxels  = body & ~erode6(body)
  normals         = -grad(box-smoothed occupancy), flipped LPS->RAS
  suitability     = |n_x| - 2*|n_y| > -0.5      (prefer lateral, not A/P)
  candidate mask  = surface & suitable & (dist to target <= 80 mm)
  entry point     = argmin distance among candidates

One jit, no host round-trips, vmappable over targets.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

SEARCH_RADIUS_MM = 80.0
SCORE_THRESHOLD = -0.5


class EntryPointResult(NamedTuple):
    point_ras: jnp.ndarray  # (3,)
    normal_ras: jnp.ndarray  # (3,) outward surface normal at the entry point
    distance_mm: jnp.ndarray  # () distance to target
    found: jnp.ndarray  # () bool


def _erode6(mask):
    m = mask
    for axis in (0, 1, 2):
        for shift in (1, -1):
            m = jnp.logical_and(m, jnp.roll(mask, shift, axis=axis))
    return m


def _box_smooth(x, iters: int = 2):
    for _ in range(iters):
        acc = x
        for axis in (0, 1, 2):
            acc = acc + jnp.roll(x, 1, axis=axis) + jnp.roll(x, -1, axis=axis)
        x = acc / 7.0
    return x


def find_entry_point(
    body_mask,
    spacing,
    origin,
    target_ras,
    search_radius_mm: float = SEARCH_RADIUS_MM,
    score_threshold: float = SCORE_THRESHOLD,
) -> EntryPointResult:
    mask = jnp.asarray(body_mask)
    spacing = jnp.asarray(spacing, dtype=jnp.float32)
    origin = jnp.asarray(origin, dtype=jnp.float32)
    target_ras = jnp.asarray(target_ras, dtype=jnp.float32)
    nx, ny, nz = mask.shape

    occ = mask.astype(jnp.float32)
    smooth = _box_smooth(occ)
    # central-difference gradient (points toward increasing occupancy = inward)
    gx = (jnp.roll(smooth, -1, axis=0) - jnp.roll(smooth, 1, axis=0)) / (2.0 * spacing[0])
    gy = (jnp.roll(smooth, -1, axis=1) - jnp.roll(smooth, 1, axis=1)) / (2.0 * spacing[1])
    gz = (jnp.roll(smooth, -1, axis=2) - jnp.roll(smooth, 1, axis=2)) / (2.0 * spacing[2])
    norm = jnp.sqrt(gx * gx + gy * gy + gz * gz)
    inv = 1.0 / jnp.maximum(norm, 1e-9)
    # outward normal in LPS = -gradient; RAS flips x and y
    n_ras_x = gx * inv  # -(-g) : LPS x flip and outward flip cancel
    n_ras_y = gy * inv
    n_ras_z = -gz * inv

    surface = jnp.logical_and(mask, jnp.logical_not(_erode6(mask)))

    # voxel positions in RAS
    ii = jnp.arange(nx, dtype=jnp.float32)[:, None, None]
    jj = jnp.arange(ny, dtype=jnp.float32)[None, :, None]
    kk = jnp.arange(nz, dtype=jnp.float32)[None, None, :]
    px = -(origin[0] + spacing[0] * ii)
    py = -(origin[1] + spacing[1] * jj)
    pz = origin[2] + spacing[2] * kk
    dx = px - target_ras[0]
    dy = py - target_ras[1]
    dz = pz - target_ras[2]
    dist = jnp.sqrt(dx * dx + dy * dy + dz * dz)

    suitability = jnp.abs(n_ras_x) - 2.0 * jnp.abs(n_ras_y)
    candidate = jnp.logical_and(
        jnp.logical_and(surface, suitability > score_threshold), dist <= search_radius_mm
    )

    masked_dist = jnp.where(candidate, dist, jnp.inf)
    flat_idx = jnp.argmin(masked_dist)
    found = jnp.isfinite(masked_dist.reshape(-1)[flat_idx])
    i, j, k = jnp.unravel_index(flat_idx, mask.shape)
    point = jnp.stack(
        [
            -(origin[0] + spacing[0] * i.astype(jnp.float32)),
            -(origin[1] + spacing[1] * j.astype(jnp.float32)),
            origin[2] + spacing[2] * k.astype(jnp.float32),
        ]
    )
    normal = jnp.stack([n_ras_x[i, j, k], n_ras_y[i, j, k], n_ras_z[i, j, k]])
    return EntryPointResult(
        point_ras=point,
        normal_ras=normal,
        distance_mm=masked_dist.reshape(-1)[flat_idx],
        found=found,
    )
