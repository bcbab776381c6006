"""MRI volume container, coordinate conventions, and synthetic test volumes.

Coordinate conventions (parity with the reference):
  * Volumes are stored in index order (i, j, k) with physical position
    LPS = origin + spacing * index (axis-aligned direction, like the DICOM
    volumes the reference pulls from Slicer).
  * RAS = (-LPS_x, -LPS_y, LPS_z). The reference applies this flip when
    converting ITK centroids to Slicer markups (Mamri/Mamri.py:1317).

The synthetic generator replaces the reference's reliance on live MRI scans:
spheres of known centroid stand in for the petroleum-jelly fiducials and an
ellipsoid for the patient body, giving closed-form expected outputs
(SURVEY.md §4's test strategy).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple

import numpy as np


_LPS_RAS_FLIP = np.asarray([-1.0, -1.0, 1.0], dtype=np.float32)


def lps_to_ras(points):
    """(..., 3) LPS -> RAS: negate x and y. Works on numpy and jnp arrays."""
    if isinstance(points, (list, tuple)):
        points = np.asarray(points, dtype=np.float32)
    return points * _LPS_RAS_FLIP


def ras_to_lps(points):
    """RAS -> LPS (same involution)."""
    return lps_to_ras(points)


@dataclass
class Volume:
    """An axis-aligned scalar volume in LPS space."""

    data: np.ndarray  # (nx, ny, nz) float32 intensities
    spacing: np.ndarray  # (3,) mm per voxel
    origin: np.ndarray  # (3,) LPS position of voxel (0,0,0)

    # Scanner-native storage dtypes kept as-is: the device pipeline casts to
    # f32 on-chip (segmentation.segment_volume), so an int16 frame ships half
    # the host->device bytes of the equivalent f32 — the streaming tracker's
    # bottleneck on bandwidth-constrained links. All values are exact in f32
    # (<= 16 significant bits), so results are bit-identical either way.
    _COMPACT_DTYPES = (np.int8, np.uint8, np.int16, np.uint16)

    def __post_init__(self):
        # big-endian scanner files normalize to native byte order only —
        # same width, so the compact H2D upload is kept
        self.data = storage_array(self.data)
        self.spacing = np.asarray(self.spacing, dtype=np.float32)
        self.origin = np.asarray(self.origin, dtype=np.float32)

    @property
    def shape(self) -> Tuple[int, int, int]:
        return self.data.shape

    @property
    def voxel_volume_mm3(self) -> float:
        return float(np.prod(self.spacing))

    def index_to_lps(self, idx):
        return self.origin + self.spacing * np.asarray(idx, dtype=np.float32)

    def index_to_ras(self, idx):
        lps = self.index_to_lps(idx)
        return lps * np.asarray([-1.0, -1.0, 1.0], dtype=np.float32)

    def ras_to_index(self, ras):
        lps = np.asarray(ras, dtype=np.float32) * np.asarray([-1.0, -1.0, 1.0], dtype=np.float32)
        return (lps - self.origin) / self.spacing


def storage_array(data) -> np.ndarray:
    """The array a format writer should store: compact scanner dtypes
    (`Volume._COMPACT_DTYPES`) pass through native-endian, everything else
    casts to float32. `Volume.__post_init__` normalizes its data with this
    same helper; it defines the keep-or-f32 rule in ONE place
    so the NRRD/MetaImage/NIfTI writers can't drift from it (each maps the
    result dtype to its format name with a STRICT lookup — extending the
    compact set without updating a writer fails loudly instead of silently
    fat-casting)."""
    arr = np.asarray(data)
    native = arr.dtype.newbyteorder("=")
    if native in Volume._COMPACT_DTYPES:
        return np.asarray(arr, dtype=native)
    return np.asarray(arr, dtype=np.float32)


def _index_grids(shape):
    return np.meshgrid(
        np.arange(shape[0], dtype=np.float32),
        np.arange(shape[1], dtype=np.float32),
        np.arange(shape[2], dtype=np.float32),
        indexing="ij",
    )


def synthetic_volume(
    shape: Tuple[int, int, int] = (128, 128, 128),
    spacing: Sequence[float] = (1.0, 1.0, 1.0),
    origin: Optional[Sequence[float]] = None,
    fiducials_ras: Optional[np.ndarray] = None,
    fiducial_radius_mm: float = 3.0,
    fiducial_intensity: float = 120.0,
    body_center_ras: Optional[Sequence[float]] = None,
    body_radii_mm: Optional[Sequence[float]] = None,
    body_intensity: float = 90.0,
    background_intensity: float = 10.0,
    noise_sigma: float = 0.0,
    seed: int = 0,
) -> Volume:
    """Build a synthetic MRI volume with sphere fiducials and an ellipsoid body.

    Defaults center the volume on the RAS origin. A 3 mm-radius sphere has
    volume ~113 mm^3, inside the reference's 50-1500 mm^3 fiducial band
    (Mamri/Mamri.py:811-812).
    """
    shape = tuple(int(s) for s in shape)
    spacing = np.asarray(spacing, dtype=np.float32)
    if origin is None:
        # center the LPS extent on 0
        origin = -spacing * (np.asarray(shape, dtype=np.float32) - 1.0) / 2.0
    origin = np.asarray(origin, dtype=np.float32)

    gi, gj, gk = _index_grids(shape)
    lx = origin[0] + spacing[0] * gi
    ly = origin[1] + spacing[1] * gj
    lz = origin[2] + spacing[2] * gk
    # RAS coordinates of every voxel
    rx, ry, rz = -lx, -ly, lz

    data = np.full(shape, background_intensity, dtype=np.float32)

    if body_center_ras is not None and body_radii_mm is not None:
        c = np.asarray(body_center_ras, dtype=np.float32)
        r = np.asarray(body_radii_mm, dtype=np.float32)
        inside = ((rx - c[0]) / r[0]) ** 2 + ((ry - c[1]) / r[1]) ** 2 + ((rz - c[2]) / r[2]) ** 2 <= 1.0
        data[inside] = body_intensity

    if fiducials_ras is not None:
        for c in np.asarray(fiducials_ras, dtype=np.float32).reshape(-1, 3):
            d2 = (rx - c[0]) ** 2 + (ry - c[1]) ** 2 + (rz - c[2]) ** 2
            data[d2 <= fiducial_radius_mm**2] = fiducial_intensity

    if noise_sigma > 0:
        rng = np.random.default_rng(seed)
        data = data + rng.normal(0.0, noise_sigma, size=shape).astype(np.float32)

    return Volume(data=data, spacing=spacing, origin=origin)


def rasterized_sphere_centroids(points_ras, radius_mm, spacing, origin_lps):
    """Centroid (RAS, mm) of the voxel-center set each sphere rasterizes to.

    Exactly the set `synthetic_volume` paints (voxel center within radius of
    the sphere center, RAS metric) and therefore exactly the centroid the
    segmentation stage measures for an isolated spherical fiducial — the
    closed-form model of voxel-grid quantization noise used by the IK oracle
    (tools/ik_oracle.py, tests/test_ik_trf_oracle.py)."""
    out = []
    spacing = np.asarray(spacing, dtype=np.float64)
    origin = np.asarray(origin_lps, dtype=np.float64)
    r = float(radius_mm)
    for c in np.asarray(points_ras, dtype=np.float64).reshape(-1, 3):
        lps = np.array([-c[0], -c[1], c[2]])
        idx = (lps - origin) / spacing
        lo = np.floor(idx - r / spacing).astype(int) - 1
        hi = np.ceil(idx + r / spacing).astype(int) + 2
        gi, gj, gk = np.mgrid[lo[0] : hi[0], lo[1] : hi[1], lo[2] : hi[2]]
        px = origin[0] + spacing[0] * gi
        py = origin[1] + spacing[1] * gj
        pz = origin[2] + spacing[2] * gk
        d2 = (-px - c[0]) ** 2 + (-py - c[1]) ** 2 + (pz - c[2]) ** 2
        m = d2 <= r * r
        cen = np.array([px[m].mean(), py[m].mean(), pz[m].mean()])
        out.append([-cen[0], -cen[1], cen[2]])
    return np.asarray(out)
