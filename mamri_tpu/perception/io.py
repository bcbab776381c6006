"""Minimal medical-volume file IO: NIfTI-1 (.nii / .nii.gz), pure numpy.

The reference receives volumes from the Slicer scene (sitkUtils.PullVolume...,
Mamri/Mamri.py:1306); standalone mamri_tpu needs its own ingest. This reader
supports the common case: single-file NIfTI-1, scalar volumes, axis-aligned
(or sign-flipped) affines. NIfTI affines map voxel ijk -> RAS+; `Volume`
stores LPS origin/spacing, so the conversion flips x/y. Oblique affines are
rejected explicitly rather than silently resampled.

DICOM series ingest is intentionally not implemented yet (needs a series
sorter + decoder); convert to NIfTI upstream for now.
"""

from __future__ import annotations

import gzip
import struct
from typing import Tuple

import numpy as np

from mamri_tpu.perception.volume import Volume

_DTYPES = {
    2: np.uint8,
    4: np.int16,
    8: np.int32,
    16: np.float32,
    64: np.float64,
    256: np.int8,
    512: np.uint16,
    768: np.uint32,
}


def _read_bytes(path: str) -> bytes:
    if path.endswith(".gz"):
        with gzip.open(path, "rb") as f:
            return f.read()
    with open(path, "rb") as f:
        return f.read()


def load_nifti(path: str) -> Volume:
    raw = _read_bytes(path)
    if len(raw) < 352:
        raise ValueError(f"{path}: too small to be NIfTI-1")
    sizeof_hdr = struct.unpack("<i", raw[:4])[0]
    byteorder = "<"
    if sizeof_hdr != 348:
        sizeof_hdr = struct.unpack(">i", raw[:4])[0]
        if sizeof_hdr != 348:
            raise ValueError(f"{path}: not a NIfTI-1 file")
        byteorder = ">"
    magic = raw[344:348]
    if magic not in (b"n+1\x00", b"ni1\x00"):
        raise ValueError(f"{path}: bad NIfTI magic {magic!r}")

    dim = struct.unpack(byteorder + "8h", raw[40:56])
    ndim = dim[0]
    if ndim < 3:
        raise ValueError(f"{path}: need a 3-D volume, got dim={dim}")
    nx, ny, nz = dim[1], dim[2], dim[3]
    datatype = struct.unpack(byteorder + "h", raw[70:72])[0]
    if datatype not in _DTYPES:
        raise ValueError(f"{path}: unsupported NIfTI datatype {datatype}")
    pixdim = struct.unpack(byteorder + "8f", raw[76:108])
    vox_offset = int(struct.unpack(byteorder + "f", raw[108:112])[0])
    scl_slope = struct.unpack(byteorder + "f", raw[112:116])[0] or 1.0
    scl_inter = struct.unpack(byteorder + "f", raw[116:120])[0]
    sform_code = struct.unpack(byteorder + "h", raw[254:256])[0]
    srow = np.array(struct.unpack(byteorder + "12f", raw[280:328])).reshape(3, 4)

    count = nx * ny * nz
    dt = np.dtype(_DTYPES[datatype]).newbyteorder(byteorder)
    data = np.frombuffer(raw, dtype=dt, count=count, offset=vox_offset)
    data = data.reshape((nx, ny, nz), order="F")
    data = np.asarray(data, dtype=np.float32) * scl_slope + scl_inter

    if sform_code > 0:
        rot = srow[:, :3]
        # accept only axis-aligned (diagonal, possibly sign-flipped) affines
        for r in range(3):
            row = np.abs(rot[r])
            if row.sum() - row[r] > 1e-3 * max(row[r], 1e-6):
                raise ValueError(f"{path}: oblique/permuted affine not supported (srow={srow})")
        # NIfTI affine is voxel->RAS; Volume stores LPS with positive steps.
        diag_lps = np.array([-rot[0, 0], -rot[1, 1], rot[2, 2]], dtype=np.float32)
        origin_lps = srow[:, 3].astype(np.float32) * np.array([-1.0, -1.0, 1.0], dtype=np.float32)
        for ax in range(3):
            if diag_lps[ax] < 0:
                data = np.flip(data, axis=ax)
                origin_lps[ax] = origin_lps[ax] + diag_lps[ax] * (data.shape[ax] - 1)
                diag_lps[ax] = -diag_lps[ax]
        return Volume(data=np.ascontiguousarray(data), spacing=diag_lps, origin=origin_lps)

    # fall back to pixdim with origin at 0 (qform ignored)
    spacing = np.array([abs(pixdim[1]), abs(pixdim[2]), abs(pixdim[3])], dtype=np.float32)
    return Volume(data=np.ascontiguousarray(data), spacing=spacing, origin=np.zeros(3, dtype=np.float32))


def save_nifti(path: str, volume: Volume) -> None:
    """Write a minimal NIfTI-1 file (float32, sform from the LPS geometry)."""
    data = np.asarray(volume.data, dtype=np.float32)
    nx, ny, nz = data.shape
    hdr = bytearray(352)
    struct.pack_into("<i", hdr, 0, 348)
    struct.pack_into("<8h", hdr, 40, 3, nx, ny, nz, 1, 1, 1, 1)
    struct.pack_into("<h", hdr, 70, 16)  # float32
    struct.pack_into("<h", hdr, 72, 32)  # bitpix
    struct.pack_into("<8f", hdr, 76, 1.0, *volume.spacing.tolist(), 1.0, 1.0, 1.0, 1.0)
    struct.pack_into("<f", hdr, 108, 352.0)  # vox_offset
    struct.pack_into("<f", hdr, 112, 1.0)  # scl_slope
    struct.pack_into("<h", hdr, 254, 1)  # sform_code
    origin_ras = volume.origin * np.array([-1.0, -1.0, 1.0], dtype=np.float32)
    sx, sy, sz = volume.spacing.tolist()
    # LPS spacing along +x LPS = -x RAS direction
    struct.pack_into("<4f", hdr, 280, -sx, 0.0, 0.0, float(origin_ras[0]))
    struct.pack_into("<4f", hdr, 296, 0.0, -sy, 0.0, float(origin_ras[1]))
    struct.pack_into("<4f", hdr, 312, 0.0, 0.0, sz, float(origin_ras[2]))
    hdr[344:348] = b"n+1\x00"
    payload = bytes(hdr) + data.tobytes(order="F")
    if path.endswith(".gz"):
        with gzip.open(path, "wb") as f:
            f.write(payload)
    else:
        with open(path, "wb") as f:
            f.write(payload)
