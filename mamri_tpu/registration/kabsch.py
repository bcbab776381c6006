"""Rigid (Kabsch/Horn) point-set alignment.

Replaces the reference's vtkLandmarkTransform RigidBody fit
(Mamri/Mamri.py:1771-1780): find the rotation+translation mapping source
(local marker) points onto target (detected world) points, least-squares
optimal. Solved with Horn's quaternion method — the largest eigenvector of the
symmetric 4x4 profile matrix via batched `jnp.linalg.eigh` — rather than an
SVD of the cross-covariance: marker triplets are coplanar, which makes the
covariance rank-deficient, and float32 SVD mixes ~1e-2 error into the
null-space directions while the symmetric eigenproblem stays well-conditioned
(and can never produce a reflection).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def kabsch_rigid_transform(source, target, weights=None):
    """Best-fit rigid transform T (4x4) with T @ source ~= target.

    Args:
      source: (..., N, 3) local points.
      target: (..., N, 3) world points.
      weights: optional (..., N) nonnegative weights.

    Returns:
      (..., 4, 4) homogeneous rigid transform.
    """
    source = jnp.asarray(source)
    target = jnp.asarray(target)
    if weights is None:
        w = jnp.ones(source.shape[:-1], dtype=source.dtype)
    else:
        w = jnp.asarray(weights, dtype=source.dtype)
    wsum = jnp.sum(w, axis=-1, keepdims=True)
    wn = w / jnp.maximum(wsum, 1e-12)

    s_mean = jnp.sum(source * wn[..., None], axis=-2, keepdims=True)
    t_mean = jnp.sum(target * wn[..., None], axis=-2, keepdims=True)
    s_c = source - s_mean
    t_c = target - t_mean

    # cross-covariance H = sum_i w_i s_i t_i^T
    h = jnp.einsum("...ni,...nj->...ij", s_c * wn[..., None], t_c, precision=lax.Precision.HIGHEST)

    # Horn's symmetric 4x4 profile matrix; its top eigenvector is the unit
    # quaternion of the optimal rotation mapping source onto target.
    sxx, sxy, sxz = h[..., 0, 0], h[..., 0, 1], h[..., 0, 2]
    syx, syy, syz = h[..., 1, 0], h[..., 1, 1], h[..., 1, 2]
    szx, szy, szz = h[..., 2, 0], h[..., 2, 1], h[..., 2, 2]
    n = jnp.stack(
        [
            jnp.stack([sxx + syy + szz, syz - szy, szx - sxz, sxy - syx], axis=-1),
            jnp.stack([syz - szy, sxx - syy - szz, sxy + syx, szx + sxz], axis=-1),
            jnp.stack([szx - sxz, sxy + syx, -sxx + syy - szz, syz + szy], axis=-1),
            jnp.stack([sxy - syx, szx + sxz, syz + szy, -sxx - syy + szz], axis=-1),
        ],
        axis=-2,
    )
    eigvals, eigvecs = jnp.linalg.eigh(n)  # ascending
    q = eigvecs[..., :, -1]  # (..., 4) = (w, x, y, z)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r = jnp.stack(
        [
            jnp.stack([w * w + x * x - y * y - z * z, 2 * (x * y - w * z), 2 * (x * z + w * y)], axis=-1),
            jnp.stack([2 * (x * y + w * z), w * w - x * x + y * y - z * z, 2 * (y * z - w * x)], axis=-1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), w * w - x * x - y * y + z * z], axis=-1),
        ],
        axis=-2,
    )

    t = t_mean[..., 0, :] - jnp.einsum("...ij,...j->...i", r, s_mean[..., 0, :], precision=lax.Precision.HIGHEST)

    batch = source.shape[:-2]
    m = jnp.zeros(batch + (4, 4), dtype=source.dtype)
    m = m.at[..., :3, :3].set(r)
    m = m.at[..., :3, 3].set(t)
    m = m.at[..., 3, 3].set(1.0)
    return m
