"""shard_map'd spatially-sharded segmentation (the sp axis' fast path).

The jit+NamedSharding sp path (parallel/mesh.py) must pin the slow jnp
segmentation because XLA cannot auto-partition `pallas_call`. This module is
the manual-SPMD alternative: the volume's x extent is sharded over the `sp`
mesh axis and every cross-shard interaction is an explicit collective —

  * morphological closing: 4-plane x-halo exchange via `lax.ppermute`
    (dilation reach 2 + erosion reach 2; global edges receive zeros, which
    matches `binary_close`'s constant-False padding exactly);
  * CCL x-axis scans: each sweep's segmented min-scan along the sharded axis
    is computed EXACTLY in one pass — local directional scans, then an
    `all_gather` of each shard's per-line fold summary (any-reset flag, scan
    value at the shard boundary), a static prefix-combine over the shard
    ring, and a local apply. The scan combine is associative, so this is the
    textbook Blelloch decomposition lifted to the mesh; a component spanning
    all shards converges in the same number of sweeps as the unsharded
    algorithm (bit-identical labels);
  * y/z scans stay shard-local and route through the Pallas line-scan kernel
    (`segmented_min_scan_lines`) on TPU — the same VMEM-resident kernel as
    the single-chip path, now wrapped in shard_map (interpret mode on CPU
    meshes);
  * component stats: local root extraction + `all_gather` top-k merge for
    candidate roots, `psum` for counts/coordinate sums (coordinates are
    global: the x index is offset by `axis_index * local_nx`);
  * convergence/completeness certificates are psum'd so every shard reports
    the GLOBAL certificate, and the engine's escalation logic applies
    unchanged.

Everything downstream of the (R, 4) stats is replicated arithmetic (the
same `finalize_segmentation` tail as the single-chip path); the big arrays
(labels, body_mask) stay sharded.

Replaces: reference's single-process SimpleITK pipeline
(Mamri/Mamri.py:1306-1341) — which has no distributed story at all.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from mamri_tpu.perception.segmentation import (
    _BIG,
    SegmentationParams,
    SegmentationResult,
    _segmented_min_scan,
    binary_close,
    finalize_segmentation,
)


def _use_pallas_local(params: SegmentationParams) -> bool:
    if params.use_pallas is not None:
        return params.use_pallas
    return jax.default_backend() not in ("cpu",)


# ----------------------------------------------------------------- closing
def _closed_mask_sharded(data, thr_lo, thr_hi, radius: int, axis_name: str):
    """Threshold + ball closing on an x-sharded volume, exact via halo
    exchange. `data` is the local (nxl, ny, nz) shard."""
    mask = jnp.logical_and(data >= thr_lo, data <= thr_hi)
    if radius <= 0:
        return mask
    h = 2 * radius
    # send my trailing h planes right / leading h planes left; global edges
    # get zeros (= background), identical to constant-False padding
    n_sp = lax.axis_size(axis_name)
    fwd = [(i, i + 1) for i in range(n_sp - 1)]
    bwd = [(i + 1, i) for i in range(n_sp - 1)]
    left_halo = lax.ppermute(mask[-h:], axis_name, perm=fwd)  # from left neighbor
    right_halo = lax.ppermute(mask[:h], axis_name, perm=bwd)  # from right neighbor
    ext = jnp.concatenate([left_halo, mask, right_halo], axis=0)
    closed = binary_close(ext, radius)
    return closed[h : h + mask.shape[0]]


# ----------------------------------------------------------------- scans
def _local_scan_lines(lab, reset_i32, axis: int, use_pallas: bool, interpret: bool):
    """Bidirectional shard-local segmented min-scan along a LOCAL axis (1 or 2),
    through the Pallas line-scan kernel when enabled."""
    if not use_pallas:
        rb = reset_i32 != 0
        fwd = _segmented_min_scan(lab, rb, axis, reverse=False)
        bwd = _segmented_min_scan(lab, rb, axis, reverse=True)
        return jnp.minimum(jnp.minimum(fwd, bwd), lab)
    from mamri_tpu.perception.pallas_ops import segmented_min_scan_lines

    nx, ny, nz = lab.shape
    if axis == 2:
        return segmented_min_scan_lines(
            lab.reshape(nx * ny, nz), reset_i32.reshape(nx * ny, nz), interpret=interpret
        ).reshape(nx, ny, nz)
    if axis == 1:
        lab_t = jnp.transpose(lab, (0, 2, 1)).reshape(nx * nz, ny)
        reset_t = jnp.transpose(reset_i32, (0, 2, 1)).reshape(nx * nz, ny)
        out = segmented_min_scan_lines(lab_t, reset_t, interpret=interpret)
        return jnp.transpose(out.reshape(nx, nz, ny), (0, 2, 1))
    raise ValueError("local axes are 1 (y) and 2 (z); axis 0 is sharded")


def _global_x_scan(lab, reset, axis_name: str, reverse: bool):
    """Exact inclusive segmented min-scan along the SHARDED x axis.

    Local directional scan, then one all_gather of the (ny, nz) per-line fold
    summaries, a static prefix-combine over shard order, and a local apply:
        out(i) = v_loc(i)                if a reset precedes i locally
               = min(v_in, v_loc(i))     otherwise
    which is exactly combine((f_in, v_in), (f_loc(i), v_loc(i))).
    """
    f_loc = lax.associative_scan(jnp.logical_or, reset, axis=0, reverse=reverse)
    v_loc = _segmented_min_scan(lab, reset, 0, reverse)
    edge = 0 if reverse else -1
    f_all = lax.all_gather(f_loc[edge], axis_name)  # (S, ny, nz)
    v_all = lax.all_gather(v_loc[edge], axis_name)
    n_sp = f_all.shape[0]

    runf = jnp.zeros_like(f_all[0])
    runv = jnp.full_like(v_all[0], _BIG)
    pref_f, pref_v = [None] * n_sp, [None] * n_sp
    order = range(n_sp) if not reverse else range(n_sp - 1, -1, -1)
    for t in order:
        pref_f[t], pref_v[t] = runf, runv
        runv = jnp.where(f_all[t], v_all[t], jnp.minimum(runv, v_all[t]))
        runf = jnp.logical_or(runf, f_all[t])
    pf = jnp.stack(pref_f)
    pv = jnp.stack(pref_v)
    me = lax.axis_index(axis_name)
    v_in = pv[me]
    return jnp.where(f_loc, v_loc, jnp.minimum(v_in[None, :, :], v_loc))


def _ccl_sweeps_sharded(lab0, reset, max_sweeps: int, axis_name: str, use_pallas: bool, interpret: bool):
    """Fixed CCL sweeps on the x-sharded labels; `converged` is the GLOBAL
    certificate (psum of the final sweep's change flags)."""
    reset_i32 = reset.astype(jnp.int32)

    def sweep(lab, _):
        prev = lab
        lab = _local_scan_lines(lab, reset_i32, 1, use_pallas, interpret)
        lab = _local_scan_lines(lab, reset_i32, 2, use_pallas, interpret)
        fwd = _global_x_scan(lab, reset, axis_name, reverse=False)
        bwd = _global_x_scan(lab, reset, axis_name, reverse=True)
        lab = jnp.minimum(jnp.minimum(fwd, bwd), lab)
        return lab, jnp.any(lab != prev)

    lab, changed = lax.scan(sweep, lab0, None, length=max_sweeps)
    changed_global = lax.psum(changed[-1].astype(jnp.int32), axis_name)
    return lab, changed_global == 0


# ----------------------------------------------------------------- stats
def _local_component_stats(labels_local, roots, x_off, ny: int, nz: int):
    """(R, 4) [count, sum_i, sum_j, sum_k] over the LOCAL shard, with GLOBAL
    i coordinates (x_off added); psum across shards completes the reduction."""
    flat = labels_local.reshape(-1)
    n = flat.shape[0]
    chunk = 1 << 15
    nchunks = -(-n // chunk)
    flat_padded = jnp.pad(flat, (0, nchunks * chunk - n), constant_values=_BIG)

    def body(acc, c):
        start = c * chunk
        lab_c = lax.dynamic_slice(flat_padded, (start,), (chunk,))
        pos = start + jnp.arange(chunk, dtype=jnp.int32)
        gi = (pos // (ny * nz) + x_off).astype(jnp.float32)
        rem = pos % (ny * nz)
        gj = (rem // nz).astype(jnp.float32)
        gk = (rem % nz).astype(jnp.float32)
        feats = jnp.stack([jnp.ones(chunk, jnp.float32), gi, gj, gk], axis=-1)
        eq = (lab_c[:, None] == roots[None, :]).astype(jnp.float32)
        return acc + jnp.einsum("cr,cf->rf", eq, feats, precision=lax.Precision.HIGHEST), None

    stats, _ = lax.scan(body, jnp.zeros((roots.shape[0], 4), jnp.float32), jnp.arange(nchunks))
    return stats


def segment_volume_sharded(
    data,
    spacing,
    origin,
    params: SegmentationParams = SegmentationParams(),
    axis_name: str = "sp",
    interpret: Optional[bool] = None,
) -> SegmentationResult:
    """`segment_volume` for one x-shard of a volume, called INSIDE shard_map.

    `data` is the local (nx/S, ny, nz) shard; the global volume is the
    concatenation along x in mesh order. Returns a SegmentationResult whose
    `labels`/`body_mask` are the local shards and everything else is
    replicated (identical on every shard). Certificates (`ccl_converged`,
    `roots_complete`) are global, so the engine's escalation reruns apply.
    """
    data = jnp.asarray(data)
    spacing = jnp.asarray(spacing, dtype=jnp.float32)
    origin = jnp.asarray(origin, dtype=jnp.float32)
    use_pallas = _use_pallas_local(params)
    if interpret is None:
        interpret = jax.default_backend() in ("cpu",)

    nxl, ny, nz = data.shape
    n_sp = lax.axis_size(axis_name)
    nx = n_sp * nxl
    me = lax.axis_index(axis_name)
    x_off = me * nxl

    closed = _closed_mask_sharded(
        data, params.intensity_low, params.intensity_high, params.closing_radius, axis_name
    )

    # labels: GLOBAL (z, y, x)-raster linear index (ITK label-order parity)
    gi = lax.broadcasted_iota(jnp.int32, closed.shape, 0) + x_off
    gj = lax.broadcasted_iota(jnp.int32, closed.shape, 1)
    gk = lax.broadcasted_iota(jnp.int32, closed.shape, 2)
    lin = gk * (nx * ny) + gj * nx + gi
    lab0 = jnp.where(closed, lin, _BIG)
    reset = jnp.logical_not(closed)

    labels, converged = _ccl_sweeps_sharded(
        lab0, reset, params.max_sweeps, axis_name, use_pallas, interpret
    )

    # roots: local exact top-k, merged across shards
    is_root = jnp.logical_and(labels == lin, labels != _BIG)
    num_components = lax.psum(jnp.sum(is_root, dtype=jnp.int32), axis_name)
    complete = num_components <= params.max_roots
    keys_local = jnp.where(is_root, -lin, -_BIG).reshape(-1)
    loc_keys, _ = lax.top_k(keys_local, min(params.max_roots, keys_local.shape[0]))
    all_keys = lax.all_gather(loc_keys, axis_name).reshape(-1)
    keys, _ = lax.top_k(all_keys, min(params.max_roots, all_keys.shape[0]))
    roots = -keys
    if roots.shape[0] < params.max_roots:
        roots = jnp.pad(roots, (0, params.max_roots - roots.shape[0]), constant_values=_BIG)
    root_valid = roots != _BIG

    stats = lax.psum(_local_component_stats(labels, roots, x_off, ny, nz), axis_name)
    counts = stats[:, 0]
    sums_ijk = stats[:, 1:4]

    return finalize_segmentation(
        labels, roots, root_valid, counts, sums_ijk, num_components, complete,
        converged, spacing, origin, params,
    )


def shard_spec_volume(sp_axis: str) -> P:
    """PartitionSpec of an x-sharded (nx, ny, nz) volume."""
    return P(sp_axis)
