"""Pallas TPU kernels for the segmentation hot path.

The XLA-only first pipeline at 256^3 cost ~400 ms (associative_scan CCL
makes O(log n) full HBM round-trips per scan; stats one-hots materialize in
HBM); the current kernel pipeline runs the whole scan->stats path in ~6 ms.
The hot-path kernel set:

  * `fused_threshold_close_init`: threshold + exact ball(2) closing +
    raster-label init in one windowed pass over the volume (int8 mask out).
  * `compute_reset_distances`: per-axis run-length distance arrays (int16),
    computed once and reused by every sweep pass, the certificate, and the
    run/stats kernels — the central amortization of the design.
  * `ccl_half_sweep_yz` / `ccl_half_sweep_x` / `ccl_sweep_dist`: segmented
    min-"sweeps" as distance-masked doubling ladders fully in VMEM (one
    roll per step); the final yz pass can fuse the y/z part of the
    local-consistency certificate (`with_check=True`).
  * `ccl_check_consistency[_x]`: d=1 fixed-point certificate — labels are
    monotone member indices, so within-run adjacent equality IS the exact
    CCL fixed point.
  * `extract_z_runs`: per-line z-run tables (label, z0, len) + per-block
    root candidates ridden along for free (every root is a z-run start).
  * `run_stats_matmul` / `component_stats_matmul[_xyz]`: per-component
    {count, sum_i, sum_j, sum_k} as one-hot @ features on the MXU, over
    the ~nz/run_k-smaller run decomposition on the fast path.

Legacy line-scan variants (`segmented_min_scan_lines`, `ccl_sweep_pallas`)
remain for the sp-sharded local path and parity coverage. jnp fallbacks
(`*_reference`) serve CPU and parity tests; every kernel takes
`interpret=True` so the full fast path runs on CPU in CI.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = jnp.iinfo(jnp.int32).max


def _combine(a, b):
    fa, va = a
    fb, vb = b
    return jnp.logical_or(fa, fb), jnp.where(fb, vb, jnp.minimum(va, vb))


# --------------------------------------------------------------------------- scan
def _scan_lines_kernel(lab_ref, reset_ref, out_ref):
    """Bidirectional segmented min-scan of each row, entirely in VMEM.

    `lax.associative_scan` does not lower in Mosaic (its recursion bottoms out
    in zero-size slices), so this is a hand-rolled Hillis-Steele doubling
    scan: log2(N) combine steps, each a roll + select on the VPU."""
    lab = lab_ref[:, :]
    reset = reset_ref[:, :]  # int32 0/1 (Mosaic cannot rotate i1 vectors)
    n = lab.shape[1]
    col = lax.broadcasted_iota(jnp.int32, lab.shape, 1)

    def directional(v0, f0, forward: bool):
        v, f = v0, f0
        d = 1
        while d < n:
            if forward:
                vs = jnp.where(col < d, _BIG, pltpu.roll(v, d, axis=1))
                fs = jnp.where(col < d, 1, pltpu.roll(f, d, axis=1))
            else:
                # pltpu.roll requires non-negative shifts; n-d is the left-roll
                vs = jnp.where(col >= n - d, _BIG, pltpu.roll(v, n - d, axis=1))
                fs = jnp.where(col >= n - d, 1, pltpu.roll(f, n - d, axis=1))
            v = jnp.where(f == 1, v, jnp.minimum(v, vs))
            f = jnp.maximum(f, fs)
            d *= 2
        return v

    fwd = directional(lab, reset, True)
    bwd = directional(lab, reset, False)
    out_ref[:, :] = jnp.minimum(jnp.minimum(fwd, bwd), lab)


def segmented_min_scan_lines_reference(lab, reset):
    """(L, N) jnp fallback: min(fwd_scan, bwd_scan, lab) per line."""
    rb = reset != 0
    _, fwd = lax.associative_scan(_combine, (rb, lab), axis=1)
    _, bwd = lax.associative_scan(_combine, (rb, lab), axis=1, reverse=True)
    return jnp.minimum(jnp.minimum(fwd, bwd), lab)


def segmented_min_scan_lines(lab, reset, block_lines: int = 256, interpret: bool = False):
    """Bidirectional segmented min-scan over the last axis of (L, N) int32.

    `reset` is int32 0/1 (background restarts a segment). Lines are
    independent; blocks of `block_lines` lines scan entirely in VMEM.
    Arbitrary L/N are handled by padding to hardware-friendly multiples with
    background cells (lab=sentinel, reset=1), which cannot affect real cells.
    """
    l, n = lab.shape
    n_pad = (-n) % 128
    l_pad = (-l) % block_lines
    if n_pad or l_pad:
        lab = jnp.pad(lab, ((0, l_pad), (0, n_pad)), constant_values=_BIG)
        reset = jnp.pad(reset, ((0, l_pad), (0, n_pad)), constant_values=1)
    lp, np_ = lab.shape
    grid = (lp // block_lines,)
    out = pl.pallas_call(
        _scan_lines_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_lines, np_), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_lines, np_), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_lines, np_), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((lp, np_), jnp.int32),
        interpret=interpret,
    )(lab, reset)
    if n_pad or l_pad:
        out = out[:l, :n]
    return out


def ccl_sweep_pallas(lab, reset_i32, interpret: bool = False):
    """One full CCL sweep (all three axes, both directions) using the
    VMEM-resident line-scan kernel. `lab` is (nx, ny, nz) int32; `reset_i32`
    is int32 0/1. Axes 0/1 are brought minor with transposes (XLA transposes
    are one HBM pass each — still ~10x cheaper than the tuple-scan HBM
    round-trips they replace)."""
    nx, ny, nz = lab.shape

    # axis 2 (already minor)
    lab = segmented_min_scan_lines(
        lab.reshape(nx * ny, nz), reset_i32.reshape(nx * ny, nz), interpret=interpret
    ).reshape(nx, ny, nz)

    # axis 1: (nx, ny, nz) -> (nx, nz, ny)
    lab_t = jnp.transpose(lab, (0, 2, 1))
    reset_t = jnp.transpose(reset_i32, (0, 2, 1))
    lab_t = segmented_min_scan_lines(
        lab_t.reshape(nx * nz, ny), reset_t.reshape(nx * nz, ny), interpret=interpret
    ).reshape(nx, nz, ny)
    lab = jnp.transpose(lab_t, (0, 2, 1))

    # axis 0: (nx, ny, nz) -> (ny, nz, nx)
    lab_t = jnp.transpose(lab, (1, 2, 0))
    reset_t = jnp.transpose(reset_i32, (1, 2, 0))
    lab_t = segmented_min_scan_lines(
        lab_t.reshape(ny * nz, nx), reset_t.reshape(ny * nz, nx), interpret=interpret
    ).reshape(ny, nz, nx)
    lab = jnp.transpose(lab_t, (2, 0, 1))
    return lab


# ------------------------------------------------- fused threshold + closing
def _ball2_pass(x, combine3, fill):
    """Ball(2) morphological pass: separable 3^3 box + +-2 axis points
    (same decomposition as segmentation._ball2_dilate), edges filled."""
    box = x
    for axis in (0, 1, 2):
        n = box.shape[axis]
        idx = lax.broadcasted_iota(jnp.int32, box.shape, axis)
        r1 = jnp.where(idx < 1, fill, pltpu.roll(box, 1, axis=axis))
        r2 = jnp.where(idx >= n - 1, fill, pltpu.roll(box, n - 1, axis=axis))
        box = combine3(box, r1, r2)
    out = box
    for axis in (0, 1, 2):
        n = x.shape[axis]
        idx = lax.broadcasted_iota(jnp.int32, x.shape, axis)
        s1 = jnp.where(idx < 2, fill, pltpu.roll(x, 2, axis=axis))
        s2 = jnp.where(idx >= n - 2, fill, pltpu.roll(x, n - 2, axis=axis))
        out = combine3(out, s1, s2)
    return out


def _close_kernel(prev_ref, cur_ref, next_ref, mask_ref, lab_ref, *, thr_lo, thr_hi, nx, ny, slab):
    """Threshold + ball(2) closing + CCL label init for one x-slab.

    The padded volume is passed three times with index maps i, i+1, i+2 so the
    kernel sees a (3*slab)-row window without manual DMA; the central `slab`
    rows (= block i+1 of the padded volume) are written.
    """
    i = pl.program_id(0)
    window = jnp.concatenate([prev_ref[...], cur_ref[...], next_ref[...]], axis=0)
    m = jnp.logical_and(window >= thr_lo, window <= thr_hi).astype(jnp.int32)

    def max3(a, b, c):
        return jnp.maximum(jnp.maximum(a, b), c)

    def min3(a, b, c):
        return jnp.minimum(jnp.minimum(a, b), c)

    dil = _ball2_pass(m, max3, 0)
    ero = _ball2_pass(dil, min3, 1)
    center = ero[slab : 2 * slab, :, :]
    # int8 storage: the mask feeds only compares downstream and the reset
    # arrays derived from it are read by two distance kernels, so the 4x
    # narrower store/loads are pure HBM savings (widened in VMEM like int16)
    mask_ref[...] = center.astype(mask_ref.dtype)

    # CCL init: label = (z, y, x)-raster linear index in ORIGINAL coordinates
    # (padded coords minus the left pads: a full slab in x, 4 in y/z).
    gi = lax.broadcasted_iota(jnp.int32, center.shape, 0) + (i + 1) * slab - slab
    gj = lax.broadcasted_iota(jnp.int32, center.shape, 1) - 4
    gk = lax.broadcasted_iota(jnp.int32, center.shape, 2) - 4
    lin = gk * (nx * ny) + gj * nx + gi
    lab_ref[...] = jnp.where(center == 1, lin, _BIG)


def fused_threshold_close_init(
    data, thr_lo: float, thr_hi: float, interpret: bool = False, label_dims=None
):
    """f32 volume -> (closed mask int8, initial CCL labels int32), fused.

    Safe-border closing semantics identical to segmentation.binary_close;
    label init matches connected_components' raster convention. One HBM
    read of the volume (x3 window overlap) + two int32 writes.

    `label_dims=(nx, ny)` overrides the raster multipliers of the label
    linear index without changing the mask/crop geometry — the sp-sharded
    path passes the GLOBAL volume dims here (labels are then global raster
    indices up to a per-shard additive x offset, applied by the caller).
    """
    nx, ny, nz = data.shape
    lnx, lny = label_dims if label_dims is not None else (nx, ny)
    slab = 8
    # x: a full slab of padding each side (the halo needs 4; the first and
    # last blocks are window-only and never written). y/z: 4 + alignment.
    pad_x = (-nx) % slab
    pad_y = (-(ny + 8)) % 8
    pad_z = (-(nz + 8)) % 128
    p = jnp.pad(
        data,
        ((slab, slab + pad_x), (4, 4 + pad_y), (4, 4 + pad_z)),
        # background fill must be STRICTLY out of band: thr_lo - 1.0 is a
        # f32 no-op once |thr_lo| >= 2^24, so use -inf (thresholds are
        # validated finite at the params boundary)
        constant_values=jnp.float32(-jnp.inf),
    )
    nxp, nyp, nzp = p.shape
    grid = (nxp // slab - 2,)
    kernel = functools.partial(_close_kernel, thr_lo=thr_lo, thr_hi=thr_hi, nx=lnx, ny=lny, slab=slab)

    def blk(off):
        return pl.BlockSpec(
            (slab, nyp, nzp), lambda i, off=off: (i + off, 0, 0), memory_space=pltpu.VMEM
        )

    mask_p, lab_p = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[blk(0), blk(1), blk(2)],
        out_specs=(
            pl.BlockSpec((slab, nyp, nzp), lambda i: (i + 1, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((slab, nyp, nzp), lambda i: (i + 1, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nxp, nyp, nzp), jnp.int8),
            jax.ShapeDtypeStruct((nxp, nyp, nzp), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(p, p, p)
    sl = (slice(slab, slab + nx), slice(4, 4 + ny), slice(4, 4 + nz))
    return mask_p[sl], lab_p[sl]


def _dist_kernel(reset_ref, *out_refs, axes):
    """last-reset / next-reset doubling scans -> run-length distances.
    Scan arithmetic stays int32; the write narrows to the output ref's dtype
    (int16 by default — run lengths are bounded by the axis extent)."""
    r = reset_ref[...].astype(jnp.int32)  # int8/int16 storage widens in VMEM
    refs = list(out_refs)
    for axis in axes:
        df_ref, db_ref = refs.pop(0), refs.pop(0)
        n = r.shape[axis]
        idx = lax.broadcasted_iota(jnp.int32, r.shape, axis)
        c = jnp.where(r == 1, idx, -1)  # index of last reset at-or-before i
        d = 1
        while d < n:
            rolled = jnp.where(idx < d, -1, pltpu.roll(c, d, axis=axis))
            c = jnp.maximum(c, rolled)
            d *= 2
        df_ref[...] = (idx - c).astype(df_ref.dtype)
        c2 = jnp.where(r == 1, idx, n)  # index of next reset at-or-after i
        d = 1
        while d < n:
            rolled = jnp.where(idx >= n - d, n, pltpu.roll(c2, n - d, axis=axis))
            c2 = jnp.minimum(c2, rolled)
            d *= 2
        db_ref[...] = (c2 - idx).astype(db_ref.dtype)


def compute_reset_distances(reset_i32, interpret: bool = False, dtype=None):
    """(nx, ny, nz) int32 0/1 -> 6 run-length arrays (dfx, dbx, dfy, dby,
    dfz, dbz). Dims must be multiples of (8, 8, 128).

    Distances are bounded by the axis extent + 1, so int16 (the default for
    volumes under 32k per side) is exact and HALVES the sweep kernels' HBM
    read traffic — the distance arrays are 6 of the 8 full-volume streams
    each sweep reads."""
    nx, ny, nz = reset_i32.shape
    if dtype is None:
        dtype = jnp.int16 if max(nx, ny, nz) < 32767 else jnp.int32
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    shp = jax.ShapeDtypeStruct(reset_i32.shape, dtype)

    yz = functools.partial(_dist_kernel, axes=(1, 2))
    blk_yz = pl.BlockSpec((8, ny, nz), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    dfy, dby, dfz, dbz = pl.pallas_call(
        yz,
        grid=(nx // 8,),
        in_specs=[blk_yz],
        out_specs=(blk_yz, blk_yz, blk_yz, blk_yz),
        out_shape=(shp, shp, shp, shp),
        compiler_params=params,
        interpret=interpret,
    )(reset_i32)

    x = functools.partial(_dist_kernel, axes=(0,))
    blk_x = pl.BlockSpec((nx, 8, 128), lambda i, j: (0, i, j), memory_space=pltpu.VMEM)
    dfx, dbx = pl.pallas_call(
        x,
        grid=(ny // 8, nz // 128),
        in_specs=[blk_x],
        out_specs=(blk_x, blk_x),
        out_shape=(shp, shp),
        compiler_params=params,
        interpret=interpret,
    )(reset_i32)
    return (dfx, dbx, dfy, dby, dfz, dbz)


def _sweep_dist_kernel(lab_ref, *refs, axes, first_block):
    """One CCL sweep over `axes` using precomputed run lengths; accumulates a
    global any-changed flag across grid steps. Distance inputs may be int16
    (halved HBM traffic); they widen to int32 in VMEM because Mosaic's
    comparison ops on this target are 32-bit only."""
    in_refs = list(refs[:-2])
    out_ref, chg_ref = refs[-2], refs[-1]
    lab = lab_ref[...]
    orig = lab
    for axis in axes:
        df = in_refs.pop(0)[...].astype(jnp.int32)
        db = in_refs.pop(0)[...].astype(jnp.int32)
        n = lab.shape[axis]
        v = lab
        d = 1
        while d < n:
            v = jnp.where(d < df, jnp.minimum(v, pltpu.roll(v, d, axis=axis)), v)
            d *= 2
        w = lab
        d = 1
        while d < n:
            w = jnp.where(d < db, jnp.minimum(w, pltpu.roll(w, n - d, axis=axis)), w)
            d *= 2
        lab = jnp.minimum(v, w)
    out_ref[...] = lab

    @pl.when(first_block())
    def _():
        chg_ref[:, :] = jnp.zeros((1, 1), jnp.int32)

    changed = jnp.max((lab != orig).astype(jnp.int32)).reshape(1, 1)
    chg_ref[:, :] = jnp.maximum(chg_ref[:, :], changed)


def _sweep_check_yz_kernel(lab_ref, dfy_ref, dby_ref, dfz_ref, dbz_ref, out_ref, bad_ref):
    """Final yz half-sweep + the y/z part of the local-consistency
    certificate on its own OUTPUT, fused: the distances are already in VMEM
    and blocks hold full y/z extents, so the d=1 checks cost two rolls and
    no extra HBM pass. (The x part of the check still needs its own kernel
    — x consistency crosses these blocks.)"""
    lab = lab_ref[...]
    dfy = dfy_ref[...].astype(jnp.int32)
    dby = dby_ref[...].astype(jnp.int32)
    dfz = dfz_ref[...].astype(jnp.int32)
    dbz = dbz_ref[...].astype(jnp.int32)

    for axis, df, db in ((1, dfy, dby), (2, dfz, dbz)):
        n = lab.shape[axis]
        v = lab
        d = 1
        while d < n:
            v = jnp.where(d < df, jnp.minimum(v, pltpu.roll(v, d, axis=axis)), v)
            d *= 2
        w = lab
        d = 1
        while d < n:
            w = jnp.where(d < db, jnp.minimum(w, pltpu.roll(w, n - d, axis=axis)), w)
            d *= 2
        lab = jnp.minimum(v, w)
    out_ref[...] = lab

    bad = jnp.zeros((), jnp.int32)
    for axis, df in ((1, dfy), (2, dfz)):
        neighbor = pltpu.roll(lab, 1, axis=axis)
        bad = jnp.maximum(bad, jnp.max(((df >= 2) & (lab != neighbor)).astype(jnp.int32)))

    @pl.when(pl.program_id(0) == 0)
    def _():
        bad_ref[:, :] = jnp.zeros((1, 1), jnp.int32)

    bad_ref[:, :] = jnp.maximum(bad_ref[:, :], bad.reshape(1, 1))


def ccl_half_sweep_yz(lab, dists, interpret: bool = False, with_check: bool = False):
    """The y+z half of a CCL sweep. Returns (labels, changed) — or
    (labels, bad_yz) when `with_check` is set (final pass: the sweep and
    the y/z consistency certificate fuse into one kernel)."""
    nx, ny, nz = lab.shape
    _, _, dfy, dby, dfz, dbz = dists
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    shp = jax.ShapeDtypeStruct(lab.shape, jnp.int32)
    chg_shp = jax.ShapeDtypeStruct((1, 1), jnp.int32)
    chg_blk = pl.BlockSpec((1, 1), lambda *_: (0, 0), memory_space=pltpu.VMEM)
    blk_yz = pl.BlockSpec((8, ny, nz), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    if with_check:
        lab, bad_yz = pl.pallas_call(
            _sweep_check_yz_kernel,
            grid=(nx // 8,),
            in_specs=[blk_yz, blk_yz, blk_yz, blk_yz, blk_yz],
            out_specs=(blk_yz, chg_blk),
            out_shape=(shp, chg_shp),
            compiler_params=params,
            interpret=interpret,
        )(lab, dfy, dby, dfz, dbz)
        return lab, bad_yz[0, 0]

    yz = functools.partial(
        _sweep_dist_kernel, axes=(1, 2), first_block=lambda: pl.program_id(0) == 0
    )
    lab, chg_yz = pl.pallas_call(
        yz,
        grid=(nx // 8,),
        in_specs=[blk_yz, blk_yz, blk_yz, blk_yz, blk_yz],
        out_specs=(blk_yz, chg_blk),
        out_shape=(shp, chg_shp),
        compiler_params=params,
        interpret=interpret,
    )(lab, dfy, dby, dfz, dbz)
    return lab, chg_yz[0, 0]


def ccl_half_sweep_x(lab, dists, interpret: bool = False):
    """The x half of a CCL sweep. Returns (labels, changed)."""
    nx, ny, nz = lab.shape
    dfx, dbx = dists[0], dists[1]
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    shp = jax.ShapeDtypeStruct(lab.shape, jnp.int32)
    chg_shp = jax.ShapeDtypeStruct((1, 1), jnp.int32)
    chg_blk = pl.BlockSpec((1, 1), lambda *_: (0, 0), memory_space=pltpu.VMEM)

    x = functools.partial(
        _sweep_dist_kernel,
        axes=(0,),
        first_block=lambda: jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0),
    )
    blk_x = pl.BlockSpec((nx, 8, 128), lambda i, j: (0, i, j), memory_space=pltpu.VMEM)
    lab, chg_x = pl.pallas_call(
        x,
        grid=(ny // 8, nz // 128),
        in_specs=[blk_x, blk_x, blk_x],
        out_specs=(blk_x, chg_blk),
        out_shape=(shp, chg_shp),
        compiler_params=params,
        interpret=interpret,
    )(lab, dfx, dbx)
    return lab, chg_x[0, 0]


def ccl_sweep_dist(lab, dists, interpret: bool = False):
    """One full CCL sweep (y, z, then x) with run-length masks. Returns
    (labels, changed) where changed is a () int32 0/1 for THIS sweep.
    Dims must be multiples of (8, 8, 128)."""
    lab, chg_yz = ccl_half_sweep_yz(lab, dists, interpret=interpret)
    lab, chg_x = ccl_half_sweep_x(lab, dists, interpret=interpret)
    return lab, jnp.maximum(chg_yz, chg_x)


# ------------------------------------------------------------- root extraction
def _roots_kernel(lab_ref, out_ref, *, nx, ny, k, slab):
    """Per x-slab: the k smallest component roots (label == own linear index)
    and the slab's exact root count. Output row: [root_0..root_{k-1}, count]."""
    i = pl.program_id(0)
    lab = lab_ref[...]
    gi = lax.broadcasted_iota(jnp.int32, lab.shape, 0) + i * slab
    gj = lax.broadcasted_iota(jnp.int32, lab.shape, 1)
    gk = lax.broadcasted_iota(jnp.int32, lab.shape, 2)
    lin = gk * (nx * ny) + gj * nx + gi
    is_root = jnp.logical_and(lab == lin, lab != _BIG)
    cnt = jnp.sum(is_root.astype(jnp.int32))
    v = jnp.where(is_root, lin, _BIG)
    for t in range(k):
        m = jnp.min(v)
        out_ref[i, t] = m
        v = jnp.where(v == m, _BIG, v)
    out_ref[i, k] = cnt


def extract_root_candidates(labels, nx: int, ny: int, k: int = 8, interpret: bool = False):
    """(candidates (nblocks*k,), block_counts (nblocks,), num_components ()).

    `labels` may be padded beyond (nx, ny, *): padded voxels carry the
    background sentinel and can never be roots. Candidates are exact and
    complete iff every x-slab holds <= k roots (check block_counts <= k).
    """
    nxp = labels.shape[0]
    slab = 8
    nblocks = nxp // slab
    kernel = functools.partial(_roots_kernel, nx=nx, ny=ny, k=k, slab=slab)
    out = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(
                (slab, labels.shape[1], labels.shape[2]),
                lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        # the whole (nblocks, k+1) table lives in SMEM across grid steps; each
        # step scalar-writes its own row (per-row VMEM blocks don't satisfy
        # the (8, 128) tile constraint)
        out_specs=pl.BlockSpec(
            (nblocks, k + 1), lambda i: (0, 0), memory_space=pltpu.SMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nblocks, k + 1), jnp.int32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(labels)
    cands = out[:, :k].reshape(-1)
    counts = out[:, k]
    return cands, counts, jnp.sum(counts)


def _check_kernel(lab_ref, *refs, axes, first_block):
    """Local-consistency certificate for one or more axes: a label volume is
    the exact CCL fixed point iff every within-run adjacent pair is equal
    (labels are monotone non-increasing member indices, so a uniform label on
    a component can only be its minimum). One d=1 roll + compare per axis —
    ~1/8 of a sweep's doubling ladder."""
    in_refs = list(refs[:-1])
    bad_ref = refs[-1]
    lab = lab_ref[...]
    bad = jnp.zeros((), jnp.int32)
    for axis in axes:
        df = in_refs.pop(0)[...].astype(jnp.int32)
        neighbor = pltpu.roll(lab, 1, axis=axis)
        # df >= 2 <=> the -axis neighbor is in the same foreground run
        bad = jnp.maximum(bad, jnp.max(((df >= 2) & (lab != neighbor)).astype(jnp.int32)))

    @pl.when(first_block())
    def _():
        bad_ref[:, :] = jnp.zeros((1, 1), jnp.int32)

    bad_ref[:, :] = jnp.maximum(bad_ref[:, :], bad.reshape(1, 1))


def ccl_check_consistency(lab, dists, interpret: bool = False):
    """() int32 0/1: 1 iff any within-run adjacent pair of labels differs —
    i.e. 0 certifies `lab` is the exact CCL fixed point (see _check_kernel).
    Dims must be multiples of (8, 8, 128) like the sweep kernels."""
    nx, ny, nz = lab.shape
    dfx, _, dfy, _, dfz, _ = dists
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    bad_shp = jax.ShapeDtypeStruct((1, 1), jnp.int32)
    bad_blk = pl.BlockSpec((1, 1), lambda *_: (0, 0), memory_space=pltpu.VMEM)

    yz = functools.partial(
        _check_kernel, axes=(1, 2), first_block=lambda: pl.program_id(0) == 0
    )
    blk_yz = pl.BlockSpec((8, ny, nz), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    bad_yz = pl.pallas_call(
        yz,
        grid=(nx // 8,),
        in_specs=[blk_yz, blk_yz, blk_yz],
        out_specs=bad_blk,
        out_shape=bad_shp,
        compiler_params=params,
        interpret=interpret,
    )(lab, dfy, dfz)

    x = functools.partial(
        _check_kernel,
        axes=(0,),
        first_block=lambda: jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0),
    )
    blk_x = pl.BlockSpec((nx, 8, 128), lambda i, j: (0, i, j), memory_space=pltpu.VMEM)
    bad_x = pl.pallas_call(
        x,
        grid=(ny // 8, nz // 128),
        in_specs=[blk_x, blk_x],
        out_specs=bad_blk,
        out_shape=bad_shp,
        compiler_params=params,
        interpret=interpret,
    )(lab, dfx)
    return jnp.maximum(bad_yz[0, 0], bad_x[0, 0])


def ccl_check_consistency_x(lab, dists, interpret: bool = False):
    """The x part of the local-consistency certificate only, for callers
    whose final yz half-sweep already verified y/z in-kernel
    (ccl_half_sweep_yz(with_check=True))."""
    nx, ny, nz = lab.shape
    dfx = dists[0]
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    bad_shp = jax.ShapeDtypeStruct((1, 1), jnp.int32)
    bad_blk = pl.BlockSpec((1, 1), lambda *_: (0, 0), memory_space=pltpu.VMEM)
    x = functools.partial(
        _check_kernel,
        axes=(0,),
        first_block=lambda: jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0),
    )
    blk_x = pl.BlockSpec((nx, 8, 128), lambda i, j: (0, i, j), memory_space=pltpu.VMEM)
    bad_x = pl.pallas_call(
        x,
        grid=(ny // 8, nz // 128),
        in_specs=[blk_x, blk_x],
        out_specs=bad_blk,
        out_shape=bad_shp,
        compiler_params=params,
        interpret=interpret,
    )(lab, dfx)
    return bad_x[0, 0]


# ------------------------------------------------------------- z-run extraction
def _runs_kernel(
    lab_ref, dfz_ref, dbz_ref, xoff_ref, lab_out, z0_out, len_out, root_out, mx_ref, *, k, nx, ny, cand_k
):
    """Per (8, by, nz) block: the first `k` maximal z-runs of every (x, y)
    line as (label, z_start, length) triples, per-run ROOT keys, and the
    global max runs-per-line (completeness certificate: exact iff max <= k).

    A z-run start is exactly `dfz == 1` (foreground whose -z neighbour is
    background) and its length is `dbz` at the start voxel (distance to the
    next background). Every voxel of a converged component's z-run carries
    the same label, so the start voxel's label is the run's label.

    Root detection rides along for free: a component's root (min (z,y,x)
    raster index) has no -z neighbour in the component, so every root IS a
    z-run start — a run is the root's run iff its label equals the start
    voxel's own raster index (computed from nx/ny, the ORIGINAL dims the
    labels encode)."""
    pi, pj = pl.program_id(0), pl.program_id(1)
    lab = lab_ref[...]
    df = dfz_ref[...].astype(jnp.int32)
    db = dbz_ref[...].astype(jnp.int32)
    nz = lab.shape[2]
    idx = lax.broadcasted_iota(jnp.int32, lab.shape, 2)
    start = (df == 1).astype(jnp.int32)

    # inclusive prefix count of starts along z -> 1-based run rank at starts
    rank = start
    d = 1
    while d < nz:
        rank = rank + jnp.where(idx < d, 0, pltpu.roll(rank, d, axis=2))
        d *= 2

    labs, z0s, lens = [], [], []
    for r in range(k):
        sel = jnp.logical_and(start == 1, rank == r + 1)
        cnt = jnp.sum(sel.astype(jnp.int32), axis=2)  # 0/1 per line
        labv = jnp.sum(jnp.where(sel, lab, 0), axis=2)
        labs.append(jnp.where(cnt == 1, labv, _BIG))
        z0s.append(jnp.sum(jnp.where(sel, idx, 0), axis=2))
        lens.append(jnp.sum(jnp.where(sel, db, 0), axis=2))
    lab_tab = jnp.stack(labs, axis=1)  # (8, k, by)
    z0_tab = jnp.stack(z0s, axis=1)
    # one contiguous store per output (k strided single-row stores blow up
    # the Mosaic lowering at full-volume block sizes)
    lab_out[...] = lab_tab
    z0_out[...] = z0_tab
    len_out[...] = jnp.stack(lens, axis=1)

    # Root extraction rides along at (8, k, by)-table cost, no extra
    # z-reductions: a run is its component's ROOT run iff its label equals
    # its start voxel's raster index (the root has no -z neighbour in the
    # component, so every root is a z-run start). Each block's cand_k
    # smallest roots + root count go to the shared SMEM table (row = grid
    # step). Roots in runs with rank > k are not in the table, so the
    # run-budget certificate (max_runs <= k) also gates root completeness
    # and the exactness of the count.
    gi2 = (
        pi * lab_tab.shape[0]
        + xoff_ref[0, 0]
        + lax.broadcasted_iota(jnp.int32, lab_tab.shape, 0)
    )
    gj2 = pj * lab_tab.shape[2] + lax.broadcasted_iota(jnp.int32, lab_tab.shape, 2)
    lin_tab = z0_tab * (nx * ny) + gj2 * nx + gi2
    v = jnp.where(
        jnp.logical_and(lab_tab != _BIG, lab_tab == lin_tab), lab_tab, _BIG
    )
    row = pi * pl.num_programs(1) + pj
    root_out[row, cand_k] = jnp.sum((v != _BIG).astype(jnp.int32))
    for t in range(cand_k):
        mv = jnp.min(v)
        root_out[row, t] = mv
        v = jnp.where(v == mv, _BIG, v)

    @pl.when(jnp.logical_and(pi == 0, pj == 0))
    def _():
        mx_ref[:, :] = jnp.zeros((1, 1), jnp.int32)

    # rank is nondecreasing along z, so its slab max = max runs-per-line
    mx_ref[:, :] = jnp.maximum(mx_ref[:, :], jnp.max(rank).reshape(1, 1))


def extract_z_runs(
    labels, dfz, dbz, nx: int, ny: int, k: int = 16, cand_k: int = 8,
    interpret: bool = False, x_off=None,
):
    """(run_labels, run_z0, run_len, root_cands, block_counts, num_components,
    max_runs_per_line) for a padded label volume — the run tables are
    (nxp, k, nyp) int32, slot r of line (x, y) holding the r-th maximal z-run
    (label sentinel / zeros where the line has fewer runs). Root extraction
    rides along: `root_cands` is the flat (nblocks*cand_k,) array of each
    grid block's `cand_k` smallest component roots (complete iff every
    block_count <= cand_k), and `num_components` is the exact global root
    count. `nx`/`ny` are the ORIGINAL volume dims the labels encode.

    Inputs are the tile-padded label volume and the z-axis run-length
    distances from `compute_reset_distances` (padding is background, so no
    run starts or extends there). Exact and complete iff
    `max_runs_per_line <= k`; callers escalate k otherwise.

    `x_off` (traced () int32, default 0) shifts the x coordinate used for
    root detection — the sp-sharded path passes its shard's global x offset
    so a run is recognized as its component's root run against the GLOBAL
    raster index its labels encode.

    Lines are independent, so the grid blocks y as well as x (8 x 128 lines
    per step) — full-(ny, nz) blocks at 256^3 overwhelm the Mosaic
    compiler's vector lowering. y is padded to a 128 multiple (background:
    df=0 means no run starts there), because the (8, k, by) output block
    needs a 128-divisible lane dimension; the padded slots stay empty and
    contribute nothing downstream."""
    nxp, nyp, nz = labels.shape
    pad_y = (-nyp) % 128
    if pad_y:
        cfg = ((0, 0), (0, pad_y), (0, 0))
        labels = jnp.pad(labels, cfg, constant_values=_BIG)
        dfz = jnp.pad(dfz, cfg, constant_values=jnp.zeros((), dfz.dtype))
        dbz = jnp.pad(dbz, cfg, constant_values=jnp.zeros((), dbz.dtype))
        nyp = nyp + pad_y
    by = 128
    nblocks = (nxp // 8) * (nyp // by)
    kernel = functools.partial(_runs_kernel, k=k, nx=nx, ny=ny, cand_k=cand_k)
    blk_in = pl.BlockSpec((8, by, nz), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
    blk_out = pl.BlockSpec((8, k, by), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM)
    root_blk = pl.BlockSpec((nblocks, cand_k + 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM)
    mx_blk = pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.VMEM)
    xoff_blk = pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM)
    xoff = jnp.reshape(
        jnp.zeros((), jnp.int32) if x_off is None else jnp.asarray(x_off, jnp.int32),
        (1, 1),
    )
    shp = jax.ShapeDtypeStruct((nxp, k, nyp), jnp.int32)
    lab_r, z0_r, len_r, root_tab, mx = pl.pallas_call(
        kernel,
        grid=(nxp // 8, nyp // by),
        in_specs=[blk_in, blk_in, blk_in, xoff_blk],
        out_specs=(blk_out, blk_out, blk_out, root_blk, mx_blk),
        out_shape=(
            shp,
            shp,
            shp,
            jax.ShapeDtypeStruct((nblocks, cand_k + 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(labels, dfz, dbz, xoff)
    cands = root_tab[:, :cand_k].reshape(-1)
    counts = root_tab[:, cand_k]
    return lab_r, z0_r, len_r, cands, counts, jnp.sum(counts), mx[0, 0]


def _run_stats_kernel(roots_ref, lab_ref, len_ref, z0_ref, out_ref, *, kny: int, ny: int, block: int):
    """Per-component stats from runs: one (R, block) compare + one MXU
    contraction per grid step, with run features computed analytically
    (i, j constant along a z-run; sum of k over the run is an arithmetic
    series). All-f32: every product is <= extent^2 < 2^24, hence exact."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    lab = lab_ref[:, :].reshape(1, block)
    ln = len_ref[:, :].reshape(1, block).astype(jnp.float32)
    z0 = z0_ref[:, :].reshape(1, block).astype(jnp.float32)
    p = i * block + lax.broadcasted_iota(jnp.int32, (1, block), 1)
    gi = (p // kny).astype(jnp.float32)
    gj = (p % ny).astype(jnp.float32)
    eq = (lab == roots_ref[:, :]).astype(jnp.float32)  # (R, block)
    feats = jnp.concatenate(
        [ln, gi * ln, gj * ln, z0 * ln + ln * (ln - 1.0) * 0.5], axis=0
    )
    # run features reach extent^2 (~65k), beyond bf16's exact-integer range —
    # the platform's default single-pass-bf16 matmul is NOT exact here (unlike
    # the voxel kernels, whose features are <= 256); force the f32 passes.
    out_ref[:, :] += lax.dot_general(
        eq,
        feats,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,
    )


def run_stats_matmul(
    run_labels, run_len, run_z0, roots, block: int = 0, interpret: bool = False
):
    """(R, 4) [count, sum_i, sum_j, sum_k] per root from the (nx, k, ny)
    z-run tables of `extract_z_runs`.

    The compare + contraction is O(R * nx*ny*k) instead of the voxel
    kernel's O(R * nx*ny*nz) — ~nz/k times cheaper, which is what makes
    escalated root budgets (noisy scans, thousands of components) as cheap
    as the clean path. Empty slots carry len=0 and contribute nothing."""
    nx, k, ny = run_labels.shape
    r = roots.shape[0]
    n = nx * k * ny
    if block <= 0:
        # size the (R, block) one-hot to ~32 MB: larger blocks mean fewer
        # grid steps, which dominate cost at escalated R
        block = max(1024, min(65536, ((32 * 1024 * 1024 // (4 * max(r, 1))) // 1024) * 1024))
    npad = -(-n // block) * block

    def flat(a, fill):
        a = a.reshape(-1)
        if npad != n:
            a = jnp.pad(a, (0, npad - n), constant_values=fill)
        br = 8
        return a.reshape(npad // (block // br), block // br)

    lab2d = flat(run_labels, _BIG)
    len2d = flat(run_len, 0)
    z02d = flat(run_z0, 0)
    br = 8
    bc = block // br
    kernel = functools.partial(_run_stats_kernel, kny=k * ny, ny=ny, block=block)
    blk = pl.BlockSpec((br, bc), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(npad // block,),
        in_specs=[
            pl.BlockSpec((r, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            blk,
            blk,
            blk,
        ],
        out_specs=pl.BlockSpec((r, 4), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, 4), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(roots.reshape(r, 1), lab2d, len2d, z02d)


def _run_stats_compact_kernel(roots_ref, lab_ref, len_ref, z0_ref, gi_ref, gj_ref, out_ref, *, block: int):
    """Compact-table variant of `_run_stats_kernel`: run coordinates arrive
    as data (gathered alongside the runs) instead of being derived from the
    grid position, so the table can be arbitrarily permuted/compacted."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    lab = lab_ref[:, :].reshape(1, block)
    ln = len_ref[:, :].reshape(1, block).astype(jnp.float32)
    z0 = z0_ref[:, :].reshape(1, block).astype(jnp.float32)
    gi = gi_ref[:, :].reshape(1, block).astype(jnp.float32)
    gj = gj_ref[:, :].reshape(1, block).astype(jnp.float32)
    eq = (lab == roots_ref[:, :]).astype(jnp.float32)  # (R, block)
    feats = jnp.concatenate(
        [ln, gi * ln, gj * ln, z0 * ln + ln * (ln - 1.0) * 0.5], axis=0
    )
    out_ref[:, :] += lax.dot_general(
        eq,
        feats,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,
    )


def run_stats_matmul_compact(
    lab_c, len_c, z0_c, gi_c, gj_c, roots, block: int = 0, interpret: bool = False
):
    """(R, 4) stats over a COMPACTED 1-D run table (built by
    `segmentation.compact_runs`). The dense (nx, k, ny) table is mostly empty slots —
    ~3-30x more than real runs on clinical scenes — and the stats cost is
    the (R x M) one-hot VMEM traffic, so compaction is what keeps escalated
    root budgets (thousands of speckle components) cheap: M drops from
    nx*k*ny to the compaction cap."""
    (m,) = lab_c.shape
    r = roots.shape[0]
    if block <= 0:
        block = max(1024, min(m, ((32 * 1024 * 1024 // (4 * max(r, 1))) // 1024) * 1024))
    mpad = -(-m // block) * block

    def flat(a, fill):
        if mpad != m:
            a = jnp.pad(a, (0, mpad - m), constant_values=fill)
        return a.reshape(mpad // (block // 8), block // 8)

    kernel = functools.partial(_run_stats_compact_kernel, block=block)
    blk = pl.BlockSpec((8, block // 8), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(mpad // block,),
        in_specs=[pl.BlockSpec((r, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)]
        + [blk] * 5,
        out_specs=pl.BlockSpec((r, 4), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, 4), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(
        roots.reshape(r, 1),
        flat(lab_c, _BIG),
        flat(len_c, 0),
        flat(z0_c, 0),
        flat(gi_c, 0),
        flat(gj_c, 0),
    )


# --------------------------------------------------------------------------- stats
def _stats_kernel(roots_ref, lab_ref, out_ref, *, nx: int, ny: int, block: int):
    """One (8, bc) label block flattened to a (1, block) row, compared against
    the (R, 1) roots column, one MXU contraction per grid step. (Measured
    alternatives — 32-row unrolled micro-dots, larger inner loops — were up to
    70x slower: long serialized dot chains defeat Mosaic's pipelining.)"""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    lab = lab_ref[:, :].reshape(1, block)
    lin = i * block + lax.broadcasted_iota(jnp.int32, (1, block), 1)
    eq = (lab == roots_ref[:, :]).astype(jnp.float32)  # (R, block)
    gi = (lin % nx).astype(jnp.float32)
    gj = ((lin // nx) % ny).astype(jnp.float32)
    gk = (lin // (nx * ny)).astype(jnp.float32)
    feats = jnp.concatenate([jnp.ones((1, block), jnp.float32), gi, gj, gk], axis=0)
    # exact under default bf16 matmul only while coordinates are <= 256;
    # HIGHEST keeps it exact for any volume extent (negligible cost at R<=4k)
    out_ref[:, :] += lax.dot_general(
        eq,
        feats,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,
    )


def component_stats_matmul(flat_labels, roots, nx: int, ny: int, block: int = 8192, interpret: bool = False):
    """(R, 4) stats [count, sum_i, sum_j, sum_k] per candidate root.

    `flat_labels` is the (z,y,x)-raster flattening of the label volume
    (length padded to a multiple of `block` with the background sentinel —
    sentinel never matches a root, so padding adds nothing). The one-hot
    comparison matrix lives only in VMEM; HBM traffic is one read of the
    labels.
    """
    n = flat_labels.shape[0]
    r = roots.shape[0]
    # keep the (R, block) one-hot within ~32 MB of VMEM at escalated R
    # (a fixed 8192 block would need 134 MB at R=4096)
    block = max(1024, min(block, ((32 * 1024 * 1024 // (4 * max(r, 1))) // 1024) * 1024))
    npad = -(-n // block) * block
    if npad != n:
        flat_labels = jnp.pad(flat_labels, (0, npad - n), constant_values=_BIG)
    br = 8
    bc = block // br
    lab2d = flat_labels.reshape(npad // bc, bc)
    grid = (npad // block,)
    kernel = functools.partial(_stats_kernel, nx=nx, ny=ny, block=block)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((r, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((br, bc), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((r, 4), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, 4), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(roots.reshape(r, 1), lab2d)


def _stats_kernel_xyz(roots_ref, lab_ref, out_ref, *, nx, ny, nz, block, compute_dtype):
    """Like _stats_kernel but for labels flattened in their ORIGINAL (x, y, z)
    C-order — no transpose pass; (i, j, k) and the raster linear index are
    decoded from the flat position.

    `compute_dtype=bfloat16` is EXACT for volumes with every dim <= 256: the
    one-hot is 0/1 and the coordinate features are integers <= 256, all
    exactly representable in bf16's 8-bit mantissa; accumulation stays f32
    (`preferred_element_type`). It halves the (R, block) one-hot's VMEM
    footprint and feeds the MXU at its native bf16 rate."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    lab = lab_ref[:, :].reshape(1, block)
    f = i * block + lax.broadcasted_iota(jnp.int32, (1, block), 1)
    gi = f // (ny * nz)
    rem = f - gi * (ny * nz)
    gj = rem // nz
    gk = rem - gj * nz
    eq = (lab == roots_ref[:, :]).astype(compute_dtype)  # (R, block)
    feats = jnp.concatenate(
        [
            jnp.ones((1, block), compute_dtype),
            gi.astype(compute_dtype),
            gj.astype(compute_dtype),
            gk.astype(compute_dtype),
        ],
        axis=0,
    )
    # bf16 inputs: single MXU pass, exact for dims <= 256 (see docstring).
    # f32 inputs (dims > 256): force the multi-pass f32 product — the
    # platform default would silently round operands to bf16.
    out_ref[:, :] += lax.dot_general(
        eq,
        feats,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=(
            lax.Precision.HIGHEST if compute_dtype == jnp.float32 else lax.Precision.DEFAULT
        ),
    )


def component_stats_matmul_xyz(
    flat_labels,
    roots,
    nx: int,
    ny: int,
    nz: int,
    block: int = 0,
    interpret: bool = False,
    compute_dtype=None,
):
    """(R, 4) [count, sum_i, sum_j, sum_k] per root, from labels flattened in
    original (x, y, z) C-order (len nx*ny*nz, possibly padded with sentinel).

    Skips the (z, y, x) transpose pass of `component_stats_matmul`. Block size
    auto-scales so the (R, block) one-hot stays within ~32 MB of VMEM.
    `compute_dtype=None` auto-selects bfloat16 when it is exact (all dims
    <= 256 and count <= 2^24 — bf16 inputs, f32 accumulation; see
    _stats_kernel_xyz) and float32 otherwise.
    """
    n = flat_labels.shape[0]
    r = roots.shape[0]
    if compute_dtype is None:
        compute_dtype = jnp.bfloat16 if max(nx, ny, nz) <= 256 else jnp.float32
    esize = jnp.dtype(compute_dtype).itemsize
    if block <= 0:
        block = max(8192, min(262144, ((32 * 1024 * 1024 // (esize * max(r, 1))) // 8192) * 8192))
    npad = -(-n // block) * block
    if npad != n:
        flat_labels = jnp.pad(flat_labels, (0, npad - n), constant_values=_BIG)
    br = 8
    bc = block // br
    lab2d = flat_labels.reshape(npad // bc, bc)
    grid = (npad // block,)
    kernel = functools.partial(
        _stats_kernel_xyz, nx=nx, ny=ny, nz=nz, block=block, compute_dtype=compute_dtype
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((r, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((br, bc), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((r, 4), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, 4), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(roots.reshape(r, 1), lab2d)


def component_stats_matmul_xyz_reference(flat_labels, roots, nx: int, ny: int, nz: int):
    """jnp fallback for `component_stats_matmul_xyz`: labels flattened in
    original (x, y, z) C-order, label values still (z, y, x)-raster indices.
    Chunked to bound memory."""
    n = flat_labels.shape[0]
    chunk = 1 << 15
    nchunks = -(-n // chunk)
    flat_padded = jnp.pad(flat_labels, (0, nchunks * chunk - n), constant_values=_BIG)

    def body(acc, c):
        start = c * chunk
        lab_c = lax.dynamic_slice(flat_padded, (start,), (chunk,))
        pos = start + jnp.arange(chunk, dtype=jnp.int32)
        gi = (pos // (ny * nz)).astype(jnp.float32)
        rem = pos % (ny * nz)
        gj = (rem // nz).astype(jnp.float32)
        gk = (rem % nz).astype(jnp.float32)
        feats = jnp.stack([jnp.ones(chunk, jnp.float32), gi, gj, gk], axis=-1)
        eq = (lab_c[:, None] == roots[None, :]).astype(jnp.float32)
        return acc + jnp.einsum("cr,cf->rf", eq, feats, precision=lax.Precision.HIGHEST), None

    stats, _ = lax.scan(body, jnp.zeros((roots.shape[0], 4), jnp.float32), jnp.arange(nchunks))
    return stats


def component_stats_matmul_reference(flat_labels, roots, nx: int, ny: int):
    """jnp fallback with the same contract (chunked to bound memory)."""
    n = flat_labels.shape[0]
    chunk = 1 << 15
    nchunks = -(-n // chunk)
    flat_padded = jnp.pad(flat_labels, (0, nchunks * chunk - n), constant_values=_BIG)

    def body(acc, c):
        start = c * chunk
        lab_c = lax.dynamic_slice(flat_padded, (start,), (chunk,))
        lin_c = start + jnp.arange(chunk, dtype=jnp.int32)
        gi = (lin_c % nx).astype(jnp.float32)
        gj = ((lin_c // nx) % ny).astype(jnp.float32)
        gk = (lin_c // (nx * ny)).astype(jnp.float32)
        feats = jnp.stack([jnp.ones(chunk, jnp.float32), gi, gj, gk], axis=-1)
        eq = (lab_c[:, None] == roots[None, :]).astype(jnp.float32)
        return acc + jnp.einsum("cr,cf->rf", eq, feats, precision=lax.Precision.HIGHEST), None

    stats, _ = lax.scan(body, jnp.zeros((roots.shape[0], 4), jnp.float32), jnp.arange(nchunks))
    return stats
