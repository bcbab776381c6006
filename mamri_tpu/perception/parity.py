"""On-device parity checks for the Pallas segmentation kernels.

Interpret-mode tests (tests/test_pallas_ops.py) pin kernel semantics on CPU,
but Mosaic lowering quirks (roll directions, i1 vectors, sublane reshapes)
are exactly where interpret mode and hardware can diverge. This module runs
every kernel against its jnp reference ON THE CURRENT DEFAULT DEVICE and
reports exact-match booleans — executed on a real TPU by tools/tpu_parity.py
(which commits the TPUPARITY artifact) and by the TPU-gated test in
tests/test_tpu_parity.py.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from mamri_tpu.perception import pallas_ops as po
from mamri_tpu.perception import segmentation as seg

_BIG = np.iinfo(np.int32).max


def _scene(size, seed: int = 42):
    """Deterministic blobs + ellipsoid + sparse speckle scene. `size` may be
    an int (cubic) or an (nx, ny, nz) shape."""
    shape = (size,) * 3 if isinstance(size, int) else tuple(size)
    nx, ny, nz = shape
    rng = np.random.default_rng(seed)
    x, y, z = np.mgrid[:nx, :ny, :nz].astype(np.float32)
    data = np.full(shape, 10.0, np.float32)
    n = max(4, min(shape) // 24)
    if nx == ny == nz:
        # keep the exact RNG stream (one (n, 3) draw) of rounds <= 3 so the
        # cubic baseline scene stays byte-comparable across parity artifacts
        centers = rng.integers(8, nx - 8, size=(n, 3))
    else:
        centers = np.stack([rng.integers(8, d - 8, size=n) for d in shape], axis=1)
    for c in centers:
        data[((x - c[0]) ** 2 + (y - c[1]) ** 2 + (z - c[2]) ** 2) < 16] = 120.0
    data[
        ((x - nx / 2) ** 2 / (nx / 3.2) ** 2)
        + ((y - ny / 2) ** 2 / (ny / 4) ** 2)
        + ((z - nz / 1.7) ** 2 / (nz / 3.6) ** 2)
        < 1.0
    ] = 90.0
    sp = rng.random(data.shape) < 2.5e-5
    data[sp] = 100.0
    return data


def run_parity_checks(size: int = 128, sweeps: int = 6, interpret=None) -> Dict:
    """Run every Pallas kernel vs its jnp reference on the default device.

    `interpret=None` resolves to False on accelerators (the hardware-parity
    purpose of this module) and True on CPU, where only interpret mode
    exists — that CPU path smoke-tests THIS script (incl. shape/reference
    logic) without stamping a hardware artifact (tools/tpu_parity.py still
    refuses CPU)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    data = jnp.asarray(_scene(size))
    report: Dict = {
        "device": str(jax.devices()[0]),
        "backend": jax.default_backend(),
        "size": size,
    }

    # --- fused threshold + closing + label init
    mask_i32, lab0 = jax.jit(lambda d: po.fused_threshold_close_init(d, 65.0, 65535.0, interpret=interpret))(data)
    mask_ref = seg.binary_close(jnp.logical_and(data >= 65.0, data <= 65535.0), 2)
    lab0_ref = seg._init_labels(mask_ref)
    report["fused_threshold_close_init"] = {
        "mask_exact": bool(np.array_equal(np.asarray(mask_i32) != 0, np.asarray(mask_ref))),
        "labels_exact": bool(np.array_equal(np.asarray(lab0), np.asarray(lab0_ref))),
    }

    # --- CCL: run-length dist sweeps vs jnp fixed point
    reset_b = jnp.logical_not(mask_ref)
    ref_labels, ref_conv = jax.jit(lambda l, r: seg._ccl_sweeps_jnp(l, r, sweeps))(lab0_ref, reset_b)
    lab0_p, reset_p, _ = seg._pad_for_kernels(lab0_ref, reset_b)
    got_labels_p, got_conv = jax.jit(lambda l, r: seg._ccl_sweeps_pallas(l, r, sweeps, interpret=interpret))(lab0_p, reset_p)
    got_labels = seg._crop3(got_labels_p, ref_labels.shape)
    report["ccl_sweep_dist"] = {
        "labels_exact": bool(np.array_equal(np.asarray(got_labels), np.asarray(ref_labels))),
        "converged_flag": bool(got_conv) == bool(ref_conv),
    }

    # --- legacy line-scan sweep kernel
    legacy = jax.jit(
        lambda l, r: jax.lax.scan(
            lambda lab, _: (po.ccl_sweep_pallas(lab, r, interpret=interpret), None), l, None, length=sweeps
        )[0]
    )(lab0_ref, reset_b.astype(jnp.int32))
    report["ccl_sweep_pallas"] = {
        "labels_exact": bool(np.array_equal(np.asarray(legacy), np.asarray(ref_labels)))
    }

    # --- root extraction vs host numpy
    cands, counts, num = jax.jit(
        lambda l: po.extract_root_candidates(l, size, size, k=16, interpret=interpret)
    )(got_labels_p)
    flat = np.asarray(ref_labels).transpose(2, 1, 0).reshape(-1)
    lin = np.arange(flat.size)
    is_root = (flat == lin) & (flat != _BIG)
    true_roots = set(map(int, lin[is_root]))
    c = np.asarray(cands)
    found = set(map(int, c[c != _BIG]))
    report["extract_root_candidates"] = {
        "count_exact": int(num) == len(true_roots),
        "all_roots_found": true_roots.issubset(found)
        or bool(np.asarray(counts).max() > 16),  # overflow is flagged, not silent
        "no_slab_overflow": bool(np.asarray(counts).max() <= 16),
    }

    # --- stats kernels vs jnp reference
    roots = np.full(128, _BIG, np.int32)
    srt = np.sort(list(true_roots))[:128]
    roots[: len(srt)] = srt
    roots_j = jnp.asarray(roots)
    ref_stats = np.asarray(
        po.component_stats_matmul_reference(jnp.asarray(flat), roots_j, size, size)
    )
    got_raster = np.asarray(
        jax.jit(lambda f, r: po.component_stats_matmul(f, r, size, size, interpret=interpret))(jnp.asarray(flat), roots_j)
    )
    got_xyz = np.asarray(
        jax.jit(lambda l, r: po.component_stats_matmul_xyz(l.reshape(-1), r, size, size, size, interpret=interpret))(
            ref_labels, roots_j
        )
    )
    # Coordinate sums of the body component exceed 2^24, so f32 accumulation
    # order shifts the last bits (relative ~5e-7) — fiducial-band components
    # stay exact. Check a tight relative tolerance plus exactness of every
    # row whose count is in the fiducial band. Compare VALID-root rows only:
    # sentinel (_BIG) rows match each path's own _BIG padding (different pad
    # amounts per path unless size^3 divides the chunk/block units), are
    # meaningless, and are masked by root_valid downstream.
    nvalid = len(srt)

    def _stats_check(got, ref):
        got, ref = got[:nvalid], ref[:nvalid]
        small = ref[:, 0] < (1 << 24) / max(size, 1)
        return {
            "max_abs_diff": float(np.abs(got - ref).max()),
            "max_rel_diff": float(
                (np.abs(got - ref) / np.maximum(np.abs(ref), 1.0)).max()
            ),
            "within_f32_tolerance": bool(np.allclose(got, ref, rtol=2e-6, atol=0.5)),
            "small_components_exact": bool(np.array_equal(got[small], ref[small])),
        }

    report["component_stats_matmul"] = _stats_check(got_raster, ref_stats)
    report["component_stats_matmul_xyz"] = _stats_check(got_xyz, ref_stats)

    # --- z-run extraction + run-length stats vs the same reference
    reset_p_i32 = reset_p.astype(jnp.int32)
    dists = jax.jit(lambda r: po.compute_reset_distances(r, interpret=interpret))(reset_p_i32)
    run_lab, run_z0, run_len, root_cands, _, num_roots, max_runs = jax.jit(
        lambda l, a, b: po.extract_z_runs(l, a, b, size, size, k=16, cand_k=16, interpret=interpret)
    )(got_labels_p, dists[4], dists[5])
    mask_np = np.asarray(mask_ref)
    starts_np = mask_np & ~np.concatenate(
        [np.zeros_like(mask_np[:, :, :1]), mask_np[:, :, :-1]], axis=2
    )
    got_run_stats = np.asarray(
        jax.jit(lambda a, b, c, r: po.run_stats_matmul(a, b, c, r, interpret=interpret))(
            run_lab, run_len, run_z0, roots_j
        )
    )
    rk = np.asarray(root_cands)
    report["extract_z_runs"] = {
        "max_runs_exact": int(max_runs) == int(starts_np.sum(axis=2).max()),
        "total_length_exact": int(np.asarray(run_len).sum()) == int(mask_np.sum()),
        "no_line_overflow": bool(int(max_runs) <= 16),
        "fused_roots_exact": set(map(int, rk[rk != _BIG])) == true_roots
        and int(num_roots) == len(true_roots),
    }
    # _stats_check compares valid-root rows; the run path additionally
    # guarantees sentinel rows are exactly zero (len=0 slots), unlike the
    # voxel kernels whose sentinel rows accumulate background + padding.
    run_check = _stats_check(got_run_stats, ref_stats)
    run_check["sentinel_rows_zero"] = bool(np.all(got_run_stats[nvalid:] == 0.0))
    report["run_stats_matmul"] = run_check

    # --- compact-table stats (the escalated-R path, r5): top_k-compacted
    # run table must reproduce the dense table's stats bit-for-bit
    nxp, kk, nyp = run_lab.shape
    m = nxp * kk * nyp
    lnflat = np.asarray(run_len).reshape(-1)
    cap = 1 << max(int((lnflat > 0).sum() * 2 - 1), 1).bit_length()
    cap = min(max(cap, 256), m)

    def compact_call(lab_t, len_t, z0_t, roots_t):
        # the PRODUCTION gather (seg.compact_runs), not a copy: the hardware
        # parity check must exercise the same slot-decode the engine runs
        lab_c, len_c, z0_c, gi_c, gj_c, _ = seg.compact_runs(lab_t, len_t, z0_t, cap)
        return po.run_stats_matmul_compact(
            lab_c, len_c, z0_c, gi_c, gj_c, roots_t, interpret=interpret,
        )

    got_compact = np.asarray(jax.jit(compact_call)(run_lab, run_len, run_z0, roots_j))
    report["run_stats_matmul_compact"] = {
        "bitexact_vs_dense": bool(np.array_equal(got_compact, got_run_stats)),
        **_stats_check(got_compact, ref_stats),
    }

    # --- end-to-end segment_volume: kernel path vs jnp path
    params_k = seg.SegmentationParams(max_sweeps=sweeps, use_pallas=True, cand_k=16)
    params_j = seg.SegmentationParams(max_sweeps=sweeps, use_pallas=False)
    sp3 = jnp.ones(3, jnp.float32)
    org = jnp.zeros(3, jnp.float32)
    rk = jax.jit(lambda d: seg.segment_volume(d, sp3, org, params_k))(data)
    rj = jax.jit(lambda d: seg.segment_volume(d, sp3, org, params_j))(data)
    report["segment_volume_end_to_end"] = {
        "centroids_max_diff_mm": float(
            np.abs(np.asarray(rk.centroids_ras) - np.asarray(rj.centroids_ras)).max()
        ),
        "volumes_exact": bool(
            np.array_equal(np.asarray(rk.volumes_mm3), np.asarray(rj.volumes_mm3))
        ),
        "num_components_exact": int(rk.num_components) == int(rj.num_components),
        "body_mask_exact": bool(
            np.array_equal(np.asarray(rk.body_mask), np.asarray(rj.body_mask))
        ),
        "certificates": {
            "converged": bool(rk.ccl_converged),
            "roots_complete": bool(rk.roots_complete),
            "blobs_complete": bool(rk.blobs_complete),
        },
    }

    # --- anisotropic end-to-end: kernel path vs jnp path on a non-cubic grid
    # (the realistic MR acquisition aspect, e.g. 512x512x192 — proves kernel
    # grids/tile padding are shape-correct, not just at cubes)
    ashape = (size + 32, size, max(48, size // 2))
    adata = jnp.asarray(_scene(ashape, seed=7))
    rka = jax.jit(lambda d: seg.segment_volume(d, sp3, org, params_k))(adata)
    rja = jax.jit(lambda d: seg.segment_volume(d, sp3, org, params_j))(adata)
    report["segment_volume_anisotropic"] = {
        "shape": "x".join(map(str, ashape)),
        "centroids_max_diff_mm": float(
            np.abs(np.asarray(rka.centroids_ras) - np.asarray(rja.centroids_ras)).max()
        ),
        "volumes_exact": bool(
            np.array_equal(np.asarray(rka.volumes_mm3), np.asarray(rja.volumes_mm3))
        ),
        "num_components_exact": int(rka.num_components) == int(rja.num_components),
        "body_mask_exact": bool(
            np.array_equal(np.asarray(rka.body_mask), np.asarray(rja.body_mask))
        ),
        "certificates": {
            "converged": bool(rka.ccl_converged),
            "roots_complete": bool(rka.roots_complete),
            "blobs_complete": bool(rka.blobs_complete),
        },
    }

    def _collect(d):
        oks = []
        for v in d.values():
            if isinstance(v, dict):
                oks.extend(_collect(v))
            elif isinstance(v, bool):
                oks.append(v)
        return oks

    checks = _collect({k: v for k, v in report.items() if isinstance(v, dict)})
    report["all_exact"] = all(checks)
    report["num_checks"] = len(checks)
    return report
