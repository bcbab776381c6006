"""Pallas kernel parity tests (interpret mode on the CPU test mesh).

The TPU path itself is exercised by bench.py and the verify drives; these
pin the kernel semantics against the jnp references on every test run.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mamri_tpu.perception.pallas_ops import (
    component_stats_matmul,
    component_stats_matmul_reference,
    segmented_min_scan_lines,
    segmented_min_scan_lines_reference,
)


@pytest.mark.parametrize("shape", [(16, 128), (8, 256), (24, 165)])
def test_scan_kernel_parity_interpret(shape):
    rng = np.random.default_rng(0)
    mask = rng.random(shape) > 0.5
    lab = np.where(mask, rng.integers(0, 1 << 24, shape), 2**31 - 1).astype(np.int32)
    reset = (~mask).astype(np.int32)
    got = segmented_min_scan_lines(jnp.asarray(lab), jnp.asarray(reset), block_lines=8, interpret=True)
    want = segmented_min_scan_lines_reference(jnp.asarray(lab), jnp.asarray(reset))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_scan_kernel_full_background_and_full_run():
    lab_bg = jnp.full((8, 128), 2**31 - 1, dtype=jnp.int32)
    reset_bg = jnp.ones((8, 128), dtype=jnp.int32)
    out = segmented_min_scan_lines(lab_bg, reset_bg, block_lines=8, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(lab_bg))

    lab_run = jnp.tile(jnp.arange(128, dtype=jnp.int32)[None, :] + 5, (8, 1))
    reset_run = jnp.zeros((8, 128), dtype=jnp.int32)
    out = segmented_min_scan_lines(lab_run, reset_run, block_lines=8, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.full((8, 128), 5, dtype=np.int32))


def test_stats_kernel_parity_interpret():
    rng = np.random.default_rng(1)
    n = 1 << 14
    labs = rng.integers(0, 40, n).astype(np.int32)
    labs[labs > 30] = 2**31 - 1
    roots = np.arange(64, dtype=np.int32)
    got = component_stats_matmul(jnp.asarray(labs), jnp.asarray(roots), 32, 16, block=2048, interpret=True)
    want = component_stats_matmul_reference(jnp.asarray(labs), jnp.asarray(roots), 32, 16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-3)


def test_fused_threshold_close_init_interpret():
    from mamri_tpu.perception.pallas_ops import fused_threshold_close_init
    from mamri_tpu.perception.segmentation import binary_close

    rng = np.random.default_rng(2)
    data = (rng.random((16, 24, 20)) * 100).astype(np.float32)
    d = jnp.asarray(data)
    mask_k, lab_k = fused_threshold_close_init(d, 65.0, 65535.0, interpret=True)
    mask_ref = binary_close(jnp.logical_and(d >= 65.0, d <= 65535.0))
    np.testing.assert_array_equal(np.asarray(mask_k != 0), np.asarray(mask_ref))
    gi = jax.lax.broadcasted_iota(jnp.int32, d.shape, 0)
    gj = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    gk = jax.lax.broadcasted_iota(jnp.int32, d.shape, 2)
    lin = gk * (16 * 24) + gj * 16 + gi
    lab_ref = jnp.where(mask_ref, lin, 2**31 - 1)
    np.testing.assert_array_equal(np.asarray(lab_k), np.asarray(lab_ref))


def test_dist_sweep_parity_and_certificate_interpret():
    """Run-length sweep kernels match the jnp fixed point and certify it."""
    from mamri_tpu.perception.pallas_ops import ccl_sweep_dist, compute_reset_distances
    from mamri_tpu.perception import segmentation as seg

    rng = np.random.default_rng(3)
    shape = (24, 16, 128)  # tile-aligned
    x, y, z = np.mgrid[: shape[0], : shape[1], : shape[2]]
    mask = np.zeros(shape, bool)
    for c in [(5, 5, 20), (12, 8, 60), (20, 12, 100), (8, 3, 110)]:
        mask |= ((x - c[0]) ** 2 + (y - c[1]) ** 2 + (z - c[2]) ** 2) < 9
    mask |= (x > 18) & (z < 40)
    mask |= rng.random(shape) < 0.01

    lab0 = seg._init_labels(jnp.asarray(mask))
    ref, conv = seg._ccl_sweeps_jnp(lab0, jnp.asarray(~mask), 6)
    assert bool(conv)

    dists = compute_reset_distances(jnp.asarray((~mask).astype(np.int32)), interpret=True)
    lab = lab0
    chgs = []
    for _ in range(6):
        lab, chg = ccl_sweep_dist(lab, dists, interpret=True)
        chgs.append(int(chg))
    np.testing.assert_array_equal(np.asarray(lab), np.asarray(ref))
    # certificate: converged -> trailing sweeps report no change
    assert chgs[0] == 1 and chgs[-1] == 0 and sorted(chgs, reverse=True) == chgs


def test_extract_root_candidates_interpret():
    from mamri_tpu.perception.pallas_ops import ccl_sweep_dist, compute_reset_distances, extract_root_candidates
    from mamri_tpu.perception import segmentation as seg

    shape = (24, 16, 128)
    x, y, z = np.mgrid[: shape[0], : shape[1], : shape[2]]
    mask = np.zeros(shape, bool)
    for c in [(5, 5, 20), (12, 8, 60), (20, 12, 100), (8, 3, 110), (3, 12, 90)]:
        mask |= ((x - c[0]) ** 2 + (y - c[1]) ** 2 + (z - c[2]) ** 2) < 9
    lab0 = seg._init_labels(jnp.asarray(mask))
    dists = compute_reset_distances(jnp.asarray((~mask).astype(np.int32)), interpret=True)
    lab = lab0
    for _ in range(4):
        lab, _ = ccl_sweep_dist(lab, dists, interpret=True)

    cands, counts, num = extract_root_candidates(lab, shape[0], shape[1], k=8, interpret=True)
    got = np.asarray(lab)
    flat = got.transpose(2, 1, 0).reshape(-1)
    lin = np.arange(flat.size)
    is_root = (flat == lin) & (flat != 2**31 - 1)
    true_roots = set(lin[is_root].tolist())
    c = np.asarray(cands)
    assert int(num) == len(true_roots) == 5
    assert true_roots.issubset(set(c[c != 2**31 - 1].tolist()))
    assert int(np.asarray(counts).sum()) == len(true_roots)


def test_stats_xyz_kernel_parity_interpret():
    from mamri_tpu.perception.pallas_ops import (
        component_stats_matmul_reference,
        component_stats_matmul_xyz,
    )

    rng = np.random.default_rng(4)
    nx, ny, nz = 8, 16, 128
    labels = rng.integers(0, 50, (nx, ny, nz)).astype(np.int32)
    labels[labels > 40] = 2**31 - 1
    roots = np.arange(40, dtype=np.int32)
    got = component_stats_matmul_xyz(
        jnp.asarray(labels.reshape(-1)), jnp.asarray(roots), nx, ny, nz, block=2048, interpret=True
    )
    flat_raster = labels.transpose(2, 1, 0).reshape(-1)
    want = component_stats_matmul_reference(jnp.asarray(flat_raster), jnp.asarray(roots), nx, ny)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-3)


def _run_stats_oracle(labels, roots):
    """Per-root [count, sum_i, sum_j, sum_k] by direct numpy accumulation."""
    out = np.zeros((len(roots), 4), np.float64)
    nx, ny, nz = labels.shape
    i, j, k = np.mgrid[:nx, :ny, :nz]
    for s, r in enumerate(roots):
        sel = labels == r
        out[s] = [sel.sum(), i[sel].sum(), j[sel].sum(), k[sel].sum()]
    return out


def test_z_runs_stats_parity_interpret():
    """Run-length stats == voxel oracle on a converged random-blob volume."""
    from mamri_tpu.perception import segmentation as seg
    from mamri_tpu.perception.pallas_ops import (
        ccl_sweep_dist,
        compute_reset_distances,
        extract_z_runs,
        run_stats_matmul,
    )

    rng = np.random.default_rng(7)
    shape = (16, 16, 128)
    x, y, z = np.mgrid[: shape[0], : shape[1], : shape[2]]
    mask = np.zeros(shape, bool)
    for c in [(5, 5, 20), (12, 8, 60), (10, 12, 100), (8, 3, 110), (3, 12, 90)]:
        mask |= ((x - c[0]) ** 2 + (y - c[1]) ** 2 + (z - c[2]) ** 2) < 14
    # plus speckles to exercise multiple runs per line
    for _ in range(60):
        i, j, k = rng.integers(0, shape[0]), rng.integers(0, shape[1]), rng.integers(0, shape[2])
        mask[i, j, k] = True

    lab = seg._init_labels(jnp.asarray(mask))
    dists = compute_reset_distances(jnp.asarray((~mask).astype(np.int32)), interpret=True)
    for _ in range(6):
        lab, chg = ccl_sweep_dist(lab, dists, interpret=True)
    assert int(chg) == 0  # converged: run labels are uniform

    labels = np.asarray(lab)
    flat = labels.transpose(2, 1, 0).reshape(-1)
    lin = np.arange(flat.size)
    true_roots = lin[(flat == lin) & (flat != 2**31 - 1)]
    roots = np.full(64, 2**31 - 1, np.int32)
    roots[: len(true_roots)] = np.sort(true_roots)

    run_lab, run_z0, run_len, cands, bcounts, num, max_runs = extract_z_runs(
        lab, dists[4], dists[5], shape[0], shape[1], k=8, cand_k=64, interpret=True
    )
    # fused root extraction: exactly the component roots, nothing else
    rk = np.asarray(cands)
    assert set(rk[rk != 2**31 - 1].tolist()) == set(true_roots.tolist())
    assert int(num) == len(true_roots)
    assert int(np.asarray(bcounts).sum()) == len(true_roots)
    # and a starved candidate budget is flagged, not silent: counts stay
    # exact while the kept candidates are the smallest per block
    _, _, _, c2, bc2, num2, _ = extract_z_runs(
        lab, dists[4], dists[5], shape[0], shape[1], k=8, cand_k=4, interpret=True
    )
    assert int(num2) == len(true_roots) and np.asarray(bc2).max() > 4
    kept = np.asarray(c2)
    assert set(kept[kept != 2**31 - 1].tolist()) <= set(true_roots.tolist())
    # certificate: max runs per (x, y) line, verified against numpy
    starts = mask & ~np.roll(mask, 1, axis=2)
    starts[:, :, 0] = mask[:, :, 0]
    assert int(max_runs) == int(starts.sum(axis=2).max()) <= 8
    # total run length recovers the voxel count
    assert int(np.asarray(run_len).sum()) == int(mask.sum())

    got = run_stats_matmul(run_lab, run_len, run_z0, jnp.asarray(roots), block=2048, interpret=True)
    want = _run_stats_oracle(labels, roots[: len(true_roots)])
    np.testing.assert_allclose(np.asarray(got)[: len(true_roots)], want, atol=1e-3)
    # invalid root slots: nothing matches the sentinel with len>0
    assert np.all(np.asarray(got)[len(true_roots):, 0] == 0)


def test_z_runs_overflow_certificate_interpret():
    """A line with more z-runs than run_k must trip the certificate."""
    from mamri_tpu.perception import segmentation as seg
    from mamri_tpu.perception.pallas_ops import compute_reset_distances, extract_z_runs

    shape = (8, 8, 128)
    mask = np.zeros(shape, bool)
    mask[2, 3, ::2] = True  # 64 single-voxel runs on one line
    lab = seg._init_labels(jnp.asarray(mask))
    dists = compute_reset_distances(jnp.asarray((~mask).astype(np.int32)), interpret=True)
    run_lab, run_z0, run_len, _, _, _, max_runs = extract_z_runs(
        lab, dists[4], dists[5], shape[0], shape[1], k=8, interpret=True
    )
    assert int(max_runs) == 64 > 8
    # the k kept runs are still the FIRST k, exact as far as they go
    kept = np.asarray(run_lab)[2, :, 3]
    assert np.all(kept != 2**31 - 1)
    np.testing.assert_array_equal(np.asarray(run_z0)[2, :, 3], np.arange(0, 16, 2))
    np.testing.assert_array_equal(np.asarray(run_len)[2, :, 3], np.ones(8))


def test_consistency_certificate_interpret():
    """The d=1 local-consistency check == the exact-fixed-point property:
    fails mid-convergence, passes at the fixed point, and agrees with the
    sweep-based changed flags."""
    from mamri_tpu.perception import segmentation as seg
    from mamri_tpu.perception.pallas_ops import (
        ccl_check_consistency,
        ccl_sweep_dist,
        compute_reset_distances,
    )

    # an S-shaped component: needs several sweeps to converge
    shape = (16, 16, 128)
    mask = np.zeros(shape, bool)
    mask[2, 2, 10:60] = True
    mask[2:10, 2, 59] = True
    mask[9, 2, 20:60] = True
    mask[9:14, 2, 20] = True
    mask[13, 2, 20:100] = True

    lab = seg._init_labels(jnp.asarray(mask))
    reset = jnp.asarray((~mask).astype(np.int32))
    dists = compute_reset_distances(reset, interpret=True)

    flags = []
    for _ in range(6):
        bad = int(ccl_check_consistency(lab, dists, interpret=True))
        # jnp twin must agree exactly
        assert bool(seg._labels_consistent_jnp(lab, reset != 0)) == (bad == 0)
        flags.append(bad)
        lab, chg = ccl_sweep_dist(lab, dists, interpret=True)
    final_bad = int(ccl_check_consistency(lab, dists, interpret=True))
    assert int(chg) == 0 and final_bad == 0  # converged and certified
    assert flags[0] == 1  # pre-convergence states are rejected
    # the check flips to 0 exactly when the labels stop changing: validate
    # against the ground-truth single-component labeling
    want = np.full(shape, 2**31 - 1, np.int64)
    lin = np.arange(np.prod(shape)).reshape(shape[2], shape[1], shape[0]).transpose(2, 1, 0)
    want[mask] = lin[mask].min()
    np.testing.assert_array_equal(np.asarray(lab), want)


def test_kernel_fast_path_end_to_end_interpret():
    """segment_volume's kernel fast path runs end-to-end on CPU in interpret
    mode and matches the jnp path (fused init + dist sweeps + consistency
    certificate + run-length stats + fused roots)."""
    from mamri_tpu.perception import segmentation as seg

    x, y, z = np.mgrid[:24, :24, :24]
    d = np.full((24, 24, 24), 10.0, np.float32)
    d[((x - 12.0) ** 2 + (y - 10.0) ** 2 + (z - 14.0) ** 2) < 40] = 120.0
    d[((x - 5.0) ** 2 + (y - 18.0) ** 2 + (z - 5.0) ** 2) < 9] = 120.0
    sp = jnp.ones(3, jnp.float32)
    og = jnp.zeros(3, jnp.float32)

    pk = seg.SegmentationParams(passes=3, max_sweeps=99, use_pallas=True)
    pj = seg.SegmentationParams(passes=3, max_sweeps=99, use_pallas=False)
    rk = seg.segment_volume(jnp.asarray(d), sp, og, pk)
    rj = seg.segment_volume(jnp.asarray(d), sp, og, pj)
    assert bool(rk.ccl_converged) and bool(rj.ccl_converged)
    assert int(rk.num_components) == int(rj.num_components) == 2
    np.testing.assert_array_equal(np.asarray(rk.volumes_mm3), np.asarray(rj.volumes_mm3))
    np.testing.assert_allclose(
        np.asarray(rk.centroids_ras), np.asarray(rj.centroids_ras), atol=1e-4
    )
    np.testing.assert_array_equal(np.asarray(rk.body_mask), np.asarray(rj.body_mask))
