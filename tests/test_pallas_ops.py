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
