"""Per-stage timing of the segmentation kernels on the real TPU.

Run: python tools/profile_stages.py [SIZE]
Prints one line per stage (pipelined: enqueue reps, fence once — see
CLAUDE.md on why block_until_ready does not fence on this platform).
Numbers include a per-call dispatch overhead (~3 ms via the relay), so
compare stages RELATIVELY; the bench's chained measurement gives the true
end-to-end device latency.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_compilation")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from mamri_tpu.perception import pallas_ops as po
    from mamri_tpu.perception import segmentation as seg

    size = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    rng = np.random.default_rng(0)
    x, y, z = np.mgrid[:size, :size, :size].astype(np.float32)
    data = np.full((size,) * 3, 10.0, np.float32)
    for c in rng.integers(10, size - 10, size=(12, 3)):
        data[((x - c[0]) ** 2 + (y - c[1]) ** 2 + (z - c[2]) ** 2) < 16] = 120.0
    data[
        ((x - size / 2) ** 2 / (size / 3.2) ** 2)
        + ((y - size / 2) ** 2 / (size / 4) ** 2)
        + ((z - size / 1.7) ** 2 / (size / 3.6) ** 2)
        < 1
    ] = 90.0
    d = jnp.asarray(data)

    def timeit(name, fn, *args, reps=8):
        out = fn(*args)  # compile
        jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(reps)]
        jax.device_get(jax.tree_util.tree_leaves(outs[-1])[0].ravel()[0])
        dt = (time.perf_counter() - t0) / reps * 1e3
        print(f"{name:40s} {dt:7.2f} ms")
        return out

    fused = jax.jit(lambda d: po.fused_threshold_close_init(d, 65.0, 65535.0))
    mask_i32, lab0 = timeit("fused_threshold_close_init", fused, d)
    lab0p, resetp, _ = jax.jit(lambda l, m: seg._pad_for_kernels(l, m == 0))(lab0, mask_i32)
    dists = timeit(
        "compute_reset_distances",
        jax.jit(lambda r: po.compute_reset_distances(r.astype(jnp.int32))),
        resetp,
    )
    labp, _ = timeit(
        "ccl sweeps (2)",
        jax.jit(lambda l, dd: seg._ccl_sweeps_pallas_from_dists(l, dd, 2)),
        lab0p,
        dists,
    )
    timeit(
        "ccl_check_consistency",
        jax.jit(lambda l, dd: po.ccl_check_consistency(l, dd)),
        labp,
        dists,
    )
    run_lab, run_z0, run_len, cands, bcounts, num, mx = timeit(
        "extract_z_runs (+fused roots)",
        jax.jit(lambda l, a, b: po.extract_z_runs(l, a, b, size, size, k=8, cand_k=8)),
        labp,
        dists[4],
        dists[5],
    )
    roots = jnp.arange(128, dtype=jnp.int32)
    timeit(
        "run_stats_matmul R=128",
        jax.jit(lambda a, b, c, r: po.run_stats_matmul(a, b, c, r)),
        run_lab,
        run_len,
        run_z0,
        roots,
    )
    timeit(
        "run_stats_matmul R=2048",
        jax.jit(lambda a, b, c, r: po.run_stats_matmul(a, b, c, r)),
        run_lab,
        run_len,
        run_z0,
        jnp.arange(2048, dtype=jnp.int32),
    )


if __name__ == "__main__":
    main()
