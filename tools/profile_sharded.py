"""Per-volume cost of the sp-sharded segmentation vs the single-chip path.

Runs `segment_volume` (the single-chip kernel pipeline) and
`segment_volume_sharded` inside a shard_map over an sp mesh on the REAL
TPU, same volume, same certified settings, and prints the times + ratios.
With one physical chip the mesh is sp=1, so TWO sharded rows print:

  * the production route — `segment_volume_sharded` detects the static
    sp=1 axis and degenerates to the single-chip pipeline (expect ~1x);
  * `force_general=True` — keeps the sharded formulation (halo concat,
    global-label shift, boundary-run masks, prefix apply), isolating its
    KERNEL cost. The true multi-chip collective cost additionally needs
    ICI hardware this environment doesn't have (docs/ROADMAP.md).

Run: python tools/profile_sharded.py [SIZE]
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
    from jax.sharding import Mesh, PartitionSpec as P

    from mamri_tpu.parallel.shard_seg import segment_volume_sharded
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
    spacing = jnp.ones(3, jnp.float32)
    origin = jnp.zeros(3, jnp.float32)
    params = seg.SegmentationParams(max_sweeps=2, passes=3, max_roots=128, use_pallas=True)

    def timeit(name, fn, *args, reps=8):
        out = fn(*args)
        jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(reps)]
        jax.device_get(jax.tree_util.tree_leaves(outs[-1])[0].ravel()[0])
        dt = (time.perf_counter() - t0) / reps * 1e3
        print(f"{name:44s} {dt:7.2f} ms")
        return out, dt

    single = jax.jit(lambda v: seg.segment_volume(v, spacing, origin, params))
    r1, t1 = timeit("segment_volume (single-chip kernels)", single, d)

    n_sp = len(jax.devices())
    mesh = Mesh(np.asarray(jax.devices()), ("sp",))

    def shmap(force_general):
        return jax.jit(
            jax.shard_map(
                lambda v: segment_volume_sharded(
                    v, spacing, origin, params, axis_name="sp",
                    force_general=force_general,
                ),
                mesh=mesh,
                in_specs=(P("sp"),),
                out_specs=seg.SegmentationResult(
                    centroids_ras=P(), volumes_mm3=P(), blob_valid=P(), num_blobs=P(),
                    body_mask=P("sp"), body_volume_mm3=P(), body_found=P(),
                    num_components=P(), labels=P("sp"), ccl_converged=P(),
                    roots_complete=P(), blobs_complete=P(),
                ),
                check_vma=False,
            )
        )

    r2, t2 = timeit(f"segment_volume_sharded (sp={n_sp} mesh)", shmap(False), d)
    same = bool(np.array_equal(np.asarray(r1.labels), np.asarray(r2.labels)))
    print(
        f"labels bit-identical: {same}; sharded/single cost ratio: {t2 / t1:.2f}x "
        f"(certified: {bool(r2.ccl_converged)}/{bool(r2.roots_complete)}/{bool(r2.blobs_complete)})"
    )
    if n_sp == 1:
        r3, t3 = timeit("segment_volume_sharded (sp=1, force_general)", shmap(True), d)
        same3 = bool(np.array_equal(np.asarray(r1.labels), np.asarray(r3.labels)))
        print(
            f"general formulation at sp=1: bit-identical: {same3}; "
            f"overhead vs single-chip: {t3 / t1:.2f}x"
        )


if __name__ == "__main__":
    main()
