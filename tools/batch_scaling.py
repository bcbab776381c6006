"""Batch-scaling measurement (BASELINE config 3: batch 1 -> 64 at 256^3).

Runs the engine's batched pipeline at growing batch sizes on the real TPU,
with `microbatch` chunking (lax.map) where the flat vmap would exceed the
16 GB chip, and prints one JSON line per configuration. Results feed the
docs/ROADMAP.md "Scaling" table.

Usage: python tools/batch_scaling.py [--sizes 1,8,16,32,64] [--volume 256]
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_compilation")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="1,8,16,32,64")
    ap.add_argument("--volume", type=int, default=256)
    ap.add_argument("--reps", type=int, default=3)
    # microbatch per batch size; 0 = flat vmap
    ap.add_argument("--micro", default="0,0,0,8,8")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mamri_tpu.api import MamriEngine

    from bench import _build_scenes

    from mamri_tpu.perception.volume import synthetic_volume

    engine = MamriEngine()
    size = args.volume
    scenes, spacing, origin, body_center = _build_scenes(engine)
    vol = synthetic_volume(
        shape=(size, size, size),
        spacing=spacing,
        origin=origin,
        fiducials_ras=scenes[0][2],
        fiducial_radius_mm=4.0,
        body_center_ras=body_center,
        body_radii_mm=[45.0, 55.0, 65.0],
    )
    data = np.asarray(vol.data)

    sizes = [int(s) for s in args.sizes.split(",")]
    micros = [int(m) for m in args.micro.split(",")]
    for b, mb in zip(sizes, micros):
        batch = np.broadcast_to(data, (b,) + data.shape).copy()
        microbatch = mb if mb > 0 else None
        try:
            t0 = time.perf_counter()
            out = engine.estimate_pose_batch(
                batch, vol.spacing, vol.origin, donate=True, microbatch=microbatch
            )
            first = time.perf_counter() - t0  # includes compile
            ok = bool(np.asarray(out["success"]).all())
            times = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                out = engine.estimate_pose_batch(
                    batch, vol.spacing, vol.origin, donate=True, microbatch=microbatch
                )
                times.append(time.perf_counter() - t0)
            t = min(times)
            print(
                json.dumps(
                    {
                        "batch": b,
                        "microbatch": mb,
                        "vols_per_s": round(b / t, 2),
                        "secs_per_batch": round(t, 4),
                        "success": ok,
                        "certified": bool(
                            np.asarray(out["seg_converged"]).all()
                            and np.asarray(out["roots_complete"]).all()
                            and np.asarray(out["blobs_complete"]).all()
                        ),
                        "first_call_s": round(first, 1),
                    }
                ),
                flush=True,
            )
        except Exception as e:  # OOM and friends: record, keep scaling table honest
            print(json.dumps({"batch": b, "microbatch": mb, "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
