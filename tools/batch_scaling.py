"""Batch-scaling measurement (BASELINE config 3: batch 1 -> 64 at 256^3).

Runs the engine's batched pipeline at growing batch sizes on the real TPU,
with `microbatch` chunking (lax.map) where the flat vmap would exceed the
16 GB chip, and prints one JSON line per configuration. Results feed the
docs/ROADMAP.md "Scaling" table.

Methodology (matches bench.py): the batch is STAGED ON DEVICE once per
size — `jax.device_put` timed separately as `h2d_f32_s` / `h2d_i16_s`
(the int16 staging ships half the bytes; the pipeline casts on device) —
and the timed reps run on the resident buffers, fetching only the small
result leaves (success/certificates/angles). The previous version
re-uploaded the full host batch every rep, so on a degraded relay window
(~5 MB/s H2D) it measured the tunnel, not the chip.

Peak-HBM discipline (the chip is a shared 16 GB v5e behind the relay):
only ONE staged input batch is resident at a time — the int16 compact
-ingest parity check runs once, at the SMALLEST requested batch (retried
down the microbatch ladder until an attempt lands, so an OOM on the first
attempt cannot silently skip it), and its buffers are
freed before the f32 batch stages. A flat-vmap RESOURCE_EXHAUSTED retries
with progressively smaller `microbatch` chunking instead of giving up,
so the scaling table records the throughput the engine actually
achieves at that batch size, plus the chunk size it needed.

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

_SMALL = ("success", "seg_converged", "roots_complete", "blobs_complete", "angles")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="1,8,16,32,64")
    ap.add_argument("--volume", type=int, default=256)
    ap.add_argument("--reps", type=int, default=3)
    # microbatch per batch size; 0 = flat vmap
    ap.add_argument("--micro", default="0,0,0,8,8")
    args = ap.parse_args()
    if args.reps < 1:
        ap.error("--reps must be >= 1")

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
    sp_j = jnp.asarray(vol.spacing)
    or_j = jnp.asarray(vol.origin)
    corr_j = jnp.asarray(False)

    def stage(host_batch):
        """Upload + fence (device_get of a tiny slice; block_until_ready
        does not fence on the axon relay)."""
        t0 = time.perf_counter()
        dev = jax.device_put(host_batch)
        jax.device_get(dev[0, 0, 0, :4])
        return dev, time.perf_counter() - t0

    def run_one(b, mb, batch, int16_check):
        """Time one (batch, microbatch) config on resident buffers."""
        microbatch = mb if mb > 0 else None
        fn = engine._get_batch_pipeline(
            tuple(data.shape), engine.seg_params, False, microbatch
        )
        rec = {"batch": b, "microbatch": mb}
        if int16_check:
            # compact-ingest parity: int16 staging ships half the bytes and
            # the pipeline casts on device. Freed before the f32 batch
            # stages so only one input batch is ever resident.
            dev16, h2d16 = stage(batch.astype(np.int16))
            out16 = jax.device_get(
                {k: v for k, v in fn(dev16, sp_j, or_j, corr_j).items() if k in _SMALL}
            )
            del dev16
            rec["h2d_i16_s"] = round(h2d16, 2)
        dev, h2d32 = stage(batch)

        t0 = time.perf_counter()
        out = fn(dev, sp_j, or_j, corr_j)
        jax.device_get({k: out[k] for k in _SMALL})
        first = time.perf_counter() - t0  # includes compile
        ok = bool(np.asarray(out["success"]).all())
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = fn(dev, sp_j, or_j, corr_j)
            small = jax.device_get({k: out[k] for k in _SMALL})
            times.append(time.perf_counter() - t0)
        del dev, out
        t = min(times)
        rec.update(
            vols_per_s=round(b / t, 2),
            secs_per_batch=round(t, 4),
            success=ok,
            certified=bool(
                np.asarray(small["seg_converged"]).all()
                and np.asarray(small["roots_complete"]).all()
                and np.asarray(small["blobs_complete"]).all()
            ),
            h2d_f32_s=round(h2d32, 2),
            first_call_s=round(first, 1),
        )
        if int16_check:
            rec["int16_matches"] = bool(
                np.array_equal(np.asarray(small["angles"]), np.asarray(out16["angles"]))
            )
        return rec

    sizes = [int(s) for s in args.sizes.split(",")]
    micros = [int(m) for m in args.micro.split(",")]
    int16_done = False
    for b, mb in zip(sizes, micros):
        batch = np.broadcast_to(data, (b,) + data.shape).copy()
        # on OOM, retry with smaller microbatch chunks before giving up
        attempts = [mb] + [m for m in (8, 4, 2, 1) if m < b and (mb == 0 or m < mb)]
        for mb_try in attempts:
            try:
                # int16 parity once, at the smallest batch, retried along the
                # microbatch ladder until it lands (its buffers are freed
                # before the f32 batch stages, so peak HBM still sees ONE
                # resident input batch per attempt)
                want_int16 = b == min(sizes) and not int16_done
                rec = run_one(b, mb_try, batch, int16_check=want_int16)
                int16_done = int16_done or want_int16
                print(json.dumps(rec), flush=True)
                break
            except Exception as e:  # OOM and friends: record, keep table honest
                print(
                    json.dumps({"batch": b, "microbatch": mb_try, "error": str(e)[:200]}),
                    flush=True,
                )
                if "RESOURCE_EXHAUSTED" not in str(e):
                    break


if __name__ == "__main__":
    main()
