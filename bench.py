"""Benchmark: batched 256^3 scan -> joint-angles throughput on one TPU chip.

BASELINE.md north star: >= 64 volumes/sec batched and < 50 ms p50 single-scan
latency on a v5e-1. The reference publishes no numbers (its IK alone runs
O(100 ms) on CPU and segmentation O(seconds) in SimpleITK); vs_baseline is
measured against the 64 vol/s target.

HONEST SETTINGS: the engine's defaults, exactly what `estimate_pose` runs —
a 3-half-sweep CCL schedule WITH the in-kernel fixed-point certificate, 128 candidate roots
WITH the completeness certificate, analytic-seeded 24-iteration IK. The run
asserts both certificates held (no silent reduced-fidelity computation) and
that the recovered joint angles match the scene's ground truth sub-degree.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_compilation")

import numpy as np

BATCH = int(os.environ.get("BENCH_BATCH", "16"))
SIZE = int(os.environ.get("BENCH_SIZE", "256"))
REPS = int(os.environ.get("BENCH_REPS", "5"))
TARGET_VOLS_PER_S = 64.0


def main():
    import jax
    import jax.numpy as jnp

    from mamri_tpu.api import MamriEngine

    engine = MamriEngine()  # default (certified) settings throughout

    # one realistic scene rendered directly into a SIZE^3 grid: spacing fitted
    # so the whole arm + phantom lies inside the volume
    from mamri_tpu.core import transforms as T
    from mamri_tpu.core.robot import marker_world_positions
    from mamri_tpu.perception.volume import synthetic_volume

    true_angles = np.array([0.3, -0.7, 0.5, 0.2, -0.4, 0.6], dtype=np.float32)
    angles = jnp.asarray(true_angles)
    base = np.asarray(
        T.translate(jnp.array([-60.0, -120.0, 0.0]))
        @ T.rot_x(jnp.float32(-np.pi / 2))
        @ T.rot_z(jnp.float32(0.15))
    )
    links = ["Baseplate", "Joint2", "Joint4", "Joint6"]
    pts = np.concatenate(
        [np.asarray(marker_world_positions(engine.model, angles, ln, jnp.asarray(base))) for ln in links]
    )
    body_center = [-60.0, -40.0, 130.0]
    lo = np.minimum(pts.min(0) - 40, np.array(body_center) - 75)
    hi = np.maximum(pts.max(0) + 40, np.array(body_center) + 75)
    lps_lo = np.array([-hi[0], -hi[1], lo[2]], dtype=np.float32)
    lps_hi = np.array([-lo[0], -lo[1], hi[2]], dtype=np.float32)
    spacing = np.full(3, float((lps_hi - lps_lo).max()) / SIZE, dtype=np.float32)
    origin = lps_lo
    vol = synthetic_volume(
        shape=(SIZE, SIZE, SIZE),
        spacing=spacing,
        origin=origin,
        fiducials_ras=pts,
        fiducial_radius_mm=4.0,
        body_center_ras=body_center,
        body_radii_mm=[45.0, 55.0, 65.0],
    )
    data = vol.data

    batch = np.broadcast_to(data, (BATCH,) + data.shape)

    # keep outputs tiny: angles/steps/success only stay on device until fetch
    pipeline = engine._pipeline_fn()

    def one(d):
        out = pipeline(
            d,
            jnp.asarray(spacing),
            jnp.asarray(origin),
            jnp.eye(4, dtype=jnp.float32),
            jnp.asarray(False),
            jnp.asarray(False),
            jnp.asarray(False),
            jnp.zeros(engine.model.num_joints, dtype=jnp.float32),
        )
        keep = ("angles", "rmse", "success", "seg_converged", "roots_complete")
        return {k: out[k] for k in keep}

    fb = jax.jit(jax.vmap(one))
    f1 = jax.jit(one)

    dev_batch = jnp.asarray(batch)
    dev_one = jnp.asarray(data)

    # NOTE: on this platform block_until_ready does NOT fence execution (the
    # axon relay defers); a host round-trip (device_get of a small output)
    # is the only reliable fence. Throughput is measured pipelined (enqueue
    # REPS batches, fence once) so the relay's ~30 ms RTT amortizes away;
    # the synchronous p50 includes one RTT, so the chained measurement below
    # reports pure on-device latency as well.

    # warmup / compile
    jax.device_get(fb(dev_batch)["rmse"])
    jax.device_get(f1(dev_one)["rmse"])

    # ---- honesty checks: certificates held and the scene was solved
    res = jax.device_get(fb(dev_batch))
    converged = bool(np.asarray(res["seg_converged"]).all())
    complete = bool(np.asarray(res["roots_complete"]).all())
    ok = bool(np.asarray(res["success"]).all())
    angle_err_deg = float(
        np.degrees(np.abs(np.asarray(res["angles"]) - true_angles[None])).max()
    )
    pipeline_success = ok and converged and complete and angle_err_deg < 1.0

    # ---- batched throughput (pipelined)
    t0 = time.perf_counter()
    outs = [fb(dev_batch) for _ in range(REPS)]
    jax.device_get(outs[-1]["rmse"])
    batch_t = (time.perf_counter() - t0) / REPS
    vols_per_s = BATCH / batch_t

    # ---- single-volume latency
    # (a) synchronous round-trips (includes one relay RTT per call)
    lats = []
    for _ in range(max(REPS * 2, 10)):
        t0 = time.perf_counter()
        jax.device_get(f1(dev_one)["rmse"])
        lats.append(time.perf_counter() - t0)
    p50_sync_ms = sorted(lats)[len(lats) // 2] * 1e3

    # (b) chained: K dependent executions, one fence — pure device latency.
    # The rmse output is folded back into the input so XLA cannot reorder or
    # overlap the runs.
    def chained(d, k):
        r = jnp.float32(0)
        for _ in range(k):
            out = f1(d + 0.0 * r)
            r = out["rmse"]
        return r

    K = 10
    chained_j = jax.jit(lambda d: chained(d, K))
    jax.device_get(chained_j(dev_one))  # compile
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.device_get(chained_j(dev_one))
        samples.append((time.perf_counter() - t0) / K)
    p50_device_ms = sorted(samples)[len(samples) // 2] * 1e3

    # ---- robustness: dense-speckle noisy variant at the noisy-scan settings
    # (the caps the engine's certificate escalation would land on, pre-set so
    # the measurement is one compile). ~1500 single-voxel speckle components
    # + sub-threshold gaussian noise: the ITK reference has no component cap,
    # so neither may we — certificates must hold WITHOUT truncation.
    from mamri_tpu.perception.segmentation import SegmentationParams

    rng = np.random.default_rng(5)
    noisy = np.array(data, copy=True)
    n_speckle = 1500
    idx = rng.integers(2, SIZE - 2, size=(n_speckle, 3))
    bright = noisy > 60.0
    for i, j, k in idx:
        if not bright[i - 2 : i + 3, j - 2 : j + 3, k - 2 : k + 3].any():
            noisy[i, j, k] = 100.0
    noisy = noisy + rng.normal(0.0, 5.0, noisy.shape).astype(np.float32)

    noisy_params = SegmentationParams(max_sweeps=2, passes=3, max_roots=2048, cand_k=128, run_k=16)
    pipeline_n = engine._pipeline_fn(seg_params=noisy_params)

    def one_noisy(d):
        out = pipeline_n(
            d,
            jnp.asarray(spacing),
            jnp.asarray(origin),
            jnp.eye(4, dtype=jnp.float32),
            jnp.asarray(False),
            jnp.asarray(False),
            jnp.asarray(False),
            jnp.zeros(engine.model.num_joints, dtype=jnp.float32),
        )
        keep = ("angles", "rmse", "success", "seg_converged", "roots_complete", "num_components")
        return {k: out[k] for k in keep}

    fbn = jax.jit(jax.vmap(one_noisy))
    dev_noisy = jnp.asarray(np.broadcast_to(noisy, (BATCH,) + noisy.shape))
    resn = jax.device_get(fbn(dev_noisy))  # compile + honesty checks
    noisy_certified = bool(
        np.asarray(resn["seg_converged"]).all() and np.asarray(resn["roots_complete"]).all()
    )
    noisy_ok = bool(np.asarray(resn["success"]).all())
    noisy_err_deg = float(
        np.degrees(np.abs(np.asarray(resn["angles"]) - true_angles[None])).max()
    )
    t0 = time.perf_counter()
    outs = [fbn(dev_noisy) for _ in range(max(REPS // 2, 2))]
    jax.device_get(outs[-1]["rmse"])
    noisy_vols_per_s = BATCH * len(outs) / (time.perf_counter() - t0)

    print(
        json.dumps(
            {
                "metric": f"scan->joint-angles throughput, batched {SIZE}^3 MRI volumes",
                "value": round(vols_per_s, 3),
                "unit": "volumes/sec",
                "vs_baseline": round(vols_per_s / TARGET_VOLS_PER_S, 4),
                "p50_latency_ms": round(p50_device_ms, 2),
                "p50_sync_incl_relay_rtt_ms": round(p50_sync_ms, 2),
                "batch": BATCH,
                "volume": f"{SIZE}^3",
                "pipeline_success": pipeline_success,
                "certified": {"ccl_converged": converged, "roots_complete": complete},
                "max_angle_err_deg": round(angle_err_deg, 4),
                "noisy_scan": {
                    "vols_per_s": round(noisy_vols_per_s, 3),
                    "speckle_components": int(np.asarray(resn["num_components"]).max()),
                    "certified_no_truncation": noisy_certified,
                    "success": noisy_ok,
                    "max_angle_err_deg": round(noisy_err_deg, 4),
                    "settings": "max_roots=2048, cand_k=128, run_k=16 (noisy-scan escalation caps, one compile)",
                },
                "settings": "engine defaults (certified): [yz,x,yz] half-sweep schedule + local-consistency certificate, 128 roots, run_k=8 run-length stats, IK 24 iters analytic-seeded",
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
