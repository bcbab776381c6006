"""Device-mesh scaling of the pose-estimation pipeline.

The reference is strictly single-process/single-volume (SURVEY.md §2.3: no
distributed layer exists). The TPU-native framework scales along the two axes
the workload actually has:

  dp — data parallel over volumes: BASELINE configs 3/5 demand batched
       throughput; volumes are independent, so the fused pipeline vmaps and
       the batch axis shards across ICI-connected chips.
  sp — spatial parallel over the volume's x extent: for single-scan latency,
       the segmentation stage's shifts/scans on an x-sharded volume lower to
       XLA collective-permutes (halo exchanges) over ICI automatically.

Everything goes through `jax.jit` + `NamedSharding` — XLA inserts the
collectives; there is no hand-written communication.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    axes: Tuple[str, ...] = ("dp",),
    shape: Optional[Tuple[int, ...]] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a mesh over the first n devices. With two axes and no explicit
    shape, devices split evenly favoring dp. Fails loudly when the default
    platform has fewer than n devices — virtual-mesh validation must provision
    CPU devices explicitly (XLA_FLAGS --xla_force_host_platform_device_count
    before backend init + jax.config.update("jax_platforms", "cpu"); see
    __graft_entry__._provision_cpu_mesh) rather than rely on a silent
    fallback that leaves eager inputs on the default platform."""
    if devices is None:
        devices = jax.devices()
    n = len(devices) if n_devices is None else n_devices
    if len(devices) < n:
        raise ValueError(
            f"need {n} devices, have {len(devices)} on platform "
            f"'{jax.default_backend()}'. For virtual multi-chip validation, "
            "provision host devices before JAX backend init (XLA_FLAGS "
            f"--xla_force_host_platform_device_count={n} and "
            "jax.config.update('jax_platforms', 'cpu'))."
        )
    devices = np.asarray(devices[:n])
    if shape is None:
        if len(axes) == 1:
            shape = (n,)
        elif len(axes) == 2:
            dp = 1
            for cand in range(int(np.sqrt(n)), 0, -1):
                if n % cand == 0:
                    dp = cand
                    break
            shape = (dp, n // dp)
        else:
            raise ValueError("give an explicit shape for >2 mesh axes")
    return Mesh(devices.reshape(shape), axes)


def batch_sharding(mesh: Mesh, dp_axis: str = "dp", sp_axis: Optional[str] = None) -> NamedSharding:
    """Sharding for a (B, nx, ny, nz) volume batch: batch over dp, optionally
    the volume x extent over sp."""
    if sp_axis is None:
        return NamedSharding(mesh, P(dp_axis))
    return NamedSharding(mesh, P(dp_axis, sp_axis))


_OUT_KEYS = (
    "success", "angles", "steps", "rmse", "base_tf", "base_ok", "base_source",
    "markers_found", "num_blobs", "body_found", "num_components",
    "seg_converged", "roots_complete", "blobs_complete",
)


def sharded_batched_pipeline(
    engine,
    mesh: Mesh,
    dp_axis: str = "dp",
    sp_axis: Optional[str] = None,
    seg_params=None,
):
    """jit the engine's fused batched pipeline with mesh shardings.

    Returns fn(data_batch, spacing, origin, apply_correction) -> dict of
    sharded outputs (per-volume results sharded over dp). The batch size must
    be a multiple of the dp axis (and nx of the sp axis when spatial sharding
    is on). `seg_params` overrides the engine's segmentation settings (the
    escalation driver `run_sharded_batched` re-builds with stronger params).

    dp-only: plain jit + NamedSharding (XLA partitions the batch axis).
    dp x sp: manual SPMD via shard_map — the segmentation stage runs
    `segment_volume_sharded` (parallel/shard_seg.py): the full single-chip
    Pallas kernel pipeline shard-locally, with explicit ppermute data halos
    for the fused closing/init, an all_gather'd boundary-run prefix for the
    cross-shard x half-sweeps, and psum'd run-stats/certificates.
    """
    nj = engine.model.num_joints

    if sp_axis is None:
        pipeline = engine.pipeline_fn(seg_params)

        def one(data, spacing, origin, apply_correction):
            out = pipeline(
                data,
                spacing,
                origin,
                jnp.eye(4, dtype=jnp.float32),
                jnp.asarray(False),
                jnp.asarray(False),
                apply_correction,
                jnp.zeros(nj, dtype=jnp.float32),
            )
            out.pop("body_mask")
            return out

        batched = jax.vmap(one, in_axes=(0, None, None, None))
        data_sh = batch_sharding(mesh, dp_axis)
        repl = NamedSharding(mesh, P())
        out_sh = NamedSharding(mesh, P(dp_axis))
        return jax.jit(
            batched,
            in_shardings=(data_sh, repl, repl, repl),
            out_shardings={k: out_sh for k in _OUT_KEYS},
        )

    from mamri_tpu.parallel.shard_seg import segment_volume_sharded

    def seg_fn(data, spacing, origin, params):
        return segment_volume_sharded(data, spacing, origin, params, axis_name=sp_axis)

    pipeline = engine.pipeline_fn(seg_params, seg_fn=seg_fn)

    def local_fn(data, spacing, origin, apply_correction):
        # data: (B/dp, nx/sp, ny, nz) local block; collectives ride sp only
        def one(d):
            out = pipeline(
                d,
                spacing,
                origin,
                jnp.eye(4, dtype=jnp.float32),
                jnp.asarray(False),
                jnp.asarray(False),
                apply_correction,
                jnp.zeros(nj, dtype=jnp.float32),
            )
            out.pop("body_mask")  # stays device-side; per-volume results only
            return out

        return jax.vmap(one)(data)

    shmapped = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(dp_axis, sp_axis), P(), P(), P()),
        out_specs={k: P(dp_axis) for k in _OUT_KEYS},
        check_vma=False,  # outputs are replicated over sp by construction
    )
    return jax.jit(shmapped)


def run_sharded_batched(
    engine,
    mesh: Mesh,
    data_batch,
    spacing,
    origin,
    apply_correction: bool = False,
    dp_axis: str = "dp",
    sp_axis: Optional[str] = None,
    _fn_cache: Optional[dict] = None,
):
    """Execute the mesh-sharded batched pipeline WITH the engine's
    certificate->escalate->rerun loop (the same semantics `estimate_pose`
    has single-chip): an uncertified segmentation (ccl_converged /
    roots_complete / blobs_complete) re-runs the batch at escalated settings
    until every volume certifies or the budgets cap out.

    Returns (outputs dict of host arrays, final SegmentationParams,
    certified: bool). Compiled programs are cached per params in `_fn_cache`
    (pass a dict to keep it across calls).
    """
    cache = _fn_cache if _fn_cache is not None else {}
    params = engine.seg_params
    while True:
        key = (params, dp_axis, sp_axis)
        if key not in cache:
            cache[key] = sharded_batched_pipeline(
                engine, mesh, dp_axis=dp_axis, sp_axis=sp_axis, seg_params=params
            )
        out = cache[key](
            jnp.asarray(data_batch),
            jnp.asarray(spacing),
            jnp.asarray(origin),
            jnp.asarray(apply_correction),
        )
        out = {k: np.asarray(v) for k, v in jax.device_get(out).items()}
        converged = bool(out["seg_converged"].all())
        complete = bool(out["roots_complete"].all())
        blobs_ok = bool(out["blobs_complete"].all())
        if converged and complete and blobs_ok:
            return out, params, True
        stronger = engine._escalate_seg_params(params, converged, complete, blobs_ok)
        if stronger is None:
            return out, params, False
        params = stronger
