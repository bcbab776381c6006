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


def sharded_batched_pipeline(engine, mesh: Mesh, dp_axis: str = "dp", sp_axis: Optional[str] = None):
    """jit the engine's fused batched pipeline with mesh shardings.

    Returns fn(data_batch, spacing, origin, apply_correction) -> dict of
    sharded outputs (per-volume results sharded over dp). The batch size must
    be a multiple of the dp axis (and nx of the sp axis when spatial sharding
    is on).
    """
    if sp_axis is not None and engine.seg_params.use_pallas is None:
        # Spatially-sharded volumes cannot route through pallas_call (XLA
        # cannot auto-partition custom kernels); pin the jnp path, whose
        # shifts/scans lower to sharded ops with ICI halo exchanges.
        import copy

        engine = copy.copy(engine)
        engine.seg_params = engine.seg_params._replace(use_pallas=False)
    pipeline = engine._pipeline_fn()
    nj = engine.model.num_joints

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
    data_sh = batch_sharding(mesh, dp_axis, sp_axis)
    repl = NamedSharding(mesh, P())
    out_sh = NamedSharding(mesh, P(dp_axis))
    return jax.jit(
        batched,
        in_shardings=(data_sh, repl, repl, repl),
        out_shardings={
            "success": out_sh,
            "angles": out_sh,
            "steps": out_sh,
            "rmse": out_sh,
            "base_tf": out_sh,
            "base_ok": out_sh,
            "base_source": out_sh,
            "markers_found": out_sh,
            "num_blobs": out_sh,
            "body_found": out_sh,
            "num_components": out_sh,
            "seg_converged": out_sh,
            "roots_complete": out_sh,
        },
    )
