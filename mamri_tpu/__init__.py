"""mamri_tpu — a TPU-native (JAX/XLA/Pallas) framework with the capabilities of the
MAMRI robot pose-estimation suite (reference: PaulSchlabach/mamri-pose-estimation).

Layering (bottom-up; see SURVEY.md §7):
  core/          pure-jnp geometry, robot model, FK, unit conversion
  perception/    MRI volume ingest + fused segmentation (threshold/closing/CCL/stats)
  registration/  L-shape marker triplet matching + SVD Kabsch rigid alignment
  ik/            bounded Levenberg–Marquardt, full-chain + trajectory residuals
  planning/      entry-point search, voxel collision checking, heuristic paths
  api/           MamriEngine facade (the MamriLogic-equivalent public surface)
  hw/            host-side serial hardware layer + simulator + closed-loop executor
  parallel/      device-mesh sharding of the batched pipeline
  utils/         STL ingest, config IO, tracing, checkpointing
"""

__version__ = "0.1.0"

__all__ = ["RobotModel", "load_robot_model", "default_config_path", "__version__"]

# Lazy exports (PEP 562): importing the bare package must stay jax-free so
# host-only tooling — the serve supervisor (api/server.supervise), transport
# and protocol layers — can import mamri_tpu submodules without pulling the
# device runtime into the process. `from mamri_tpu import load_robot_model`
# resolves exactly as before, on first attribute access.
def __getattr__(name):
    if name in ("RobotModel", "load_robot_model", "default_config_path"):
        from mamri_tpu.core import robot

        return getattr(robot, name)
    raise AttributeError(f"module 'mamri_tpu' has no attribute {name!r}")
