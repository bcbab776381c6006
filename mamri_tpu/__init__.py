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

from mamri_tpu.core.robot import RobotModel, load_robot_model, default_config_path

__all__ = ["RobotModel", "load_robot_model", "default_config_path", "__version__"]
