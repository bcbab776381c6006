from mamri_tpu.api.engine import MamriEngine
from mamri_tpu.api.types import PoseEstimate, TrajectoryPlan

__all__ = ["MamriEngine", "PoseEstimate", "TrajectoryPlan"]
