from mamri_tpu.api.engine import MamriEngine
from mamri_tpu.api.types import ActionState, PoseEstimate, TrajectoryPlan

__all__ = ["MamriEngine", "ActionState", "PoseEstimate", "TrajectoryPlan"]
