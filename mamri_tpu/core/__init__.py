from mamri_tpu.core.robot import RobotModel, load_robot_model, default_config_path, fk_all_links
from mamri_tpu.core import transforms, units

__all__ = [
    "RobotModel",
    "load_robot_model",
    "default_config_path",
    "fk_all_links",
    "transforms",
    "units",
]
