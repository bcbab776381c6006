from mamri_tpu.hw.devices import EncoderLink, MotorControllerLink
from mamri_tpu.hw.executor import RobotTaskRunner, TaskOutcome, TaskState
from mamri_tpu.hw.sim import SimulatedEncoder, SimulatedMotorController, SimulatedRobot
from mamri_tpu.hw.sync import SyncMonitor
from mamri_tpu.hw.transport import LoopbackTransport, SerialTransport, Transport, list_serial_ports

__all__ = [
    "MotorControllerLink",
    "EncoderLink",
    "RobotTaskRunner",
    "TaskState",
    "TaskOutcome",
    "SimulatedRobot",
    "SimulatedMotorController",
    "SimulatedEncoder",
    "SyncMonitor",
    "Transport",
    "SerialTransport",
    "LoopbackTransport",
    "list_serial_ports",
]
