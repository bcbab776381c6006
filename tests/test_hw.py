"""Hardware-layer tests against the simulated controller/encoder.

These exercise the protocol framing, the listener thread, the closed-loop
executor (arrival / keyframes / stall / timeout / stop), and the sync monitor
with a fake clock so everything runs deterministically in milliseconds.
"""

import numpy as np
import pytest

from mamri_tpu.hw.devices import EncoderLink, MotorControllerLink
from mamri_tpu.hw.executor import RobotTaskRunner, TaskOutcome
from mamri_tpu.hw.sim import SimulatedEncoder, SimulatedMotorController, SimulatedRobot
from mamri_tpu.hw.sync import SyncMonitor
from mamri_tpu.hw.transport import LoopbackTransport


class FakeClock:
    def __init__(self):
        self.t = 1000.0

    def __call__(self):
        return self.t

    def advance(self, dt):
        self.t += dt


@pytest.fixture()
def rig():
    clock = FakeClock()
    robot = SimulatedRobot(speed_steps_per_s=400.0, clock=clock)
    mc_dev = SimulatedMotorController(robot)
    enc_dev = SimulatedEncoder(robot)
    mc = MotorControllerLink(LoopbackTransport(mc_dev))
    enc = EncoderLink(LoopbackTransport(enc_dev))
    assert mc.handshake()
    enc_dev.emit()  # first line for the handshake
    assert enc.handshake()
    yield clock, robot, mc_dev, enc_dev, mc, enc
    enc.disconnect()
    mc.disconnect()


def _settle_listener(enc_dev, enc, n=3):
    """Push fresh encoder lines and give the listener thread a beat to parse."""
    import time as _t

    for _ in range(n):
        enc_dev.emit()
    for _ in range(50):
        _t.sleep(0.002)
        if True:
            break


def test_handshake_wrong_device():
    """Controller handshake against an encoder-style device must fail."""
    clock = FakeClock()
    robot = SimulatedRobot(clock=clock)
    enc_dev = SimulatedEncoder(robot)
    tp = LoopbackTransport(enc_dev)
    mc = MotorControllerLink(tp)
    assert not mc.handshake()


def test_position_query_roundtrip(rig):
    clock, robot, mc_dev, enc_dev, mc, enc = rig
    pos = mc.query_positions()
    assert pos == [0] * 6
    mc.command_pose([100, -50, 30, 0, 0, 0])
    clock.advance(10.0)  # plenty of time to arrive
    assert mc.query_positions() == [100, -50, 30, 0, 0, 0]


def test_encoder_listener_tracks_motion_and_skips_garbage(rig):
    import time

    clock, robot, mc_dev, enc_dev, mc, enc = rig
    enc_dev.garbage_every = 2  # every other line corrupt
    mc.command_pose([200, 0, 0, 0, 0, 0])
    clock.advance(10.0)
    for _ in range(4):
        enc_dev.emit()
    deadline = time.time() + 1.0
    while time.time() < deadline:
        if enc.latest_position[0] == 200:
            break
        time.sleep(0.005)
    assert enc.latest_position[0] == 200


def test_executor_move_to_pose_success(rig):
    import time

    clock, robot, mc_dev, enc_dev, mc, enc = rig
    runner = RobotTaskRunner(mc, enc, clock=clock)
    runner.start("move_to_pose", target_steps=[120, 40, -60, 10, 0, 5])
    for _ in range(100):
        clock.advance(0.15)
        enc_dev.emit()
        time.sleep(0.003)  # listener thread
        st = runner.step()
        if st.outcome is not TaskOutcome.RUNNING:
            break
    assert st.outcome is TaskOutcome.SUCCESS
    assert enc.latest_position == [120, 40, -60, 10, 0, 5]


def test_executor_trajectory_keyframes(rig):
    import time

    clock, robot, mc_dev, enc_dev, mc, enc = rig
    kfs = [np.array([50, 0, 0, 0, 0, 0]), np.array([50, 80, 0, 0, 0, 0]), np.array([0, 80, 20, 0, 0, 0])]
    runner = RobotTaskRunner(mc, enc, clock=clock)
    runner.start("trajectory", keyframes=kfs)
    seen_targets = set()
    for _ in range(300):
        seen_targets.add(tuple(runner.state.target_steps.tolist()))
        clock.advance(0.15)
        enc_dev.emit()
        time.sleep(0.003)
        st = runner.step()
        if st.outcome is not TaskOutcome.RUNNING:
            break
    assert st.outcome is TaskOutcome.SUCCESS
    assert len(seen_targets) == 3  # visited every keyframe
    assert enc.latest_position == [0, 80, 20, 0, 0, 0]


def test_executor_stall_reissues_command(rig):
    import time

    clock, robot, mc_dev, enc_dev, mc, enc = rig
    robot.inject_stall([0])  # joint 0 slips: controller counts, mechanism doesn't
    runner = RobotTaskRunner(mc, enc, clock=clock)
    runner.start("jog", target_steps=[100, 0, 0, 0, 0, 0])
    reissues = 0
    last_cmd_time = runner.state.last_command_time
    for _ in range(60):
        clock.advance(0.15)
        enc_dev.emit()
        time.sleep(0.003)
        st = runner.step()
        if st.last_command_time != last_cmd_time:
            reissues += 1
            last_cmd_time = st.last_command_time
        if st.outcome is not TaskOutcome.RUNNING:
            break
    assert reissues >= 2  # kept re-issuing while stalled


def test_executor_timeout(rig):
    import time

    clock, robot, mc_dev, enc_dev, mc, enc = rig
    robot.inject_stall([0])
    runner = RobotTaskRunner(mc, enc, clock=clock)
    runner.start("move_to_pose", target_steps=[500, 0, 0, 0, 0, 0], timeout_s=5.0)
    for _ in range(100):
        clock.advance(0.3)
        enc_dev.emit()
        time.sleep(0.002)
        st = runner.step()
        if st.outcome is not TaskOutcome.RUNNING:
            break
    assert st.outcome is TaskOutcome.TIMEOUT


def test_executor_user_stop_soft_stops(rig):
    import time

    clock, robot, mc_dev, enc_dev, mc, enc = rig
    runner = RobotTaskRunner(mc, enc, clock=clock)
    runner.start("move_to_pose", target_steps=[10000, 0, 0, 0, 0, 0])
    clock.advance(0.5)
    enc_dev.emit()
    time.sleep(0.003)
    runner.step()
    runner.request_stop()
    st = runner.step()
    assert st.outcome is TaskOutcome.STOPPED
    # soft stop re-commanded the current position, not the big target
    assert abs(robot.targets[0] - robot.controller_counts[0]) < 500


def test_zeroing_protocol(rig):
    import time

    clock, robot, mc_dev, enc_dev, mc, enc = rig
    mc.command_pose([300, 0, 0, 0, 0, 0])
    clock.advance(10.0)
    enc_dev.emit(); time.sleep(0.005)
    assert enc.latest_position[0] == 300
    enc.reset_counters()
    mc.zero_counters()
    enc_dev.emit(); time.sleep(0.02)
    assert enc.latest_position[0] == 0
    assert mc.query_positions()[0] == 0


def test_sync_monitor_corrects_drift(rig):
    import time

    clock, robot, mc_dev, enc_dev, mc, enc = rig
    sync = SyncMonitor(mc, enc)
    # one-time slip of 30 steps on joint 1 mid-move: the encoder sees motion
    # (sync arms), the move settles 30 steps short, the settle check finds the
    # discrepancy and overwrites the controller counters; the outstanding
    # target then re-drives the joint the missing 30 steps. (A permanent
    # 100% slip produces no encoder movement at all and the reference's sync
    # — faithfully ours too — never arms: that is a hard hardware fault.)
    mc.command_pose([150, 200, 0, 0, 0, 0])
    clock.advance(0.2)
    robot.advance()
    robot.missed_steps[1] += 30.0  # the slip event
    for _ in range(10):
        clock.advance(0.25)
        enc_dev.emit()
        time.sleep(0.003)
        sync.step()
    assert sync.corrections >= 1
    # after the counter overwrite the outstanding target re-drives the slipped
    # joint with corrected counts — let it settle, then both must agree at the
    # commanded target
    for _ in range(20):
        clock.advance(0.25)
        enc_dev.emit()
        time.sleep(0.003)
        sync.step()
    assert mc.query_positions() == enc.latest_position == [150, 200, 0, 0, 0, 0]
