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


def test_wall_clock_soak_free_running_encoder():
    """VERDICT r3 #8: ~2 s of REAL wall time with a free-running encoder
    emitter thread, the blocking RobotTaskRunner.run loop, and the background
    sync loop all running concurrently — the one place ordering/timing bugs
    could hide from the fake-clock tests (reference: the 150 ms task QTimer
    and 250 ms sync QTimer running together, Mamri.py:485-581, 1250-1302).
    Asserts arrival, live updates were observed throughout, clean shutdown."""
    import threading
    import time

    from mamri_tpu.api import MamriEngine
    from mamri_tpu.hw.transport import LoopbackTransport

    robot = SimulatedRobot(speed_steps_per_s=1500.0, clock=time.time)
    mc_dev = SimulatedMotorController(robot)
    enc_dev = SimulatedEncoder(robot)
    tp_mc = LoopbackTransport(mc_dev)
    tp_enc = LoopbackTransport(enc_dev)

    stop_emit = threading.Event()

    def emitter():
        while not stop_emit.is_set():
            enc_dev.emit()
            time.sleep(0.004)  # ~250 Hz free-running stream

    emit_thread = threading.Thread(target=emitter, daemon=True)
    emit_thread.start()

    engine = MamriEngine()
    stack = engine.attach_hardware(tp_mc, tp_enc)
    enc_dev.garbage_every = 7  # corrupt lines mixed into the live stream
    stop_sync = stack.start_sync_loop(interval_s=0.05)

    observed = []
    engine_cb = stack.runner.pose_callback

    def spy_cb(steps):
        observed.append(np.asarray(steps).copy())
        engine_cb(steps)

    stack.runner.pose_callback = spy_cb

    target = [900, -600, 450, 300, -200, 120]
    stack.runner.start("move", target_steps=target, timeout_s=15.0)
    t0 = time.time()
    state = stack.runner.run(tick_interval_s=0.01)
    elapsed = time.time() - t0

    stop_sync()
    stop_emit.set()
    emit_thread.join(timeout=2.0)
    assert not emit_thread.is_alive()
    stack.disconnect()

    assert state.outcome is TaskOutcome.SUCCESS, (state.outcome, state.message)
    assert elapsed < 10.0
    # the listener tracked the stream live: many distinct intermediate
    # positions were observed, ending at the target
    distinct = {tuple(p) for p in observed}
    assert len(distinct) > 5, f"only {len(distinct)} distinct updates observed"
    np.testing.assert_array_equal(observed[-1], target)
    assert stack.encoder.latest_position == target
    # engine state followed the pose callback to the final pose
    np.testing.assert_allclose(
        engine.current_angles,
        np.asarray(engine.convert_steps_to_angles(np.asarray(target))),
        atol=1e-6,
    )
