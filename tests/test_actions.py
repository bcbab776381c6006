"""Headless button-gating state machine + tables (SURVEY #10).

Oracle: the reference's `_checkAllButtons` (Mamri.py:650-701) and
`_populatePoseTable` (Mamri.py:704-722) conditions, replayed against engine
state transitions (no GUI)."""

import numpy as np

from mamri_tpu.api import MamriEngine
from mamri_tpu.hw.sim import SimulatedEncoder, SimulatedMotorController, SimulatedRobot
from mamri_tpu.hw.transport import LoopbackTransport


def _attach_sim(engine):
    robot = SimulatedRobot(speed_steps_per_s=2000.0)
    mc_dev = SimulatedMotorController(robot)
    enc_dev = SimulatedEncoder(robot)
    enc_tp = LoopbackTransport(enc_dev)
    enc_dev.emit()  # seed the stream so the encoder handshake sees a line
    return engine.attach_hardware(LoopbackTransport(mc_dev), enc_tp), enc_dev


def test_gating_fresh_engine():
    eng = MamriEngine()
    acts = eng.available_actions()
    # nothing selected, nothing built, nothing connected
    assert not acts["estimate_pose"]
    assert "input volume" in acts["estimate_pose"].reason
    for k in ("plan_trajectory", "zero_robot", "playback", "execute_trajectory",
              "stop_trajectory", "return_to_zero", "move_to_pose",
              "manual_control", "zero_hardware", "encoder_command"):
        assert not acts[k], k
    # no task running -> connection actions are allowed (Mamri.py:678-680)
    for k in ("connect_controller", "refresh_ports", "connect_encoder"):
        assert acts[k], k
    # selecting a volume enables estimation only
    acts = eng.available_actions(have_volume=True)
    assert acts["estimate_pose"]
    assert not acts["plan_trajectory"]


def test_gating_model_built_and_planned():
    eng = MamriEngine()
    eng.baseplate_tf = np.eye(4, dtype=np.float32)  # "model built"
    acts = eng.available_actions(have_target=True, have_entry=True)
    assert acts["zero_robot"] and acts["plan_trajectory"]
    # target+entry alone (no model) must not enable planning (Mamri.py:657-661)
    assert not MamriEngine().available_actions(have_target=True, have_entry=True)["plan_trajectory"]
    assert not acts["playback"]
    eng.trajectory_path = np.zeros((5, 6), dtype=np.float32)
    assert eng.available_actions()["playback"]
    # hardware-dependent actions still gated: nothing connected
    assert not acts["execute_trajectory"] and not acts["move_to_pose"]


def test_gating_hardware_and_execution():
    eng = MamriEngine()
    hw, enc_dev = _attach_sim(eng)
    try:
        acts = eng.available_actions()
        assert acts["return_to_zero"] and acts["manual_control"]
        assert acts["zero_hardware"] and acts["encoder_command"]
        # move_to_pose additionally needs a pose estimate (Mamri.py:688)
        assert not acts["move_to_pose"]
        eng.last_estimated_steps = np.zeros(6, dtype=int)
        assert eng.available_actions()["move_to_pose"]
        # execute needs keyframes too (Mamri.py:682-683)
        assert not acts["execute_trajectory"]
        eng.trajectory_keyframes = np.zeros((4, 6), dtype=np.float32)
        assert eng.available_actions()["execute_trajectory"]

        # while a task runs, everything motion-issuing flips off and only
        # stop flips on (Mamri.py:676-690)
        hw.return_to_zero()
        running = eng.available_actions()
        assert running["stop_trajectory"]
        for k in ("execute_trajectory", "return_to_zero", "move_to_pose",
                  "manual_control", "zero_hardware", "encoder_command",
                  "connect_controller", "refresh_ports", "connect_encoder"):
            assert not running[k], k
        hw.stop()
        enc_dev.emit()
        hw.runner.step()  # observes the stop request -> task retires
        assert not eng.available_actions()["stop_trajectory"]
    finally:
        hw.disconnect()


def test_pose_table_rows():
    eng = MamriEngine()
    rows = eng.pose_table(title="Start Pose")
    assert rows[0] == ("Start Pose", "Steps", "Degrees (°)")
    assert len(rows) == 1 + eng.model.num_joints
    assert all(r[1:] == ("...", "...") for r in rows[1:])
    pose = np.deg2rad([10.0, -15.0, 0.0, 5.0, 0.0, 90.0])
    rows = eng.pose_table(pose)
    # degrees column formatted %.2f (Mamri.py:716), steps via the truncating
    # converter the hardware uses
    assert [r[2] for r in rows[1:]] == ["10.00", "-15.00", "0.00", "5.00", "0.00", "90.00"]
    steps = eng.convert_angles_to_steps(pose)
    assert [r[1] for r in rows[1:]] == [str(int(s)) for s in steps]


def test_joint_status_table():
    eng = MamriEngine()
    hw, enc_dev = _attach_sim(eng)
    try:
        enc_dev.emit()
        rows = hw.joint_status_table()
        assert rows[0] == ("Joint", "Encoder (steps)", "Controller (steps)", "Target (steps)")
        assert len(rows) == 1 + eng.model.num_joints
        # connected encoder/controller report numeric steps; no task -> "..."
        assert all(r[1] == "0" and r[2] == "0" and r[3] == "..." for r in rows[1:])
    finally:
        hw.disconnect()
