"""Live execution mirror: pose stream, /watch SSE, /hw/* routes, hw --watch.

Reference behavior being mirrored: during hardware execution the widget
pushes encoder state into the 3-D scene on every 150 ms task tick
(`setRobotPose`, Mamri/Mamri.py:537) and refreshes the status panel at 4 Hz
(:582-648, :595). The headless rebuild publishes one frame per executor tick
on `HardwareStack.stream` (wired in `MamriEngine.attach_hardware`), serves
it as SSE on `GET /watch` (+ `/watch.html` live panel, `/hw/move|exec|stop`
remote control), and prints it from the CLI with `hw --watch`.
"""

import json
import threading
import time
import urllib.request

import numpy as np
import pytest

from mamri_tpu.api import MamriEngine
from mamri_tpu.api.server import MamriServer, make_http_server
from mamri_tpu.hw.sim import simulated_hardware
from mamri_tpu.hw.stream import PoseStream


# ------------------------------------------------------------- broker unit
def test_pose_stream_fanout_and_seq():
    s = PoseStream()
    a, b = s.subscribe(), s.subscribe()
    s.publish({"event": "pose", "x": 1})
    s.publish({"event": "pose", "x": 2})
    assert a.get(0.1)["x"] == 1 and a.get(0.1)["x"] == 2
    fb = b.get(0.1)
    assert fb["seq"] == 1 and s.last_frame["seq"] == 2
    a.close()
    s.publish({"event": "pose", "x": 3})  # must not reach the closed sub
    assert b.get(0.1)["x"] == 2 and b.get(0.1)["x"] == 3
    assert s.num_subscribers == 1
    b.close()


def test_pose_stream_drop_oldest_never_blocks():
    s = PoseStream()
    sub = s.subscribe(maxlen=4)
    for i in range(10):
        s.publish({"i": i})
    assert sub.dropped == 6
    got = [sub.get(0.05)["i"] for _ in range(4)]
    assert got == [6, 7, 8, 9]  # oldest dropped, newest kept
    assert sub.get(0.05) is None
    sub.close()


def test_pose_stream_close_wakes_blocked_consumer():
    s = PoseStream()
    sub = s.subscribe()
    out = []

    def consume():
        out.append(sub.get(timeout=5.0))

    t = threading.Thread(target=consume)
    t.start()
    time.sleep(0.05)
    s.close()
    t.join(timeout=2.0)
    assert not t.is_alive() and out == [None] and sub.closed


def test_frames_stops_at_terminal():
    s = PoseStream()
    sub = s.subscribe()
    s.publish({"event": "pose"})
    s.publish({"event": "task_finished", "outcome": "success"})
    s.publish({"event": "pose"})  # after terminal: not consumed by frames()
    got = list(sub.frames(idle_timeout_s=0.2))
    assert [f["event"] for f in got] == ["pose", "task_finished"]
    sub.close()


# -------------------------------------------------- executor -> stream wiring
@pytest.fixture()
def sim_rig():
    eng = MamriEngine()
    # slow enough that a just-started task is still alive when a watcher
    # subscribes a few ms after the start call returns
    stack, robot, shutdown = simulated_hardware(eng, speed_steps_per_s=4000.0)
    yield eng, stack, robot
    shutdown()


def test_executor_publishes_pose_frames_and_terminal(sim_rig):
    eng, stack, _ = sim_rig
    eng.baseplate_tf = np.eye(4, dtype=np.float32)  # unlock tcp_world frames
    sub = stack.stream.subscribe()
    stack.move_to_pose([400, 0, 0, 0, 0, 0], timeout_s=20.0)
    state = stack.runner.run(tick_interval_s=0.02)
    assert state.outcome.value == "success"
    frames = list(sub.frames(idle_timeout_s=0.5))
    sub.close()
    poses = [f for f in frames if f["event"] == "pose"]
    assert len(poses) >= 2, frames
    assert frames[-1]["event"] == "task_finished"
    assert frames[-1]["outcome"] == "success"
    p = poses[-1]
    assert p["target_steps"] == [400, 0, 0, 0, 0, 0]
    assert len(p["steps"]) == 6 and len(p["angles_deg"]) == 6
    assert "tcp_world" in p and len(p["tcp_world"]) == 3
    # the mirror also drove the engine pose (reference :537 semantics)
    assert abs(eng.current_angles[0] - 400 * 2 * np.pi / 3332.0) < 0.05


def test_stack_watch_generator(sim_rig):
    _, stack, _ = sim_rig
    frames = []

    def watch():
        frames.extend(stack.watch(idle_timeout_s=2.0))

    t = threading.Thread(target=watch)
    t.start()
    stack.move_to_pose([200, 0, 0, 0, 0, 0], timeout_s=20.0)
    stack.runner.run(tick_interval_s=0.02)
    t.join(timeout=5.0)
    assert not t.is_alive()
    assert frames and frames[-1]["event"] == "task_finished"


# ------------------------------------------------------------- server routes
@pytest.fixture()
def hw_server(sim_rig):
    eng, stack, robot = sim_rig
    core = MamriServer(engine=eng, hw_tick_s=0.02)
    return core, stack, robot


def _drain_watch(core, timeout=10.0):
    return list(core.watch_frames(idle_timeout_s=timeout, heartbeat_s=0.05))


def test_hw_move_and_watch_frames(hw_server):
    core, stack, _ = hw_server
    st, payload = core.handle(
        "POST", "/hw/move", json.dumps({"steps": [300, 0, 0, 0, 0, 0]}).encode(),
        "application/json",
    )
    assert st == 200 and payload["started"] and payload["watch"] == "/watch"
    frames = _drain_watch(core)
    assert frames[-1]["event"] == "task_finished"
    assert frames[-1]["outcome"] == "success"
    assert any(f["event"] == "pose" for f in frames)
    # runner thread wound down; a new task is accepted
    core._hw_thread.join(timeout=5.0)
    st, payload = core.handle(
        "POST", "/hw/move", json.dumps({"degrees": [0, 0, 0, 0, 0, 0]}).encode(),
        "application/json",
    )
    assert st == 200, payload
    assert _drain_watch(core)[-1]["event"] == "task_finished"


def test_hw_exec_keyframes_and_status_and_stop(hw_server):
    core, stack, robot = hw_server
    st, payload = core.handle("GET", "/hw/status", b"", "")
    assert st == 200 and payload["success"] and len(payload["joints"]) == 7
    st, payload = core.handle(
        "POST", "/hw/exec",
        json.dumps({"keyframes_deg": [[5, 0, 0, 0, 0, 0], [10, 0, 0, 0, 0, 0]]}).encode(),
        "application/json",
    )
    assert st == 200 and payload["mode"] == "trajectory", payload
    # a second task while one runs must 409 (or the first already finished)
    st2, p2 = core.handle(
        "POST", "/hw/move", json.dumps({"steps": [0] * 6}).encode(), "application/json"
    )
    assert st2 in (200, 409)
    frames = _drain_watch(core)
    assert frames[-1]["event"] == "task_finished"
    # stop with nothing active is still a clean 200 (idempotent operator path)
    st3, p3 = core.handle("POST", "/hw/stop", b"", "application/json")
    assert st3 == 200 and p3["stop_requested"]


def test_hw_routes_409_without_hardware():
    core = MamriServer(engine=MamriEngine())
    for method, route in (("GET", "/hw/status"), ("POST", "/hw/move"), ("POST", "/hw/stop")):
        st, payload = core.handle(method, route, b"{}", "application/json")
        assert st == 409, (route, payload)
        assert "no hardware" in payload["message"]


def test_watch_heartbeats_when_idle(hw_server):
    core, _, _ = hw_server
    t0 = time.monotonic()
    frames = list(core.watch_frames(max_frames=3, heartbeat_s=0.05, idle_timeout_s=0.4))
    # idle: no task -> encoder-only status heartbeats, then idle timeout ends it
    assert 0 < len(frames) <= 3
    assert all(f["event"] == "status" for f in frames)
    assert all(not f["task_active"] for f in frames)
    assert time.monotonic() - t0 < 5.0


# ----------------------------------------------------------- SSE over HTTP
def test_watch_sse_over_http(hw_server):
    core, _, _ = hw_server
    httpd = make_http_server(core, port=0)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    url = "http://%s:%d" % httpd.server_address[:2]
    try:
        req = urllib.request.Request(
            url + "/hw/move",
            data=json.dumps({"steps": [250, 0, 0, 0, 0, 0]}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=10) as r:
            assert r.status == 200
        with urllib.request.urlopen(url + "/watch?timeout=5", timeout=30) as r:
            assert r.headers["Content-Type"].startswith("text/event-stream")
            body = r.read().decode()
        events = [json.loads(ln[6:]) for ln in body.splitlines() if ln.startswith("data: ")]
        assert events, body
        assert events[-1]["event"] == "task_finished"
        assert events[-1]["outcome"] == "success"
        with urllib.request.urlopen(url + "/watch.html", timeout=10) as r:
            page = r.read().decode()
        assert "EventSource('/watch" in page
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_watch_without_hardware_is_clean_409():
    core = MamriServer(engine=MamriEngine())
    httpd = make_http_server(core, port=0)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    url = "http://%s:%d" % httpd.server_address[:2]
    try:
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(url + "/watch", timeout=10)
        assert ei.value.code == 409
    finally:
        httpd.shutdown()
        httpd.server_close()


# ------------------------------------------------------------- CLI --watch
def test_cli_hw_move_watch_prints_frames(capsys):
    from mamri_tpu.__main__ import main

    rc = main(
        ["hw", "move", "--sim", "--steps", "150", "0", "0", "0", "0", "0",
         "--tick", "0.02", "--sim-speed", "20000", "--watch"]
    )
    assert rc == 0
    out = capsys.readouterr().out
    lines = [ln for ln in out.splitlines() if ln.startswith("{")]
    frames = []
    for ln in lines:
        try:
            obj = json.loads(ln)
        except json.JSONDecodeError:
            continue
        if isinstance(obj, dict) and obj.get("event"):
            frames.append(obj)
    assert any(f["event"] == "pose" for f in frames), out
    assert any(f["event"] == "task_finished" for f in frames), out


def test_hw_task_rejected_while_draining(hw_server):
    """r5 review: a draining worker must not start a robot motion it cannot
    supervise to completion (the process is about to exit)."""
    core, stack, robot = hw_server
    core.draining = True
    core.drain_reason = "RSS budget reached (x/y MiB)"
    st, payload = core.handle(
        "POST", "/hw/move", json.dumps({"steps": [5, 0, 0, 0, 0, 0]}).encode(),
        "application/json",
    )
    assert st == 503 and payload["recycle"] is True
    assert not stack.runner.is_active
    core.draining = False
    core.drain_reason = None


def test_hw_status_passive_while_task_active(hw_server):
    """r5 review: /hw/status during a running task must not write the serial
    command channel from the handler thread (single-writer links) — it
    serves the lock-safe passive snapshot + the last streamed frame."""
    core, stack, robot = hw_server
    st, payload = core.handle(
        "POST", "/hw/move", json.dumps({"steps": [40, 0, 0, 0, 0, 0]}).encode(),
        "application/json",
    )
    assert st == 200, payload
    saw_passive = False
    for _ in range(300):
        st, payload = core.handle("GET", "/hw/status", b"", "")
        assert st == 200 and payload["success"]
        if payload.get("passive"):
            assert "joints" not in payload  # no controller round-trips
            # (task_active may already read False here: the task can finish
            # between the route's is_active check and this snapshot)
            saw_passive = True
        if not stack.runner.is_active and not payload.get("passive"):
            break
        time.sleep(0.01)
    assert saw_passive  # at least one status call landed mid-task
    # after the task, the full (controlling-thread) status path is back
    st, payload = core.handle("GET", "/hw/status", b"", "")
    assert st == 200 and "joints" in payload


def test_stop_hw_task_on_worker_exit(hw_server):
    """r5 review: a worker exiting mid-task must soft-stop and join the hw
    thread instead of abandoning a moving robot."""
    core, stack, robot = hw_server
    st, payload = core.handle(
        "POST", "/hw/move", json.dumps({"steps": [2000, 0, 0, 0, 0, 0],
                                        "timeout_s": 30.0}).encode(),
        "application/json",
    )
    assert st == 200, payload
    assert core.stop_hw_task(join_timeout_s=10.0)
    assert not stack.runner.is_active
    assert stack.runner.state.outcome.value in ("stopped", "success")


def test_no_new_hw_task_after_stop_hw_task(hw_server):
    """r5 review: stop_hw_task latches shutdown under _hw_lock — an in-flight
    /hw/move racing the worker exit gets a 503, never a started task."""
    core, stack, robot = hw_server
    assert core.stop_hw_task()
    st, payload = core.handle(
        "POST", "/hw/move", json.dumps({"steps": [1, 0, 0, 0, 0, 0]}).encode(),
        "application/json",
    )
    assert st == 503, payload
    assert not stack.runner.is_active
