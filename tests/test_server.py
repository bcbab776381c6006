"""Serving-surface tests (api/server.py): one warm engine behind HTTP/JSON.

Drives the real ThreadingHTTPServer over a loopback socket (port 0) — the
transport, the JSON contracts, the data-root jail, concurrent requests, and
the budget-drain worker-recycling state machine. One engine is shared across
server instances so the fused pipeline compiles once for the whole module.
"""

import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from mamri_tpu.api.server import (
    RECYCLE_EXIT_CODE,
    MamriServer,
    make_http_server,
    serve,
)
from mamri_tpu.perception.io import save_nifti
from mamri_tpu.perception.volume import synthetic_volume


@pytest.fixture(scope="module")
def scan_path(tmp_path_factory):
    """Same partial scene as the CLI tests: baseplate triplet + body blob
    (pose fails with a graceful message, markers/entry still exercised)."""
    pts = np.array([[-10.0, 20.0, 5.0], [10.0, 20.0, 5.0], [-10.0, -20.0, 5.0]], dtype=np.float32)
    v = synthetic_volume(
        shape=(64, 64, 64),
        fiducials_ras=pts,
        fiducial_radius_mm=3.0,
        body_center_ras=[0.0, 0.0, -18.0],
        body_radii_mm=[22.0, 20.0, 10.0],
    )
    p = str(tmp_path_factory.mktemp("srv") / "scan.nii.gz")
    save_nifti(p, v)
    return p


@pytest.fixture(scope="module")
def engine():
    from mamri_tpu.api import MamriEngine

    return MamriEngine()


def _spin(core):
    """Start the HTTP server on a free loopback port; -> (base_url, thread)."""
    httpd = make_http_server(core, host="127.0.0.1", port=0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    host, port = httpd.server_address[:2]
    return f"http://{host}:{port}", t, httpd


def _req(url, payload=None, raw=None, method=None):
    """-> (status, parsed_json). Never raises on HTTP error statuses."""
    if raw is not None:
        req = urllib.request.Request(url, data=raw, method=method or "POST",
                                     headers={"Content-Type": "application/octet-stream"})
    elif payload is not None:
        req = urllib.request.Request(url, data=json.dumps(payload).encode(),
                                     method=method or "POST",
                                     headers={"Content-Type": "application/json"})
    else:
        req = urllib.request.Request(url, method=method or "GET")
    try:
        with urllib.request.urlopen(req, timeout=600) as r:
            return r.status, json.loads(r.read().decode())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read().decode())


@pytest.fixture()
def server(engine):
    core = MamriServer(engine=engine)
    url, t, httpd = _spin(core)
    yield url, core
    httpd.shutdown()
    httpd.server_close()
    t.join(timeout=10)


def test_healthz_and_status(server):
    url, core = server
    st, out = _req(url + "/healthz")
    assert st == 200 and out == {"ok": True}
    st, out = _req(url + "/status")
    assert st == 200
    assert out["frames_served"] == 0 and out["draining"] is False
    assert out["rss_mb"] > 0 and "pipeline_cache_entries" in out
    assert out["backend"] == "cpu"  # conftest pins the virtual CPU mesh


def test_estimate_path_mode(server, scan_path):
    url, core = server
    st, out = _req(url + "/estimate", payload={"path": scan_path})
    assert st == 200
    # partial scene: graceful failure with the detected baseplate reported
    assert out["success"] is False
    assert out["markers_found"]["Baseplate"] is True
    assert out["markers_found"]["Joint6"] is False
    assert core.frames_served == 1


def test_estimate_raw_upload(server, scan_path):
    url, _ = server
    with open(scan_path, "rb") as f:
        body = f.read()
    st, out = _req(url + "/estimate", raw=body)
    assert st == 200
    assert out["markers_found"]["Baseplate"] is True


def test_estimate_batch(server, scan_path, tmp_path):
    """Homogeneous batch over the wire -> vmapped pipeline, per-volume rows."""
    import shutil

    url, _ = server
    p2 = str(tmp_path / "scan2.nii.gz")
    shutil.copy(scan_path, p2)
    st, out = _req(url + "/estimate_batch", payload={"paths": [scan_path, p2]})
    assert st == 200 and out["batch"] == 2 and len(out["results"]) == 2
    for r in out["results"]:
        assert r["success"] is False  # partial scene: no Joint6 triplet
        assert r["certified"] is True  # but the segmentation certificates hold

    # request validation
    st, out = _req(url + "/estimate_batch", payload={"paths": []})
    assert st == 400
    st, out = _req(url + "/estimate_batch", payload={"paths": [scan_path], "microbatch": 3})
    assert st == 400 and "microbatch" in out["message"]

    # heterogeneous batch is rejected with the offending path
    from mamri_tpu.perception.io import save_nifti
    from mamri_tpu.perception.volume import synthetic_volume

    odd = synthetic_volume(shape=(32, 32, 32))
    p3 = str(tmp_path / "odd.nii.gz")
    save_nifti(p3, odd)
    st, out = _req(url + "/estimate_batch", payload={"paths": [scan_path, p3]})
    assert st == 422 and "odd.nii.gz" in out["message"]


def test_entry_composes_pose_and_search(server, scan_path):
    url, _ = server
    st, out = _req(url + "/entry", payload={"path": scan_path, "target": [0, 0, -18]})
    assert st == 200 and out["success"] is True
    assert out["distance_mm"] < 80.0
    assert len(out["entry_ras"]) == 3
    assert out["pose"]["markers_found"]["Baseplate"] is True


def test_entry_raw_upload_query_target(server, scan_path):
    """Raw uploads carry options in the query string (?target=R,A,S)."""
    url, _ = server
    with open(scan_path, "rb") as f:
        body = f.read()
    st, out = _req(url + "/entry?target=0,0,-18", raw=body)
    assert st == 200 and out["success"] is True
    st, out = _req(url + "/entry?target=1,2", raw=body)
    assert st == 400 and "target" in out["message"]
    st, out = _req(url + "/estimate?bogus=1", raw=body)
    assert st == 400 and "unknown query option" in out["message"]


def test_plan_rejects_unsolvable_pose(server, scan_path):
    """Partial scene: /plan must fail with 422 + the pose message, not 500."""
    url, _ = server
    st, out = _req(url + "/plan", payload={"path": scan_path, "target": [0, 0, -18]})
    assert st == 422
    assert out["success"] is False and "pose estimation failed" in out["message"]


def test_request_errors(server, tmp_path):
    url, _ = server
    st, out = _req(url + "/estimate", payload={})  # no path
    assert st == 400 and "path" in out["message"]
    st, out = _req(url + "/entry", payload={"path": "x", "target": [1, 2]})
    assert st == 400 and "target" in out["message"]
    st, out = _req(url + "/estimate", payload={"path": str(tmp_path / "missing.nii")})
    assert st == 422
    st, out = _req(url + "/estimate", raw=b"not a volume")
    assert st == 422
    st, out = _req(url + "/nope")
    assert st == 404
    # malformed JSON body
    req = urllib.request.Request(url + "/estimate", data=b"{oops", method="POST",
                                 headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req, timeout=60) as r:
            st = r.status
    except urllib.error.HTTPError as e:
        st = e.code
    assert st == 400


def test_data_root_jail(engine, scan_path, tmp_path):
    import shutil

    shutil.copy(scan_path, tmp_path / "in_root.nii.gz")
    core = MamriServer(engine=engine, data_root=str(tmp_path))
    url, t, httpd = _spin(core)
    try:
        st, out = _req(url + "/estimate", payload={"path": "in_root.nii.gz"})
        assert st == 200
        st, out = _req(url + "/estimate", payload={"path": "../" + tmp_path.name + "x/../../etc/passwd"})
        assert st == 403
        st, out = _req(url + "/estimate", payload={"path": scan_path})  # absolute escape
        assert st == 403 or st == 200 and False, f"absolute path escaped the jail: {st}"
    finally:
        httpd.shutdown()
        httpd.server_close()
        t.join(timeout=10)


def test_upload_size_limit(engine):
    core = MamriServer(engine=engine, max_upload_bytes=128)
    url, t, httpd = _spin(core)
    try:
        st, out = _req(url + "/estimate", raw=b"\0" * 256)
        assert st == 413
    finally:
        httpd.shutdown()
        httpd.server_close()
        t.join(timeout=10)


def test_concurrent_estimates(server, scan_path):
    url, _ = server
    results = [None, None]

    def hit(i):
        results[i] = _req(url + "/estimate", payload={"path": scan_path})

    ts = [threading.Thread(target=hit, args=(i,)) for i in range(2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=600)
    for st, out in results:
        assert st == 200 and out["markers_found"]["Baseplate"] is True


def test_frame_budget_drains_worker(engine, scan_path):
    """max_frames=1: the first request succeeds, then the worker drains —
    healthz 503 {recycle}, compute requests 503, serve_forever returns."""
    core = MamriServer(engine=engine, max_frames=1)
    url, t, httpd = _spin(core)
    st, out = _req(url + "/estimate", payload={"path": scan_path})
    assert st == 200
    # the drain shutdown is issued from a helper thread; wait for it
    t.join(timeout=30)
    assert not t.is_alive(), "serve_forever did not return after the budget drained"
    assert core.draining and "frame budget" in core.drain_reason
    httpd.server_close()
    # the CLI maps a budget drain to the recycle exit code
    assert core.drain_reason != "shutdown requested"


def test_draining_rejects_compute(engine, scan_path):
    """A drained core answers 503/recycle without touching the engine."""
    core = MamriServer(engine=engine)
    core.draining = True
    core.drain_reason = "frame budget reached (1/1)"
    st, out = core.handle("POST", "/estimate", json.dumps({"path": scan_path}).encode(),
                          "application/json")
    assert st == 503 and out["recycle"] is True
    st, out = core.handle("GET", "/healthz", b"", "")
    assert st == 503 and out["recycle"] is True


def test_shutdown_route_exits_zero(engine):
    """POST /shutdown: serve() returns 0 (clean stop), not the recycle code."""
    core = MamriServer(engine=engine)
    rc = {}

    def run():
        rc["code"] = serve(core, host="127.0.0.1", port=0)

    t = threading.Thread(target=run, daemon=True)
    t.start()
    # wait for the server socket to bind
    for _ in range(200):
        if core._httpd is not None:
            break
        import time

        time.sleep(0.01)
    host, port = core._httpd.server_address[:2]
    st, out = _req(f"http://{host}:{port}/shutdown", payload={})
    assert st == 200 and out["draining"] is True
    t.join(timeout=30)
    assert not t.is_alive()
    assert rc["code"] == 0


def test_supervise_respawns_on_budget_drain(scan_path):
    """End-to-end `serve --supervise`: the frame budget drains worker #1
    (exit 3), the supervisor respawns a fresh worker on the same port, the
    next request lands on it, and /shutdown ends supervision with rc 0."""
    import socket
    import subprocess
    import sys
    import time

    with socket.socket() as s:  # pick a free port
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    proc = subprocess.Popen(
        [sys.executable, "-m", "mamri_tpu", "serve", "--supervise",
         "--platform", "cpu", "--port", str(port), "--max-frames", "1",
         "--max-restarts", "3"],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    url = f"http://127.0.0.1:{port}"
    try:
        def wait_healthy(timeout_s=240):
            deadline = time.monotonic() + timeout_s
            while time.monotonic() < deadline:
                try:
                    st, out = _req(url + "/healthz")
                    if st == 200:
                        return
                except OSError:
                    pass
                time.sleep(0.25)
            raise AssertionError("worker never became healthy")

        wait_healthy()
        st, out = _req(url + "/estimate", payload={"path": scan_path})
        assert st == 200
        # worker #1 drains; the supervisor brings up worker #2 on the port.
        # Poll /status until a FRESH process answers (frames_served == 0) —
        # worker #1 may still answer 503s while its in-flight drain finishes.
        deadline = time.monotonic() + 240
        while True:
            assert time.monotonic() < deadline, "no fresh worker appeared"
            try:
                st, out = _req(url + "/status")
                if st == 200 and out["frames_served"] == 0:
                    break
            except OSError:
                pass
            time.sleep(0.25)
        st, _ = _req(url + "/shutdown", payload={})
        assert st == 200
        assert proc.wait(timeout=120) == 0  # clean stop ends supervision
    finally:
        if proc.poll() is None:
            proc.terminate()
            proc.wait(timeout=30)


def test_rss_budget_math(engine, monkeypatch):
    """RSS budget: exceeding flips draining with the measured number."""
    core = MamriServer(engine=engine, max_rss_mb=1.0)  # any real process > 1 MiB
    core._check_budgets()
    assert core.draining and "RSS budget" in core.drain_reason
    assert RECYCLE_EXIT_CODE == 3


def test_batch_spends_batch_size_frames(engine, monkeypatch):
    """ADVICE r4: /estimate_batch of N volumes spends N frames of the leak
    budget (N H2D uploads), not 1."""
    core = MamriServer(engine=engine, max_frames=10)
    core._check_budgets(4)
    assert core.frames_served == 4 and not core.draining
    core._check_budgets(6)
    assert core.frames_served == 10 and core.draining
    assert "frame budget" in core.drain_reason


def test_shutdown_during_budget_drain_still_exits_zero(engine):
    """ADVICE r4: an operator /shutdown on a worker already draining for a
    budget must end supervision (exit 0), not be respawned (exit 3)."""
    core = MamriServer(engine=engine)
    rc = {}

    def run():
        rc["code"] = serve(core, host="127.0.0.1", port=0)

    t = threading.Thread(target=run, daemon=True)
    t.start()
    for _ in range(200):
        if core._httpd is not None:
            break
        import time

        time.sleep(0.01)
    # budget drain first...
    core.draining = True
    core.drain_reason = "RSS budget reached (999/100 MiB)"
    host, port = core._httpd.server_address[:2]
    # ...then the operator explicitly stops the worker
    st, out = _req(f"http://{host}:{port}/shutdown", payload={})
    assert st == 200
    t.join(timeout=30)
    assert not t.is_alive()
    assert rc["code"] == 0  # drain_reason says budget, but shutdown wins


def test_shutdown_token_required_when_configured(engine):
    core = MamriServer(engine=engine, shutdown_token="s3cret")
    st, out = core.handle("POST", "/shutdown", b"{}", "application/json")
    assert st == 403 and not core.shutdown_requested
    st, out = core.handle(
        "POST", "/shutdown", json.dumps({"token": "s3cret"}).encode(), "application/json"
    )
    assert st == 200 and core.shutdown_requested


def test_malformed_content_length_is_400(engine):
    """ADVICE r4: a non-integer Content-Length must map to a 400 response,
    not an uncaught ValueError that kills the connection silently."""
    import http.client

    core = MamriServer(engine=engine)
    httpd = make_http_server(core, port=0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    host, port = httpd.server_address[:2]
    try:
        conn = http.client.HTTPConnection(host, port, timeout=10)
        conn.putrequest("POST", "/estimate")
        conn.putheader("Content-Type", "application/json")
        conn.putheader("Content-Length", "not-a-number")
        conn.endheaders()
        resp = conn.getresponse()
        assert resp.status == 400
        assert b"Content-Length" in resp.read()
        conn.close()
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_supervise_parent_is_import_light():
    """ADVICE r4: the supervise() import path must not pull jax/the engine
    into the parent process (leaked device state must die with workers)."""
    import subprocess
    import sys

    # NOTE: this image's sitecustomize imports jax into EVERY process, so
    # the assertion is about what the mamri import chain ADDS: the engine
    # (and with it the robot model / device arrays) must stay unloaded.
    code = (
        "import sys\n"
        "from mamri_tpu.api.server import supervise, MamriServer, RECYCLE_EXIT_CODE\n"
        "heavy = ('mamri_tpu.api.engine', 'mamri_tpu.core.robot',\n"
        "         'mamri_tpu.perception.segmentation')\n"
        "mods = [m for m in heavy if m in sys.modules]\n"
        "assert not mods, f'supervise import dragged in {mods}'\n"
        "print('light')\n"
    )
    out = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True)
    assert out.returncode == 0, out.stderr
    assert "light" in out.stdout


def test_batch_validation_failure_spends_no_budget(engine):
    """r5 review: a batch rejected at validation/load time uploaded nothing,
    so it must not spend the frame budget the leak flag exists to bound."""
    core = MamriServer(engine=engine, max_frames=10)
    st, out = core.handle(
        "POST", "/estimate_batch",
        json.dumps({"paths": [f"/nonexistent/{i}.nii" for i in range(500)]}).encode(),
        "application/json",
    )
    assert st == 422 and not out["success"]
    assert core.frames_served == 0 and not core.draining
