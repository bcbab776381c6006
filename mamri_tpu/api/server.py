"""Production serving surface: one long-lived warm engine behind HTTP/JSON.

The reference is an interactive Slicer panel — one operator, one scene
(Mamri/Mamri.py:248-400 builds the widget; `process()` runs on a button).
Deployed at scale, the equivalent workload is a scanner (or a DICOM router)
emitting volumes at a steady cadence into a service that must answer with
joint angles in bounded time. This module is that service: a stdlib-only
ThreadingHTTPServer wrapping ONE `MamriEngine`, so every request after the
first reuses the engine's compiled-program caches (the fused pipeline is
jitted once per volume shape; see `MamriEngine._get_pipeline`).

Design points:

- **One compute lock.** A single accelerator runs one fused program at a
  time anyway; request threads overlap socket I/O, upload parsing, and file
  decode with the current request's device compute, but engine calls are
  serialized under `_compute_lock`. That also lets the engine keep its
  single-operator state contract (ARCHITECTURE §5c): pose/entry/plan
  requests compose through `last_segmentation` exactly like the reference's
  workflow, with the lock held across the whole composition. Scale-out is
  one worker process per chip, not threads.
- **Worker recycling.** On the axon relay, every H2D upload leaks ~the full
  staged buffer in host RSS (environment bug, measured r4 — see
  docs/ROADMAP.md); long-running ingest loops must recycle the process.
  `--max-rss-mb` / `--max-frames` make that a first-class server behavior:
  once a budget is exceeded the worker *drains* — `/healthz` flips to 503
  so a supervisor/load-balancer stops routing to it, in-flight work
  completes, new compute requests get 503 `{"recycle": true}`, and
  `serve_forever` returns so the CLI can exit with code 3 (restart-me).
- **Two ingest modes.** `{"path": ...}` for the shared-storage/DICOM-router
  integration (any format `perception.formats.load_volume` sniffs,
  including a DICOM series directory), or a raw volume upload
  (`application/octet-stream` body = the bytes of a .nii/.nii.gz/.nrrd/
  .mha/.dcm file — magic-sniffed, no filename needed). Path mode can be
  jailed under `data_root`.
"""

from __future__ import annotations

import json
import logging
import os
import tempfile
import threading
import time
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

DEFAULT_MAX_UPLOAD_BYTES = 2 << 30  # 2 GiB: a 512^3 f32 volume is 512 MiB
RECYCLE_EXIT_CODE = 3  # CLI exit code asking the supervisor for a restart


def _rss_mb() -> float:
    """Current resident set size in MiB (Linux /proc; 0.0 if unreadable)."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return float(line.split()[1]) / 1024.0
    except OSError:
        pass
    return 0.0


def _pose_json(res) -> dict:
    """PoseEstimate -> the CLI `estimate` JSON contract (__main__.py)."""
    out = {
        "success": res.success,
        "message": res.message,
        "baseplate_source": res.baseplate_source,
        "markers_found": res.markers_found,
        "num_blobs": res.num_blobs,
    }
    if res.success:
        out.update(
            angles_deg=np.rad2deg(res.angles_rad).round(3).tolist(),
            steps=res.steps.tolist(),
            rmse_mm=round(float(res.rmse_mm), 4),
        )
    return out


class ServerError(Exception):
    """Request-level failure with an HTTP status (4xx/5xx) and a message."""

    def __init__(self, status: int, message: str):
        super().__init__(message)
        self.status = status


class MamriServer:
    """The service core: owns the engine, budgets, and request handlers.

    Transport-independent — `handle(method, route, body, content_type)`
    returns `(status, payload_dict)`, so tests can also drive it without
    sockets. `ThreadingHTTPServer` integration lives in `make_http_server`.
    """

    ROUTES_GET = ("/healthz", "/status")
    ROUTES_POST = ("/estimate", "/estimate_batch", "/entry", "/plan", "/shutdown")

    def __init__(
        self,
        engine=None,
        data_root: Optional[str] = None,
        max_rss_mb: Optional[float] = None,
        max_frames: Optional[int] = None,
        max_upload_bytes: int = DEFAULT_MAX_UPLOAD_BYTES,
    ):
        if engine is None:
            from mamri_tpu.api.engine import MamriEngine

            engine = MamriEngine()
        self.engine = engine
        self.data_root = os.path.realpath(data_root) if data_root else None
        self.max_rss_mb = max_rss_mb
        self.max_frames = max_frames
        self.max_upload_bytes = int(max_upload_bytes)
        self._compute_lock = threading.Lock()
        self._state_lock = threading.Lock()  # counters + draining flag
        self.frames_served = 0
        self.started_at = time.monotonic()
        self.draining = False
        self.drain_reason: Optional[str] = None
        self._httpd: Optional[ThreadingHTTPServer] = None

    # ------------------------------------------------------------- ingest
    def _resolve_path(self, path: str) -> str:
        real = os.path.realpath(
            os.path.join(self.data_root, path) if self.data_root else path
        )
        if self.data_root is not None and not (
            real == self.data_root or real.startswith(self.data_root + os.sep)
        ):
            raise ServerError(403, f"path escapes data root: {path}")
        return real

    def _load_volume(self, body: bytes, content_type: str, opts: dict):
        from mamri_tpu.perception.formats import load_volume

        if content_type.startswith("application/json"):
            path = opts.get("path")
            if not path:
                raise ServerError(400, "JSON body needs a 'path' field")
            try:
                return load_volume(self._resolve_path(str(path)))
            except (OSError, ValueError) as e:
                raise ServerError(422, f"cannot load volume: {e}")
        # raw upload: magic-sniffed single file. load_volume dispatches on
        # extension first, so mirror the gzip case in the suffix.
        suffix = ".nii.gz" if body[:2] == b"\x1f\x8b" else ".bin"
        fd, tmp = tempfile.mkstemp(suffix=suffix, prefix="mamri_upload_")
        try:
            with os.fdopen(fd, "wb") as f:
                f.write(body)
            try:
                return load_volume(tmp)
            except (OSError, ValueError) as e:
                raise ServerError(422, f"cannot decode uploaded volume: {e}")
        finally:
            os.unlink(tmp)

    @staticmethod
    def _parse(body: bytes, content_type: str) -> dict:
        if not content_type.startswith("application/json"):
            return {}
        try:
            opts = json.loads(body.decode("utf-8") or "{}")
        except (UnicodeDecodeError, json.JSONDecodeError) as e:
            raise ServerError(400, f"malformed JSON body: {e}")
        if not isinstance(opts, dict):
            raise ServerError(400, "JSON body must be an object")
        return opts

    @staticmethod
    def _target(opts: dict, key: str = "target") -> np.ndarray:
        t = opts.get(key)
        if not (isinstance(t, (list, tuple)) and len(t) == 3):
            raise ServerError(400, f"'{key}' must be [R, A, S] (mm)")
        try:
            return np.asarray([float(v) for v in t], dtype=np.float32)
        except (TypeError, ValueError):
            raise ServerError(400, f"'{key}' must be three numbers")

    @staticmethod
    def _coerce_query(query: dict) -> dict:
        """Query-string options for raw-upload requests (`?target=0,0,-18&
        safety=5`): coerce to the JSON option types. JSON-body fields win."""
        out = {}
        for key, val in query.items():
            if key in ("target", "entry"):
                out[key] = [p for p in str(val).split(",") if p != ""]
            elif key == "safety":
                out[key] = val
            elif key in ("correction", "use_saved_baseplate", "remember_baseplate"):
                out[key] = str(val).lower() in ("1", "true", "yes", "on")
            elif key == "path":
                out[key] = str(val)
            else:
                raise ServerError(400, f"unknown query option: {key}")
        return out

    # ------------------------------------------------------------ budgets
    def _check_budgets(self) -> None:
        """Called after each compute request; flips the worker to draining."""
        with self._state_lock:
            self.frames_served += 1
            if self.draining:
                return
            if self.max_frames is not None and self.frames_served >= self.max_frames:
                self.draining = True
                self.drain_reason = f"frame budget reached ({self.frames_served}/{self.max_frames})"
            elif self.max_rss_mb is not None:
                rss = _rss_mb()
                if rss >= self.max_rss_mb:
                    self.draining = True
                    self.drain_reason = f"RSS budget reached ({rss:.0f}/{self.max_rss_mb:.0f} MiB)"
        if self.draining:
            logger.warning("worker draining: %s", self.drain_reason)
            self._stop_accepting()

    def _stop_accepting(self) -> None:
        httpd = self._httpd
        if httpd is not None:
            # shutdown() blocks until serve_forever returns — do it from a
            # helper thread so the in-flight request's handler can finish.
            threading.Thread(target=httpd.shutdown, daemon=True).start()

    # ----------------------------------------------------------- handlers
    def handle(self, method: str, route: str, body: bytes, content_type: str,
               query: Optional[dict] = None):
        """-> (http_status, json_payload). Raises nothing."""
        try:
            if method == "GET" and route == "/healthz":
                return self._healthz()
            if method == "GET" and route == "/status":
                return 200, self.status()
            if method == "POST" and route == "/shutdown":
                with self._state_lock:
                    self.draining = True
                    self.drain_reason = self.drain_reason or "shutdown requested"
                self._stop_accepting()
                return 200, {"ok": True, "draining": True}
            if method == "POST" and route == "/estimate_batch":
                if self.draining:
                    return 503, {"success": False, "recycle": True,
                                 "message": f"worker draining: {self.drain_reason}"}
                opts = self._parse(body, content_type)
                try:
                    with self._compute_lock:
                        payload = self._do_estimate_batch(opts)
                finally:
                    self._check_budgets()
                return 200, payload
            if method == "POST" and route in ("/estimate", "/entry", "/plan"):
                if self.draining:
                    return 503, {"success": False, "recycle": True,
                                 "message": f"worker draining: {self.drain_reason}"}
                opts = {**self._coerce_query(query or {}), **self._parse(body, content_type)}
                # validate request options BEFORE decoding a (possibly huge)
                # volume, so malformed requests fail fast and cheap
                if route == "/entry":
                    self._target(opts)
                elif route == "/plan":
                    self._target(opts)
                    if "entry" in opts:
                        self._target(opts, "entry")
                vol = self._load_volume(body, content_type, opts)
                try:
                    with self._compute_lock:
                        payload = getattr(self, "_do" + route.replace("/", "_"))(vol, opts)
                finally:
                    self._check_budgets()
                return 200, payload
            return 404, {"success": False, "message": f"no route {method} {route}"}
        except ServerError as e:
            return e.status, {"success": False, "message": str(e)}
        except Exception as e:  # a bug must not kill the worker thread pool
            logger.exception("request failed: %s %s", method, route)
            return 500, {"success": False, "message": f"{type(e).__name__}: {e}"}

    def _healthz(self):
        with self._state_lock:
            if self.draining:
                return 503, {"ok": False, "recycle": True, "reason": self.drain_reason}
        return 200, {"ok": True}

    def status(self) -> dict:
        import jax

        eng = self.engine
        with self._state_lock:
            out = {
                "frames_served": self.frames_served,
                "uptime_s": round(time.monotonic() - self.started_at, 1),
                "draining": self.draining,
                "drain_reason": self.drain_reason,
            }
        out.update(
            rss_mb=round(_rss_mb(), 1),
            max_rss_mb=self.max_rss_mb,
            max_frames=self.max_frames,
            backend=jax.default_backend(),
            pipeline_cache_entries=len(eng._pipeline_cache),
            has_saved_baseplate=eng.saved_baseplate is not None,
        )
        return out

    # Each _do_* runs with _compute_lock held and a decoded Volume in hand.
    def _do_estimate(self, vol, opts: dict) -> dict:
        res = self.engine.estimate_pose(
            vol,
            use_saved_baseplate=bool(opts.get("use_saved_baseplate", False)),
            apply_correction=bool(opts.get("correction", False)),
        )
        out = _pose_json(res)
        if opts.get("remember_baseplate") and res.success:
            # keep the transform in the worker (reference: save-baseplate
            # button, Mamri.py:1035-1043); later requests opt in with
            # use_saved_baseplate.
            self.engine.save_baseplate()
            out["baseplate_remembered"] = True
        return out

    def _do_estimate_batch(self, opts: dict) -> dict:
        """The flagship throughput path over the wire: a homogeneous batch of
        volumes (one scanner geometry — same shape/spacing/origin, e.g. a
        time series) through the vmapped fused pipeline with per-volume
        certificate escalation (`MamriEngine.estimate_pose_batch`)."""
        from mamri_tpu.perception.formats import load_volume

        paths = opts.get("paths")
        if not (isinstance(paths, list) and paths and all(isinstance(p, str) for p in paths)):
            raise ServerError(400, "'paths' must be a non-empty list of volume paths")
        microbatch = opts.get("microbatch")
        if microbatch is not None:
            microbatch = int(microbatch)
            if microbatch <= 0 or len(paths) % microbatch:
                raise ServerError(400, f"microbatch {microbatch} must divide batch {len(paths)}")
        vols = []
        for p in paths:
            try:
                vols.append(load_volume(self._resolve_path(p)))
            except (OSError, ValueError) as e:
                raise ServerError(422, f"cannot load volume {p!r}: {e}")
        v0 = vols[0]
        for p, v in zip(paths[1:], vols[1:]):
            if np.asarray(v.data).shape != np.asarray(v0.data).shape:
                raise ServerError(422, f"batch is not homogeneous: {p!r} has shape "
                                       f"{np.asarray(v.data).shape}, expected {np.asarray(v0.data).shape}")
            if not (np.allclose(v.spacing, v0.spacing) and np.allclose(v.origin, v0.origin)):
                raise ServerError(422, f"batch is not homogeneous: {p!r} has different geometry")
        batch = np.stack([np.asarray(v.data) for v in vols])
        out = self.engine.estimate_pose_batch(
            batch, v0.spacing, v0.origin,
            apply_correction=bool(opts.get("correction", False)),
            microbatch=microbatch,
        )
        certified = out["seg_converged"] & out["roots_complete"] & out["blobs_complete"]
        results = []
        for i, p in enumerate(paths):
            ok = bool(out["success"][i])
            r = {"path": p, "success": ok, "certified": bool(certified[i])}
            if ok:
                r.update(
                    angles_deg=np.rad2deg(out["angles"][i]).round(3).tolist(),
                    steps=np.asarray(out["steps"][i]).astype(int).tolist(),
                    rmse_mm=round(float(out["rmse"][i]), 4),
                )
            results.append(r)
        return {"success": all(r["success"] for r in results),
                "batch": len(paths), "results": results}

    def _do_entry(self, vol, opts: dict) -> dict:
        target = self._target(opts)
        pose = self.engine.estimate_pose(vol)
        if self.engine.body_mask() is None:
            raise ServerError(422, "no body segmentation found in scan")
        ep = self.engine.find_entry_point(target)
        return {
            "success": bool(ep.found),
            "entry_ras": np.asarray(ep.point_ras).round(3).tolist(),
            "distance_mm": round(float(ep.distance_mm), 2),
            "normal_ras": np.asarray(ep.normal_ras).round(3).tolist(),
            "pose": _pose_json(pose),
        }

    def _do_plan(self, vol, opts: dict) -> dict:
        target = self._target(opts)
        pose = self.engine.estimate_pose(
            vol, apply_correction=bool(opts.get("correction", False))
        )
        if not pose.success:
            raise ServerError(422, f"pose estimation failed: {pose.message}")
        if "entry" in opts:
            entry = self._target(opts, "entry")
        else:
            ep = self.engine.find_entry_point(target)
            if not bool(ep.found):
                raise ServerError(422, "no suitable entry point within 80 mm")
            entry = np.asarray(ep.point_ras)
        plan = self.engine.plan_heuristic_path(
            target, entry, float(opts.get("safety", 5.0)), start_pose_steps=pose.steps
        )
        out = {
            "success": plan.success,
            "message": plan.message,
            "collision_detected": plan.collision_detected,
            "entry_ras": np.asarray(entry).round(3).tolist(),
            "pose": _pose_json(pose),
        }
        if plan.success:
            out.update(
                goal_angles_deg=np.rad2deg(plan.goal_angles).round(3).tolist(),
                goal_steps=plan.goal_steps.tolist(),
                position_error_mm=round(float(plan.position_error_mm), 3),
                path_samples=len(plan.path),
            )
        return out


def make_http_server(core: MamriServer, host: str = "127.0.0.1", port: int = 0):
    """Bind a ThreadingHTTPServer for `core`. Returns the httpd; the caller
    runs `httpd.serve_forever()` (blocking) or wraps it in a thread."""

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"
        server_version = "mamri-tpu"

        def log_message(self, fmt, *args):  # route access logs to logging
            logger.info("%s %s", self.address_string(), fmt % args)

        def _reply(self, status: int, payload: dict) -> None:
            data = json.dumps(payload).encode("utf-8")
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def _body(self) -> bytes:
            n = int(self.headers.get("Content-Length") or 0)
            if n > core.max_upload_bytes:
                raise ServerError(
                    413, f"body of {n} bytes exceeds limit {core.max_upload_bytes}"
                )
            return self.rfile.read(n) if n else b""

        def _serve(self, method: str) -> None:
            try:
                body = self._body()
            except ServerError as e:
                self._reply(e.status, {"success": False, "message": str(e)})
                return
            ctype = self.headers.get("Content-Type", "application/json" if method == "POST" else "")
            route, _, qs = self.path.partition("?")
            query = dict(urllib.parse.parse_qsl(qs)) if qs else None
            status, payload = core.handle(method, route, body, ctype, query)
            self._reply(status, payload)

        def do_GET(self):  # noqa: N802 (http.server API)
            self._serve("GET")

        def do_POST(self):  # noqa: N802
            self._serve("POST")

    httpd = ThreadingHTTPServer((host, port), Handler)
    httpd.daemon_threads = True
    core._httpd = httpd
    return httpd


def supervise(worker_argv: list, max_restarts: Optional[int] = None) -> int:
    """Tiny built-in supervisor: run `worker_argv` as a child process and
    respawn it whenever it exits with RECYCLE_EXIT_CODE (budget drain).
    Any other exit code ends supervision with that code. The parent stays
    import-light (no jax/engine) — all device state dies with each worker,
    which is the point: on the axon relay the leaked H2D host RSS can only
    be reclaimed by process exit (docs/ROADMAP.md)."""
    import signal
    import subprocess
    import sys

    restarts = 0
    child = None

    def forward(signum, frame):
        if child is not None and child.poll() is None:
            child.send_signal(signum)

    prev = {s: signal.signal(s, forward) for s in (signal.SIGINT, signal.SIGTERM)}
    try:
        while True:
            child = subprocess.Popen([sys.executable, "-m", "mamri_tpu"] + worker_argv)
            rc = child.wait()
            if rc != RECYCLE_EXIT_CODE:
                return rc
            restarts += 1
            logger.warning("worker recycled (restart %d)", restarts)
            if max_restarts is not None and restarts >= max_restarts:
                logger.error("restart budget exhausted (%d)", restarts)
                return RECYCLE_EXIT_CODE
    finally:
        for s, h in prev.items():
            signal.signal(s, h)


def serve(core: MamriServer, host: str = "127.0.0.1", port: int = 8420) -> int:
    """Blocking entry point for the CLI. Returns the process exit code:
    0 on an explicit shutdown, RECYCLE_EXIT_CODE when a budget drained the
    worker (ask the supervisor for a fresh process)."""
    httpd = make_http_server(core, host, port)
    bound = httpd.server_address
    logger.info("mamri-tpu serving on http://%s:%d", bound[0], bound[1])
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.server_close()
    budget_drained = core.drain_reason not in (None, "shutdown requested")
    return RECYCLE_EXIT_CODE if budget_drained else 0
