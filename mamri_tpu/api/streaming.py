"""Streaming pose tracking: per-scan ingest -> segmentation -> IK -> re-plan
at interactive cadence (BASELINE config 5).

The reference has no streaming mode — each scan is a button press
(Mamri/Mamri.py:850). Here a `PoseTracker` wraps the engine's fused pipeline
with warm-started IK (the previous pose is the first restart, exactly the
reference's "current pose" initial guess) and keeps per-frame latency
statistics.

Two modes:
  * synchronous (default): `step` uploads, computes, and fetches — per-frame
    latency = H2D + device + relay RTT.
  * pipelined (`pipelined=True`): `step` dispatches frame N and collects
    frame N-depth (`estimate_pose_async`/`_collect`), so the upload and the
    relay round-trip of one frame hide behind the device compute of the
    next — higher frame rate at `depth` frames of result latency. IK then
    warm-starts from a pose `depth` frames old (fine at interactive rates:
    the arm barely moves per frame).
"""

from __future__ import annotations

import time
from typing import List, Optional

from mamri_tpu.api.engine import MamriEngine
from mamri_tpu.api.types import PoseEstimate
from mamri_tpu.perception.volume import Volume
from mamri_tpu.utils.trace import Tracer


class PoseTracker:
    def __init__(
        self,
        engine: MamriEngine,
        apply_correction: bool = False,
        pipelined: bool = False,
        depth: int = 1,
        target_ras=None,
        entry_ras=None,
        safety_mm: float = 5.0,
        replan_every: int = 1,
    ):
        """`target_ras` (with `entry_ras`) arms per-frame RE-PLANNING: after
        every `replan_every`-th successful estimate the tracker re-solves
        the collision-checked up-over-down path from the fresh pose (one
        fused jitted program; the body world is rebuilt from that frame's
        segmentation, so moving anatomy is honored). The latest plan is
        `last_plan`; its latency is the "replan" tracer span."""
        if depth < 1:
            raise ValueError("pipeline depth must be >= 1")
        if replan_every < 1:
            raise ValueError("replan_every must be >= 1")
        if target_ras is not None and entry_ras is None:
            raise ValueError("re-planning needs entry_ras (run find_entry_point once)")
        if target_ras is not None and pipelined:
            raise ValueError(
                "per-frame re-planning requires the synchronous tracker: the "
                "collision world must come from the frame being planned, and "
                "the pipelined path does not keep segmentations"
            )
        self.engine = engine
        self.apply_correction = apply_correction
        self.pipelined = pipelined
        self.depth = depth
        self.target_ras = target_ras
        self.entry_ras = entry_ras
        self.safety_mm = safety_mm
        self.replan_every = replan_every
        self.last_plan = None
        self.tracer = Tracer()
        self.frames = 0
        self.failures = 0
        self.last_estimate: Optional[PoseEstimate] = None
        self._inflight: List[dict] = []

    def step(self, volume: Volume) -> Optional[PoseEstimate]:
        """Process one scan. Synchronous mode returns the frame's estimate;
        pipelined mode returns the estimate of the frame `depth` steps back
        (None while the pipeline fills — call `flush()` at end of stream)."""
        t0 = time.perf_counter()
        if not self.pipelined:
            # re-plan frames keep the segmentation: the body world used for
            # collision checking is rebuilt from THIS frame's scan
            result = self.engine.estimate_pose(
                volume,
                apply_correction=self.apply_correction,
                keep_segmentation=self.target_ras is not None,
            )
        else:
            self._inflight.append(
                self.engine.estimate_pose_async(volume, apply_correction=self.apply_correction)
            )
            result = None
            if len(self._inflight) > self.depth:
                result = self.engine.estimate_pose_collect(self._inflight.pop(0))
        self.tracer.spans["frame"].append(time.perf_counter() - t0)
        if result is not None:
            self._count(result)
        return result

    def flush(self) -> List[PoseEstimate]:
        """Collect every in-flight frame (pipelined mode end-of-stream)."""
        out = []
        while self._inflight:
            result = self.engine.estimate_pose_collect(self._inflight.pop(0))
            self._count(result)
            out.append(result)
        return out

    def _count(self, result: PoseEstimate) -> None:
        self.frames += 1
        if not result.success:
            self.failures += 1
        self.last_estimate = result
        if (
            self.target_ras is not None
            and result.success
            and (self.frames % self.replan_every) == 0
        ):
            t0 = time.perf_counter()
            # the engine invalidated last_collision_world when this frame's
            # segmentation was stored, so the plan's world IS this frame's
            self.last_plan = self.engine.plan_heuristic_path(
                self.target_ras,
                self.entry_ras,
                self.safety_mm,
                start_pose_steps=result.steps,
            )
            self.tracer.spans["replan"].append(time.perf_counter() - t0)

    def stats(self) -> dict:
        s = self.tracer.stats("frame")
        out = {
            "frames": self.frames,
            "failures": self.failures,
            "p50_latency_ms": round(s.get("p50_s", 0.0) * 1e3, 2) if s else None,
            "max_latency_ms": round(s.get("max_s", 0.0) * 1e3, 2) if s else None,
            "interactive": bool(s and s["p50_s"] < 0.1),  # < 100 ms target
        }
        r = self.tracer.stats("replan")
        if r:
            out["replan_p50_ms"] = round(r["p50_s"] * 1e3, 2)
        return out
