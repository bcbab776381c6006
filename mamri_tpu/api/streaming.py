"""Streaming pose tracking: per-scan ingest -> segmentation -> IK -> re-plan
at interactive cadence (BASELINE config 5).

The reference has no streaming mode — each scan is a button press. Here a
`PoseTracker` wraps the engine's fused pipeline with warm-started IK (the
previous pose is the first restart, exactly the reference's "current pose"
initial guess) and keeps per-frame latency statistics.
"""

from __future__ import annotations

import time
from typing import Optional

import numpy as np

from mamri_tpu.api.engine import MamriEngine
from mamri_tpu.api.types import PoseEstimate
from mamri_tpu.perception.volume import Volume
from mamri_tpu.utils.trace import Tracer


class PoseTracker:
    def __init__(self, engine: MamriEngine, apply_correction: bool = False):
        self.engine = engine
        self.apply_correction = apply_correction
        self.tracer = Tracer()
        self.frames = 0
        self.failures = 0
        self.last_estimate: Optional[PoseEstimate] = None

    def step(self, volume: Volume) -> PoseEstimate:
        """Process one scan; IK warm-starts from the engine's current pose
        (updated by the previous frame), so tracking stays on the same
        kinematic branch between frames."""
        t0 = time.perf_counter()
        result = self.engine.estimate_pose(
            volume, apply_correction=self.apply_correction, keep_segmentation=False
        )
        self.tracer.spans["frame"].append(time.perf_counter() - t0)
        self.frames += 1
        if not result.success:
            self.failures += 1
        self.last_estimate = result
        return result

    def stats(self) -> dict:
        s = self.tracer.stats("frame")
        return {
            "frames": self.frames,
            "failures": self.failures,
            "p50_latency_ms": round(s.get("p50_s", 0.0) * 1e3, 2) if s else None,
            "max_latency_ms": round(s.get("max_s", 0.0) * 1e3, 2) if s else None,
            "interactive": bool(s and s["p50_s"] < 0.1),  # < 100 ms target
        }
