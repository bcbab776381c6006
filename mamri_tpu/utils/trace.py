"""Lightweight tracing/profiling spans.

The reference has no profiling beyond wall-clock throttling (SURVEY.md §5);
this adds the observability layer the rebuild needs: named spans with
wall-clock stats, `jax.block_until_ready` fencing so device work is attributed
to the span that launched it, and an optional bridge to `jax.profiler` traces.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, List, Optional

import jax


class Tracer:
    """Collects named span durations; thread-compatible for host-side loops."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.spans: Dict[str, List[float]] = defaultdict(list)

    @contextlib.contextmanager
    def span(self, name: str, sync: bool = False, result=None):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync and result is not None:
                jax.block_until_ready(result)
            self.spans[name].append(time.perf_counter() - t0)

    def stats(self, name: str) -> Dict[str, float]:
        xs = sorted(self.spans.get(name, []))
        if not xs:
            return {}
        n = len(xs)
        return {
            "count": n,
            "total_s": sum(xs),
            "mean_s": sum(xs) / n,
            "p50_s": xs[n // 2],
            "min_s": xs[0],
            "max_s": xs[-1],
        }

    def report(self) -> str:
        lines = []
        for name in sorted(self.spans):
            s = self.stats(name)
            lines.append(
                f"{name:32s} n={s['count']:<5d} p50={s['p50_s']*1e3:8.2f}ms "
                f"mean={s['mean_s']*1e3:8.2f}ms max={s['max_s']*1e3:8.2f}ms"
            )
        return "\n".join(lines)

    def reset(self):
        self.spans.clear()


_GLOBAL = Tracer()


def span(name: str, **kw):
    """Module-level convenience: `with trace.span("segmentation"): ...`"""
    return _GLOBAL.span(name, **kw)


def global_tracer() -> Tracer:
    return _GLOBAL


@contextlib.contextmanager
def device_trace(log_dir: Optional[str] = None):
    """Wrap a block in a jax.profiler trace (TensorBoard-compatible)."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
