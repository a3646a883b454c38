"""Profiling + runtime telemetry.

The reference's observability is wall-clock chrono prints around feature
extraction and a running ms/frame average via ROS_INFO
(src/laserProcessingNode.cpp:127-135, src/odomEstimationNode.cpp:226-234).
Equivalents here: a scans/s meter with percentile latencies, scoped timers,
and jax.profiler trace capture for XLA-level analysis.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import numpy as np


class RateMeter:
    """Per-frame latency/throughput telemetry (the analogue of the
    reference's total_time/total_frame counters)."""

    def __init__(self, warmup: int = 2):
        self.samples_ms: List[float] = []
        self.warmup = warmup

    @contextlib.contextmanager
    def frame(self):
        t0 = time.perf_counter()
        yield
        self.samples_ms.append((time.perf_counter() - t0) * 1e3)

    def summary(self) -> Dict[str, float]:
        s = np.asarray(self.samples_ms[self.warmup:] or self.samples_ms)
        if len(s) == 0:
            return {}
        return {
            "frames": len(s),
            "mean_ms": float(s.mean()),
            "p50_ms": float(np.percentile(s, 50)),
            "p95_ms": float(np.percentile(s, 95)),
            "scans_per_sec": float(1e3 / s.mean()),
        }


class ScopedTimers:
    """Named scoped timers for host-side stage attribution."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def scope(self, name: str, sync=None):
        t0 = time.perf_counter()
        yield
        if sync is not None:
            import jax

            jax.block_until_ready(sync)
        self.totals[name] = self.totals.get(name, 0.0) + \
            (time.perf_counter() - t0)
        self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        lines = []
        for name, total in sorted(self.totals.items(),
                                  key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(f"{name:32s} {total*1e3:10.2f} ms total "
                         f"{total/n*1e3:8.2f} ms/call x{n}")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace capture (view with TensorBoard / xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
