"""Observability: throughput counters + profiler hooks.

The reference has only coarse wall-clock prints (SURVEY.md §5.1).  Here:

- ``ThroughputMeter``: streaming reads/s / sites/s / batches/s counters with
  periodic report lines (the north-star metric is reads/s per chip)
- ``trace``: context manager around ``jax.profiler`` trace capture
- ``StageTimer``: per-stage wall-clock accounting for the pipeline
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional


class ThroughputMeter:
    """Streaming throughput counter with periodic stdout reports."""

    def __init__(self, name: str = "call_mods",
                 report_every_s: Optional[float] = 30.0):
        self.name = name
        self.report_every_s = report_every_s
        self.start = time.time()
        self._last_report = self.start
        self.sites = 0
        self.reads = 0
        self.batches = 0

    def update(self, sites: int = 0, reads: int = 0,
               batches: int = 1) -> None:
        self.sites += sites
        self.reads += reads
        self.batches += batches
        now = time.time()
        if (self.report_every_s is not None
                and now - self._last_report >= self.report_every_s):
            self._last_report = now
            print(self.line(), flush=True)

    def line(self) -> str:
        dt = max(time.time() - self.start, 1e-9)
        return (f"[{self.name}] {self.sites} sites, {self.reads} reads, "
                f"{self.batches} batches in {dt:.1f}s | "
                f"{self.sites / dt:.0f} sites/s, {self.reads / dt:.1f} "
                f"reads/s")

    def as_dict(self) -> dict:
        dt = max(time.time() - self.start, 1e-9)
        return {"sites": self.sites, "reads": self.reads,
                "batches": self.batches, "seconds": dt,
                "sites_per_s": self.sites / dt,
                "reads_per_s": self.reads / dt}


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """Capture a jax profiler trace when ``log_dir`` is set; no-op else."""
    if not log_dir:
        yield
        return
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Accumulate wall-clock per named stage; print a summary on demand."""

    def __init__(self):
        self.totals: dict = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t = time.time()
        try:
            yield
        finally:
            self.totals[name] = self.totals.get(name, 0.0) + time.time() - t

    def summary(self) -> str:
        total = sum(self.totals.values()) or 1e-9
        parts = [f"{k}: {v:.2f}s ({100 * v / total:.0f}%)"
                 for k, v in sorted(self.totals.items(),
                                    key=lambda kv: -kv[1])]
        return "stage timing: " + ", ".join(parts)
