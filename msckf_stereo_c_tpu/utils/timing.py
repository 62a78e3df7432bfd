"""Per-phase timing harness (the aux 'tracing/profiling' subsystem).

The reference wraps every back-end phase in std::chrono timers and prints a
red overrun report when a frame exceeds 1/frame_rate (msckf_vio.cpp:321-372).
The JAX analog: jitted code can't be timed per-phase from inside one fused
program, so this harness times *jitted sub-stages* with block_until_ready
and keeps budget accounting; use it on the unfused stage functions (see
scripts/profile_tpu.py) or around whole chunks in production.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

import jax


class PhaseTimer:
    """Accumulates wall-clock per named phase; reports overruns like the
    reference's featureCallback budget check."""

    def __init__(self, frame_budget_s: Optional[float] = None):
        self.frame_budget_s = frame_budget_s
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        self.overruns = 0

    @contextlib.contextmanager
    def phase(self, name: str, sync=None):
        t0 = time.perf_counter()
        yield
        if sync is not None:
            jax.block_until_ready(sync)
        dt = time.perf_counter() - t0
        self.totals[name] += dt
        self.counts[name] += 1

    def frame_done(self, frame_time_s: float):
        if self.frame_budget_s is not None and frame_time_s > self.frame_budget_s:
            self.overruns += 1

    def report(self) -> str:
        total = sum(self.totals.values())
        lines = []
        for name, t in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            frac = t / total if total > 0 else 0.0
            n = self.counts[name]
            lines.append(
                f"{name:28s} {t:8.3f}s  {frac:6.1%}  ({t / max(n, 1) * 1e3:7.2f} ms/call x{n})"
            )
        if self.overruns:
            lines.append(f"frames over budget: {self.overruns}")
        return "\n".join(lines)
