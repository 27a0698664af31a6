"""Per-stage throughput counters and JAX profiler hooks.

The reference instruments hot loops with %-complete + ETA logs
(ref decode_funcube.py:281-286) and wall-time prints (ref decode_fm.py:107);
here throughput is a first-class metric: every stage can record
(samples, seconds) and report Msamples/s, and `trace()` wraps a region in the
JAX profiler for XLA-level inspection (SURVEY 5.1).
"""
from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict
from dataclasses import dataclass

log = logging.getLogger(__name__)


@dataclass
class StageStats:
    samples: int = 0
    seconds: float = 0.0
    calls: int = 0

    @property
    def msamples_per_s(self) -> float:
        return self.samples / self.seconds / 1e6 if self.seconds else 0.0


class Profiler:
    """Accumulates per-stage samples/s. Thread-unsafe by design (one stream)."""

    def __init__(self):
        self.stages: dict[str, StageStats] = defaultdict(StageStats)

    @contextlib.contextmanager
    def stage(self, name: str, samples: int):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            st = self.stages[name]
            st.samples += samples
            st.seconds += dt
            st.calls += 1

    def report(self) -> dict:
        return {name: {"msamples_per_s": round(s.msamples_per_s, 2),
                       "samples": s.samples, "seconds": round(s.seconds, 4),
                       "calls": s.calls}
                for name, s in self.stages.items()}

    def log_report(self) -> None:
        for name, r in self.report().items():
            log.info("stage %-20s %10.1f Msamp/s  (%d samples, %d calls)",
                     name, r["msamples_per_s"], r["samples"], r["calls"])


@contextlib.contextmanager
def trace(logdir: str):
    """JAX profiler trace of a region (view with TensorBoard/XProf)."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def wall_clock(label: str = "run"):
    t0 = time.perf_counter()
    yield
    log.info("%s took %.3f s", label, time.perf_counter() - t0)
