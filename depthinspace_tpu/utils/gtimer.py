"""Timing / progress utilities for the host-side epoch loop.

Functional replacement for the reference's tracing layer (SURVEY.md §5),
designed around how a TPU run is actually timed:

- ``PhaseTimer``: named-phase wall-clock aggregation for the epoch loop.
  Stores running aggregates (count/total/max), not per-call lists, and uses
  the monotonic clock. No per-phase device synchronization — steps are
  dispatched async and only block at logging boundaries.
- ``Progress``: throughput-based elapsed/ETA strings for batch loops.
- The reference's per-module sync-timer (``TimedModule`` + ``co.gtimer.Ctx``,
  reference model/networks.py:58-71) must not be replicated inside jit (it
  would break fusion); use ``annotate``/``jax.profiler`` traces instead:
  named scopes show up per-op in the TPU profile.
"""

from __future__ import annotations

import atexit
import contextlib
import time
from dataclasses import dataclass, field

import jax


@dataclass
class _PhaseStats:
    count: int = 0
    total: float = 0.0
    max: float = 0.0

    def record(self, dt: float):
        self.count += 1
        self.total += dt
        if dt > self.max:
            self.max = dt


class PhaseTimer:
    """Aggregate wall time by phase name.

    Either bracket code with the ``phase`` context manager or call
    ``begin``/``end`` when a span straddles loop boundaries (e.g. "data"
    time between consuming one batch and the next).
    """

    def __init__(self):
        self._stats: dict[str, _PhaseStats] = {}
        self._open: dict[str, float] = {}

    def begin(self, name: str):
        self._open[name] = time.monotonic()

    def end(self, name: str):
        t0 = self._open.pop(name, None)
        if t0 is not None:
            self._stats.setdefault(name, _PhaseStats()).record(
                time.monotonic() - t0)

    @contextlib.contextmanager
    def phase(self, name: str):
        self.begin(name)
        try:
            yield
        finally:
            self.end(name)

    def total(self, name: str) -> float:
        return self._stats[name].total if name in self._stats else 0.0

    def summary(self) -> str:
        parts = []
        for name, s in self._stats.items():
            mean = s.total / s.count if s.count else 0.0
            parts.append(f"{name} {s.total:.2f}s"
                         f" (n={s.count}, avg {mean * 1e3:.0f}ms,"
                         f" max {s.max * 1e3:.0f}ms)")
        return "; ".join(parts)

    __str__ = summary


class Progress:
    """Elapsed/remaining time for a loop of ``total`` items.

    The estimate is rate-based: remaining = items left / observed rate,
    where the rate counts items *finished* so far.
    """

    def __init__(self, total: int):
        self.total = max(int(total), 0)
        self.done = 0
        self._t0 = time.monotonic()
        self._t_last = self._t0

    def step(self, n: int = 1):
        """Mark ``n`` more items finished."""
        self.done += n
        self._t_last = time.monotonic()

    def elapsed(self) -> float:
        return self._t_last - self._t0

    def remaining(self) -> float:
        if self.done <= 0:
            return float("inf")
        rate = self.done / max(self.elapsed(), 1e-9)
        return max(self.total - self.done, 0) / rate

    @staticmethod
    def _hms(seconds: float) -> str:
        if not (seconds < float("inf")):
            return "--:--:--"
        s = int(seconds)
        return f"{s // 3600:02d}:{s // 60 % 60:02d}:{s % 60:02d}"

    def elapsed_str(self) -> str:
        return self._hms(self.elapsed())

    def remaining_str(self) -> str:
        return self._hms(self.remaining())


@contextlib.contextmanager
def annotate(name: str):
    """Named scope visible in jax profiler traces (safe inside jit)."""
    with jax.named_scope(name):
        yield


class _ProcessTimer(PhaseTimer):
    """Process-wide phase timer with an at-exit summary (host-side phases
    only — device timing belongs to the jax profiler)."""

    def report(self):
        if self._stats:
            print(f"[gtimer] {self.summary()}")


GTIMER = _ProcessTimer()
atexit.register(GTIMER.report)


@contextlib.contextmanager
def timed(name: str):
    with GTIMER.phase(name):
        yield


def start_profiler_trace(logdir: str):
    jax.profiler.start_trace(logdir)


def stop_profiler_trace():
    jax.profiler.stop_trace()
