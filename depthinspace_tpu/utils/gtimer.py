"""Timing / profiling utilities.

Replaces the reference's two-level homegrown tracing (SURVEY.md §5):
- ``StopWatch`` / ``ETA``: host-side phase timing for the epoch loop, same
  reporting shape as the reference (model/worker.py:69-128) but WITHOUT
  per-phase device synchronization — steps are dispatched async and only
  block at logging boundaries.
- The reference's per-module sync-timer (``TimedModule`` +
  ``co.gtimer.Ctx``, model/networks.py:58-71) must not be replicated inside
  jit (it would break fusion); use ``annotate``/``jax.profiler`` traces
  instead: named scopes show up per-op in the TPU profile.
"""

from __future__ import annotations

import atexit
import contextlib
import time
from collections import OrderedDict

import numpy as np
import jax


class StopWatch:
    def __init__(self):
        self.timings = OrderedDict()
        self.starts = {}

    def start(self, name):
        self.starts[name] = time.time()

    def stop(self, name):
        self.timings.setdefault(name, []).append(time.time() - self.starts[name])

    def get(self, name=None, reduce=np.sum):
        if name is not None:
            return reduce(self.timings[name])
        return {k: reduce(v) for k, v in self.timings.items()}

    def __str__(self):
        return ", ".join(f"{k}: {v:f}[s]" for k, v in self.get().items())

    __repr__ = __str__


class ETA:
    def __init__(self, length):
        self.length = length
        self.start_time = time.time()
        self.current_idx = 0
        self.current_time = time.time()

    def update(self, idx):
        self.current_idx = idx
        self.current_time = time.time()

    def get_elapsed_time(self):
        return self.current_time - self.start_time

    def get_remaining_time(self):
        per_item = self.get_elapsed_time() / (self.current_idx + 1)
        return per_item * (self.length - self.current_idx + 1)

    @staticmethod
    def _fmt(seconds):
        minutes, seconds = divmod(seconds, 60)
        hours, minutes = divmod(minutes, 60)
        return f"{int(hours):02d}:{int(minutes):02d}:{seconds:05.2f}"

    def get_elapsed_time_str(self):
        return self._fmt(self.get_elapsed_time())

    def get_remaining_time_str(self):
        return self._fmt(self.get_remaining_time())


@contextlib.contextmanager
def annotate(name: str):
    """Named scope visible in jax profiler traces (safe inside jit)."""
    with jax.named_scope(name):
        yield


class _GlobalTimer(StopWatch):
    """Process-exit summary timer (reference GTIMER pattern, co/gtimer.py:
    30-47) for *host-side* phases only."""

    def __del__(self):
        pass

    def report(self):
        if not self.timings:
            return
        print("=" * 60)
        for k, v in self.timings.items():
            arr = np.asarray(v)
            print(f"[gtimer] {k}: total={arr.sum():.3f}s n={arr.size} "
                  f"mean={arr.mean():.4f}s median={np.median(arr):.4f}s")


GTIMER = _GlobalTimer()
atexit.register(GTIMER.report)


@contextlib.contextmanager
def timed(name: str):
    GTIMER.start(name)
    try:
        yield
    finally:
        GTIMER.stop(name)


def start_profiler_trace(logdir: str):
    jax.profiler.start_trace(logdir)


def stop_profiler_trace():
    jax.profiler.stop_trace()
