"""Named-operation timing registry.

Reference parity: ``support/ppTiming.hpp/.cpp`` — ``RecordTime`` accumulates
per-op total/min/max/sum-of-squares/count (plus optional prebarrier time that
attributes load imbalance ahead of collectives); ``SummarizeTime`` prints a
per-process table and ``SummarizeTimeAcrossProcesses`` a cross-rank reduced
table (ppTiming.cpp:67-338).

TPU translation: one Python process drives all chips, so "across processes"
becomes "across devices" and is only meaningful for per-device telemetry the
caller gathers itself; the registry is host-side and wraps *jitted* steps, so
callers must ``block_until_ready`` (use :func:`timed` which does it for you).
"""
from __future__ import annotations

import math
import time
from contextlib import contextmanager
from dataclasses import dataclass, field
from typing import Callable, Dict, Optional

import jax


@dataclass
class _OpStats:
    count: int = 0
    total: float = 0.0
    tmin: float = math.inf
    tmax: float = 0.0
    sq_total: float = 0.0  # sum of squares, for RMS like reference "sq-avg"
    prebarrier: float = 0.0


@dataclass
class TimingRegistry:
    enabled: bool = True
    verbosity: int = 0
    ops: Dict[str, _OpStats] = field(default_factory=dict)
    _extra_info: list = field(default_factory=list)

    def record(self, name: str, seconds: float, prebarrier: float = 0.0) -> None:
        """RecordTime analog (ppTiming.cpp:67-100)."""
        if not self.enabled:
            return
        s = self.ops.setdefault(name, _OpStats())
        s.count += 1
        s.total += seconds
        s.tmin = min(s.tmin, seconds)
        s.tmax = max(s.tmax, seconds)
        s.sq_total += seconds * seconds
        s.prebarrier += prebarrier
        if self.verbosity >= 1:
            jax.debug.print  # noop touch; keep host-side
            print(f"[timing] {name}: {seconds:.6f}s (pre-barrier {prebarrier:.6f}s)")

    def print_additional_time_info(self, msg: str, level: int = 1) -> None:
        if self.enabled and self.verbosity >= level - 1:
            self._extra_info.append(msg)

    def summarize(self, print_fn: Callable[[str], None] = print) -> str:
        """SummarizeTime analog: per-op table (ppTiming.cpp:168-213)."""
        lines = ["Timing summary (op, count, total, avg, min, max, rms, prebarrier):"]
        for name in sorted(self.ops):
            s = self.ops[name]
            avg = s.total / s.count if s.count else 0.0
            rms = math.sqrt(s.sq_total / s.count) if s.count else 0.0
            lines.append(
                f"  {name:<40s} n={s.count:<6d} tot={s.total:.6f} avg={avg:.6f} "
                f"min={s.tmin if s.count else 0.0:.6f} max={s.tmax:.6f} "
                f"rms={rms:.6f} pre={s.prebarrier:.6f}"
            )
        for msg in self._extra_info:
            lines.append(f"  info: {msg}")
        out = "\n".join(lines)
        if print_fn is not None:
            print_fn(out)
        return out

    def reset(self) -> None:
        self.ops.clear()
        self._extra_info.clear()


# Global registry, mirroring the reference's file-static accumulator.
_REGISTRY = TimingRegistry()


def get_registry() -> TimingRegistry:
    return _REGISTRY


def enable_timing() -> None:
    _REGISTRY.enabled = True


def disable_timing() -> None:
    _REGISTRY.enabled = False


def set_timing_verbosity(v: int) -> None:
    _REGISTRY.verbosity = v


def record_time(name: str, seconds: float, prebarrier: float = 0.0) -> None:
    _REGISTRY.record(name, seconds, prebarrier)


def summarize_time(print_fn: Callable[[str], None] = print) -> str:
    return _REGISTRY.summarize(print_fn)


def print_additional_time_info(msg: str, level: int = 1) -> None:
    _REGISTRY.print_additional_time_info(msg, level)


@contextmanager
def timed(name: str, block_on=None):
    """Context manager that records wall time for ``name``.

    ``block_on``: optional array/pytree whose readiness gates the stop stamp
    (callers pass the output of a jitted op so async dispatch is accounted).
    """
    t0 = time.perf_counter()
    holder = {}
    try:
        yield holder
    finally:
        target = holder.get("block_on", block_on)
        if target is not None:
            jax.block_until_ready(target)
        _REGISTRY.record(name, time.perf_counter() - t0)


@contextmanager
def profiling_region(name: str):
    """Kokkos::Profiling::pushRegion analog → jax named scope + trace annotation."""
    with jax.profiler.TraceAnnotation(name):
        with jax.named_scope(name):
            yield
