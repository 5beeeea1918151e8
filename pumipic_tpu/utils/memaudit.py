"""Live-buffer audit — the memcheck analog.

Reference parity: the reference wires Valgrind memcheck into ctest
(``CMakeLists.txt:105-110``, ``valgrind.supp``) and keeps a dedicated
``destroy_test`` for leak paths.  In a JAX runtime there is no malloc/free
to shadow; the honest equivalent failure mode is **device-buffer growth** —
live ``jax.Array`` buffers accumulating across steps (e.g. host references
pinning old particle states, or a step that fails to donate/overwrite its
inputs).  This module snapshots the live-buffer population and diffs
snapshots, so a test can assert "N steps leave the buffer population flat".
"""
from __future__ import annotations

from collections import Counter
from dataclasses import dataclass
from typing import Dict, Optional

import jax
import numpy as np


@dataclass(frozen=True)
class BufferSnapshot:
    """Live device-buffer census: count and bytes per (shape, dtype) key."""

    count: int
    nbytes: int
    by_key: Dict[str, int]          # "(shape)dtype" -> count

    def __sub__(self, other: "BufferSnapshot") -> "BufferDiff":
        keys = set(self.by_key) | set(other.by_key)
        delta = {
            k: self.by_key.get(k, 0) - other.by_key.get(k, 0) for k in keys
        }
        return BufferDiff(
            count=self.count - other.count,
            nbytes=self.nbytes - other.nbytes,
            by_key={k: v for k, v in delta.items() if v != 0},
        )


@dataclass(frozen=True)
class BufferDiff:
    count: int
    nbytes: int
    by_key: Dict[str, int]

    def leaked(self, tol_buffers: int = 0) -> bool:
        return self.count > tol_buffers

    def report(self) -> str:
        lines = [f"live-buffer delta: {self.count:+d} buffers, "
                 f"{self.nbytes / 1e6:+.1f} MB"]
        for k, v in sorted(self.by_key.items(), key=lambda kv: -abs(kv[1])):
            lines.append(f"  {v:+d}  {k}")
        return "\n".join(lines)


def snapshot() -> BufferSnapshot:
    """Census of all live jax.Arrays (committed device buffers)."""
    count = 0
    nbytes = 0
    by_key: Counter = Counter()
    for a in jax.live_arrays():
        count += 1
        n = int(np.prod(a.shape)) * a.dtype.itemsize if a.shape else a.dtype.itemsize
        nbytes += n
        by_key[f"{tuple(a.shape)}{a.dtype.name}"] += 1
    return BufferSnapshot(count=count, nbytes=nbytes, by_key=dict(by_key))


class LeakCheck:
    """Context/step helper: assert a step loop leaves the live-buffer
    population flat (the ``destroy_test`` role).

    Usage::

        lc = LeakCheck()
        for _ in range(n):
            state, out = step(state)
        jax.block_until_ready(out)
        lc.assert_flat(tol_buffers=4)   # raises with a census diff report
    """

    def __init__(self):
        self.base: Optional[BufferSnapshot] = None
        self.reset()

    def reset(self) -> None:
        self.base = snapshot()

    def diff(self) -> BufferDiff:
        return snapshot() - self.base

    def assert_flat(self, tol_buffers: int = 0) -> BufferDiff:
        d = self.diff()
        if d.leaked(tol_buffers):
            raise AssertionError(d.report())
        return d
