"""Device memory telemetry.

Reference parity: ``support/ppMemUsage.hpp:25-34`` (``getMemUsage`` via
cudaMemGetInfo) and the per-step memory-imbalance telemetry in
``test/pseudoXGCm.cpp:17-39``.  On TPU we read ``device.memory_stats()``.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax


def get_mem_usage(device=None) -> Tuple[int, int]:
    """Return (free_bytes, total_bytes) for one device; (0, 0) if unknown."""
    dev = device or jax.devices()[0]
    stats = getattr(dev, "memory_stats", lambda: None)()
    if not stats:
        return (0, 0)
    total = stats.get("bytes_limit", 0)
    used = stats.get("bytes_in_use", 0)
    return (max(total - used, 0), total)


def memory_imbalance() -> Dict[str, float]:
    """Max/avg used-bytes imbalance across local devices (pseudoXGCm.cpp:17-39)."""
    used = []
    for d in jax.local_devices():
        free, total = get_mem_usage(d)
        used.append(total - free)
    if not used or sum(used) == 0:
        return {"max": 0, "avg": 0.0, "imbalance": 1.0}
    avg = sum(used) / len(used)
    return {"max": max(used), "avg": avg, "imbalance": max(used) / avg if avg else 1.0}
