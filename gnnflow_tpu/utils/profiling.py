"""Profiling and observability utilities.

The reference instruments training with manual per-phase wall-clock
counters (sampling / feature / memory / train breakdown,
``scripts/offline_edge_prediction.py:366-454``), a GPU-load polling thread
and an nsys wrapper (``benchmarks/profile.sh``).  TPU equivalents:

- :class:`PhaseTimer` — the same accumulating phase breakdown,
- :func:`trace` — ``jax.profiler`` trace context (XPlane/TensorBoard),
- :func:`device_memory_stats` — per-device HBM usage polling.

Note that in the fused-step design most phases execute inside one XLA
program, so the breakdown that matters is host-visible: batch staging,
step dispatch, blocking eval, checkpointing.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

import jax


class PhaseTimer:
    """Accumulating wall-clock phase timer.

    Usage::

        timer = PhaseTimer()
        with timer("sample"):
            ...
        timer.summary()  # {'sample': {'total': ..., 'count': ...}}
    """

    def __init__(self):
        self._total = defaultdict(float)
        self._count = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, phase: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._total[phase] += time.perf_counter() - t0
            self._count[phase] += 1

    def add(self, phase: str, seconds: float) -> None:
        self._total[phase] += seconds
        self._count[phase] += 1

    def reset(self) -> None:
        self._total.clear()
        self._count.clear()

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {k: {"total": self._total[k], "count": self._count[k],
                    "mean": self._total[k] / max(self._count[k], 1)}
                for k in self._total}

    def format(self) -> str:
        parts = [f"{k} {v['total']:.3f}s/{v['count']}"
                 for k, v in sorted(self.summary().items())]
        return " | ".join(parts)


@contextlib.contextmanager
def trace(logdir: Optional[str] = None):
    """``jax.profiler`` trace context; no-op when the backend does not
    support profiling (e.g. tunneled devices)."""
    if logdir is None:
        yield
        return
    try:
        with jax.profiler.trace(logdir):
            yield
    except Exception:  # profiling unsupported on this backend
        yield


def device_memory_stats() -> Dict[str, Dict[str, int]]:
    """Per-device memory statistics (bytes) where the backend reports
    them (the GPU-load-thread analogue)."""
    out = {}
    for d in jax.devices():
        try:
            stats = d.memory_stats()
        except Exception:
            stats = None
        if stats:
            out[str(d)] = {
                "bytes_in_use": stats.get("bytes_in_use", 0),
                "bytes_limit": stats.get("bytes_limit", 0),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use", 0),
            }
    return out
