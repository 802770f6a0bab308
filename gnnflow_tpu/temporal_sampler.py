"""User-facing temporal sampler.

API parity with ``/root/reference/gnnflow/temporal_sampler.py:14-177``
(``TemporalSampler(graph, fanouts, sample_strategy, num_snapshots,
snapshot_time_window, prop_time, seed)``; ``sample(vertices, ts)`` returns a
layer-major list of per-snapshot MFGs with ``mfgs[0]`` the innermost layer).
The heavy lifting is the jittable :mod:`gnnflow_tpu.ops.sampling`; this
wrapper manages device refresh, static-mode timestamps and the PRNG stream.
"""
from __future__ import annotations

from typing import List

import jax
import numpy as np

from gnnflow_tpu.common import MFG, STATIC_TS
from gnnflow_tpu.dynamic_graph import DynamicGraph
from gnnflow_tpu.ops.sampling import sample_hops


class TemporalSampler:
    """Samples k-hop multi-snapshot temporal neighborhoods."""

    def __init__(self, graph: DynamicGraph, fanouts: List[int],
                 sample_strategy: str = "recent", num_snapshots: int = 1,
                 snapshot_time_window: float = 0.0, prop_time: bool = False,
                 seed: int = 1234, is_static: bool = False,
                 compact_factor: float | None = "auto", **kwargs):
        sample_strategy = sample_strategy.lower()
        if sample_strategy not in ("recent", "uniform"):
            raise ValueError("strategy must be 'recent' or 'uniform'")
        if num_snapshots > 1 and abs(snapshot_time_window) < 1e-6:
            raise ValueError(
                "snapshot_time_window must be positive when num_snapshots>1")
        self._graph = graph
        self._fanouts = tuple(int(f) for f in fanouts)
        self._strategy = sample_strategy
        self._num_snapshots = int(num_snapshots)
        self._window = float(snapshot_time_window)
        self._prop_time = bool(prop_time)
        self._is_static = bool(is_static)
        if compact_factor == "auto":
            # windowed multi-snapshot configs (DySAT) leave most neighbor
            # slots empty — compact deeper layers; the reference compacts
            # every layer with thrust::remove_if
            compact_factor = (0.25 if num_snapshots > 1
                              and snapshot_time_window > 0 else None)
        self._compact_factor = compact_factor
        self._key = jax.random.PRNGKey(seed)

    @property
    def num_layers(self) -> int:
        return len(self._fanouts)

    @property
    def num_snapshots(self) -> int:
        return self._num_snapshots

    @property
    def fanouts(self):
        return self._fanouts

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def _search_iters(self) -> int:
        # Enough binary-search steps to cover the largest vertex degree;
        # changes (and recompiles) only at power-of-two boundaries.
        return max(1, int(self._graph._max_degree).bit_length())

    def _jitted_hops(self, iters: int, with_key: bool):
        """One fused jit for the whole k-hop sample (a single dispatch
        instead of one per layer/snapshot — dispatch latency matters on
        remote-device runtimes)."""
        cache = getattr(self, "_hops_cache", None)
        if cache is None:
            cache = self._hops_cache = {}
        k = (iters, with_key)
        if k not in cache:
            def fn(g, roots, ts, key=None):
                return sample_hops(
                    g, roots, ts, fanouts=self._fanouts,
                    strategy=self._strategy,
                    num_snapshots=self._num_snapshots,
                    window=self._window, prop_time=self._prop_time,
                    search_iters=iters,
                    compact_factor=self._compact_factor, key=key)
            cache[k] = jax.jit(fn)
        return cache[k]

    def sample(self, target_vertices: np.ndarray,
               timestamps: np.ndarray) -> List[List[MFG]]:
        """Sample k-hop neighbors; ``mfgs[0]`` is the innermost layer."""
        ts = (np.full(np.shape(target_vertices), STATIC_TS, dtype=np.float32)
              if self._is_static else timestamps)
        g = self._graph.device_graph()
        # colocate roots with the store (host-placement stores live on the
        # CPU backend; the sampling program then runs there and MFGs are
        # shipped to the accelerator by the feature-fetch stage)
        dev = next(iter(g.e_ts.devices()))
        roots = np.asarray(target_vertices, dtype=np.int32)
        with_key = self._strategy == "uniform"
        fn = self._jitted_hops(self._search_iters(), with_key)
        args = [g, jax.device_put(roots, dev),
                jax.device_put(np.asarray(ts, dtype=np.float32), dev)]
        if with_key:
            args.append(jax.device_put(self._next_key(), dev))
        return fn(*args)

    def sample_layer(self, target_vertices: np.ndarray,
                     timestamps: np.ndarray, layer: int,
                     snapshot: int) -> MFG:
        """Sample a single (layer, snapshot) — reference
        ``temporal_sampler.py:128-147``."""
        from gnnflow_tpu.ops.sampling import sample_layer as _sl
        ts = (np.full(np.shape(target_vertices), STATIC_TS, dtype=np.float32)
              if self._is_static else np.asarray(timestamps, dtype=np.float32))
        g = self._graph.device_graph()
        return _sl(
            g, jax.device_put(np.asarray(target_vertices, dtype=np.int32)),
            jax.device_put(ts),
            fanout=self._fanouts[layer], strategy=self._strategy,
            snapshot_idx=snapshot, num_snapshots=self._num_snapshots,
            window=self._window, prop_time=self._prop_time,
            search_iters=self._search_iters(),
            key=self._next_key() if self._strategy == "uniform" else None)
