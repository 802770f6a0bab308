"""Feature caches: HBM-resident cache over a host-resident master table.

Counterpart of ``/root/reference/gnnflow/cache/cache.py`` (base ``Cache``)
and its policies.  On TPU the common case (WIKI/REDDIT/MOOC/LastFM) keeps
all features in HBM and needs no cache — the trainer gathers in-jit
(:func:`gnnflow_tpu.train.fetch_features`).  The cache layer serves
GDELT/MAG-scale feature tables that exceed HBM: the master table stays in
host RAM (optionally memmapped, the KV-server analogue), a fixed-capacity
cache buffer lives in HBM, and each fetch gathers hits from HBM while
misses stream host→device (the pinned-staging analogue,
``cache.py:305-312``).

State layout mirrors the reference (``cache.py:108-134``): per kind a
``[capacity, dim]`` device buffer, a ``flag[N]`` bool, an id→slot map and a
slot→id reverse map (host numpy — the eviction decision is host work), plus
running ``cache_node_ratio`` / ``cache_edge_ratio`` hit-rate metrics.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gnnflow_tpu.common import MFG


class _KindCache:
    """Cache state for one feature kind (node or edge)."""

    def __init__(self, capacity: int, num_ids: int, dim: int,
                 table: np.ndarray):
        self.capacity = int(capacity)
        self.num_ids = int(num_ids)
        self.dim = int(dim)
        self.table = table                       # host master [N, dim]
        self.buffer = jnp.zeros((max(self.capacity, 1), dim),
                                jnp.float32)     # HBM
        self.flag = np.zeros(num_ids, dtype=bool)
        self.map = np.full(num_ids, -1, dtype=np.int64)      # id -> slot
        self.rmap = np.full(max(self.capacity, 1), -1,
                            dtype=np.int64)                  # slot -> id
        self.hits = 0
        self.total = 0

    @property
    def hit_ratio(self) -> float:
        return self.hits / self.total if self.total else 0.0

    def seed(self, ids: np.ndarray) -> None:
        """Pre-fill the cache with ``ids`` (first-k / presampled top-k)."""
        ids = np.asarray(ids, dtype=np.int64)[: self.capacity]
        ids = ids[ids < self.num_ids]
        k = len(ids)
        if k == 0 or self.capacity == 0:
            return
        slots = np.arange(k)
        self.buffer = self.buffer.at[slots].set(
            jnp.asarray(self.table[ids], jnp.float32))
        self.flag[ids] = True
        self.map[ids] = slots
        self.rmap[:k] = ids

    def fetch(self, ids: np.ndarray) -> jax.Array:
        """Gather features for (unique) ``ids`` → device [len(ids), dim]."""
        n = len(ids)
        if n == 0:
            return jnp.zeros((0, self.dim), jnp.float32)
        self.total += n
        if self.capacity == 0:
            return jax.device_put(
                np.ascontiguousarray(self.table[ids], dtype=np.float32))
        hit = self.flag[ids]
        self.hits += int(hit.sum())
        hit_pos = np.flatnonzero(hit)
        miss_pos = np.flatnonzero(~hit)
        out = jnp.zeros((n, self.dim), jnp.float32)
        if len(hit_pos):
            slots = self.map[ids[hit_pos]]
            out = out.at[jnp.asarray(hit_pos)].set(
                self.buffer[jnp.asarray(slots)])
        miss_vals = None
        if len(miss_pos):
            miss_vals = jax.device_put(np.ascontiguousarray(
                self.table[ids[miss_pos]], dtype=np.float32))
            out = out.at[jnp.asarray(miss_pos)].set(miss_vals)
        self._last_miss = (ids[miss_pos] if len(miss_pos) else
                           np.zeros(0, np.int64), miss_vals)
        return out

    def insert(self, victim_slots: np.ndarray) -> np.ndarray:
        """Place the last fetch's missed ids into ``victim_slots``;
        returns the slots actually used (deduplicated missed ids)."""
        miss_ids, miss_vals = self._last_miss
        if len(miss_ids) == 0 or self.capacity == 0:
            return np.zeros(0, np.int64)
        k = min(len(victim_slots), len(miss_ids))
        ids = miss_ids[:k]
        slots = np.asarray(victim_slots[:k], dtype=np.int64)
        old_ids = self.rmap[slots]
        live = old_ids >= 0
        self.flag[old_ids[live]] = False
        self.map[old_ids[live]] = -1
        self.buffer = self.buffer.at[jnp.asarray(slots)].set(
            miss_vals[:k])
        self.flag[ids] = True
        self.map[ids] = slots
        self.rmap[slots] = ids
        return slots

    def resize_ids(self, num_ids: int) -> None:
        if num_ids <= self.num_ids:
            return
        for name in ("flag",):
            arr = getattr(self, name)
            grown = np.zeros(num_ids, dtype=arr.dtype)
            grown[: len(arr)] = arr
            setattr(self, name, grown)
        grown = np.full(num_ids, -1, dtype=np.int64)
        grown[: len(self.map)] = self.map
        self.map = grown
        self.num_ids = num_ids

    def mem_size(self) -> int:
        return int(self.buffer.size * 4)


class Cache:
    """Base feature cache (policy hooks in subclasses).

    Parity with ``gnnflow/cache/cache.py:10-413``: capacities =
    ratio × table size; ``fetch_feature(mfgs, eids)`` returns per-snapshot
    node features for the innermost MFGs, per-(layer, snapshot) edge
    features, and the batch's target-edge features (for TGN mails).
    """

    name = "Cache"

    def __init__(self, edge_cache_ratio: float, node_cache_ratio: float,
                 num_nodes: int, num_edges: int,
                 node_feats: Optional[np.ndarray],
                 edge_feats: Optional[np.ndarray],
                 dim_node: int = 0, dim_edge: int = 0, **kwargs):
        self.node_cache: Optional[_KindCache] = None
        self.edge_cache: Optional[_KindCache] = None
        if node_feats is not None:
            dim_node = node_feats.shape[1]
            cap = int(node_cache_ratio * num_nodes)
            self.node_cache = _KindCache(cap, num_nodes, dim_node,
                                         node_feats)
        if edge_feats is not None:
            dim_edge = edge_feats.shape[1]
            cap = int(edge_cache_ratio * num_edges)
            self.edge_cache = _KindCache(cap, num_edges, dim_edge,
                                         edge_feats)
        self.dim_node = dim_node
        self.dim_edge = dim_edge
        self.target_edge_features: Optional[jax.Array] = None

    # -- policy hooks ---------------------------------------------------

    def init_cache(self, **kwargs) -> None:
        """Default seeding: first-k ids (``cache.py:161-173``)."""
        if self.node_cache is not None:
            self.node_cache.seed(np.arange(self.node_cache.capacity))
        if self.edge_cache is not None:
            self.edge_cache.seed(np.arange(self.edge_cache.capacity))

    def _update(self, kind: _KindCache, ids: np.ndarray,
                hit_mask: np.ndarray) -> None:
        """Admit misses / adjust recency state.  Overridden per policy."""
        raise NotImplementedError

    # -- fetch ----------------------------------------------------------

    @property
    def cache_node_ratio(self) -> float:
        return self.node_cache.hit_ratio if self.node_cache else 0.0

    @property
    def cache_edge_ratio(self) -> float:
        return self.edge_cache.hit_ratio if self.edge_cache else 0.0

    def get_mem_size(self) -> int:
        s = 0
        if self.node_cache:
            s += self.node_cache.mem_size()
        if self.edge_cache:
            s += self.edge_cache.mem_size()
        return s

    def _fetch_kind(self, kind: Optional[_KindCache], ids: np.ndarray,
                    valid: np.ndarray, out_shape) -> Optional[jax.Array]:
        if kind is None:
            return None
        flat_ids = ids.reshape(-1)
        flat_valid = valid.reshape(-1)
        safe = np.where(flat_valid, flat_ids, 0)
        uniq, inv = np.unique(safe, return_inverse=True)
        hit_mask = kind.flag[uniq]
        rows = kind.fetch(uniq)
        self._update(kind, uniq, hit_mask)
        out = rows[jnp.asarray(inv)]
        out = jnp.where(jnp.asarray(flat_valid)[:, None], out, 0.0)
        return out.reshape(out_shape + (kind.dim,))

    def fetch_feature(self, mfgs: List[List[MFG]],
                      eids: Optional[np.ndarray] = None,
                      target_edge_features: bool = True):
        """Fetch features for sampled MFGs.

        Returns ``(node_feats_per_snapshot, edge_feats[layer][snapshot])``
        and stashes ``self.target_edge_features`` (``cache.py:402-411``).
        """
        nfs = []
        for mfg in mfgs[0]:
            if self.node_cache is None:
                nfs.append(None)
                continue
            ids = np.asarray(mfg.all_nodes())
            valid = np.asarray(mfg.all_mask())
            nfs.append(self._fetch_kind(self.node_cache, ids, valid,
                                        (ids.shape[0],)))
        efs = []
        for layer in mfgs:
            row = []
            for mfg in layer:
                if self.edge_cache is None:
                    row.append(None)
                    continue
                ids = np.asarray(mfg.nbr_eids)
                valid = np.asarray(mfg.nbr_mask)
                row.append(self._fetch_kind(self.edge_cache, ids, valid,
                                            ids.shape))
            efs.append(row)
        if target_edge_features and eids is not None \
                and self.edge_cache is not None:
            ids = np.asarray(eids, dtype=np.int64)
            valid = np.ones_like(ids, dtype=bool)
            self.target_edge_features = self._fetch_kind(
                self.edge_cache, ids, valid, (len(ids),))
        return nfs, efs
