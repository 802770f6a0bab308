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

import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gnnflow_tpu.common import MFG


def _bucket(n: int) -> int:
    """Pad counts to powers of two so the jitted device ops compile for a
    bounded set of shapes."""
    return 1 if n <= 1 else 1 << (int(n) - 1).bit_length()


@functools.lru_cache(maxsize=None)
def _assemble_fn(dim: int):
    """One fused device call per fetch: gather cached rows, merge host
    misses, map back to the flat id order.  Eager per-op dispatch is
    pathologically slow on remote-device runtimes, so ALL device work of
    a fetch happens here (shapes bucket-padded by the caller)."""

    def impl(buffer, n_uniq, hit_slots, hit_pos, miss_vals, miss_pos,
             inv, valid):
        out = jnp.zeros((n_uniq, dim), jnp.float32)
        out = out.at[hit_pos].set(buffer[hit_slots], mode="drop")
        out = out.at[miss_pos].set(miss_vals.astype(jnp.float32),
                                   mode="drop")
        rows = out[jnp.clip(inv, 0, n_uniq - 1)]
        return jnp.where(valid[:, None], rows, 0.0)

    return jax.jit(impl, static_argnums=(1,))


@functools.lru_cache(maxsize=None)
def _insert_fn():
    @jax.jit
    def impl(buffer, slots, vals):
        return buffer.at[slots].set(vals.astype(buffer.dtype),
                                    mode="drop")
    return impl


@jax.jit
def _pack_indices(arrays):
    """Concatenate index/mask arrays into ONE int32 vector so the host
    side needs a single device->host transfer per fetch (transfer latency
    dominates on remote-device runtimes)."""
    return jnp.concatenate(
        [a.reshape(-1).astype(jnp.int32) for a in arrays])


def mfgs_to_host(mfgs):
    """Pull every MFG's id/eid/mask arrays to host in one transfer.

    Returns ``(node_ids[s], node_valid[s], eids[l][s], emask[l][s])``
    keyed like ``fetch_feature`` consumes them."""
    parts = []
    for mfg in mfgs[0]:
        parts += [mfg.all_nodes(), mfg.all_mask()]
    for layer in mfgs:
        for mfg in layer:
            parts += [mfg.nbr_eids, mfg.nbr_mask]
    flat = np.asarray(_pack_indices(parts))
    out = []
    off = 0
    for a in parts:
        size = int(np.prod(a.shape))
        out.append(flat[off: off + size].reshape(a.shape))
        off += size
    node_ids = out[0::2][: len(mfgs[0])]
    node_valid = [v.astype(bool) for v in out[1::2][: len(mfgs[0])]]
    rest = out[2 * len(mfgs[0]):]
    eids, emask = [], []
    i = 0
    for layer in mfgs:
        eids.append([rest[2 * (i + j)] for j in range(len(layer))])
        emask.append([rest[2 * (i + j) + 1].astype(bool)
                      for j in range(len(layer))])
        i += len(layer)
    return node_ids, node_valid, eids, emask


class _KindCache:
    """Cache state for one feature kind (node or edge).

    The master copy behind the cache is either a host numpy table (the
    single-host mode: misses stream host→device) or a mesh-sharded
    device table (the distributed mode: misses become sharded gathers —
    the reference routes misses to the KV store by partition,
    ``cache.py:364-377``).  Pass a :class:`ShardedTable`-like object (has
    ``.pull``) as ``table`` for the latter."""

    def __init__(self, capacity: int, num_ids: int, dim: int,
                 table, transfer_dtype: str = "float32"):
        self.capacity = int(capacity)
        self.num_ids = int(num_ids)
        self.dim = int(dim)
        # miss rows can stream host->device as bf16 (half the transfer
        # bytes; values round to bf16).  The HBM buffer stays f32.
        if transfer_dtype not in ("float32", "bfloat16"):
            raise ValueError(transfer_dtype)
        import ml_dtypes
        self._tdt = np.dtype(ml_dtypes.bfloat16) \
            if transfer_dtype == "bfloat16" else np.float32
        self.distributed = hasattr(table, "pull")
        self.table = table                       # master [N, dim]
        if self.distributed:
            # replicate the HBM cache buffer over the table's mesh so
            # assembled fetches compose with mesh-sharded miss pulls.
            # Host-side values (ids, slots, masks) are placed the same
            # way — in multi-PROCESS runs every jit input must be a
            # global array, and the host bookkeeping is deterministic +
            # batch-identical across processes, so replicated placement
            # is correct.
            from jax.sharding import PartitionSpec as _P
            from gnnflow_tpu.parallel.kvstore import put_global
            self._dev = lambda x: put_global(np.asarray(x), table.mesh,
                                             _P())
            self.buffer = self._dev(
                np.zeros((max(self.capacity, 1), dim), np.float32))
        else:
            self._dev = jnp.asarray
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

    def _pull(self, ids: np.ndarray, pad_to_n: int = 0):
        """Fetch master rows for ``ids`` (optionally zero-padded to
        ``pad_to_n`` rows).  Host table → numpy rows; sharded table →
        one device gather (the KV-routed miss path, ``cache.py:364-377``)."""
        k = len(ids)
        n = max(pad_to_n, k)
        if self.distributed:
            idsp = np.zeros(n, np.int64)
            idsp[:k] = ids
            rows = self.table.pull(self._dev(idsp))
            if k < n:
                m = jnp.zeros((n, 1), rows.dtype).at[:k].set(1.0)
                rows = rows * m
            return rows
        rows = np.zeros((n, self.dim), np.float32)
        if k:
            rows[:k] = self.table[ids]
        return rows

    def seed(self, ids: np.ndarray) -> None:
        """Pre-fill the cache with ``ids`` (first-k / presampled top-k,
        ``cache.py:161-173``)."""
        ids = np.asarray(ids, dtype=np.int64)[: self.capacity]
        ids = ids[ids < self.num_ids]
        k = len(ids)
        if k == 0 or self.capacity == 0:
            return
        slots = np.arange(k)
        vals = self._pull(ids)
        if not isinstance(vals, jax.Array):
            vals = self._dev(np.asarray(vals, np.float32))
        self.buffer = _insert_fn()(self.buffer, self._dev(slots), vals)
        self.flag[ids] = True
        self.map[ids] = slots
        self.rmap[:k] = ids

    def fetch(self, ids: np.ndarray, inv: np.ndarray,
              valid: np.ndarray) -> jax.Array:
        """Gather features for unique ``ids``; ``inv`` maps them back to
        the flat query order.  Returns device [len(inv), dim].  All
        device work is one jitted call with bucket-padded shapes."""
        n = len(ids)
        self.total += n
        if self.capacity == 0 or n == 0:
            if self.distributed:
                rows = self._pull(ids)[self._dev(
                    np.asarray(inv, np.int64))] \
                    if n else self._dev(
                        np.zeros((len(inv), self.dim), np.float32))
                self._last_miss = (np.zeros(0, np.int64), None)
                return jnp.where(self._dev(valid)[:, None], rows, 0.0)
            rows = np.zeros((len(inv), self.dim), np.float32)
            np.copyto(rows, self.table[ids][inv] if n else 0)
            rows[~valid] = 0
            self._last_miss = (np.zeros(0, np.int64), None)
            return jax.device_put(rows)
        hit = self.flag[ids]
        self.hits += int(hit.sum())
        hit_pos = np.flatnonzero(hit)
        miss_pos = np.flatnonzero(~hit)
        n_uniq = _bucket(n)
        nh = _bucket(len(hit_pos))
        nm = _bucket(len(miss_pos))
        pad_to = lambda a, k, fill: np.pad(
            np.asarray(a, np.int64), (0, k - len(a)),
            constant_values=fill)
        hit_slots = pad_to(self.map[ids[hit_pos]], nh, 0)
        hit_posp = pad_to(hit_pos, nh, n_uniq)      # pad -> dropped
        miss_idsp = ids[miss_pos]
        miss_vals = self._pull(miss_idsp, pad_to_n=nm)
        miss_posp = pad_to(miss_pos, nm, n_uniq)
        send = miss_vals if isinstance(miss_vals, jax.Array) \
            else miss_vals.astype(self._tdt)
        out = _assemble_fn(self.dim)(
            self.buffer, n_uniq,
            self._dev(hit_slots), self._dev(hit_posp),
            send if isinstance(send, jax.Array) else self._dev(send),
            self._dev(miss_posp),
            self._dev(np.asarray(inv, np.int64)),
            self._dev(valid))
        self._last_miss = (miss_idsp, miss_vals[: len(miss_pos)])
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
        kb = _bucket(k)
        slots_p = np.pad(slots, (0, kb - k),
                         constant_values=self.buffer.shape[0])
        if isinstance(miss_vals, jax.Array):
            vals_p = jnp.pad(miss_vals[:k], ((0, kb - k), (0, 0)))
        else:
            vals_p = np.zeros((kb, self.dim), self._tdt)
            vals_p[:k] = miss_vals[:k]
            vals_p = self._dev(vals_p)
        self.buffer = _insert_fn()(self.buffer, self._dev(slots_p),
                                   vals_p)
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

        def table_dim(t):
            return (t.array.shape[1] if hasattr(t, "pull")
                    else t.shape[1])

        tdt = kwargs.get("transfer_dtype", "float32")
        if node_feats is not None:
            dim_node = table_dim(node_feats)
            cap = int(node_cache_ratio * num_nodes)
            self.node_cache = _KindCache(cap, num_nodes, dim_node,
                                         node_feats, transfer_dtype=tdt)
        if edge_feats is not None:
            dim_edge = table_dim(edge_feats)
            cap = int(edge_cache_ratio * num_edges)
            self.edge_cache = _KindCache(cap, num_edges, dim_edge,
                                         edge_feats, transfer_dtype=tdt)
        self.dim_node = dim_node
        self.dim_edge = dim_edge
        self.target_edge_features: Optional[jax.Array] = None
        # f-leading edge-feature layout: fetch_feature returns
        # [F, B, de] per MFG (set by callers whose model has
        # DGNN.edge_major; see gnnflow_tpu.train.fetch_features)
        self.edge_major = False

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

    def reset(self) -> None:
        """Zero the hit/total counters so logged hit ratios are per-epoch
        rates, not lifetime averages (the reference calls ``cache.reset()``
        at each epoch start, ``offline_edge_prediction.py:357``)."""
        for kind in (self.node_cache, self.edge_cache):
            if kind is not None:
                kind.hits = 0
                kind.total = 0

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
        hit_mask = kind.flag[uniq] if kind.capacity else \
            np.zeros(len(uniq), bool)
        out = kind.fetch(uniq, inv, flat_valid)
        self._update(kind, uniq, hit_mask)
        return out.reshape(out_shape + (kind.dim,))

    def fetch_feature(self, mfgs: List[List[MFG]],
                      eids: Optional[np.ndarray] = None,
                      target_edge_features: bool = True):
        """Fetch features for sampled MFGs.

        Returns ``(node_feats_per_snapshot, edge_feats[layer][snapshot])``
        and stashes ``self.target_edge_features`` (``cache.py:402-411``).
        """
        node_ids, node_valid, eid_arrs, emask_arrs = mfgs_to_host(mfgs)
        nfs = []
        for s in range(len(mfgs[0])):
            if self.node_cache is None:
                nfs.append(None)
                continue
            ids, valid = node_ids[s], node_valid[s]
            nfs.append(self._fetch_kind(self.node_cache, ids, valid,
                                        (ids.shape[0],)))
        efs = []
        for l, layer in enumerate(mfgs):
            row = []
            for s in range(len(layer)):
                if self.edge_cache is None:
                    row.append(None)
                    continue
                ids, valid = eid_arrs[l][s], emask_arrs[l][s]
                if self.edge_major:
                    ids, valid = ids.T, valid.T
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
