"""TPU-native dynamic graph store.

Replaces the reference's block-adjacency-list design (per-vertex doubly
linked lists of GPU ``TemporalBlock``s mutated by one-thread CUDA kernels,
``/root/reference/gnnflow/csrc/dynamic_graph.{h,cu}``,
``doubly_linked_list.{h,cu}``, ``temporal_block_allocator.{h,cu}``) with a
layout XLA can consume directly:

- **Flat edge pools** ``e_dst/e_ts/e_eid`` in one contiguous buffer.
- **Per-vertex contiguous regions**: vertex ``v`` owns pool slots
  ``[row_off[v], row_off[v]+row_cap[v])`` with ``row_len[v]`` live edges
  sorted by timestamp (ascending).  This is the T-CSR-with-slack analogue of
  the reference's block chain — but a vertex's whole history is one sorted
  run, so sampling is a single binary search + gather instead of a pointer
  walk (the reference tracks ``avg_linked_list_length`` precisely because
  long chains hurt; here the "chain length" is always 1).
- **Amortized growth**: when a region fills, the vertex is reallocated to a
  next-power-of-two region at the pool tail (same adaptive-size heuristic as
  ``dynamic_graph.cu:243-257``); the pool itself doubles up to
  ``maximum_pool_size`` (the RMM pool analogue,
  ``temporal_block_allocator.cu``).
- **Host mirror is the source of truth** (as in the reference's host/device
  block mirror, ``dynamic_graph.h:136-143``): ingestion is vectorized NumPy
  (optionally the C++ helper in ``csrc/``), and device arrays are refreshed
  lazily before sampling.

Public API parity with ``gnnflow/dynamic_graph.py:8-204``: ``add_edges``,
``offload_old_blocks``, ``num_vertices``, ``num_source_vertices``,
``max_vertex_id``, ``num_edges``, ``out_degree``, ``nodes``, ``src_nodes``,
``edges``, ``get_temporal_neighbors``, ``avg_linked_list_length``,
``get_graph_memory_usage``, ``get_metadata_memory_usage``.
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from gnnflow_tpu.common import EID_DTYPE, NID_DTYPE, TS_DTYPE


class DeviceGraph(struct.PyTreeNode):
    """Device-resident view of the store; consumed by the jittable sampler.

    All arrays have power-of-two padded capacities so jit caches survive
    incremental growth.  ``search_iters`` (static metadata) bounds the
    binary search to the maximum vertex degree — it only changes when the
    max degree crosses a power of two, so jit caches stay warm.
    """

    row_off: jax.Array  # [N] int32  — start slot of each vertex's region
    row_len: jax.Array  # [N] int32  — live edges in the region
    e_dst: jax.Array    # [C] int32  — neighbor ids, ts-sorted per vertex
    e_ts: jax.Array     # [C] float32
    e_eid: jax.Array    # [C] int32
    # lane-interleaved (dst,eid,ts) pick pool — one row gather fetches all
    # three values of an edge (ops/sampling.py:build_triple_pool); None →
    # samplers fall back to per-pool gathers
    e_triples: Optional[jax.Array] = None
    # lane-interleaved (off,len) node table (build_pair_table); None →
    # samplers fall back to two separate gathers
    v_pairs: Optional[jax.Array] = None
    search_iters: int = struct.field(pytree_node=False, default=32)

    @property
    def node_capacity(self) -> int:
        return self.row_off.shape[0]

    @property
    def pool_capacity(self) -> int:
        return self.e_dst.shape[0]


def _next_pow2(x: int) -> int:
    return 1 if x <= 1 else 1 << (int(x) - 1).bit_length()


def _exclusive_cumsum(x: np.ndarray) -> np.ndarray:
    out = np.zeros_like(x)
    np.cumsum(x[:-1], out=out[1:])
    return out


def _ranged_arange(counts: np.ndarray) -> np.ndarray:
    """[0,1,..,c0-1, 0,1,..,c1-1, ...] for counts [c0, c1, ...]."""
    total = int(counts.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64)
    return (np.arange(total, dtype=np.int64)
            - np.repeat(_exclusive_cumsum(counts), counts))


_STORAGE_ALIASES = {
    # reference names (gnnflow/dynamic_graph.py:53-62) -> TPU placements
    "cuda": "hbm", "unified": "host", "pinned": "host", "shared": "host",
    "hbm": "hbm", "host": "host",
}


class DynamicGraph:
    """Dynamic graph with incremental, time-ordered edge insertion."""

    def __init__(
            self,
            initial_pool_size: int = 1 << 20,
            maximum_pool_size: int = 1 << 26,
            mem_resource_type: str = "hbm",
            minimum_block_size: int = 16,
            blocks_to_preallocate: int = 0,
            insertion_policy: str = "insert",
            source_vertices: Optional[np.ndarray] = None,
            target_vertices: Optional[np.ndarray] = None,
            timestamps: Optional[np.ndarray] = None,
            eids: Optional[np.ndarray] = None,
            add_reverse: bool = False,
            device: int = 0,
            adaptive_block_size: bool = True,
            spill_dir: Optional[str] = None):
        placement = _STORAGE_ALIASES.get(mem_resource_type.lower())
        if placement is None:
            raise ValueError(
                f"Invalid memory resource type: {mem_resource_type}")
        insertion_policy = insertion_policy.lower()
        if insertion_policy not in ("insert", "replace"):
            raise ValueError(f"Invalid insertion policy: {insertion_policy}")

        self.placement = placement
        self.insertion_policy = insertion_policy
        self.minimum_block_size = int(max(1, minimum_block_size))
        self.adaptive_block_size = adaptive_block_size
        self.maximum_pool_size = int(maximum_pool_size)
        self.spill_dir = spill_dir or os.path.join(".", "graph_spill")

        # Pools (host mirror).  ``blocks_to_preallocate`` grows the initial
        # pool by that many minimum-size regions (the reference pre-creates
        # that many empty blocks at init, temporal_block_allocator.cu).
        cap = _next_pow2(max(
            int(initial_pool_size), 1024,
            int(blocks_to_preallocate) * self.minimum_block_size))
        self._pool_cap = cap
        self._dst = np.zeros(cap, dtype=np.int32)
        self._ts = np.zeros(cap, dtype=np.float32)
        self._eid = np.zeros(cap, dtype=np.int32)
        self._pool_used = 0

        # Vertex table (host mirror).
        ncap = 1024
        self._node_cap = ncap
        self._row_off = np.zeros(ncap, dtype=np.int64)
        self._row_len = np.zeros(ncap, dtype=np.int64)
        self._row_cap = np.zeros(ncap, dtype=np.int64)
        self._node_seen = np.zeros(ncap, dtype=bool)
        self._src_seen = np.zeros(ncap, dtype=bool)
        self._max_vertex_id = -1

        # Edge-id accounting (reference keeps a std::set of eids,
        # dynamic_graph.cu:151; we use a growable bitmap).
        self._eid_seen = np.zeros(1024, dtype=bool)
        self._num_unique_eids = 0
        self._num_insertions = 0
        self._num_offloaded = 0
        self._max_degree = 0

        # Lazy device view.
        self._device_graph: Optional[DeviceGraph] = None
        self._dirty = True

        if source_vertices is not None and target_vertices is not None \
                and timestamps is not None:
            self.add_edges(source_vertices, target_vertices, timestamps,
                           eids, add_reverse)

    # ------------------------------------------------------------------
    # Capacity management
    # ------------------------------------------------------------------

    def _ensure_node_capacity(self, max_id: int) -> None:
        if max_id < self._node_cap:
            return
        new_cap = _next_pow2(max_id + 1)
        for name in ("_row_off", "_row_len", "_row_cap"):
            arr = getattr(self, name)
            grown = np.zeros(new_cap, dtype=arr.dtype)
            grown[: len(arr)] = arr
            setattr(self, name, grown)
        for name in ("_node_seen", "_src_seen"):
            arr = getattr(self, name)
            grown = np.zeros(new_cap, dtype=bool)
            grown[: len(arr)] = arr
            setattr(self, name, grown)
        self._node_cap = new_cap

    def _ensure_pool_capacity(self, extra: int) -> None:
        need = self._pool_used + int(extra)
        if need <= self._pool_cap:
            return
        new_cap = self._pool_cap
        while new_cap < need:
            new_cap *= 2
        if new_cap > max(self.maximum_pool_size, self._pool_cap):
            raise MemoryError(
                f"edge pool would exceed maximum_pool_size "
                f"({new_cap} > {self.maximum_pool_size} edges); "
                f"consider compact() or offload_old_blocks()")
        for name in ("_dst", "_ts", "_eid"):
            arr = getattr(self, name)
            grown = np.zeros(new_cap, dtype=arr.dtype)
            grown[: len(arr)] = arr
            setattr(self, name, grown)
        self._pool_cap = new_cap

    def _ensure_eid_capacity(self, max_eid: int) -> None:
        if max_eid < len(self._eid_seen):
            return
        new_cap = _next_pow2(max_eid + 1)
        grown = np.zeros(new_cap, dtype=bool)
        grown[: len(self._eid_seen)] = self._eid_seen
        self._eid_seen = grown

    # ------------------------------------------------------------------
    # Insertion
    # ------------------------------------------------------------------

    def add_edges(self, source_vertices: np.ndarray,
                  target_vertices: np.ndarray,
                  timestamps: np.ndarray,
                  eids: Optional[np.ndarray] = None,
                  add_reverse: bool = False) -> None:
        """Insert a batch of edges (need not be time-sorted).

        Mirrors ``gnnflow/dynamic_graph.py:87-123``: eids default to
        sequential ids starting at ``num_edges()``; ``add_reverse``
        duplicates each edge in both directions sharing the eid.
        """
        src = np.asarray(source_vertices, dtype=np.int64).ravel()
        dst = np.asarray(target_vertices, dtype=np.int64).ravel()
        ts = np.asarray(timestamps, dtype=np.float32).ravel()
        if not (len(src) == len(dst) == len(ts)):
            raise ValueError(
                "The number of source vertices, target vertices, and "
                "timestamps must be the same.")
        if len(src) == 0:
            return
        if (src < 0).any() or (dst < 0).any():
            raise ValueError("vertex ids must be non-negative")

        if eids is None:
            start = self.num_edges()
            eids = np.arange(start, start + len(src), dtype=np.int64)
        else:
            eids = np.asarray(eids, dtype=np.int64).ravel()

        if add_reverse:
            src, dst = (np.concatenate([src, dst]),
                        np.concatenate([dst, src]))
            ts = np.concatenate([ts, ts])
            eids = np.concatenate([eids, eids])

        # eid accounting (unique count as in the reference's eid set)
        self._ensure_eid_capacity(int(eids.max()))
        uniq_eids = np.unique(eids)
        fresh = ~self._eid_seen[uniq_eids]
        self._num_unique_eids += int(fresh.sum())
        self._eid_seen[uniq_eids] = True
        self._num_insertions += len(src)

        max_id = int(max(src.max(), dst.max()))
        self._ensure_node_capacity(max_id)
        self._max_vertex_id = max(self._max_vertex_id, max_id)
        self._node_seen[src] = True
        self._node_seen[dst] = True
        self._src_seen[src] = True

        # Group by src, time-sorted within group; the sort is stable so
        # equal (src, ts) pairs keep arrival order (matches the reference's
        # group-then-stable-sort, dynamic_graph.cu:105-128).  Runs in the
        # native helper when built (csrc/ingest.cc), numpy otherwise.
        from gnnflow_tpu import csrc as _csrc
        order = _csrc.group_sort_edges(src, ts)
        src, dst, ts, eids = src[order], dst[order], ts[order], eids[order]
        uniq, first_idx, counts = np.unique(
            src, return_index=True, return_counts=True)

        old_len = self._row_len[uniq]
        old_cap = self._row_cap[uniq]
        old_off = self._row_off[uniq]
        new_len = old_len + counts

        # --- reallocate vertices whose region is too small -------------
        need = new_len > old_cap
        if need.any():
            vs = uniq[need]
            grow_len = new_len[need]
            if self.insertion_policy == "replace":
                # REPLACE reallocates the (single) block exact-fit in
                # place instead of chaining a new adaptively-sized block
                # (dynamic_graph.cu:262-267 → Reallocate →
                # AlignUp(size), temporal_block_allocator.cu:83-132).
                # No edges are lost; only the capacity heuristic differs.
                caps = np.maximum(grow_len, self.minimum_block_size)
            elif self.adaptive_block_size:
                caps = np.maximum(
                    self.minimum_block_size,
                    2 ** np.ceil(np.log2(np.maximum(grow_len, 1)))
                    .astype(np.int64))
            else:
                mbs = self.minimum_block_size
                caps = ((grow_len + mbs - 1) // mbs) * mbs
            total = int(caps.sum())
            self._ensure_pool_capacity(total)
            new_offs = self._pool_used + _exclusive_cumsum(caps)
            # move live edges of each reallocated vertex (vectorized)
            lens = self._row_len[vs]
            intra = _ranged_arange(lens)
            src_idx = np.repeat(self._row_off[vs], lens) + intra
            dst_idx = np.repeat(new_offs, lens) + intra
            self._dst[dst_idx] = self._dst[src_idx]
            self._ts[dst_idx] = self._ts[src_idx]
            self._eid[dst_idx] = self._eid[src_idx]
            self._row_off[vs] = new_offs
            self._row_cap[vs] = caps
            self._pool_used += total
            old_off = self._row_off[uniq]
            old_cap = self._row_cap[uniq]

        # --- append the new edges (vectorized scatter) ------------------
        write_pos = np.repeat(old_off + old_len, counts) \
            + _ranged_arange(counts)
        self._dst[write_pos] = dst
        self._ts[write_pos] = ts
        self._eid[write_pos] = eids
        self._row_len[uniq] = new_len
        self._max_degree = max(self._max_degree, int(new_len.max()))

        # --- restore sortedness where the batch predates stored edges ---
        had_old = old_len > 0
        if had_old.any():
            last_old_ts = self._ts[(old_off + old_len - 1)[had_old]]
            first_new_ts = ts[first_idx[had_old]]
            broken = np.flatnonzero(had_old)[first_new_ts < last_old_ts]
            for j in broken:
                v = uniq[j]
                _csrc.resort_range(self._ts, self._dst, self._eid,
                                   int(self._row_off[v]),
                                   int(self._row_len[v]))

        self._dirty = True

    # ------------------------------------------------------------------
    # Eviction (the reference's OffloadOldBlocks, dynamic_graph.cu:382-411)
    # ------------------------------------------------------------------

    def offload_old_blocks(self, timestamp: float,
                           to_file: bool = False) -> int:
        """Evict all edges strictly older than ``timestamp``.

        Finer-grained than the reference (which evicts whole blocks whose
        ``end_timestamp < ts``); returns the number of evicted edges.
        With ``to_file`` the evicted edges are spilled to
        ``<spill_dir>/offload_<n>.npz`` (the ``SaveToFile`` analogue,
        ``temporal_block_allocator.cu:182-256``).
        """
        active = np.flatnonzero(self._row_len > 0)
        if len(active) == 0:
            return 0
        offs = self._row_off[active]
        lens = self._row_len[active]
        # per-range lower bound for `timestamp` (native when built)
        from gnnflow_tpu import csrc as _csrc
        k = _csrc.ranged_lower_bound(
            self._ts, offs, lens,
            np.float32(timestamp))  # edges to evict per vertex
        total = int(k.sum())
        if total == 0:
            return 0
        if to_file:
            intra = _ranged_arange(k)
            idx = np.repeat(offs, k) + intra
            os.makedirs(self.spill_dir, exist_ok=True)
            path = os.path.join(
                self.spill_dir, f"offload_{self._num_offloaded}.npz")
            np.savez(path,
                     src=np.repeat(active, k),
                     dst=self._dst[idx], ts=self._ts[idx],
                     eid=self._eid[idx])
        self._row_off[active] += k
        self._row_len[active] -= k
        self._row_cap[active] -= k
        self._num_offloaded += total
        self._dirty = True
        return total

    def restore_from_file(self, path: str) -> int:
        """Re-insert edges previously spilled by
        ``offload_old_blocks(to_file=True)`` (the ``ReadFromFile``
        analogue, ``temporal_block_allocator.cu:220-256``).  Returns the
        number of restored edges."""
        data = np.load(path)
        self.add_edges(data["src"], data["dst"], data["ts"],
                       eids=data["eid"])
        return int(len(data["src"]))

    def compact(self) -> None:
        """Repack all live regions to the front of the pool, reclaiming the
        slack leaked by reallocation/offload."""
        active = np.flatnonzero(self._row_cap > 0)
        lens = self._row_len[active]
        if self.adaptive_block_size:
            caps = np.maximum(
                self.minimum_block_size,
                2 ** np.ceil(np.log2(np.maximum(lens, 1))).astype(np.int64))
        else:
            mbs = self.minimum_block_size
            caps = np.maximum(((lens + mbs - 1) // mbs) * mbs, mbs)
        new_offs = _exclusive_cumsum(caps)
        intra = _ranged_arange(lens)
        src_idx = np.repeat(self._row_off[active], lens) + intra
        dst_idx = np.repeat(new_offs, lens) + intra
        new_dst = np.zeros_like(self._dst)
        new_ts = np.zeros_like(self._ts)
        new_eid = np.zeros_like(self._eid)
        new_dst[dst_idx] = self._dst[src_idx]
        new_ts[dst_idx] = self._ts[src_idx]
        new_eid[dst_idx] = self._eid[src_idx]
        self._dst, self._ts, self._eid = new_dst, new_ts, new_eid
        self._row_off[active] = new_offs
        self._row_cap[active] = caps
        self._pool_used = int(caps.sum())
        self._dirty = True

    # ------------------------------------------------------------------
    # Introspection (parity with gnnflow/dynamic_graph.py:141-204)
    # ------------------------------------------------------------------

    def num_vertices(self) -> int:
        return int(self._node_seen.sum())

    def num_source_vertices(self) -> int:
        return int(self._src_seen.sum())

    def max_vertex_id(self) -> int:
        return self._max_vertex_id

    def num_edges(self) -> int:
        return self._num_unique_eids

    def out_degree(self, vertices: np.ndarray) -> np.ndarray:
        vertices = np.asarray(vertices, dtype=np.int64)
        deg = np.zeros(len(vertices), dtype=np.int64)
        ok = (vertices >= 0) & (vertices < self._node_cap)
        deg[ok] = self._row_len[vertices[ok]]
        return deg

    def nodes(self) -> np.ndarray:
        return np.flatnonzero(self._node_seen)

    def src_nodes(self) -> np.ndarray:
        return np.flatnonzero(self._src_seen)

    def edges(self) -> np.ndarray:
        return np.flatnonzero(self._eid_seen)

    def get_temporal_neighbors(self, vertex: int) \
            -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Neighbors of ``vertex`` sorted by timestamp **descending**
        (newest first), matching ``gnnflow/dynamic_graph.py:170-183``."""
        if vertex < 0 or vertex >= self._node_cap:
            z = np.zeros(0)
            return z.astype(np.int64), z.astype(np.float32), \
                z.astype(np.int64)
        o = int(self._row_off[vertex])
        l = int(self._row_len[vertex])
        sl = slice(o, o + l)
        return (self._dst[sl][::-1].astype(np.int64),
                self._ts[sl][::-1].copy(),
                self._eid[sl][::-1].astype(np.int64))

    def avg_linked_list_length(self) -> float:
        # Contiguous regions: every vertex's history is exactly one run.
        return 1.0 if self.num_vertices() > 0 else 0.0

    def get_graph_memory_usage(self) -> int:
        itm = (self._dst.itemsize + self._ts.itemsize + self._eid.itemsize)
        return int(self._pool_used * itm)

    def get_metadata_memory_usage(self) -> int:
        return int(self._row_off.nbytes + self._row_len.nbytes
                   + self._row_cap.nbytes)

    # ------------------------------------------------------------------
    # Device view
    # ------------------------------------------------------------------

    def _target_device(self):
        if self.placement == "host":
            try:
                return jax.local_devices(backend="cpu")[0]
            except RuntimeError:
                return None
        return None  # default device

    def device_graph(self, refresh: bool = False) -> DeviceGraph:
        """Return the device-resident view, refreshing it if the host
        mirror changed since the last call."""
        if self._device_graph is not None and not (self._dirty or refresh):
            return self._device_graph
        n = self._node_cap
        c = self._pool_cap
        dev = self._target_device()

        def put(x):
            return jax.device_put(x, dev) if dev is not None \
                else jax.device_put(x)

        # lane-interleaved pick pool (see ops/sampling.build_triple_pool)
        # built host-side so it follows the store's device placement
        n42 = -(-c // 42)
        flat = np.stack([self._dst[:c].astype(np.int32),
                         self._eid[:c].astype(np.int32),
                         self._ts[:c].astype(np.float32).view(np.int32)],
                        axis=-1).reshape(-1)
        flat = np.pad(flat, (0, n42 * 126 - flat.shape[0]))
        triples = np.pad(flat.reshape(n42, 126), ((0, 0), (0, 2)))
        n64 = -(-n // 64)
        pairs = np.stack([self._row_off.astype(np.int32),
                          self._row_len.astype(np.int32)],
                         axis=-1).reshape(-1)
        pairs = np.pad(pairs, (0, n64 * 128 - pairs.shape[0]))
        self._device_graph = DeviceGraph(
            row_off=put(self._row_off.astype(np.int32)),
            row_len=put(self._row_len.astype(np.int32)),
            e_dst=put(self._dst.astype(NID_DTYPE)[:c]),
            e_ts=put(self._ts.astype(TS_DTYPE)[:c]),
            e_eid=put(self._eid.astype(EID_DTYPE)[:c]),
            e_triples=put(triples),
            v_pairs=put(pairs.reshape(n64, 128)),
            search_iters=max(1, self._max_degree.bit_length()),
        )
        self._dirty = False
        return self._device_graph


def build_dynamic_graph(
        initial_pool_size: int,
        maximum_pool_size: int,
        mem_resource_type: str,
        minimum_block_size: int,
        insertion_policy: str,
        undirected: bool,
        blocks_to_preallocate: int = 0,
        device: int = 0,
        adaptive_block_size: bool = True,
        dataset=None,
        **kwargs) -> DynamicGraph:
    """Counterpart of ``gnnflow/utils.py:413-463``; ``dataset`` may be an
    :class:`~gnnflow_tpu.data.EdgeTable` used to seed the graph."""
    src = dst = ts = eids = None
    if dataset is not None:
        src, dst, ts, eids = (dataset.src, dataset.dst, dataset.time,
                              dataset.eid)
    return DynamicGraph(
        initial_pool_size=initial_pool_size,
        maximum_pool_size=maximum_pool_size,
        mem_resource_type=mem_resource_type,
        minimum_block_size=minimum_block_size,
        blocks_to_preallocate=blocks_to_preallocate,
        insertion_policy=insertion_policy,
        source_vertices=src, target_vertices=dst, timestamps=ts, eids=eids,
        add_reverse=undirected,
        device=device,
        adaptive_block_size=adaptive_block_size)
