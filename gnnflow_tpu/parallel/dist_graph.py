"""Partitioned graph store + distributed temporal sampling.

TPU-native replacement for the reference's distributed graph plane
(``/root/reference/gnnflow/distributed/{dist_graph.py,dist_sampler.py,
graph_services.py}``).  The reference routes each layer's roots to owner
machines over TensorPipe RPC, samples remotely, and re-stitches results
preserving dst order (``dist_sampler.py:159-314``).  Here the whole
exchange is one SPMD program:

- Each partition's store is one slice of stacked arrays ``[P, ...]``
  sharded over the mesh axis, so every device holds exactly its
  partition's edges (the per-machine graph store).
- A distributed layer sample runs under ``shard_map``: every device runs
  the *local* sampler for **all** roots against its own partition — roots
  it does not own terminate immediately (row length 0) — then a single
  ``psum`` merges the per-partition padded MFGs.  Because vertex
  partitioning assigns each root to exactly one partition, the sum
  reconstructs the unique owner's result bit-for-bit; dst order is
  preserved by construction (no ``_merge_sampling_results`` re-stitch).
- Unpartitioned vertices (table entry -1, ``dist_sampler.py:222-236``)
  are owned by no partition and yield fully-masked rows.

This replaces: RPC scatter/gather, the serving-side sampling threads and
handle polling, and static/dynamic scheduling — ICI collectives are
load-balanced by construction.
"""
from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gnnflow_tpu.common import INVALID_NID, MFG, NID_DTYPE, TS_DTYPE
from gnnflow_tpu.dynamic_graph import DeviceGraph, DynamicGraph
from gnnflow_tpu.ops import sampling as sampling_lib
from gnnflow_tpu.parallel.mesh import DATA_AXIS


class PartitionedDeviceGraph(struct.PyTreeNode):
    """Per-partition stores stacked on a leading axis (sharded over the
    mesh) + the replicated partition table."""

    row_off: jax.Array   # [P, N] int32
    row_len: jax.Array   # [P, N] int32
    e_dst: jax.Array     # [P, C] int32
    e_ts: jax.Array      # [P, C] float32
    e_eid: jax.Array     # [P, C] int32
    partition_table: jax.Array  # [N] int32 (UNASSIGNED = -1)

    @property
    def num_partitions(self) -> int:
        return self.row_off.shape[0]

    def local(self, p) -> DeviceGraph:
        return DeviceGraph(row_off=self.row_off[p],
                           row_len=self.row_len[p],
                           e_dst=self.e_dst[p], e_ts=self.e_ts[p],
                           e_eid=self.e_eid[p])


class PartitionedDynamicGraph:
    """Host-side manager: one :class:`DynamicGraph` mirror per partition
    (the per-machine ingestion path, ``dist_graph.py:34-71``) plus the
    partition table; produces a mesh-sharded device view."""

    _GRAPH_KEYS = ("initial_pool_size", "maximum_pool_size",
                   "mem_resource_type", "minimum_block_size",
                   "blocks_to_preallocate", "insertion_policy",
                   "adaptive_block_size", "spill_dir")

    def __init__(self, num_partitions: int, mesh: Optional[Mesh] = None,
                 **graph_kwargs):
        self.num_partitions = num_partitions
        self.mesh = mesh
        graph_kwargs = {k: v for k, v in graph_kwargs.items()
                        if k in self._GRAPH_KEYS}
        self.locals: List[DynamicGraph] = [
            DynamicGraph(**graph_kwargs) for _ in range(num_partitions)]
        self._pt = np.zeros(0, dtype=np.int32)
        self._device_graph: Optional[PartitionedDeviceGraph] = None
        self._dirty = True

    def set_partition_table(self, pt: np.ndarray) -> None:
        self._pt = np.asarray(pt, dtype=np.int32)
        self._dirty = True

    def add_partitioned_edges(self, partitions) -> None:
        """Ingest the output of ``Partitioner.partition`` (one edge set
        per partition)."""
        for pid, part in enumerate(partitions):
            if len(part):
                self.locals[pid].add_edges(part.src_nodes, part.dst_nodes,
                                           part.timestamps, part.eids)
        self._dirty = True

    def num_edges(self) -> int:
        return sum(g.num_edges() for g in self.locals)

    def max_vertex_id(self) -> int:
        return max([g.max_vertex_id() for g in self.locals] + [-1])

    def device_graph(self) -> PartitionedDeviceGraph:
        if self._device_graph is not None and not self._dirty:
            return self._device_graph
        views = [g.device_graph() for g in self.locals]
        ncap = max(v.row_off.shape[0] for v in views)
        ccap = max(v.e_dst.shape[0] for v in views)
        npad = max(ncap, len(self._pt))

        def stack(field, cap, fill=0):
            arrs = []
            for v in views:
                a = np.asarray(getattr(v, field))
                if a.shape[0] < cap:
                    a = np.pad(a, (0, cap - a.shape[0]),
                               constant_values=fill)
                arrs.append(a)
            return np.stack(arrs)

        pt = np.full(npad, -1, dtype=np.int32)
        pt[: len(self._pt)] = self._pt
        pg = PartitionedDeviceGraph(
            row_off=jnp.asarray(stack("row_off", npad)),
            row_len=jnp.asarray(stack("row_len", npad)),
            e_dst=jnp.asarray(stack("e_dst", ccap)),
            e_ts=jnp.asarray(stack("e_ts", ccap)),
            e_eid=jnp.asarray(stack("e_eid", ccap)),
            partition_table=jnp.asarray(pt))
        if self.mesh is not None:
            shard = NamedSharding(self.mesh, P(DATA_AXIS))
            repl = NamedSharding(self.mesh, P())
            pg = PartitionedDeviceGraph(
                row_off=jax.device_put(pg.row_off, shard),
                row_len=jax.device_put(pg.row_len, shard),
                e_dst=jax.device_put(pg.e_dst, shard),
                e_ts=jax.device_put(pg.e_ts, shard),
                e_eid=jax.device_put(pg.e_eid, shard),
                partition_table=jax.device_put(pg.partition_table, repl))
        self._device_graph = pg
        self._dirty = False
        return pg


def _local_masked_sample(g: DeviceGraph, owned: jax.Array,
                         roots: jax.Array, root_ts: jax.Array, *,
                         fanout: int, strategy: str, snapshot_idx: int,
                         num_snapshots: int, window: float,
                         prop_time: bool, search_iters: int,
                         key) -> MFG:
    """Local sample with non-owned roots masked out."""
    roots_here = jnp.where(owned, roots, INVALID_NID)
    return sampling_lib.sample_layer(
        g, roots_here, root_ts, fanout=fanout, strategy=strategy,
        snapshot_idx=snapshot_idx, num_snapshots=num_snapshots,
        window=window, prop_time=prop_time, search_iters=search_iters,
        key=key)


def sample_layer_partitioned(
        pg: PartitionedDeviceGraph, mesh: Mesh, roots: jax.Array,
        root_ts: jax.Array, *, fanout: int, strategy: str = "recent",
        snapshot_idx: int = 0, num_snapshots: int = 1, window: float = 0.0,
        prop_time: bool = False, search_iters: int = 32,
        key: Optional[jax.Array] = None) -> MFG:
    """One distributed layer sample over the mesh (see module doc)."""
    roots = roots.astype(NID_DTYPE)
    root_ts = root_ts.astype(TS_DTYPE)
    pt = pg.partition_table

    def local(row_off, row_len, e_dst, e_ts, e_eid, pt, roots, root_ts,
              key):
        # each device sees its own partition slice (leading dim 1)
        pid = jax.lax.axis_index(DATA_AXIS)
        g = DeviceGraph(row_off=row_off[0], row_len=row_len[0],
                        e_dst=e_dst[0], e_ts=e_ts[0], e_eid=e_eid[0])
        safe = jnp.clip(roots, 0, pt.shape[0] - 1)
        owned = (roots >= 0) & (pt[safe] == pid)
        k = (jax.random.fold_in(key, pid) if key is not None else None)
        mfg = _local_masked_sample(
            g, owned, roots, root_ts, fanout=fanout, strategy=strategy,
            snapshot_idx=snapshot_idx, num_snapshots=num_snapshots,
            window=window, prop_time=prop_time,
            search_iters=search_iters, key=k)
        # psum-merge: exactly one partition owns each root
        nbr_nids = jax.lax.psum(
            jnp.where(mfg.nbr_mask, mfg.nbr_nids + 1, 0), DATA_AXIS) - 1
        nbr_ts = jax.lax.psum(
            jnp.where(mfg.nbr_mask, mfg.nbr_ts, 0.0), DATA_AXIS)
        nbr_dts = jax.lax.psum(
            jnp.where(mfg.nbr_mask, mfg.nbr_dts, 0.0), DATA_AXIS)
        nbr_eids = jax.lax.psum(
            jnp.where(mfg.nbr_mask, mfg.nbr_eids, 0), DATA_AXIS)
        mask = jax.lax.psum(mfg.nbr_mask.astype(jnp.int32), DATA_AXIS) > 0
        return MFG(root_nids=roots, root_ts=root_ts,
                   nbr_nids=jnp.where(mask, nbr_nids, INVALID_NID),
                   nbr_ts=nbr_ts, nbr_dts=nbr_dts,
                   nbr_eids=jnp.where(mask, nbr_eids, 0),
                   nbr_mask=mask)

    from jax import shard_map
    spec_g = P(DATA_AXIS)
    repl = P()
    fn = shard_map(
        local, mesh=mesh,
        in_specs=(spec_g, spec_g, spec_g, spec_g, spec_g, repl, repl,
                  repl, repl),
        out_specs=MFG(root_nids=repl, root_ts=repl, nbr_nids=repl,
                      nbr_ts=repl, nbr_dts=repl, nbr_eids=repl,
                      nbr_mask=repl),
        check_vma=False)
    return fn(pg.row_off, pg.row_len, pg.e_dst, pg.e_ts, pg.e_eid, pt,
              roots, root_ts, key)


def sample_hops_partitioned(
        pg: PartitionedDeviceGraph, mesh: Mesh, roots: jax.Array,
        root_ts: jax.Array, *, fanouts: Sequence[int],
        strategy: str = "recent", num_snapshots: int = 1,
        window: float = 0.0, prop_time: bool = False,
        search_iters: int = 32,
        key: Optional[jax.Array] = None) -> List[List[MFG]]:
    """Multi-layer multi-snapshot distributed sampling (the counterpart of
    ``DistributedTemporalSampler.sample``, ``dist_sampler.py:129-157``)."""
    mfgs: List[List[MFG]] = []
    per_snap = [(roots, root_ts)] * num_snapshots
    for layer, fanout in enumerate(fanouts):
        layer_mfgs = []
        nxt = []
        for snap in range(num_snapshots):
            r, t = per_snap[snap]
            k = None
            if key is not None:
                k = jax.random.fold_in(jax.random.fold_in(key, layer),
                                       snap)
            mfg = sample_layer_partitioned(
                pg, mesh, r, t, fanout=fanout, strategy=strategy,
                snapshot_idx=snap, num_snapshots=num_snapshots,
                window=window, prop_time=prop_time,
                search_iters=search_iters, key=k)
            layer_mfgs.append(mfg)
            nxt.append((mfg.all_nodes(), mfg.all_ts()))
        per_snap = nxt
        mfgs.append(layer_mfgs)
    mfgs.reverse()
    return mfgs


class DistributedTemporalSampler:
    """User-facing distributed sampler (parity with
    ``distributed/dist_sampler.py:23``)."""

    def __init__(self, pgraph: PartitionedDynamicGraph, mesh: Mesh,
                 fanouts: Sequence[int], sample_strategy: str = "recent",
                 num_snapshots: int = 1, snapshot_time_window: float = 0.0,
                 prop_time: bool = False, seed: int = 1234,
                 is_static: bool = False, **kwargs):
        self._pgraph = pgraph
        self._mesh = mesh
        self._fanouts = tuple(int(f) for f in fanouts)
        self._strategy = sample_strategy.lower()
        self._num_snapshots = num_snapshots
        self._window = float(snapshot_time_window)
        self._prop_time = prop_time
        self._is_static = is_static
        self._key = jax.random.PRNGKey(seed)

    def sample(self, target_vertices: np.ndarray,
               timestamps: np.ndarray) -> List[List[MFG]]:
        pg = self._pgraph.device_graph()
        if self._is_static:
            timestamps = np.full(np.shape(target_vertices), 3.4e38,
                                 np.float32)
        key = None
        if self._strategy == "uniform":
            self._key, key = jax.random.split(self._key)
        iters = max(1, int(pg.e_ts.shape[1]).bit_length())
        return sample_hops_partitioned(
            pg, self._mesh,
            jnp.asarray(np.asarray(target_vertices, np.int32)),
            jnp.asarray(np.asarray(timestamps, np.float32)),
            fanouts=self._fanouts, strategy=self._strategy,
            num_snapshots=self._num_snapshots, window=self._window,
            prop_time=self._prop_time, search_iters=iters, key=key)
