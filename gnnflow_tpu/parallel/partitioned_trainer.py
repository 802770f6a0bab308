"""Fully-partitioned trainer: the multi-node training mode.

Counterpart of the reference's multi-node path
(``scripts/offline_edge_prediction_multi_node_kvstore.py``): graph
partitioned across workers, features/memory sharded behind a KV store,
per-layer RPC sampling.  Here it is the same fused train step with
different data placement:

- sampling goes through :func:`sample_hops_partitioned` (shard_map +
  psum-merge over the mesh-sharded partitioned store),
- feature tables and TGN memory rows are mesh-sharded
  (:mod:`gnnflow_tpu.parallel.kvstore`),
- the batch is sharded over the same axis (DP),

so graph partitioning + feature/memory sharding + DP compose inside one
XLA program with GSPMD-inserted collectives.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gnnflow_tpu.models import memory as memory_lib
from gnnflow_tpu.parallel.dist_graph import (PartitionedDeviceGraph,
                                             sample_hops_partitioned,
                                             sample_hops_routed,
                                             sample_layer_partitioned,
                                             sample_layer_routed)
from gnnflow_tpu.parallel.kvstore import put_global, shard_memory_state
from gnnflow_tpu.parallel.mesh import DATA_AXIS
from gnnflow_tpu.train import Trainer, _valid_mask


class PartitionedTrainer(Trainer):
    """Trainer whose sampling runs over a partitioned graph store.

    ``sampling_mode``:

    - ``"routed"`` (default) — owner-routed all-to-all sampling; per-device
      sampling work is O(B/P) (``sample_hops_routed``).
    - ``"replicated"`` — every device samples all roots against its
      partition, psum-merged; per-device work O(B) but exact for any
      partition skew (``sample_hops_partitioned``).
    """

    # all three compaction fast paths compose with routed sampling: the
    # per-boundary (nid, ts) dedup paths route each boundary's compact
    # unique roots to owners like any other roots (round 4), and block
    # compaction's packing math is store-independent — its packed roots
    # sample through _sample_layer_snaps too (round 5; loss-equality
    # under the partitioned store: tests/test_layer_dedup.py +
    # tests/test_model_compact.py partitioned variants)
    _fast_paths = frozenset({"snapshot_dedup", "layer_dedup",
                             "model_compact"})

    def __init__(self, model, mesh: Mesh, sampling_mode: str = "routed",
                 capacity_factor="auto", overflow_fallback: bool = True,
                 **kwargs):
        if sampling_mode not in ("routed", "replicated"):
            raise ValueError(sampling_mode)
        self.mesh = mesh
        self.sampling_mode = sampling_mode
        # "auto" resolves from the partition-table histogram at
        # init_state (auto_capacity_factor); must be a concrete float
        # before the step traces.
        self.capacity_factor = (capacity_factor if capacity_factor ==
                                "auto" else float(capacity_factor))
        self.overflow_fallback = bool(overflow_fallback)
        # the (nid, ts) GRU dedup sorts the full instance axis — under
        # GSPMD that would all-gather the batch-sharded MFGs; keep the
        # partitioned step per-instance unless explicitly requested.
        kwargs.setdefault("dedup_factor", None)
        # auto-calibration works under multi-controller jax.distributed
        # too (round 5): probe batches become process-spanning global
        # arrays (_probe_batch) and probe MFGs are all-gathered back to
        # every host for the stats (_host_mfgs) — multi-host runs keep
        # the tier-ladder fast paths instead of training fully padded.
        super().__init__(model, **kwargs)
        repl = NamedSharding(mesh, P())
        batch = NamedSharding(mesh, P(DATA_AXIS))
        shard = NamedSharding(mesh, P(DATA_AXIS))
        graph_shard = PartitionedDeviceGraph(
            row_off=shard, row_len=shard, e_dst=shard, e_ts=shard,
            e_eid=shard, partition_table=repl)
        # state sharding (memory rows sharded, params replicated) is
        # propagated by GSPMD from the input placements; only the batch
        # and graph args are constrained here.
        self._jit_train_kwargs = dict(
            in_shardings=(None, graph_shard, None, None,
                          batch, batch, batch, batch))
        self._rejit()

    # -- multi-process placement hooks ---------------------------------
    # Under jax.distributed (multi-controller SPMD) every jit input must
    # be a global array; these hooks build them from process-uniform
    # host values.  Single-process they reduce to plain device arrays.

    def _init_array(self, x):
        return put_global(np.asarray(x), self.mesh, P(DATA_AXIS))

    def _replicated(self, x):
        return put_global(np.asarray(x), self.mesh, P())

    def _init_memory(self, num_nodes: int):
        mem = memory_lib.init_memory(
            num_nodes, self.model.dim_memory, self.model.dim_edge,
            mailbox_slots=getattr(self.model, "mailbox_slots", 1))
        if jax.process_count() > 1:
            mem = shard_memory_state(mem, self.mesh)
        return mem

    def _batch_arrays(self, batch):
        b = P(DATA_AXIS)
        return (
            put_global(np.asarray(batch.target_nodes, np.int32),
                       self.mesh, b),
            put_global(np.asarray(batch.ts, np.float32), self.mesh, b),
            put_global(np.asarray(batch.eids, np.int32), self.mesh, b),
            put_global(np.asarray(_valid_mask(batch)), self.mesh, b))

    def train_step(self, state, dg, node_feats, edge_feats, batch):
        self._maybe_auto_calibrate(
            dg, np.asarray(batch.target_nodes, np.int32),
            np.asarray(batch.ts, np.float32))
        return self._train_step(state, dg, node_feats, edge_feats,
                                *self._batch_arrays(batch), True)

    def eval_step(self, state, dg, node_feats, edge_feats, batch):
        return self._train_step(state, dg, node_feats, edge_feats,
                                *self._batch_arrays(batch), False)

    def _resolve_capacity(self, dg) -> None:
        """Resolve ``capacity_factor="auto"`` from the partition table
        (host side, before the step traces — inside jit the table is a
        tracer)."""
        if self.capacity_factor == "auto":
            from gnnflow_tpu.parallel.dist_graph import auto_capacity_factor
            self.capacity_factor = auto_capacity_factor(
                np.asarray(dg.partition_table), dg.num_partitions)

    def init_state(self, key, dg, batch_size, node_feats, edge_feats,
                   num_nodes):
        self._resolve_capacity(dg)
        return super().init_state(key, dg, batch_size, node_feats,
                                  edge_feats, num_nodes)

    def _sample(self, dg, roots, ts, key):
        if self.sampling_mode == "routed":
            if self.capacity_factor == "auto":
                raise RuntimeError(
                    "capacity_factor='auto' unresolved — call init_state "
                    "(or _resolve_capacity) before the step traces")
            return sample_hops_routed(
                dg, self.mesh, roots, ts, fanouts=self.fanouts,
                strategy=self.strategy, num_snapshots=self.num_snapshots,
                window=self.window, prop_time=self.prop_time,
                search_iters=self._iters(dg), key=key,
                capacity_factor=self.capacity_factor,
                overflow_fallback=self.overflow_fallback)
        return sample_hops_partitioned(
            dg, self.mesh, roots, ts, fanouts=self.fanouts,
            strategy=self.strategy, num_snapshots=self.num_snapshots,
            window=self.window, prop_time=self.prop_time,
            search_iters=self._iters(dg), key=key)

    def _pre_calibrate(self, dg) -> None:
        # must run before the jitted probe sampler traces (inside the
        # trace the partition table is a tracer)
        self._resolve_capacity(dg)

    def _sample_plain(self, dg, roots, ts, key):
        """Calibration probes sample the PARTITIONED store (there is no
        single-store view); routed/replicated per sampling_mode."""
        return self._sample(dg, jnp.asarray(roots, jnp.int32),
                            jnp.asarray(ts, jnp.float32), key)

    def _probe_batch(self, roots, ts):
        """Probe batches as process-spanning global arrays — under
        multi-controller ``jax.distributed`` every jit input must be a
        global array built from process-uniform host values."""
        return (put_global(np.asarray(roots, np.int32), self.mesh,
                           P(DATA_AXIS)),
                put_global(np.asarray(ts, np.float32), self.mesh,
                           P(DATA_AXIS)))

    def _host_mfgs(self, mfgs):
        """All-gather probe MFGs to full host copies: the calibration
        stats (np.unique over all_nodes etc.) need the WHOLE batch, and
        a batch-sharded global array is not addressable from one host."""
        if jax.process_count() == 1:
            return mfgs
        from jax.experimental import multihost_utils
        return jax.tree.map(
            lambda x: np.asarray(
                multihost_utils.process_allgather(x, tiled=True)), mfgs)

    def _layer_kw(self, dg, snapshot_idx=0):
        return dict(strategy=self.strategy, snapshot_idx=snapshot_idx,
                    num_snapshots=self.num_snapshots, window=self.window,
                    prop_time=self.prop_time,
                    search_iters=self._iters(dg))

    def _sample_layer(self, dg, roots, ts, *, fanout, key=None):
        """One distributed layer sample — used by the per-boundary
        dedup fast paths, whose compact unique roots route to owner
        partitions exactly like batch roots."""
        if self.sampling_mode == "routed" \
                and roots.shape[0] % dg.num_partitions == 0:
            return sample_layer_routed(
                dg, self.mesh, roots, ts, fanout=fanout,
                key=key, capacity_factor=self.capacity_factor,
                overflow_fallback=self.overflow_fallback,
                **self._layer_kw(dg))
        return sample_layer_partitioned(
            dg, self.mesh, roots, ts, fanout=fanout, key=key,
            **self._layer_kw(dg))

    def _sample_layer_snaps(self, dg, R, T, *, fanout,
                            shared_roots=False, key=None):
        """Per-snapshot distributed layer sampling ([S, B] roots ->
        list of S MFGs).  No fused stacked pass across the partitioned
        store — each snapshot routes independently (the reference's
        multi-node sampler also loops snapshots,
        ``dist_sampler.py:129-157``)."""
        del shared_roots
        out = []
        for s in range(self.num_snapshots):
            k = jax.random.fold_in(key, s) if key is not None else None
            if self.sampling_mode == "routed" \
                    and R.shape[1] % dg.num_partitions == 0:
                out.append(sample_layer_routed(
                    dg, self.mesh, R[s], T[s], fanout=fanout, key=k,
                    capacity_factor=self.capacity_factor,
                    overflow_fallback=self.overflow_fallback,
                    **self._layer_kw(dg, snapshot_idx=s)))
            else:
                out.append(sample_layer_partitioned(
                    dg, self.mesh, R[s], T[s], fanout=fanout, key=k,
                    **self._layer_kw(dg, snapshot_idx=s)))
        return out
