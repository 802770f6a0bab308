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
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gnnflow_tpu.parallel.dist_graph import (PartitionedDeviceGraph,
                                             sample_hops_partitioned)
from gnnflow_tpu.parallel.mesh import DATA_AXIS
from gnnflow_tpu.train import Trainer


class PartitionedTrainer(Trainer):
    """Trainer whose sampling runs over a partitioned graph store."""

    def __init__(self, model, mesh: Mesh, **kwargs):
        self.mesh = mesh
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
        self._train_step = jax.jit(
            self._step, static_argnums=(8,), donate_argnums=(0,),
            in_shardings=(None, graph_shard, None, None,
                          batch, batch, batch, batch))

    def _sample(self, dg, roots, ts, key):
        return sample_hops_partitioned(
            dg, self.mesh, roots, ts, fanouts=self.fanouts,
            strategy=self.strategy, num_snapshots=self.num_snapshots,
            window=self.window, prop_time=self.prop_time,
            search_iters=self._iters(dg), key=key)
