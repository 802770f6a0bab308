"""Dataset dispatch for partitioned execution.

Counterpart of ``/root/reference/gnnflow/distributed/{dist_context.py,
dispatcher.py}``: the reference's rank-0 Dispatcher streams csv chunks,
partitions them, ``rpc_async``-ships edges to every worker of the owning
machine, pushes features to KV servers and broadcasts metadata
(``dispatcher.py:62-97,188-237``).

Here dispatch is data movement inside one program: chunks stream through
the partitioner into per-partition host stores, features become
mesh-sharded tables, and "broadcast" is replication of small arrays.
Training data is re-split evenly across partitions exactly like
``partition.py:173-260`` so every data-parallel shard sees the same
number of chronological edges.
"""
from __future__ import annotations

import logging
from typing import Optional, Tuple

import numpy as np
from jax.sharding import Mesh

from gnnflow_tpu.data import EdgeTable
from gnnflow_tpu.parallel.dist_graph import PartitionedDynamicGraph
from gnnflow_tpu.parallel.kvstore import ShardedFeatureStore
from gnnflow_tpu.parallel.partition import Partitioner


def dispatch_full_dataset(
        full_data: EdgeTable,
        ext_roll: Optional[np.ndarray],
        partitioner: Partitioner,
        pgraph: PartitionedDynamicGraph,
        mesh: Mesh,
        node_feats: Optional[np.ndarray] = None,
        edge_feats: Optional[np.ndarray] = None,
        ingestion_batch_size: int = 100_000,
        undirected: bool = False,
) -> Tuple[EdgeTable, ShardedFeatureStore]:
    """Stream the dataset through the partitioner into the partitioned
    store; returns (train split, sharded feature store).

    ``ext_roll`` marks train(0)/val(1)/test(2) rows; like the reference
    (``dispatcher.py:117-138``) only train edges are rebalanced for
    training while ALL edges are ingested into the graph.
    """
    n = len(full_data)
    for lo in range(0, n, ingestion_batch_size):
        hi = min(lo + ingestion_batch_size, n)
        chunk = full_data[lo:hi]
        src, dst, ts, eid = (chunk.src, chunk.dst, chunk.time, chunk.eid)
        if undirected:
            src, dst = (np.concatenate([src, dst]),
                        np.concatenate([dst, src]))
            ts = np.concatenate([ts, ts])
            eid = np.concatenate([eid, eid])
        partitions, _ = partitioner.partition(src, dst, ts, eid)
        pgraph.add_partitioned_edges(partitions)
    pgraph.set_partition_table(partitioner.get_partition_table())
    logging.info(
        "dispatched %d edges into %d partitions (sizes: %s)", n,
        partitioner.get_num_partitions(),
        [g.num_edges() for g in pgraph.locals])

    store = ShardedFeatureStore(mesh, node_feats, edge_feats)
    if ext_roll is not None:
        train_end = int(np.searchsorted(ext_roll, 1))
        train = full_data[:train_end]
    else:
        train = full_data
    return train, store
