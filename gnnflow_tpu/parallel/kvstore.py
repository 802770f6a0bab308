"""Sharded feature/memory tables — the KV-store replacement.

The reference shards node features, edge features and TGN memory across
machines behind ``KVStoreServer``/``KVStoreClient`` RPC
(``/root/reference/gnnflow/distributed/kvstore.py``): clients route
push/pull by partition table, send ``rpc_async`` requests, and re-merge
partial results by masks (``kvstore.py:344-394``).

On TPU none of that machinery is needed: a table is a row-sharded device
array (``NamedSharding(mesh, P('data', None))``), a *pull* is a plain
gather and a *push* a scatter — GSPMD partitions both and inserts the
ICI collectives automatically, overlapping them with compute inside the
fused train step.  This module wraps that pattern with the reference's
pull/push/init_cache vocabulary so distributed callers read the same way.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gnnflow_tpu.parallel.mesh import DATA_AXIS


def put_global(data, mesh: Mesh, spec: P):
    """Place host data (identical on every process) onto a mesh that may
    span processes.  Single-process: plain ``device_put``; multi-process:
    ``make_array_from_callback`` so each process materializes only its
    addressable shards."""
    if jax.process_count() == 1:
        return jax.device_put(data, NamedSharding(mesh, spec))
    h = np.asarray(data)
    return jax.make_array_from_callback(
        h.shape, NamedSharding(mesh, spec), lambda idx: h[idx])


class ShardedTable:
    """A ``[N, dim]`` table row-sharded over the mesh's data axis."""

    def __init__(self, data: np.ndarray, mesh: Mesh,
                 axis: str = DATA_AXIS, pad_to_multiple: bool = True):
        self.mesh = mesh
        n_shards = mesh.shape[axis]
        n = data.shape[0]
        if pad_to_multiple and n % n_shards:
            pad = n_shards - (n % n_shards)
            data = np.concatenate(
                [data, np.zeros((pad,) + data.shape[1:], data.dtype)])
        self.num_rows = n
        spec = P(axis, *([None] * (data.ndim - 1)))
        self.sharding = NamedSharding(mesh, spec)
        self.array = put_global(np.asarray(data), mesh, spec)

    def pull(self, ids: jax.Array) -> jax.Array:
        """Gather rows (``KVStoreClient.pull``); safe for any id order —
        GSPMD routes cross-shard reads."""
        safe = jnp.clip(ids, 0, self.array.shape[0] - 1)
        return self.array[safe]

    def push(self, ids: jax.Array, rows: jax.Array,
             drop_invalid: bool = True) -> None:
        """Scatter rows (``KVStoreClient.push``)."""
        idx = jnp.where(ids >= 0, ids, self.array.shape[0]) \
            if drop_invalid else ids
        self.array = self.array.at[idx].set(rows, mode="drop")

    def memory_usage(self) -> int:
        return int(self.array.size * self.array.dtype.itemsize)


class ShardedFeatureStore:
    """Node/edge feature tables sharded over the mesh — the
    ``KVStoreServer`` replacement for the trainer's resident path.

    Passing these arrays into the fused train step gives the distributed
    feature fetch: per-batch gathers compile to sharded collectives."""

    def __init__(self, mesh: Mesh,
                 node_feats: Optional[np.ndarray] = None,
                 edge_feats: Optional[np.ndarray] = None):
        self.mesh = mesh
        self.node_table = (ShardedTable(node_feats, mesh)
                           if node_feats is not None else None)
        self.edge_table = (ShardedTable(edge_feats, mesh)
                           if edge_feats is not None else None)

    @property
    def node_array(self):
        return self.node_table.array if self.node_table else None

    @property
    def edge_array(self):
        return self.edge_table.array if self.edge_table else None

    def memory_usage(self) -> Dict[str, int]:
        return {
            "node": self.node_table.memory_usage() if self.node_table
            else 0,
            "edge": self.edge_table.memory_usage() if self.edge_table
            else 0,
        }


def shard_memory_state(memory_state, mesh: Mesh, axis: str = DATA_AXIS):
    """Re-place a :class:`~gnnflow_tpu.models.memory.MemoryState` with
    rows sharded over the mesh (the partitioned-TGN-memory mode,
    ``kvstore.py:159-177``).  The fused train step's pull/update/scatter
    then run as sharded collectives."""
    def place(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        n_shards = mesh.shape[axis]
        if x.shape[0] % n_shards:
            pad = n_shards - (x.shape[0] % n_shards)
            x = jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))
        return put_global(x, mesh, spec)

    return jax.tree.map(place, memory_state)
