"""Multi-process (multi-host) runtime context.

Counterpart of ``/root/reference/gnnflow/distributed/dist_context.py:17-107``
(TensorPipe RPC init, per-worker KV servers, rank-0 Dispatcher + metadata
broadcast) re-designed for JAX's multi-controller SPMD model:

- ``initialize`` wraps ``jax.distributed.initialize`` — each process
  connects to the coordinator and contributes its local devices to ONE
  global device set (the RPC-world replacement).
- Every process then executes the *same* program over a global
  :class:`~jax.sharding.Mesh`; collectives ride ICI/DCN, replacing the
  reference's RPC data plane.
- ``dispatch_full_dataset_multiprocess`` is the Dispatcher analogue:
  every process streams the same (shared-filesystem) edge stream through
  an identical deterministic partitioner — so partition tables agree
  bit-for-bit without any broadcast — and ingests ONLY the partitions its
  local devices own (per-machine ingestion, ``dispatcher.py:62-73``).
- Small metadata that must be process-uniform is verified/combined with
  ``jax.experimental.multihost_utils`` (the broadcast analogue,
  ``dispatcher.py:188-237``).

Single-process use is unaffected: ``initialize()`` with no arguments is a
no-op returning (0, 1).
"""
from __future__ import annotations

import logging
from typing import Optional, Tuple

import numpy as np

from gnnflow_tpu.parallel.mesh import DATA_AXIS


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               local_device_ids=None) -> Tuple[int, int]:
    """Join the multi-process runtime (``dist_context.py:17-56``).

    With no arguments this is a single-process no-op.  Otherwise each
    process calls it with the shared coordinator address and its rank;
    afterwards ``jax.devices()`` spans ALL processes' devices and
    ``jax.local_devices()`` this process's.

    Returns ``(process_id, num_processes)``.
    """
    import jax
    if coordinator_address is None and num_processes is None:
        return jax.process_index(), jax.process_count()
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids)
    logging.info("joined distributed runtime: process %d/%d, "
                 "%d local / %d global devices", jax.process_index(),
                 jax.process_count(), jax.local_device_count(),
                 jax.device_count())
    return jax.process_index(), jax.process_count()


def shutdown() -> None:
    import jax
    if jax.process_count() > 1:
        jax.distributed.shutdown()


def global_mesh(axis_names=(DATA_AXIS,)):
    """Mesh over ALL processes' devices (one partition per device)."""
    from gnnflow_tpu.parallel.mesh import make_mesh
    return make_mesh(None, axis_names=axis_names)


def owned_partitions(num_partitions: int) -> range:
    """Partition ids whose device is local to this process.

    Partition p lives on global device p (the partitioned store shards
    its leading axis over the mesh), and JAX orders ``jax.devices()`` by
    process, so ownership is a contiguous range."""
    import jax
    per = num_partitions // max(jax.process_count(), 1)
    lo = jax.process_index() * per
    return range(lo, lo + per)


def replicate_to_global(x, mesh):
    """Host array (identical on every process) → replicated global array
    — the metadata-broadcast analogue (``dispatcher.py:188-237``)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    return jax.make_array_from_callback(
        np.shape(x), NamedSharding(mesh, P()),
        lambda idx: np.asarray(x)[idx])


def assert_uniform(value: np.ndarray, name: str = "value") -> None:
    """Verify a host value is identical on every process (guards the
    'deterministic partitioner' invariant)."""
    import jax
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils
    gathered = multihost_utils.process_allgather(np.asarray(value))
    if not (gathered == gathered[0]).all():
        raise AssertionError(
            f"{name} differs across processes — the partitioner stream "
            f"must be deterministic and identical on every process")


def dispatch_full_dataset_multiprocess(
        full_data, ext_roll, partitioner, pgraph, mesh,
        node_feats=None, edge_feats=None,
        ingestion_batch_size: int = 100_000, undirected: bool = False):
    """Multi-process Dispatcher analogue (``dist_context.py:58-107``).

    Every process streams the same edge stream through its own (identical,
    deterministic) partitioner; ``pgraph`` must be constructed with
    ``local_only=True`` so only locally-owned partitions are materialized.
    Features become globally-sharded tables.  Returns
    ``(train_split, ShardedFeatureStore)`` like the single-process
    ``dispatch_full_dataset``.
    """
    from gnnflow_tpu.parallel.kvstore import ShardedFeatureStore

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
    pt = partitioner.get_partition_table()
    # cheap cross-process agreement check on a table digest
    digest = np.array([len(pt), int(pt.astype(np.int64).sum()),
                       int((pt >= 0).sum())], np.int64)
    assert_uniform(digest, "partition table digest")
    pgraph.set_partition_table(pt)

    store = ShardedFeatureStore(mesh, node_feats, edge_feats)
    if ext_roll is not None:
        train_end = int(np.searchsorted(ext_roll, 1))
        train = full_data[:train_end]
    else:
        train = full_data
    return train, store
