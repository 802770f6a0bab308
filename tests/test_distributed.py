"""Distributed (partitioned) subsystem tests on the 8-device CPU mesh.

The reference has NO multi-node unit tests (SURVEY.md §4); these validate
the full partitioned path: dispatch → partitioned store → shard_map
sampling (bit-identical to the single-store sampler) → sharded KV tables.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gnnflow_tpu.data import make_synthetic_dataset
from gnnflow_tpu.dynamic_graph import DynamicGraph
from gnnflow_tpu.parallel import (DistributedTemporalSampler,
                                  PartitionedDynamicGraph, ShardedTable,
                                  dispatch_full_dataset, get_partitioner,
                                  make_mesh, shard_memory_state)
from gnnflow_tpu.temporal_sampler import TemporalSampler

GRAPH_KW = dict(initial_pool_size=4096, maximum_pool_size=1 << 22,
                mem_resource_type="hbm", minimum_block_size=8,
                insertion_policy="insert")


def _dataset(num_edges=3000, seed=0):
    _, _, _, full, nf, ef = make_synthetic_dataset(
        num_src=120, num_dst=40, num_edges=num_edges, dim_edge=8,
        dim_node=4, seed=seed)
    return full, nf, ef


def _build_both(full, mesh, strategy="hash"):
    """Build a replicated single store and an equivalent partitioned one."""
    g = DynamicGraph(**GRAPH_KW)
    g.add_edges(full.src, full.dst, full.time, full.eid)
    part = get_partitioner(strategy, mesh.shape["data"])
    pg = PartitionedDynamicGraph(mesh.shape["data"], mesh=mesh, **GRAPH_KW)
    parts, _ = part.partition(full.src, full.dst, full.time, full.eid)
    pg.add_partitioned_edges(parts)
    pg.set_partition_table(part.get_partition_table())
    return g, pg


def test_partitioned_matches_single_store_recent():
    """Distributed recent sampling must reproduce the single-store result
    bit-for-bit (the psum-merge owner invariant)."""
    full, _, _ = _dataset()
    mesh = make_mesh(8)
    g, pg = _build_both(full, mesh)
    single = TemporalSampler(g, fanouts=[4, 3], sample_strategy="recent")
    dist = DistributedTemporalSampler(pg, mesh, fanouts=[4, 3],
                                      sample_strategy="recent")
    rng = np.random.RandomState(0)
    roots = rng.randint(0, 120, 64)
    ts = (rng.rand(64) * full.time.max()).astype(np.float32)
    m1 = single.sample(roots, ts)
    m2 = dist.sample(roots, ts)
    for l in range(2):
        a, b = m1[l][0], m2[l][0]
        np.testing.assert_array_equal(np.asarray(a.nbr_nids),
                                      np.asarray(b.nbr_nids))
        np.testing.assert_array_equal(np.asarray(a.nbr_eids),
                                      np.asarray(b.nbr_eids))
        np.testing.assert_allclose(np.asarray(a.nbr_ts),
                                   np.asarray(b.nbr_ts), rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(a.nbr_mask),
                                      np.asarray(b.nbr_mask))


def test_partitioned_uniform_valid():
    full, _, _ = _dataset()
    mesh = make_mesh(8)
    g, pg = _build_both(full, mesh)
    dist = DistributedTemporalSampler(pg, mesh, fanouts=[5],
                                      sample_strategy="uniform")
    roots = np.arange(50)
    ts = np.full(50, float(full.time.max()), np.float32)
    mfg = dist.sample(roots, ts)[0][0]
    nbr = np.asarray(mfg.nbr_nids)
    mask = np.asarray(mfg.nbr_mask)
    # sampled neighbors must be true temporal neighbors of each root
    for i, r in enumerate(roots):
        true_nbrs = set(full.dst[full.src == r].tolist())
        got = set(nbr[i][mask[i]].tolist())
        assert got <= true_nbrs


def test_unpartitioned_vertices_empty():
    full, _, _ = _dataset()
    mesh = make_mesh(8)
    _, pg = _build_both(full, mesh)
    # vertex id beyond the partition table -> unowned -> masked
    dist = DistributedTemporalSampler(pg, mesh, fanouts=[4])
    mfg = dist.sample(np.array([5000, -1]),
                      np.array([50.0, 50.0], np.float32))[0][0]
    assert not np.asarray(mfg.nbr_mask).any()


def test_dispatch_full_dataset():
    full, nf, ef = _dataset()
    ext_roll = np.zeros(len(full), np.int64)
    ext_roll[int(0.7 * len(full)):] = 1
    mesh = make_mesh(8)
    part = get_partitioner("roundrobin", 8)
    pg = PartitionedDynamicGraph(8, mesh=mesh, **GRAPH_KW)
    train, store = dispatch_full_dataset(
        full, ext_roll, part, pg, mesh, node_feats=nf, edge_feats=ef,
        ingestion_batch_size=500)
    assert pg.num_edges() == len(full)
    assert len(train) == int(0.7 * len(full))
    assert store.node_array is not None
    assert store.memory_usage()["edge"] > 0
    # sampling over the dispatched store works
    dist = DistributedTemporalSampler(pg, mesh, fanouts=[3])
    mfg = dist.sample(np.arange(10),
                      np.full(10, 50.0, np.float32))[0][0]
    assert np.asarray(mfg.nbr_mask).any()


def test_sharded_table_pull_push():
    mesh = make_mesh(8)
    data = np.arange(80, dtype=np.float32).reshape(20, 4)
    table = ShardedTable(data, mesh)
    ids = jnp.array([3, 17, 5, 3])
    rows = np.asarray(table.pull(ids))
    np.testing.assert_allclose(rows, data[np.array([3, 17, 5, 3])])
    table.push(jnp.array([2, -1]),
               jnp.stack([jnp.full(4, 900.0), jnp.full(4, -777.0)]))
    np.testing.assert_allclose(np.asarray(table.pull(jnp.array([2]))),
                               [[900.0] * 4])
    # invalid id dropped
    assert not (np.asarray(table.array) == -777.0).any()


def test_sharded_memory_in_train_step():
    """The fused TGN train step must run with memory + features sharded
    over the mesh (the partitioned KV mode)."""
    from gnnflow_tpu.data import DstRandEdgeSampler, get_batches
    from gnnflow_tpu.models.dgnn import DGNN
    from gnnflow_tpu.train import Trainer

    full, nf, ef = _dataset(num_edges=2000)
    mesh = make_mesh(8)
    g = DynamicGraph(**GRAPH_KW)
    g.add_edges(full.src, full.dst, full.time, full.eid, add_reverse=True)
    dg = g.device_graph()
    model = DGNN(dim_node=0, dim_edge=8, dim_time=8, dim_embed=16,
                 num_layers=1, num_snapshots=1, att_head=2, dropout=0.0,
                 att_dropout=0.0, use_memory=True, dim_memory=16)
    trainer = Trainer(model, fanouts=[5], lr=1e-3)
    B = 160
    efj = ShardedTable(ef, mesh).array
    state = trainer.init_state(jax.random.PRNGKey(0), dg, B, None, efj,
                               num_nodes=g.max_vertex_id() + 1)
    state = state.replace(memory=shard_memory_state(state.memory, mesh))
    neg = DstRandEdgeSampler(full.dst, seed=1)
    train = full[: int(0.7 * len(full))]
    for i, batch in enumerate(get_batches(train, B, neg)):
        state, loss, _, _ = trainer.train_step(state, dg, None, efj,
                                               batch)
        assert np.isfinite(float(loss))
        if i >= 2:
            break


def test_partitioned_trainer_end_to_end():
    """Graph partitioning + sharded memory/features + DP batch, one jit."""
    from gnnflow_tpu.data import DstRandEdgeSampler, get_batches
    from gnnflow_tpu.models.dgnn import DGNN
    from gnnflow_tpu.parallel.partitioned_trainer import PartitionedTrainer
    from gnnflow_tpu.parallel import ShardedTable, shard_memory_state

    full, nf, ef = _dataset(num_edges=2500)
    mesh = make_mesh(8)
    part = get_partitioner("hash", 8)
    pg = PartitionedDynamicGraph(8, mesh=mesh, **GRAPH_KW)
    src, dst = (np.concatenate([full.src, full.dst]),
                np.concatenate([full.dst, full.src]))
    ts2 = np.concatenate([full.time, full.time])
    eid2 = np.concatenate([full.eid, full.eid])
    parts, _ = part.partition(src, dst, ts2, eid2)
    pg.add_partitioned_edges(parts)
    pg.set_partition_table(part.get_partition_table())

    model = DGNN(dim_node=0, dim_edge=8, dim_time=8, dim_embed=16,
                 num_layers=1, num_snapshots=1, att_head=2, dropout=0.0,
                 att_dropout=0.0, use_memory=True, dim_memory=16)
    trainer = PartitionedTrainer(model, mesh, fanouts=[5], lr=1e-3)
    B = 160
    dg = pg.device_graph()
    efj = ShardedTable(ef, mesh).array
    state = trainer.init_state(jax.random.PRNGKey(0), dg, B, None, efj,
                               num_nodes=pg.max_vertex_id() + 1)
    state = state.replace(memory=shard_memory_state(state.memory, mesh))
    neg = DstRandEdgeSampler(full.dst, seed=1)
    train = full[: int(0.7 * len(full))]
    losses = []
    for i, batch in enumerate(get_batches(train, B, neg)):
        state, loss, _, _ = trainer.train_step(state, dg, None, efj,
                                               batch)
        losses.append(float(loss))
        if i >= 3:
            break
    assert np.isfinite(losses).all()


def test_partitioned_trainer_matches_single_device():
    """The fully-partitioned trainer (graph shards + sharded memory +
    DP batch) must match the single-store trainer numerically."""
    from gnnflow_tpu.data import DstRandEdgeSampler, get_batches
    from gnnflow_tpu.models.dgnn import DGNN
    from gnnflow_tpu.parallel.partitioned_trainer import PartitionedTrainer
    from gnnflow_tpu.parallel import ShardedTable, shard_memory_state
    from gnnflow_tpu.train import Trainer

    full, nf, ef = _dataset(num_edges=2000, seed=4)
    mesh = make_mesh(8)
    src = np.concatenate([full.src, full.dst])
    dst = np.concatenate([full.dst, full.src])
    ts2 = np.concatenate([full.time, full.time])
    eid2 = np.concatenate([full.eid, full.eid])

    def model():
        return DGNN(dim_node=0, dim_edge=8, dim_time=8, dim_embed=16,
                    num_layers=1, num_snapshots=1, att_head=2,
                    dropout=0.0, att_dropout=0.0, use_memory=True,
                    dim_memory=16)

    B = 160
    train = full[: int(0.7 * len(full))]

    # single device
    g = DynamicGraph(**GRAPH_KW)
    g.add_edges(src, dst, ts2, eid2)
    t1 = Trainer(model(), fanouts=[5], lr=1e-3)
    efj = jnp.asarray(ef)
    s1 = t1.init_state(jax.random.PRNGKey(0), g.device_graph(), B, None,
                       efj, num_nodes=g.max_vertex_id() + 1)

    # partitioned
    part = get_partitioner("hash", 8)
    pg = PartitionedDynamicGraph(8, mesh=mesh, **GRAPH_KW)
    parts, _ = part.partition(src, dst, ts2, eid2)
    pg.add_partitioned_edges(parts)
    pg.set_partition_table(part.get_partition_table())
    t2 = PartitionedTrainer(model(), mesh, fanouts=[5], lr=1e-3)
    efp = ShardedTable(ef, mesh).array
    s2 = t2.init_state(jax.random.PRNGKey(0), pg.device_graph(), B, None,
                       efp, num_nodes=pg.max_vertex_id() + 1)
    s2 = s2.replace(memory=shard_memory_state(s2.memory, mesh))

    neg1 = DstRandEdgeSampler(full.dst, seed=1)
    neg2 = DstRandEdgeSampler(full.dst, seed=1)
    l1s, l2s = [], []
    for i, (b1, b2) in enumerate(zip(get_batches(train, B, neg1),
                                     get_batches(train, B, neg2))):
        s1, l1, _, _ = t1.train_step(s1, g.device_graph(), None, efj, b1)
        s2, l2, _, _ = t2.train_step(s2, pg.device_graph(), None, efp,
                                     b2)
        l1s.append(float(l1))
        l2s.append(float(l2))
        if i >= 3:
            break
    np.testing.assert_allclose(l1s, l2s, rtol=5e-4)


def test_partitioned_trainer_multisnapshot_matches_single_device():
    """DySAT-style (windowed multi-snapshot, 2-layer, no memory) through
    the fully-partitioned trainer must match the single-store trainer —
    the partitioned path has no model-compaction (padded everywhere), so
    recent sampling makes the comparison deterministic."""
    from gnnflow_tpu.data import DstRandEdgeSampler, get_batches
    from gnnflow_tpu.models.dgnn import DGNN
    from gnnflow_tpu.parallel.partitioned_trainer import PartitionedTrainer
    from gnnflow_tpu.parallel import ShardedTable
    from gnnflow_tpu.train import Trainer

    full, nf, ef = _dataset(num_edges=2000, seed=9)
    mesh = make_mesh(8)
    src = np.concatenate([full.src, full.dst])
    dst = np.concatenate([full.dst, full.src])
    ts2 = np.concatenate([full.time, full.time])
    eid2 = np.concatenate([full.eid, full.eid])

    def model():
        return DGNN(dim_node=0, dim_edge=8, dim_time=8, dim_embed=16,
                    num_layers=2, num_snapshots=2, att_head=2,
                    dropout=0.0, att_dropout=0.0, use_memory=False)

    kw = dict(fanouts=[4, 3], sample_strategy="recent", num_snapshots=2,
              snapshot_time_window=2.0, prop_time=True, lr=1e-3)
    B = 160
    train = full[: int(0.7 * len(full))]

    g = DynamicGraph(**GRAPH_KW)
    g.add_edges(src, dst, ts2, eid2)
    # single-device trainer WITHOUT model compaction for an apples
    # comparison (the partitioned path is padded)
    t1 = Trainer(model(), model_compact=False, **kw)
    efj = jnp.asarray(ef)
    s1 = t1.init_state(jax.random.PRNGKey(0), g.device_graph(), B, None,
                       efj, num_nodes=g.max_vertex_id() + 1)

    part = get_partitioner("hash", 8)
    pg = PartitionedDynamicGraph(8, mesh=mesh, **GRAPH_KW)
    parts, _ = part.partition(src, dst, ts2, eid2)
    pg.add_partitioned_edges(parts)
    pg.set_partition_table(part.get_partition_table())
    t2 = PartitionedTrainer(model(), mesh, **kw)
    efp = ShardedTable(ef, mesh).array
    s2 = t2.init_state(jax.random.PRNGKey(0), pg.device_graph(), B, None,
                       efp, num_nodes=pg.max_vertex_id() + 1)

    neg1 = DstRandEdgeSampler(full.dst, seed=1)
    neg2 = DstRandEdgeSampler(full.dst, seed=1)
    l1s, l2s = [], []
    for i, (b1, b2) in enumerate(zip(get_batches(train, B, neg1),
                                     get_batches(train, B, neg2))):
        s1, l1, _, _ = t1.train_step(s1, g.device_graph(), None, efj, b1)
        s2, l2, _, _ = t2.train_step(s2, pg.device_graph(), None, efp,
                                     b2)
        l1s.append(float(l1))
        l2s.append(float(l2))
        if i >= 3:
            break
    np.testing.assert_allclose(l1s, l2s, rtol=5e-4)
