"""Distributed cache (misses routed to mesh-sharded KV tables,
``gnnflow/cache/cache.py:364-377``) and the prefetch pipeline
(``offline_edge_prediction.py:343-399``)."""
import numpy as np
import jax
import pytest

from gnnflow_tpu.cache import FIFOCache, LRUCache
from gnnflow_tpu.data import (DstRandEdgeSampler, get_batches,
                              make_synthetic_dataset)
from gnnflow_tpu.dynamic_graph import DynamicGraph
from gnnflow_tpu.parallel import ShardedTable, make_mesh
from gnnflow_tpu.pipeline import FeaturePipeline
from gnnflow_tpu.temporal_sampler import TemporalSampler


def _setup(num_edges=2000, seed=0):
    train, val, test, full, nf, ef = make_synthetic_dataset(
        num_src=100, num_dst=30, num_edges=num_edges, dim_edge=8,
        dim_node=6, seed=seed)
    g = DynamicGraph(initial_pool_size=4096, maximum_pool_size=1 << 22,
                     mem_resource_type="hbm", minimum_block_size=8,
                     insertion_policy="insert")
    g.add_edges(full.src, full.dst, full.time, full.eid, add_reverse=True)
    return train, full, g, nf, ef


@pytest.mark.parametrize("cache_cls", [LRUCache, FIFOCache])
def test_distributed_cache_matches_host_cache(cache_cls):
    """A cache whose masters are mesh-sharded KV tables must return the
    same features and the same hit accounting as the host-table cache."""
    train, full, g, nf, ef = _setup()
    mesh = make_mesh(8)
    sampler = TemporalSampler(g, fanouts=[5])
    num_nodes = g.max_vertex_id() + 1
    kw = dict(edge_cache_ratio=0.2, node_cache_ratio=0.2,
              num_nodes=num_nodes, num_edges=len(full))
    host = cache_cls(node_feats=nf, edge_feats=ef, **kw)
    dist = cache_cls(node_feats=ShardedTable(nf, mesh),
                     edge_feats=ShardedTable(ef, mesh), **kw)
    host.init_cache()
    dist.init_cache()
    assert dist.edge_cache.distributed and dist.node_cache.distributed
    neg = DstRandEdgeSampler(train.dst, seed=1)
    for i, batch in enumerate(get_batches(train, 100, neg)):
        mfgs = sampler.sample(batch.target_nodes, batch.ts)
        nfs_h, efs_h = host.fetch_feature(mfgs, batch.eids)
        nfs_d, efs_d = dist.fetch_feature(mfgs, batch.eids)
        np.testing.assert_allclose(np.asarray(nfs_h[0]),
                                   np.asarray(nfs_d[0]), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(efs_h[0][0]),
                                   np.asarray(efs_d[0][0]), rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(host.target_edge_features),
            np.asarray(dist.target_edge_features), rtol=1e-6)
        assert host.cache_edge_ratio == dist.cache_edge_ratio
        assert host.cache_node_ratio == dist.cache_node_ratio
        if i >= 4:
            break
    assert dist.cache_edge_ratio > 0


def test_distributed_cache_zero_capacity_passthrough():
    train, full, g, nf, ef = _setup()
    mesh = make_mesh(8)
    sampler = TemporalSampler(g, fanouts=[4])
    num_nodes = g.max_vertex_id() + 1
    dist = LRUCache(edge_cache_ratio=0, node_cache_ratio=0,
                    num_nodes=num_nodes, num_edges=len(full),
                    node_feats=ShardedTable(nf, mesh),
                    edge_feats=ShardedTable(ef, mesh))
    dist.init_cache()
    neg = DstRandEdgeSampler(train.dst, seed=1)
    batch = next(iter(get_batches(train, 64, neg)))
    mfgs = sampler.sample(batch.target_nodes, batch.ts)
    nfs, efs = dist.fetch_feature(mfgs, batch.eids)
    mfg = mfgs[0][0]
    ids = np.asarray(mfg.all_nodes())
    valid = np.asarray(mfg.all_mask())
    exp = np.where(valid[:, None], nf[np.clip(ids, 0, None)], 0.0)
    np.testing.assert_allclose(np.asarray(nfs[0]), exp, rtol=1e-6)


def test_feature_pipeline_matches_sequential():
    """The prefetch pipeline must yield exactly the sequential loop's
    batches/features, in order."""
    train, full, g, nf, ef = _setup()
    sampler = TemporalSampler(g, fanouts=[5])
    num_nodes = g.max_vertex_id() + 1

    def mk():
        c = LRUCache(edge_cache_ratio=0.2, node_cache_ratio=0.2,
                     num_nodes=num_nodes, num_edges=len(full),
                     node_feats=nf, edge_feats=ef)
        c.init_cache()
        return c

    neg = DstRandEdgeSampler(train.dst, seed=1)
    seq = []
    cache = mk()
    for batch in get_batches(train, 100, neg):
        mfgs = sampler.sample(batch.target_nodes, batch.ts)
        nfs, efs = cache.fetch_feature(mfgs, batch.eids)
        seq.append((batch.eids.copy(), np.asarray(nfs[0]),
                    np.asarray(efs[0][0]),
                    np.asarray(cache.target_edge_features)))

    neg2 = DstRandEdgeSampler(train.dst, seed=1)
    pipe = FeaturePipeline(sampler, mk(), depth=2)
    out = list(pipe.run(get_batches(train, 100, neg2)))
    assert len(out) == len(seq)
    for (eids, nf0, ef0, tef), (batch, mfgs, nfs, efs, tef2) in zip(
            seq, out):
        np.testing.assert_array_equal(eids, batch.eids)
        np.testing.assert_allclose(nf0, np.asarray(nfs[0]), rtol=1e-6)
        np.testing.assert_allclose(ef0, np.asarray(efs[0][0]), rtol=1e-6)
        np.testing.assert_allclose(tef, np.asarray(tef2), rtol=1e-6)


def test_feature_pipeline_early_break():
    """Breaking out of the consumer loop must not deadlock the worker."""
    train, full, g, nf, ef = _setup()
    sampler = TemporalSampler(g, fanouts=[5])
    cache = LRUCache(edge_cache_ratio=0.2, node_cache_ratio=0,
                     num_nodes=g.max_vertex_id() + 1, num_edges=len(full),
                     node_feats=None, edge_feats=ef)
    cache.init_cache()
    neg = DstRandEdgeSampler(train.dst, seed=1)
    pipe = FeaturePipeline(sampler, cache, depth=2)
    for i, item in enumerate(pipe.run(get_batches(train, 100, neg))):
        if i >= 1:
            break  # must not hang


def test_feature_pipeline_propagates_errors():
    class Boom:
        def sample(self, *a):
            raise RuntimeError("boom")

    pipe = FeaturePipeline(Boom(), None)

    class B:
        target_nodes = np.zeros(3)
        ts = np.zeros(3)
        eids = np.zeros(1)

    with pytest.raises(RuntimeError, match="boom"):
        list(pipe.run([B()]))
