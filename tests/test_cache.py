"""Feature cache tests: correctness of every policy, hit-rate accounting,
and training through the cache path (analogue of the reference's cached
feature fetch, ``gnnflow/cache/``)."""
import numpy as np
import jax
import pytest

from gnnflow_tpu.cache import (CACHES, FIFOCache, GNNLabStaticCache,
                               LFUCache, LRUCache)
from gnnflow_tpu.data import (DstRandEdgeSampler, get_batches,
                              make_synthetic_dataset)
from gnnflow_tpu.dynamic_graph import DynamicGraph
from gnnflow_tpu.models.dgnn import DGNN
from gnnflow_tpu.temporal_sampler import TemporalSampler
from gnnflow_tpu.train import Trainer


def _graph_and_feats(num_edges=2000, dim_edge=8, dim_node=6, seed=0):
    train, val, test, full, nf, ef = make_synthetic_dataset(
        num_src=100, num_dst=30, num_edges=num_edges, dim_edge=dim_edge,
        dim_node=dim_node, seed=seed)
    g = DynamicGraph(initial_pool_size=4096, maximum_pool_size=1 << 22,
                     mem_resource_type="hbm", minimum_block_size=8,
                     insertion_policy="insert")
    g.add_edges(full.src, full.dst, full.time, full.eid, add_reverse=True)
    return train, full, g, nf, ef


@pytest.mark.parametrize("cache_cls", [LRUCache, LFUCache, FIFOCache,
                                       GNNLabStaticCache])
def test_cache_returns_correct_features(cache_cls):
    train, full, g, nf, ef = _graph_and_feats()
    sampler = TemporalSampler(g, fanouts=[5], sample_strategy="recent")
    num_nodes = g.max_vertex_id() + 1
    cache = cache_cls(edge_cache_ratio=0.2, node_cache_ratio=0.2,
                      num_nodes=num_nodes, num_edges=len(full),
                      node_feats=nf, edge_feats=ef)
    if cache_cls is GNNLabStaticCache:
        cache.init_cache(sampler=sampler, train_data=train,
                         pre_sampling_rounds=1, batch_size=200)
    else:
        cache.init_cache()
    neg = DstRandEdgeSampler(train.dst, seed=1)
    for i, batch in enumerate(get_batches(train, 100, neg)):
        mfgs = sampler.sample(batch.target_nodes, batch.ts)
        nfs, efs = cache.fetch_feature(mfgs, batch.eids)
        # verify against direct gather from master tables
        mfg = mfgs[0][0]
        ids = np.asarray(mfg.all_nodes())
        valid = np.asarray(mfg.all_mask())
        got = np.asarray(nfs[0])
        exp = np.where(valid[:, None], nf[np.clip(ids, 0, None)], 0.0)
        np.testing.assert_allclose(got, exp, rtol=1e-6)
        eids2 = np.asarray(mfg.nbr_eids)
        emask = np.asarray(mfg.nbr_mask)
        got_e = np.asarray(efs[0][0])
        exp_e = np.where(emask[..., None], ef[np.clip(eids2, 0, None)],
                         0.0)
        np.testing.assert_allclose(got_e, exp_e, rtol=1e-6)
        # target edge features
        tef = np.asarray(cache.target_edge_features)
        np.testing.assert_allclose(tef[: batch.num_valid],
                                   ef[batch.eids[: batch.num_valid]],
                                   rtol=1e-6)
        if i >= 4:
            break
    assert 0.0 <= cache.cache_edge_ratio <= 1.0
    assert cache.get_mem_size() > 0


def test_lru_hits_increase_on_repeat():
    train, full, g, nf, ef = _graph_and_feats()
    sampler = TemporalSampler(g, fanouts=[5])
    cache = LRUCache(edge_cache_ratio=0.5, node_cache_ratio=0.5,
                     num_nodes=g.max_vertex_id() + 1, num_edges=len(full),
                     node_feats=nf, edge_feats=ef)
    # NB: no init_cache() -> cold start, first fetch is all misses
    batch = next(iter(get_batches(train, 200,
                                  DstRandEdgeSampler(train.dst, seed=1))))
    mfgs = sampler.sample(batch.target_nodes, batch.ts)
    cache.fetch_feature(mfgs, batch.eids)
    r1 = cache.cache_edge_ratio
    cache.fetch_feature(mfgs, batch.eids)  # same batch again -> mostly hits
    r2 = cache.cache_edge_ratio
    assert r2 > r1


def test_zero_capacity_cache_passthrough():
    train, full, g, nf, ef = _graph_and_feats()
    sampler = TemporalSampler(g, fanouts=[5])
    cache = FIFOCache(edge_cache_ratio=0.0, node_cache_ratio=0.0,
                      num_nodes=g.max_vertex_id() + 1,
                      num_edges=len(full), node_feats=nf, edge_feats=ef)
    cache.init_cache()
    batch = next(iter(get_batches(train, 100,
                                  DstRandEdgeSampler(train.dst, seed=1))))
    mfgs = sampler.sample(batch.target_nodes, batch.ts)
    nfs, efs = cache.fetch_feature(mfgs, batch.eids)
    mfg = mfgs[0][0]
    ids = np.asarray(mfg.all_nodes())
    valid = np.asarray(mfg.all_mask())
    np.testing.assert_allclose(
        np.asarray(nfs[0]),
        np.where(valid[:, None], nf[np.clip(ids, 0, None)], 0.0),
        rtol=1e-6)


def test_training_through_cache_path():
    """Cache-fed prefetched trainer step must run and produce finite loss."""
    train, full, g, nf, ef = _graph_and_feats()
    sampler = TemporalSampler(g, fanouts=[5])
    num_nodes = g.max_vertex_id() + 1
    cache = LRUCache(edge_cache_ratio=0.3, node_cache_ratio=0.3,
                     num_nodes=num_nodes, num_edges=len(full),
                     node_feats=nf, edge_feats=ef)
    cache.init_cache()
    model = DGNN(dim_node=6, dim_edge=8, dim_time=8, dim_embed=16,
                 num_layers=1, num_snapshots=1, att_head=2, dropout=0.1,
                 att_dropout=0.1, use_memory=True, dim_memory=16)
    trainer = Trainer(model, fanouts=[5], lr=1e-3)
    dg = g.device_graph()
    state = trainer.init_state(jax.random.PRNGKey(0), dg, 100,
                               jax.numpy.asarray(nf),
                               jax.numpy.asarray(ef), num_nodes=num_nodes)
    neg = DstRandEdgeSampler(train.dst, seed=1)
    for i, batch in enumerate(get_batches(train, 100, neg)):
        mfgs = sampler.sample(batch.target_nodes, batch.ts)
        nfs, efs = cache.fetch_feature(mfgs, batch.eids)
        state, loss, pos, negs = trainer.train_step_prefetched(
            state, mfgs, nfs, efs, cache.target_edge_features, batch)
        assert np.isfinite(float(loss))
        if i >= 2:
            break


def test_host_storage_hybrid_training():
    """'unified'-memory analogue: graph store host-resident (sampled on
    the CPU backend), features cache-fed, model on the default device."""
    train, full, g, nf, ef = _graph_and_feats()
    ghost = DynamicGraph(initial_pool_size=4096,
                         maximum_pool_size=1 << 22,
                         mem_resource_type="unified",  # -> host placement
                         minimum_block_size=8, insertion_policy="insert")
    ghost.add_edges(full.src, full.dst, full.time, full.eid,
                    add_reverse=True)
    sampler = TemporalSampler(ghost, fanouts=[5])
    num_nodes = ghost.max_vertex_id() + 1
    cache = LRUCache(edge_cache_ratio=0.3, node_cache_ratio=0.3,
                     num_nodes=num_nodes, num_edges=len(full),
                     node_feats=nf, edge_feats=ef)
    cache.init_cache()
    model = DGNN(dim_node=6, dim_edge=8, dim_time=8, dim_embed=16,
                 num_layers=1, num_snapshots=1, att_head=2, dropout=0.1,
                 att_dropout=0.1, use_memory=True, dim_memory=16)
    trainer = Trainer(model, fanouts=[5], lr=1e-3)
    state = trainer.init_state(jax.random.PRNGKey(0),
                               ghost.device_graph(), 100, None, None,
                               num_nodes=num_nodes)
    neg = DstRandEdgeSampler(train.dst, seed=1)
    for i, batch in enumerate(get_batches(train, 100, neg)):
        mfgs = sampler.sample(batch.target_nodes, batch.ts)
        nfs, efs = cache.fetch_feature(mfgs, batch.eids)
        state, loss, _, _ = trainer.train_step_prefetched(
            state, mfgs, nfs, efs, cache.target_edge_features, batch)
        assert np.isfinite(float(loss))
        if i >= 2:
            break


def test_bf16_transfer_dtype():
    """Miss rows streamed as bf16 reproduce the master rows to bf16
    precision; the HBM buffer stays f32."""
    import jax.numpy as jnp
    train, full, g, nf, ef = _graph_and_feats()
    sampler = TemporalSampler(g, fanouts=[5], sample_strategy="recent")
    num_nodes = g.max_vertex_id() + 1
    cache = LRUCache(edge_cache_ratio=0.2, node_cache_ratio=0.2,
                     num_nodes=num_nodes, num_edges=len(full),
                     node_feats=nf, edge_feats=ef,
                     transfer_dtype="bfloat16")
    cache.init_cache()
    neg = DstRandEdgeSampler(train.dst, seed=1)
    for i, batch in enumerate(get_batches(train, 100, neg)):
        if i >= 3:
            break
        mfgs = sampler.sample(batch.target_nodes, batch.ts)
        nfs, efs = cache.fetch_feature(mfgs, batch.eids)
        mfg = mfgs[0][0]
        eids2 = np.asarray(mfg.nbr_eids)
        emask = np.asarray(mfg.nbr_mask)
        got_e = np.asarray(efs[0][0])
        exp_e = np.where(emask[..., None], ef[np.clip(eids2, 0, None)],
                         0.0)
        np.testing.assert_allclose(got_e, exp_e, rtol=2e-2, atol=2e-2)
    assert cache.edge_cache.buffer.dtype == jnp.float32
