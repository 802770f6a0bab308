"""Store-order edge-feature slab gather (DeviceGraph.e_feat).

The recent sampler's picks are a contiguous slot run, so attaching the
edge-feature table in store order lets it return features as one
[fanout, D] slab per root (ops/sampling._slab_feats).  These tests pin
EXACT equality with the eid-row-gather path (train.fetch_features) across
the alignment-sensitive cases: low-degree roots (e_idx < fanout), the
vertex at pool offset 0, windowed recent sampling, multi-layer hops, and
table rebuild after further ingestion.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from gnnflow_tpu.dynamic_graph import DynamicGraph
from gnnflow_tpu.ops.sampling import sample_hops
from gnnflow_tpu.train import fetch_features


def _graph_and_feats(num_nodes=40, num_edges=600, dim_edge=12, seed=0):
    rng = np.random.RandomState(seed)
    src = rng.randint(0, num_nodes, num_edges).astype(np.int64)
    dst = rng.randint(0, num_nodes, num_edges).astype(np.int64)
    ts = np.sort(rng.rand(num_edges).astype(np.float32) * 100)
    g = DynamicGraph(initial_pool_size=256, maximum_pool_size=1 << 16,
                     mem_resource_type="hbm", minimum_block_size=4,
                     insertion_policy="insert")
    g.add_edges(src, dst, ts, add_reverse=True)
    ef = jnp.asarray(rng.randn(num_edges, dim_edge).astype(np.float32))
    return g, ef


def _efs(g, ef, roots, ts, fanouts, window=0.0):
    dg = g.device_graph()
    mfgs = sample_hops(dg, jnp.asarray(roots, jnp.int32),
                       jnp.asarray(ts, jnp.float32),
                       fanouts=fanouts, strategy="recent", window=window,
                       search_iters=dg.search_iters)
    _, efs = fetch_features(mfgs, None, ef, None, ef.shape[1])
    return mfgs, efs


@pytest.mark.parametrize("fanouts", [(5,), (4, 3)])
def test_slab_feats_match_eid_gather(fanouts):
    g, ef = _graph_and_feats()
    roots = np.arange(40) % 40          # includes offset-0 + low-degree
    ts = np.linspace(0.0, 120.0, 40)    # early ts => e_idx < fanout cases

    _, base = _efs(g, ef, roots, ts, fanouts)        # eid gather
    g.attach_edge_features(ef)
    mfgs, slab = _efs(g, ef, roots, ts, fanouts)     # slab path
    for layer_mfgs in mfgs:
        for m in layer_mfgs:
            assert m.nbr_feats is not None
    for lb, ls in zip(base, slab):
        for b, s in zip(lb, ls):
            np.testing.assert_array_equal(np.asarray(b), np.asarray(s))


def test_slab_feats_windowed_recent():
    g, ef = _graph_and_feats(seed=3)
    roots = np.arange(40)
    ts = np.full(40, 90.0)
    _, base = _efs(g, ef, roots, ts, (6,), window=20.0)
    g.attach_edge_features(ef)
    _, slab = _efs(g, ef, roots, ts, (6,), window=20.0)
    np.testing.assert_array_equal(np.asarray(base[0][0]),
                                  np.asarray(slab[0][0]))


def test_slab_feats_rebuilt_after_ingest():
    """Region growth/resort moves slots; the store-order table must be
    rebuilt on the next device_graph refresh."""
    g, ef0 = _graph_and_feats(num_edges=200, seed=1)
    rng = np.random.RandomState(7)
    extra = 300
    ef = jnp.concatenate(
        [ef0, jnp.asarray(rng.randn(extra, ef0.shape[1]), jnp.float32)])
    g.attach_edge_features(ef)
    g.device_graph()  # build once at 200 edges
    src = rng.randint(0, 40, extra).astype(np.int64)
    dst = rng.randint(0, 40, extra).astype(np.int64)
    ts = (100.0 + np.sort(rng.rand(extra).astype(np.float32) * 50))
    g.add_edges(src, dst, ts, add_reverse=True)

    roots = np.arange(40)
    rts = np.full(40, 200.0)
    mfgs, slab = _efs(g, ef, roots, rts, (8,))
    g.attach_edge_features(None)
    g.device_graph(refresh=True)
    _, base = _efs(g, ef, roots, rts, (8,))
    np.testing.assert_array_equal(np.asarray(base[0][0]),
                                  np.asarray(slab[0][0]))


def test_slab_feats_bf16_storage():
    g, ef = _graph_and_feats(seed=5)
    g.attach_edge_features(ef, dtype=jnp.bfloat16)
    mfgs, slab = _efs(g, ef, np.arange(40), np.full(40, 80.0), (5,))
    g.attach_edge_features(None)
    g.device_graph(refresh=True)
    _, base = _efs(g, ef, np.arange(40), np.full(40, 80.0), (5,))
    np.testing.assert_allclose(np.asarray(base[0][0]),
                               np.asarray(slab[0][0], np.float32),
                               rtol=1e-2, atol=1e-2)
