"""Round-2 behavior fixes: REPLACE insertion policy, neg_sample_ratio,
index-interleaved distributed batching, deterministic hash partitioning,
multi-axis meshes, per-epoch cache counter reset."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnnflow_tpu.data import (DstRandEdgeSampler, get_batches,
                              make_synthetic_dataset)
from gnnflow_tpu.dynamic_graph import DynamicGraph
from gnnflow_tpu.models import build_model
from gnnflow_tpu.parallel.mesh import make_mesh
from gnnflow_tpu.parallel.partition import (HashPartitioner,
                                            _hash_vertices)
from gnnflow_tpu.train import Trainer


def _graph(policy):
    return DynamicGraph(initial_pool_size=2048,
                        maximum_pool_size=1 << 20,
                        mem_resource_type="hbm", minimum_block_size=4,
                        insertion_policy=policy)


def test_replace_policy_keeps_all_edges_exact_fit():
    """REPLACE reallocates regions exact-fit in place
    (dynamic_graph.cu:262-267 -> Reallocate -> AlignUp): same edges as
    INSERT, tighter capacity."""
    src = np.zeros(50, np.int64)
    dst = np.arange(50, dtype=np.int64) + 1
    ts = np.arange(50, dtype=np.float32)
    g_ins = _graph("insert")
    g_rep = _graph("replace")
    for g in (g_ins, g_rep):
        for lo in range(0, 50, 7):   # many incremental inserts
            sl = slice(lo, min(lo + 7, 50))
            g.add_edges(src[sl], dst[sl], ts[sl],
                        np.arange(sl.start, sl.stop, dtype=np.int64))
    # identical temporal neighborhoods
    for g in (g_ins, g_rep):
        n, t, e = g.get_temporal_neighbors(0)
        np.testing.assert_array_equal(n, dst[::-1])
        np.testing.assert_array_equal(t, ts[::-1])
    # REPLACE capacity is exact-fit (aligned to minimum_block_size=4),
    # INSERT rounds up to the next power of two
    assert g_rep._row_cap[0] == 50
    assert g_ins._row_cap[0] == 64


def test_replace_policy_out_of_order_resort():
    g = _graph("replace")
    g.add_edges([0, 0], [1, 2], [5.0, 6.0], [0, 1])
    g.add_edges([0, 0, 0], [3, 4, 5], [1.0, 2.0, 9.0], [2, 3, 4])
    n, t, e = g.get_temporal_neighbors(0)
    np.testing.assert_array_equal(t, [9.0, 6.0, 5.0, 2.0, 1.0])
    np.testing.assert_array_equal(n, [5, 2, 1, 4, 3])


def test_hash_partitioner_deterministic_and_vectorized():
    v = np.array([0, 1, 2, 12345, 2**40, 7], np.int64)
    a = _hash_vertices(v, 4)
    b = _hash_vertices(v, 4)
    np.testing.assert_array_equal(a, b)
    assert a.dtype == np.int8
    assert ((a >= 0) & (a < 4)).all()
    # spread: large id ranges shouldn't collapse to one partition
    big = _hash_vertices(np.arange(10000), 4)
    counts = np.bincount(big, minlength=4)
    assert counts.min() > 1500

    p = HashPartitioner(4)
    src = np.arange(100, dtype=np.int64)
    parts, _ = p.partition(src, src + 1,
                           np.arange(100, dtype=np.float32),
                           np.arange(100, dtype=np.int64))
    table = p.get_partition_table()
    assigned = np.flatnonzero(table[:100] >= 0)
    np.testing.assert_array_equal(table[:100][assigned],
                                  _hash_vertices(assigned, 4))
    assert sum(len(pt.src_nodes) for pt in parts) == 100


def test_interleaved_distributed_batches_match_reference_semantics():
    _, _, _, full, _, _ = make_synthetic_dataset(
        num_src=50, num_dst=10, num_edges=200, dim_edge=0, seed=3)
    W, B = 4, 8
    seen = []
    for r in range(W):
        for b in get_batches(full, B, None, rank=r, world_size=W,
                             interleave_indices=True):
            eids = b.eids[: b.num_valid]
            # reference: rank r holds exactly indices idx % W == r
            assert (np.asarray(eids) % W == r).all()
            seen.append(eids)
    got = np.sort(np.concatenate(seen))
    np.testing.assert_array_equal(got, np.arange(200))


def test_batch_roundrobin_partition_covers_all():
    _, _, _, full, _, _ = make_synthetic_dataset(
        num_src=50, num_dst=10, num_edges=100, dim_edge=0, seed=3)
    seen = []
    for r in range(2):
        for b in get_batches(full, 16, None, rank=r, world_size=2):
            seen.append(b.eids[: b.num_valid])
    np.testing.assert_array_equal(np.sort(np.concatenate(seen)),
                                  np.arange(100))


def test_make_mesh_two_axes():
    mesh = make_mesh(8, axis_names=("host", "data"))
    assert mesh.devices.shape in ((1, 8), (8 // max(
        jax.process_count(), 1), jax.process_count())) or \
        mesh.devices.size == 8
    assert mesh.axis_names == ("host", "data")
    mesh2 = make_mesh(8, axis_names=("host", "data"), shape=(2, 4))
    assert mesh2.devices.shape == (2, 4)
    with pytest.raises(ValueError):
        make_mesh(8, axis_names=("a", "b"), shape=(3, 2))


@pytest.mark.parametrize("ratio", [1, 3])
def test_neg_sample_ratio_training(ratio):
    train, _, _, full, _, ef = make_synthetic_dataset(
        num_src=60, num_dst=20, num_edges=2000, dim_edge=8, seed=5)
    g = _graph("insert")
    g.add_edges(full.src, full.dst, full.time, full.eid, add_reverse=True)
    cfg = {"dim_time": 8, "dim_embed": 16, "num_layers": 1,
           "num_snapshots": 1, "att_head": 2, "dropout": 0.0,
           "att_dropout": 0.0, "use_memory": True, "dim_memory": 16,
           "fanouts": [5], "sample_strategy": "recent", "batch_size": 32,
           "neg_sample_ratio": ratio}
    model, sk = build_model("TGN", cfg, 0, 8)
    trainer = Trainer(model, lr=1e-3, **sk)
    dg = g.device_graph()
    efj = jnp.asarray(ef)
    state = trainer.init_state(jax.random.PRNGKey(0), dg, 32, None, efj,
                               num_nodes=g.max_vertex_id() + 1)
    neg = DstRandEdgeSampler(train.dst, seed=0)
    losses = []
    for i, batch in enumerate(get_batches(train, 32, neg,
                                          neg_sample_ratio=ratio)):
        assert len(batch.target_nodes) == (2 + ratio) * 32
        state, loss, pos, negs = trainer.train_step(
            state, dg, None, efj, batch)
        losses.append(float(loss))
        if i == 0:
            assert pos.shape[0] == 32
            assert negs.shape[0] == ratio * 32
        if i >= 20:
            break
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_neg_ratio_mismatch_raises():
    cfg = {"dim_time": 8, "dim_embed": 16, "num_layers": 1,
           "num_snapshots": 1, "att_head": 2, "dropout": 0.0,
           "att_dropout": 0.0, "use_memory": False,
           "fanouts": [5], "batch_size": 32, "neg_sample_ratio": 2}
    model, sk = build_model("TGAT", cfg, 0, 8)
    sk["neg_sample_ratio"] = 1
    with pytest.raises(ValueError):
        Trainer(model, **sk)


def test_cache_reset_counters():
    from gnnflow_tpu.cache import CACHES
    ef = np.random.RandomState(0).randn(100, 4).astype(np.float32)
    c = CACHES["LRUCache"](0.5, 0, 10, 100, None, ef)
    c.init_cache()
    from gnnflow_tpu.common import MFG
    # minimal fetch via the kind API
    ids = np.arange(20)
    inv = np.arange(20)
    c.edge_cache.fetch(ids, inv, np.ones(20, bool))
    assert c.edge_cache.total == 20
    c.reset()
    assert c.edge_cache.total == 0 and c.edge_cache.hits == 0
