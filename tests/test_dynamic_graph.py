"""Golden-value tests for the dynamic graph store.

Ports the behavioral checks of the reference
``tests/test_dynamic_graph.py`` (add sorted/unsorted edges, reverse edges,
repeated adds, explicit/non-contiguous eids, out_degree,
get_temporal_neighbors exact order, offload) onto the TPU store.
Parameterized over both storage placements (the analogue of the reference's
4 memory resource types).
"""
import numpy as np
import pytest

from gnnflow_tpu.dynamic_graph import DynamicGraph

PLACEMENTS = ["hbm", "host"]


def make_graph(**kw):
    defaults = dict(initial_pool_size=1024, maximum_pool_size=1 << 20,
                    mem_resource_type="hbm", minimum_block_size=4,
                    insertion_policy="insert")
    defaults.update(kw)
    return DynamicGraph(**defaults)


@pytest.mark.parametrize("placement", PLACEMENTS)
def test_add_edges_sorted_by_timestamps(placement):
    g = make_graph(mem_resource_type=placement)
    src = np.array([0, 0, 0, 1, 1, 1, 2, 2, 2])
    dst = np.array([1, 2, 3, 1, 2, 3, 1, 2, 3])
    ts = np.array([0, 1, 2, 0, 1, 2, 0, 1, 2], dtype=np.float32)
    g.add_edges(src, dst, ts)
    assert g.num_vertices() == 4
    assert g.num_edges() == 9
    assert g.out_degree(np.array([0, 1, 2, 3])).tolist() == [3, 3, 3, 0]
    for v in range(3):
        nbrs, tss, eids = g.get_temporal_neighbors(v)
        assert nbrs.tolist() == [3, 2, 1]
        assert tss.tolist() == [2, 1, 0]
        assert eids.tolist() == [3 * v + 2, 3 * v + 1, 3 * v]


@pytest.mark.parametrize("placement", PLACEMENTS)
def test_add_edges_unsorted(placement):
    g = make_graph(mem_resource_type=placement)
    src = np.array([0, 0, 0])
    dst = np.array([1, 2, 3])
    ts = np.array([2, 0, 1], dtype=np.float32)
    g.add_edges(src, dst, ts)
    nbrs, tss, eids = g.get_temporal_neighbors(0)
    assert nbrs.tolist() == [1, 3, 2]
    assert tss.tolist() == [2, 1, 0]
    assert eids.tolist() == [0, 2, 1]


@pytest.mark.parametrize("placement", PLACEMENTS)
def test_add_edges_multiple_times(placement):
    """Incremental adds with later (and some earlier) timestamps."""
    g = make_graph(mem_resource_type=placement, minimum_block_size=2)
    for i in range(10):
        src = np.array([0, 1])
        dst = np.array([i + 1, i + 2])
        ts = np.array([i, i], dtype=np.float32)
        g.add_edges(src, dst, ts)
    nbrs, tss, eids = g.get_temporal_neighbors(0)
    assert nbrs.tolist() == [10, 9, 8, 7, 6, 5, 4, 3, 2, 1]
    assert tss.tolist() == [9, 8, 7, 6, 5, 4, 3, 2, 1, 0]
    assert eids.tolist() == [18, 16, 14, 12, 10, 8, 6, 4, 2, 0]
    assert g.num_edges() == 20


def test_add_out_of_order_batches():
    """A later batch may carry older timestamps; per-vertex order must be
    restored (stable for ties)."""
    g = make_graph()
    g.add_edges(np.array([5, 5]), np.array([1, 2]),
                np.array([10.0, 20.0], dtype=np.float32))
    g.add_edges(np.array([5, 5]), np.array([3, 4]),
                np.array([5.0, 15.0], dtype=np.float32))
    nbrs, tss, eids = g.get_temporal_neighbors(5)
    assert tss.tolist() == [20, 15, 10, 5]
    assert nbrs.tolist() == [2, 4, 1, 3]
    assert eids.tolist() == [1, 3, 0, 2]


def test_add_reverse_edges():
    g = make_graph()
    src = np.array([0, 1, 2])
    dst = np.array([1, 2, 0])
    ts = np.array([0, 1, 2], dtype=np.float32)
    g.add_edges(src, dst, ts, add_reverse=True)
    # reverse edges share eids; num_edges counts unique eids
    assert g.num_edges() == 3
    nbrs, tss, eids = g.get_temporal_neighbors(0)
    assert nbrs.tolist() == [2, 1]
    assert tss.tolist() == [2, 0]
    assert eids.tolist() == [2, 0]
    assert g.num_source_vertices() == 3


def test_explicit_noncontiguous_eids():
    g = make_graph()
    g.add_edges(np.array([0, 0]), np.array([1, 2]),
                np.array([0.0, 1.0], dtype=np.float32),
                eids=np.array([100, 7]))
    assert g.num_edges() == 2
    assert sorted(g.edges().tolist()) == [7, 100]
    _, _, eids = g.get_temporal_neighbors(0)
    assert eids.tolist() == [7, 100]
    # auto eids continue from num_edges()
    g.add_edges(np.array([0]), np.array([3]),
                np.array([2.0], dtype=np.float32))
    _, _, eids = g.get_temporal_neighbors(0)
    assert eids.tolist() == [2, 7, 100]


def test_tie_timestamps_keep_insertion_order():
    g = make_graph()
    g.add_edges(np.array([0, 0, 0]), np.array([1, 2, 3]),
                np.array([1.0, 1.0, 1.0], dtype=np.float32))
    nbrs, tss, _ = g.get_temporal_neighbors(0)
    # descending ts; ties reversed from insertion order (newest-first view)
    assert nbrs.tolist() == [3, 2, 1]


def test_many_vertices_region_growth():
    rng = np.random.RandomState(0)
    g = make_graph(minimum_block_size=2, initial_pool_size=64)
    all_edges = {}
    t = 0.0
    for batch in range(20):
        n = 50
        src = rng.randint(0, 20, n)
        dst = rng.randint(0, 100, n)
        ts = np.sort(t + rng.rand(n).astype(np.float32) * 0.5)
        t += 1.0
        g.add_edges(src, dst, ts)
        for s, d, tt in zip(src, dst, ts):
            all_edges.setdefault(s, []).append((tt, d))
    for v in range(20):
        expect = sorted(all_edges.get(v, []), key=lambda x: x[0])
        nbrs, tss, _ = g.get_temporal_neighbors(v)
        assert len(nbrs) == len(expect)
        np.testing.assert_allclose(tss, [e[0] for e in expect][::-1],
                                   rtol=1e-6)


def test_offload_old_edges(tmp_path):
    g = make_graph(spill_dir=str(tmp_path))
    g.add_edges(np.array([0, 0, 0, 0]), np.array([1, 2, 3, 4]),
                np.array([0.0, 1.0, 2.0, 3.0], dtype=np.float32))
    n = g.offload_old_blocks(2.0, to_file=True)
    assert n == 2
    nbrs, tss, _ = g.get_temporal_neighbors(0)
    assert nbrs.tolist() == [4, 3]
    assert tss.tolist() == [3, 2]
    # spilled file holds the evicted edges
    import glob
    files = glob.glob(str(tmp_path / "offload_*.npz"))
    assert len(files) == 1
    data = np.load(files[0])
    assert data["dst"].tolist() == [1, 2]
    # idempotent for the same threshold
    assert g.offload_old_blocks(2.0) == 0
    # spilled edges can be restored (ReadFromFile analogue)
    assert g.restore_from_file(files[0]) == 2
    nbrs, tss, eids = g.get_temporal_neighbors(0)
    assert nbrs.tolist() == [4, 3, 2, 1]
    assert eids.tolist() == [3, 2, 1, 0]


def test_pool_growth_and_max_size():
    g = make_graph(initial_pool_size=1024, maximum_pool_size=2048)
    g.add_edges(np.zeros(1000, dtype=np.int64),
                np.arange(1000, dtype=np.int64),
                np.arange(1000, dtype=np.float32))
    with pytest.raises(MemoryError):
        g.add_edges(np.ones(5000, dtype=np.int64),
                    np.arange(5000, dtype=np.int64),
                    np.arange(5000, dtype=np.float32))


def test_compact_preserves_contents():
    rng = np.random.RandomState(1)
    g = make_graph(minimum_block_size=2, initial_pool_size=64)
    for _ in range(10):
        g.add_edges(rng.randint(0, 10, 30), rng.randint(0, 30, 30),
                    np.sort(rng.rand(30).astype(np.float32)
                            + g._num_insertions))
    before = {v: g.get_temporal_neighbors(v) for v in range(10)}
    used_before = g._pool_used
    g.offload_old_blocks(3.0)
    g.compact()
    assert g._pool_used <= used_before
    after3 = {v: g.get_temporal_neighbors(v) for v in range(10)}
    for v in range(10):
        nb, tb, eb = before[v]
        keep = tb >= 3.0
        na, ta, ea = after3[v]
        assert na.tolist() == nb[keep].tolist()
        assert ea.tolist() == eb[keep].tolist()


def test_device_graph_roundtrip():
    g = make_graph()
    g.add_edges(np.array([0, 1]), np.array([1, 0]),
                np.array([1.0, 2.0], dtype=np.float32))
    dg = g.device_graph()
    assert dg.row_len.shape[0] == g._node_cap
    assert int(dg.row_len[0]) == 1
    # cached until dirty
    assert g.device_graph() is dg
    g.add_edges(np.array([0]), np.array([2]),
                np.array([3.0], dtype=np.float32))
    dg2 = g.device_graph()
    assert dg2 is not dg
    assert int(dg2.row_len[0]) == 2


def test_metrics_and_metadata():
    g = make_graph()
    g.add_edges(np.array([0, 1]), np.array([1, 2]),
                np.array([0.0, 1.0], dtype=np.float32))
    assert g.max_vertex_id() == 2
    assert g.num_vertices() == 3
    assert g.num_source_vertices() == 2
    assert g.avg_linked_list_length() == 1.0
    assert g.get_graph_memory_usage() > 0
    assert g.get_metadata_memory_usage() > 0
    assert g.nodes().tolist() == [0, 1, 2]
    assert g.src_nodes().tolist() == [0, 1]
