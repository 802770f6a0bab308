"""Partitioner tests: assignment invariants, stickiness, balance, and
quality metrics (counterpart of the reference ``tests/test_partition.py``,
plus correctness assertions it lacks)."""
import numpy as np
import pytest

from gnnflow_tpu.parallel.partition import (UNASSIGNED, get_partitioner,
                                            partition_metrics)

STRATEGIES = ["hash", "roundrobin", "edgecount", "timestampsum",
              "timestampavg", "fennel", "fennel_edge"]


def _stream(num_edges=3000, num_nodes=200, seed=0):
    rng = np.random.RandomState(seed)
    src = rng.randint(0, num_nodes, num_edges)
    dst = rng.randint(0, num_nodes, num_edges)
    ts = np.sort(rng.rand(num_edges).astype(np.float32) * 100)
    eid = np.arange(num_edges)
    return src, dst, ts, eid


@pytest.mark.parametrize("strategy", STRATEGIES)
def test_partition_invariants(strategy):
    src, dst, ts, eid = _stream()
    p = get_partitioner(strategy, num_partitions=4)
    chunk = 500
    total = 0
    for lo in range(0, len(src), chunk):
        sl = slice(lo, lo + chunk)
        parts, _ = p.partition(src[sl], dst[sl], ts[sl], eid[sl])
        # every edge lands in exactly one partition
        got = sum(len(pp) for pp in parts)
        assert got == len(src[sl])
        total += got
        # edges follow their src's partition-table entry
        pt = p.get_partition_table()
        for i, pp in enumerate(parts):
            if len(pp):
                assert (pt[pp.src_nodes] == i).all()
    assert total == len(src)
    pt = p.get_partition_table()
    touched = np.unique(src)
    assert (pt[touched] != UNASSIGNED).all()


@pytest.mark.parametrize("strategy", STRATEGIES)
def test_partition_stickiness(strategy):
    """A vertex, once assigned, never migrates (vertex partitioning)."""
    src, dst, ts, eid = _stream()
    p = get_partitioner(strategy, num_partitions=4)
    p.partition(src[:1500], dst[:1500], ts[:1500], eid[:1500])
    before = p.get_partition_table().copy()
    p.partition(src[1500:], dst[1500:], ts[1500:], eid[1500:])
    after = p.get_partition_table()
    assigned = before != UNASSIGNED
    np.testing.assert_array_equal(before[assigned],
                                  after[: len(before)][assigned])


def test_roundrobin_balanced():
    src, dst, ts, eid = _stream(num_edges=4000, num_nodes=400)
    p = get_partitioner("roundrobin", num_partitions=4)
    p.partition(src, dst, ts, eid)
    m = partition_metrics(p, src, dst)
    # round robin over vertices: vertex counts exactly balanced
    pt = p.get_partition_table()
    counts = np.bincount(pt[pt >= 0], minlength=4)
    assert counts.max() - counts.min() <= 1
    assert m["load_factor"] < 1.5


def test_edgecount_balances_edges():
    src, dst, ts, eid = _stream(num_edges=5000, num_nodes=100, seed=2)
    p = get_partitioner("edgecount", num_partitions=4)
    p.partition(src, dst, ts, eid)
    m = partition_metrics(p, src, dst)
    assert m["load_factor"] < 1.6


def test_fennel_reduces_edge_cut_vs_roundrobin():
    """Fennel should exploit community structure better than round-robin."""
    rng = np.random.RandomState(0)
    # 4 communities of 50 nodes; 90% intra-community edges
    n_comm, comm_size, E = 4, 50, 6000
    src_c = rng.randint(0, n_comm, E)
    intra = rng.rand(E) < 0.9
    dst_c = np.where(intra, src_c, rng.randint(0, n_comm, E))
    src = src_c * comm_size + rng.randint(0, comm_size, E)
    dst = dst_c * comm_size + rng.randint(0, comm_size, E)
    ts = np.sort(rng.rand(E).astype(np.float32))
    eid = np.arange(E)

    cuts = {}
    for strat in ["roundrobin", "fennel"]:
        p = get_partitioner(strat, num_partitions=4)
        for lo in range(0, E, 1000):
            sl = slice(lo, lo + 1000)
            p.partition(src[sl], dst[sl], ts[sl], eid[sl])
        cuts[strat] = partition_metrics(p, src, dst)["edge_cut"]
    assert cuts["fennel"] < cuts["roundrobin"]


def test_assign_with_dst_node():
    p = get_partitioner("roundrobin", num_partitions=2,
                        assign_with_dst_node=True)
    # first chunk: establish node 10 in some partition
    p.partition(np.array([10]), np.array([11]),
                np.array([0.0], np.float32), np.array([0]))
    pid10 = p.get_partition_table()[10]
    # new src 20 whose dsts are all node 10 -> same partition as 10
    p.partition(np.array([20, 20]), np.array([10, 10]),
                np.array([1.0, 2.0], np.float32), np.array([1, 2]))
    assert p.get_partition_table()[20] == pid10


def test_static_preloaded_table():
    table = np.array([0, 1, 0, 1, 0], dtype=np.int8)
    p = get_partitioner("metis", num_partitions=2, partition_table=table)
    parts, _ = p.partition(np.array([0, 1, 2, 3]), np.array([1, 2, 3, 4]),
                           np.zeros(4, np.float32), np.arange(4))
    assert sorted(parts[0].src_nodes.tolist()) == [0, 2]
    assert sorted(parts[1].src_nodes.tolist()) == [1, 3]


def test_evenly_partitioned_dataset():
    src, dst, ts, eid = _stream(num_edges=4000, num_nodes=50, seed=3)
    p = get_partitioner("hash", num_partitions=3, local_world_size=2)
    parts, evenly = p.partition(src, dst, ts, eid,
                                return_evenly_dataset=True)
    assert len(evenly) == 3
    sizes = [len(w) for part in evenly for w in part]
    assert len(set(sizes)) == 1  # all workers get the same count
