"""Golden-value tests for the temporal sampler.

Ports the behavioral contract of the reference
``tests/test_temporal_sampler.py`` (exact neighbor/ts/dt/eid contents for
recent 1-hop, uniform shape/validity, multi-layer, multi-snapshot windows,
duplicate roots, empty batches, static mode) onto padded MFGs.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gnnflow_tpu.common import INVALID_NID, STATIC_TS
from gnnflow_tpu.dynamic_graph import DynamicGraph
from gnnflow_tpu.temporal_sampler import TemporalSampler


def build_graph():
    """The reference tests' canonical tiny graph: vertices 0,1,2 each with
    edges to 1,2,3 at ts 0,1,2 (test_temporal_sampler.py:27-45)."""
    g = DynamicGraph(initial_pool_size=1024, maximum_pool_size=1 << 20,
                     mem_resource_type="hbm", minimum_block_size=4,
                     insertion_policy="insert")
    src = np.array([0, 0, 0, 1, 1, 1, 2, 2, 2])
    dst = np.array([1, 2, 3, 1, 2, 3, 1, 2, 3])
    ts = np.array([0, 1, 2, 0, 1, 2, 0, 1, 2], dtype=np.float32)
    g.add_edges(src, dst, ts)
    return g


def test_sample_layer_recent():
    g = build_graph()
    sampler = TemporalSampler(g, fanouts=[2], sample_strategy="recent")
    mfgs = sampler.sample(np.array([0, 1, 2]),
                          np.array([1.5, 1.5, 1.5], dtype=np.float32))
    assert len(mfgs) == 1 and len(mfgs[0]) == 1
    b = mfgs[0][0]
    # most recent edges strictly before ts=1.5 are (dst=2, ts=1), (dst=1, ts=0)
    np.testing.assert_array_equal(np.asarray(b.root_nids), [0, 1, 2])
    np.testing.assert_array_equal(np.asarray(b.nbr_nids),
                                  [[2, 1], [2, 1], [2, 1]])
    np.testing.assert_allclose(np.asarray(b.nbr_ts),
                               [[1, 0], [1, 0], [1, 0]])
    np.testing.assert_allclose(np.asarray(b.nbr_dts),
                               [[0.5, 1.5]] * 3)
    np.testing.assert_array_equal(np.asarray(b.nbr_eids),
                                  [[1, 0], [4, 3], [7, 6]])
    assert bool(np.asarray(b.nbr_mask).all())


def test_sample_layer_recent_excludes_root_timestamp():
    """LowerBound semantics: edges at exactly root_ts are excluded."""
    g = build_graph()
    sampler = TemporalSampler(g, fanouts=[3], sample_strategy="recent")
    b = sampler.sample(np.array([0]), np.array([2.0], dtype=np.float32))[0][0]
    np.testing.assert_array_equal(np.asarray(b.nbr_nids), [[2, 1, -1]])
    np.testing.assert_array_equal(np.asarray(b.nbr_mask), [[True, True,
                                                            False]])


def test_sample_layer_fanout_exceeds_neighbors():
    g = build_graph()
    sampler = TemporalSampler(g, fanouts=[5], sample_strategy="recent")
    b = sampler.sample(np.array([0]), np.array([10.0], dtype=np.float32)
                       )[0][0]
    np.testing.assert_array_equal(np.asarray(b.nbr_nids),
                                  [[3, 2, 1, -1, -1]])
    np.testing.assert_array_equal(np.asarray(b.nbr_eids)[0, :3], [2, 1, 0])


def test_sample_layer_uniform():
    g = build_graph()
    sampler = TemporalSampler(g, fanouts=[2], sample_strategy="uniform",
                              seed=7)
    b = sampler.sample(np.array([0, 1, 2]),
                       np.array([1.5, 1.5, 1.5], dtype=np.float32))[0][0]
    nbrs = np.asarray(b.nbr_nids)
    mask = np.asarray(b.nbr_mask)
    assert mask.all()
    # candidates are dsts {1, 2} (ts 0 and 1)
    assert set(nbrs.ravel().tolist()) <= {1, 2}
    ts = np.asarray(b.nbr_ts)
    # ts must correspond to the picked edge: dst==2 <-> ts==1
    np.testing.assert_allclose(ts, np.where(nbrs == 2, 1.0, 0.0))


def test_sample_uniform_no_candidates():
    g = build_graph()
    sampler = TemporalSampler(g, fanouts=[2], sample_strategy="uniform")
    b = sampler.sample(np.array([0]), np.array([0.0], dtype=np.float32)
                       )[0][0]
    assert not np.asarray(b.nbr_mask).any()
    np.testing.assert_array_equal(np.asarray(b.nbr_nids), [[-1, -1]])


def test_sample_invalid_and_unknown_roots():
    g = build_graph()
    sampler = TemporalSampler(g, fanouts=[2])
    b = sampler.sample(np.array([-1, 900]),
                       np.array([5.0, 5.0], dtype=np.float32))[0][0]
    assert not np.asarray(b.nbr_mask).any()


def test_sample_duplicate_roots():
    g = build_graph()
    sampler = TemporalSampler(g, fanouts=[2])
    b = sampler.sample(np.array([0, 0]),
                       np.array([1.5, 3.0], dtype=np.float32))[0][0]
    np.testing.assert_array_equal(np.asarray(b.nbr_nids),
                                  [[2, 1], [3, 2]])


def test_sample_multi_layer():
    g = build_graph()
    sampler = TemporalSampler(g, fanouts=[2, 2], sample_strategy="recent")
    mfgs = sampler.sample(np.array([0]), np.array([3.0], dtype=np.float32))
    assert len(mfgs) == 2
    # mfgs[1] is the outermost layer (roots = the targets)
    outer = mfgs[1][0]
    np.testing.assert_array_equal(np.asarray(outer.root_nids), [0])
    np.testing.assert_array_equal(np.asarray(outer.nbr_nids), [[3, 2]])
    # mfgs[0] (innermost) roots = outer's all_nodes = [0, 3, 2]
    inner = mfgs[0][0]
    np.testing.assert_array_equal(np.asarray(inner.root_nids), [0, 3, 2])
    # vertex 3 has no out-edges; vertex 2's neighbors before its edge ts
    np.testing.assert_array_equal(np.asarray(inner.nbr_nids)[1], [-1, -1])
    # vertex 2 sampled at the ts of the edge (0->2 at ts=1): strictly before
    np.testing.assert_array_equal(np.asarray(inner.nbr_nids)[2], [1, -1])


def test_sample_multi_snapshot_windows():
    """Snapshot i covers [root_ts-(S-i)*W, root_ts-(S-i-1)*W)
    (sampling_kernels.cu:29-40)."""
    g = DynamicGraph(initial_pool_size=1024, maximum_pool_size=1 << 20,
                     mem_resource_type="hbm", minimum_block_size=4,
                     insertion_policy="insert")
    # vertex 0: neighbors k at ts k for k=1..9
    n = 9
    g.add_edges(np.zeros(n, dtype=np.int64),
                np.arange(1, n + 1, dtype=np.int64),
                np.arange(1, n + 1, dtype=np.float32))
    sampler = TemporalSampler(g, fanouts=[10], sample_strategy="recent",
                              num_snapshots=3, snapshot_time_window=3.0)
    mfgs = sampler.sample(np.array([0]), np.array([10.0], dtype=np.float32))
    assert len(mfgs[0]) == 3
    windows = []
    for s in range(3):
        b = mfgs[0][s]
        got = sorted(np.asarray(b.nbr_nids)[0][np.asarray(b.nbr_mask)[0]]
                     .tolist())
        windows.append(got)
    # snapshot 0: [1,4) -> {1,2,3}; snapshot 1: [4,7) -> {4,5,6};
    # snapshot 2: [7,10) -> {7,8,9}
    assert windows == [[1, 2, 3], [4, 5, 6], [7, 8, 9]]


def test_single_snapshot_time_window():
    g = build_graph()
    sampler = TemporalSampler(g, fanouts=[5], snapshot_time_window=1.0)
    b = sampler.sample(np.array([0]), np.array([2.0], dtype=np.float32)
                       )[0][0]
    # window [1.0, 2.0): only edge (2, ts=1)
    got = np.asarray(b.nbr_nids)[0][np.asarray(b.nbr_mask)[0]]
    np.testing.assert_array_equal(got, [2])


def test_prop_time():
    g = build_graph()
    sampler = TemporalSampler(g, fanouts=[2], prop_time=True)
    b = sampler.sample(np.array([0]), np.array([1.5], dtype=np.float32)
                       )[0][0]
    # nbr_ts propagated = root ts; dt still real delta
    np.testing.assert_allclose(np.asarray(b.nbr_ts), [[1.5, 1.5]])
    np.testing.assert_allclose(np.asarray(b.nbr_dts), [[0.5, 1.5]])


def test_static_mode():
    g = build_graph()
    sampler = TemporalSampler(g, fanouts=[3], sample_strategy="recent",
                              is_static=True)
    b = sampler.sample(np.array([0]), np.array([0.0], dtype=np.float32)
                       )[0][0]
    np.testing.assert_array_equal(np.asarray(b.nbr_nids), [[3, 2, 1]])
    assert np.asarray(b.root_ts)[0] == STATIC_TS


def test_sample_after_offload():
    g = build_graph()
    g.offload_old_blocks(1.0)  # drop ts<1 edges
    sampler = TemporalSampler(g, fanouts=[3])
    b = sampler.sample(np.array([0]), np.array([3.0], dtype=np.float32)
                       )[0][0]
    got = np.asarray(b.nbr_nids)[0][np.asarray(b.nbr_mask)[0]].tolist()
    assert got == [3, 2]


def test_empty_batch():
    g = build_graph()
    sampler = TemporalSampler(g, fanouts=[2])
    b = sampler.sample(np.zeros(0, dtype=np.int64),
                       np.zeros(0, dtype=np.float32))[0][0]
    assert b.num_dst == 0


def test_sampling_inside_jit():
    """The sampler must compose with jit (it runs inside the train step)."""
    from gnnflow_tpu.ops.sampling import sample_hops
    g = build_graph()
    dg = g.device_graph()

    @jax.jit
    def run(dg, roots, ts):
        mfgs = sample_hops(dg, roots, ts, fanouts=(2, 2),
                           strategy="recent")
        return mfgs[0][0].nbr_nids

    out = run(dg, jnp.array([0], dtype=jnp.int32),
              jnp.array([3.0], dtype=jnp.float32))
    assert out.shape == (3, 2)


def test_against_numpy_bruteforce():
    """Cross-check recent sampling against a brute-force numpy oracle on a
    random graph (the analogue of the reference's pandas cross-check,
    test_temporal_sampler.py:684-723)."""
    rng = np.random.RandomState(0)
    g = DynamicGraph(initial_pool_size=4096, maximum_pool_size=1 << 22,
                     mem_resource_type="hbm", minimum_block_size=8,
                     insertion_policy="insert")
    E = 2000
    src = rng.randint(0, 50, E)
    dst = rng.randint(0, 50, E)
    ts = np.sort(rng.rand(E).astype(np.float32) * 100)
    g.add_edges(src, dst, ts)
    fanout = 5
    sampler = TemporalSampler(g, fanouts=[fanout], sample_strategy="recent")
    roots = rng.randint(0, 50, 64)
    root_ts = (rng.rand(64) * 100).astype(np.float32)
    b = sampler.sample(roots, root_ts)[0][0]
    nbr = np.asarray(b.nbr_nids)
    eid = np.asarray(b.nbr_eids)
    mask = np.asarray(b.nbr_mask)
    for i, (r, t) in enumerate(zip(roots, root_ts)):
        sel = (src == r) & (ts < t)
        order = np.argsort(ts[sel], kind="stable")[::-1]
        exp_dst = dst[sel][order][:fanout]
        exp_eid = np.flatnonzero(sel)[order][:fanout]
        k = len(exp_dst)
        np.testing.assert_array_equal(nbr[i, :k], exp_dst)
        np.testing.assert_array_equal(eid[i, :k], exp_eid)
        assert mask[i, :k].all() and not mask[i, k:].any()
