"""Owner-routed distributed sampling (all-to-all root exchange).

Counterpart of the reference's routed RPC sampler
(``/root/reference/gnnflow/distributed/dist_sampler.py:159-242``): roots
go only to their owner, each owner samples ~B/P roots, results return in
dst order.  Validated bit-identical against the single store at several
mesh sizes, plus overflow semantics and the trainer integration."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gnnflow_tpu.data import make_synthetic_dataset
from gnnflow_tpu.dynamic_graph import DynamicGraph
from gnnflow_tpu.parallel import (DistributedTemporalSampler,
                                  PartitionedDynamicGraph,
                                  get_partitioner, make_mesh,
                                  routed_overflow_check,
                                  sample_hops_routed)
from gnnflow_tpu.temporal_sampler import TemporalSampler

GRAPH_KW = dict(initial_pool_size=4096, maximum_pool_size=1 << 22,
                mem_resource_type="hbm", minimum_block_size=8,
                insertion_policy="insert")


def _dataset(num_edges=3000, seed=0):
    _, _, _, full, nf, ef = make_synthetic_dataset(
        num_src=120, num_dst=40, num_edges=num_edges, dim_edge=8,
        dim_node=4, seed=seed)
    return full


def _build_both(full, mesh, strategy="hash"):
    g = DynamicGraph(**GRAPH_KW)
    g.add_edges(full.src, full.dst, full.time, full.eid)
    n = mesh.shape["data"]
    part = get_partitioner(strategy, n)
    pg = PartitionedDynamicGraph(n, mesh=mesh, **GRAPH_KW)
    parts, _ = part.partition(full.src, full.dst, full.time, full.eid)
    pg.add_partitioned_edges(parts)
    pg.set_partition_table(part.get_partition_table())
    return g, pg


def _assert_mfgs_equal(m1, m2):
    for l in range(len(m1)):
        for s in range(len(m1[l])):
            a, b = m1[l][s], m2[l][s]
            np.testing.assert_array_equal(np.asarray(a.nbr_nids),
                                          np.asarray(b.nbr_nids))
            np.testing.assert_array_equal(np.asarray(a.nbr_eids),
                                          np.asarray(b.nbr_eids))
            np.testing.assert_allclose(np.asarray(a.nbr_ts),
                                       np.asarray(b.nbr_ts), rtol=1e-6)
            np.testing.assert_array_equal(np.asarray(a.nbr_mask),
                                          np.asarray(b.nbr_mask))


@pytest.mark.parametrize("ndev", [2, 4, 8])
def test_routed_matches_single_store(ndev):
    """Routed 2-hop recent sampling is bit-identical to the single store
    at P = 2 / 4 / 8."""
    full = _dataset()
    mesh = make_mesh(ndev)
    g, pg = _build_both(full, mesh)
    single = TemporalSampler(g, fanouts=[4, 3], sample_strategy="recent")
    dist = DistributedTemporalSampler(pg, mesh, fanouts=[4, 3],
                                      sample_strategy="recent",
                                      mode="routed")
    rng = np.random.RandomState(0)
    roots = rng.randint(0, 120, 64)
    ts = (rng.rand(64) * full.time.max()).astype(np.float32)
    _assert_mfgs_equal(single.sample(roots, ts), dist.sample(roots, ts))


def test_routed_matches_replicated_snapshots():
    """Routed == psum-replicated for the multi-snapshot (DySAT) window
    path."""
    full = _dataset()
    mesh = make_mesh(4)
    _, pg = _build_both(full, mesh, strategy="roundrobin")
    kw = dict(fanouts=[3, 3], sample_strategy="recent", num_snapshots=2,
              snapshot_time_window=200.0)
    routed = DistributedTemporalSampler(pg, mesh, mode="routed", **kw)
    repl = DistributedTemporalSampler(pg, mesh, mode="replicated", **kw)
    roots = np.arange(64) % 120
    ts = np.full(64, float(full.time.max()), np.float32)
    _assert_mfgs_equal(repl.sample(roots, ts), routed.sample(roots, ts))


def test_routed_duplicate_and_invalid_roots():
    """Duplicate roots each get their own (identical) rows; invalid /
    unpartitioned roots yield masked rows (dist_sampler.py:222-236)."""
    full = _dataset()
    mesh = make_mesh(4)
    g, pg = _build_both(full, mesh)
    single = TemporalSampler(g, fanouts=[4])
    dist = DistributedTemporalSampler(pg, mesh, fanouts=[4],
                                      mode="routed")
    t = float(full.time.max())
    roots = np.array([7, 7, 7, 7, -1, 5000, 7, 3] * 2)
    ts = np.full(16, t, np.float32)
    m = dist.sample(roots, ts)[0][0]
    ms = single.sample(roots, ts)[0][0]
    mask = np.asarray(m.nbr_mask)
    assert not mask[4].any() and not mask[5].any()
    np.testing.assert_array_equal(np.asarray(m.nbr_nids),
                                  np.asarray(ms.nbr_nids))


def test_routed_overflow_drops_gracefully():
    """With ``overflow_fallback=False`` and a pathologically small
    capacity factor, overflowed roots lose their rows (masked) but every
    in-capacity root is still exact."""
    full = _dataset()
    mesh = make_mesh(4)
    g, pg = _build_both(full, mesh)
    single = TemporalSampler(g, fanouts=[4])
    t = float(full.time.max())
    # all 64 roots the same node -> every shard routes 16 copies to one
    # owner; capacity factor 1 gives cap = 8 -> 8 survive per shard
    roots = np.full(64, 7, np.int64)
    ts = np.full(64, t, np.float32)
    pgv = pg.device_graph()
    mfgs = sample_hops_routed(pgv, mesh, jnp.asarray(roots, jnp.int32),
                              jnp.asarray(ts), fanouts=[4],
                              search_iters=16, capacity_factor=1.0,
                              overflow_fallback=False)
    m = mfgs[0][0]
    ms = single.sample(roots, ts)[0][0]
    mask = np.asarray(m.nbr_mask)
    per_shard = mask.reshape(4, 16, 4)
    for s in range(4):
        rows_ok = per_shard[s].any(axis=1)
        assert rows_ok[:8].all() and not rows_ok[8:].any()
    # surviving rows match the single store exactly
    nids = np.asarray(m.nbr_nids)
    ref = np.asarray(ms.nbr_nids)
    np.testing.assert_array_equal(nids[mask.any(1)], ref[mask.any(1)])
    # the host-side audit predicts the overflow
    ov = routed_overflow_check(
        np.asarray(pgv.partition_table), roots, 4, capacity_factor=1.0)
    assert ov == 4 * 8


def test_routed_uniform_neighbors_valid():
    full = _dataset()
    mesh = make_mesh(8)
    _, pg = _build_both(full, mesh)
    dist = DistributedTemporalSampler(pg, mesh, fanouts=[5],
                                      sample_strategy="uniform",
                                      mode="routed")
    roots = np.arange(48)
    ts = np.full(48, float(full.time.max()), np.float32)
    mfg = dist.sample(roots, ts)[0][0]
    nbr = np.asarray(mfg.nbr_nids)
    mask = np.asarray(mfg.nbr_mask)
    assert mask.any()
    for i, r in enumerate(roots):
        true_nbrs = set(full.dst[full.src == r].tolist())
        assert set(nbr[i][mask[i]].tolist()) <= true_nbrs


def test_routed_fallback_on_indivisible_batch():
    """A batch not divisible by P transparently uses the replicated
    path (still exact)."""
    full = _dataset()
    mesh = make_mesh(8)
    g, pg = _build_both(full, mesh)
    single = TemporalSampler(g, fanouts=[4])
    dist = DistributedTemporalSampler(pg, mesh, fanouts=[4],
                                      mode="routed")
    roots = np.arange(13)
    ts = np.full(13, float(full.time.max()), np.float32)
    _assert_mfgs_equal(single.sample(roots, ts), dist.sample(roots, ts))
