"""Skew guard for owner-routed distributed sampling.

The reference's RPC sampler never drops roots (every routed message is
variable-length, ``/root/reference/gnnflow/distributed/dist_sampler.py:
159-242``); the TPU routed path uses fixed-capacity buckets, so a skewed
partition table (least-loaded / Fennel output) could overflow them.  The
guard: an in-jit ``lax.cond`` falls back to the replicated psum-merge
path for any layer whose buckets would overflow — zero root loss — and
``routed_load_stats`` gives the host-side observability (per-owner load
CV + fallback rate, the reference's sampling-time CV analogue,
``dist_sampler.py:108-127``)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gnnflow_tpu.data import DstRandEdgeSampler, get_batches, \
    make_synthetic_dataset
from gnnflow_tpu.dynamic_graph import DynamicGraph
from gnnflow_tpu.models.dgnn import DGNN
from gnnflow_tpu.parallel import (PartitionedDynamicGraph,
                                  auto_capacity_factor, get_partitioner,
                                  make_mesh, routed_load_stats,
                                  routed_overflow_check,
                                  sample_hops_routed)
from gnnflow_tpu.parallel.partitioned_trainer import PartitionedTrainer
from gnnflow_tpu.temporal_sampler import TemporalSampler

GRAPH_KW = dict(initial_pool_size=4096, maximum_pool_size=1 << 22,
                mem_resource_type="hbm", minimum_block_size=8,
                insertion_policy="insert")


def _dataset(num_edges=3000, seed=0):
    _, _, _, full, nf, ef = make_synthetic_dataset(
        num_src=120, num_dst=40, num_edges=num_edges, dim_edge=8,
        dim_node=4, seed=seed)
    return full, ef


def _build_partitioned(full, mesh, partitioner):
    n = mesh.shape["data"]
    pg = PartitionedDynamicGraph(n, mesh=mesh, **GRAPH_KW)
    parts, _ = partitioner.partition(full.src, full.dst, full.time,
                                     full.eid)
    pg.add_partitioned_edges(parts)
    pg.set_partition_table(partitioner.get_partition_table())
    return pg


def test_fallback_exact_under_extreme_skew():
    """All roots the same node + capacity factor 1 overflows every
    bucket; the in-jit fallback keeps the result bit-identical to the
    single store (2-hop recent)."""
    full, _ = _dataset()
    mesh = make_mesh(4)
    g = DynamicGraph(**GRAPH_KW)
    g.add_edges(full.src, full.dst, full.time, full.eid)
    part = get_partitioner("hash", 4)
    pg = _build_partitioned(full, mesh, part)
    single = TemporalSampler(g, fanouts=[4, 3])
    t = float(full.time.max())
    roots = np.full(64, 7, np.int64)
    ts = np.full(64, t, np.float32)
    pgv = pg.device_graph()
    mfgs = sample_hops_routed(
        pgv, mesh, jnp.asarray(roots, jnp.int32), jnp.asarray(ts),
        fanouts=[4, 3], search_iters=16, capacity_factor=1.0,
        overflow_fallback=True)
    ref = single.sample(roots, ts)
    for layer in range(2):
        a, b = mfgs[layer][0], ref[layer][0]
        np.testing.assert_array_equal(np.asarray(a.nbr_nids),
                                      np.asarray(b.nbr_nids))
        np.testing.assert_array_equal(np.asarray(a.nbr_eids),
                                      np.asarray(b.nbr_eids))
        np.testing.assert_array_equal(np.asarray(a.nbr_mask),
                                      np.asarray(b.nbr_mask))
    # the host audit predicts the fallback
    ov = routed_overflow_check(np.asarray(pgv.partition_table), roots, 4,
                               capacity_factor=1.0)
    assert ov > 0


def test_partial_overflow_near_routed_cost():
    """A few hot roots (<5% of the batch overflow their buckets) must be
    served by the SMALL side pass — not the whole-layer replicated
    fallback — and stay bit-identical to the single store (round 4;
    reference analogue: dynamic load-aware scheduling re-routes only hot
    requests, dist_sampler.py:337-377)."""
    full, _ = _dataset()
    mesh = make_mesh(4)
    g = DynamicGraph(**GRAPH_KW)
    g.add_edges(full.src, full.dst, full.time, full.eid)
    part = get_partitioner("hash", 4)
    pg = _build_partitioned(full, mesh, part)
    single = TemporalSampler(g, fanouts=[4, 3])
    t = float(full.time.max())
    pgv = pg.device_graph()
    pt = np.asarray(pgv.partition_table)
    # deterministic construction: 14 distinct roots per owner class per
    # device (balanced base load, cap=16 at factor 1.0) + 8 hot copies
    # of one class-0 vertex -> exactly ONE bucket overflows by 6 per
    # device, well inside the side buffer (cap_ovf=8)
    classes = [np.where(pt[:150] == p)[0] for p in range(4)]
    assert all(len(c) >= 15 for c in classes)
    hot = int(classes[0][0])
    shard = np.concatenate([c[1:15] for c in classes]
                           + [np.full(8, hot, np.int64)])
    roots = np.concatenate([shard] * 4).astype(np.int64)   # B=256, b=64
    ts = np.full(roots.shape[0], t, np.float32)
    stats = routed_load_stats(pt, roots, 4, capacity_factor=1.0)
    assert stats["overflow"] > 0, stats
    assert stats["partial"] and not stats["fallback"], stats
    mfgs = sample_hops_routed(
        pgv, mesh, jnp.asarray(roots, jnp.int32), jnp.asarray(ts),
        fanouts=[4, 3], search_iters=16, capacity_factor=1.0,
        overflow_fallback=True)
    ref = single.sample(roots, ts)
    for layer in range(2):
        a, b = mfgs[layer][0], ref[layer][0]
        np.testing.assert_array_equal(np.asarray(a.nbr_nids),
                                      np.asarray(b.nbr_nids))
        np.testing.assert_array_equal(np.asarray(a.nbr_eids),
                                      np.asarray(b.nbr_eids))
        np.testing.assert_array_equal(np.asarray(a.nbr_mask),
                                      np.asarray(b.nbr_mask))


def test_skewed_table_trainer_zero_root_loss():
    """A heavily skewed partition table (the shape least-loaded/Fennel
    partitioners can produce on real streams) trained with routed
    sampling + pathologically small capacity matches the replicated
    trainer exactly — the fallback guarantees no dropped roots (VERDICT
    r2 item 3)."""
    from gnnflow_tpu.parallel.partition import HashPartitioner

    full, ef = _dataset(num_edges=2000, seed=4)
    mesh = make_mesh(4)

    def model():
        return DGNN(dim_node=0, dim_edge=8, dim_time=8, dim_embed=16,
                    num_layers=1, num_snapshots=1, att_head=2,
                    dropout=0.0, att_dropout=0.0, use_memory=True,
                    dim_memory=16)

    B = 160
    train = full[: int(0.7 * len(full))]

    class SkewedPartitioner(HashPartitioner):
        """75% of vertices on partition 0."""

        def _assign_vertices(self, vertices, dst_lists, ts_lists):
            nids = np.asarray(vertices)
            return np.where(nids < 90, 0, nids % 3 + 1).astype(np.int8)

    def build():
        part = SkewedPartitioner(4)
        pg = _build_partitioned(full, mesh, part)
        return pg, part.get_partition_table()

    pg_r, pt = build()
    counts = np.bincount(pt[pt >= 0], minlength=4)
    assert counts.max() > 2 * counts.sum() / 4  # genuinely skewed
    pg_p, _ = build()

    t_r = PartitionedTrainer(model(), mesh, fanouts=[5], lr=1e-3,
                             sampling_mode="routed", capacity_factor=1.0)
    t_p = PartitionedTrainer(model(), mesh, fanouts=[5], lr=1e-3,
                             sampling_mode="replicated")
    efj = jnp.asarray(ef)
    s_r = t_r.init_state(jax.random.PRNGKey(0), pg_r.device_graph(), B,
                         None, efj, num_nodes=pg_r.max_vertex_id() + 1)
    s_p = t_p.init_state(jax.random.PRNGKey(0), pg_p.device_graph(), B,
                         None, efj, num_nodes=pg_p.max_vertex_id() + 1)

    neg_r = DstRandEdgeSampler(full.dst, seed=1)
    neg_p = DstRandEdgeSampler(full.dst, seed=1)
    fallbacks = 0
    lr_, lp_ = [], []
    for i, (br, bp) in enumerate(zip(get_batches(train, B, neg_r),
                                     get_batches(train, B, neg_p))):
        stats = routed_load_stats(pt, br.target_nodes, 4,
                                  t_r.capacity_factor)
        fallbacks += int(stats["fallback"])
        s_r, l_r, _, _ = t_r.train_step(s_r, pg_r.device_graph(), None,
                                        efj, br)
        s_p, l_p, _, _ = t_p.train_step(s_p, pg_p.device_graph(), None,
                                        efj, bp)
        lr_.append(float(l_r))
        lp_.append(float(l_p))
        if i >= 3:
            break
    # capacity_factor=1.0 under a skewed table must trip the fallback at
    # least once — and training stays loss-identical regardless
    assert fallbacks > 0
    np.testing.assert_allclose(lr_, lp_, rtol=5e-4)


def test_auto_capacity_factor():
    # balanced table -> the minimum (2.0)
    pt = np.arange(400, dtype=np.int32) % 4
    assert auto_capacity_factor(pt, 4) == 2.0
    # heaviest partition holds 70% -> 1.5 * 4 * 0.7 = 4.2, clamped to P=4
    pt = np.array([0] * 70 + [1] * 10 + [2] * 10 + [3] * 10, np.int32)
    assert auto_capacity_factor(pt, 4) == 4.0
    # moderate skew: 40% -> 1.5 * 4 * 0.4 = 2.4
    pt = np.array([0] * 40 + [1] * 20 + [2] * 20 + [3] * 20, np.int32)
    assert abs(auto_capacity_factor(pt, 4) - 2.4) < 1e-9
    # unassigned entries ignored
    pt = np.array([-1] * 50 + [0, 1, 2, 3] * 10, np.int32)
    assert auto_capacity_factor(pt, 4) == 2.0


def test_routed_load_stats():
    pt = np.array([0, 0, 0, 1, 2, 3], np.int32)
    roots = np.array([0, 1, 2, 3, 4, 5, 0, 1], np.int64)  # P=2 shards of 4
    s = routed_load_stats(pt, roots, 4, capacity_factor=4.0)
    np.testing.assert_array_equal(s["counts"], [5, 1, 1, 1])
    assert s["cv"] == pytest.approx(np.std([5, 1, 1, 1]) / 2.0)
    assert s["overflow"] == 0 and not s["fallback"]
    # small overflow (8/device == side-buffer capacity) -> the PARTIAL
    # side pass serves it; no whole-layer fallback (round 4)
    s2 = routed_load_stats(pt, np.zeros(64, np.int64), 4,
                           capacity_factor=1.0)
    assert s2["overflow"] > 0 and s2["partial"] and not s2["fallback"]
    # massive overflow (48/device >> side buffer) -> full fallback
    s3 = routed_load_stats(pt, np.zeros(256, np.int64), 4,
                           capacity_factor=1.0)
    assert s3["overflow"] > 0 and s3["fallback"] and not s3["partial"]


def test_trainer_auto_capacity_resolves():
    full, ef = _dataset(num_edges=1500, seed=7)
    mesh = make_mesh(4)
    part = get_partitioner("hash", 4)
    pg = _build_partitioned(full, mesh, part)
    tr = PartitionedTrainer(
        DGNN(dim_node=0, dim_edge=8, dim_time=8, dim_embed=16,
             num_layers=1, num_snapshots=1, att_head=2, dropout=0.0,
             att_dropout=0.0, use_memory=False),
        mesh, fanouts=[4], lr=1e-3)
    assert tr.capacity_factor == "auto"
    efj = jnp.asarray(ef)
    s = tr.init_state(jax.random.PRNGKey(0), pg.device_graph(), 80, None,
                      efj, num_nodes=pg.max_vertex_id() + 1)
    assert isinstance(tr.capacity_factor, float)
    assert 2.0 <= tr.capacity_factor <= 4.0
    neg = DstRandEdgeSampler(full.dst, seed=1)
    for batch in get_batches(full[:400], 80, neg):
        s, loss, _, _ = tr.train_step(s, pg.device_graph(), None, efj,
                                      batch)
        assert np.isfinite(float(loss))
        break
