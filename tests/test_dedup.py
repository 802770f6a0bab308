"""Exact (nid, ts) instance dedup for the memory/GRU path.

The deduped fast path must be numerically equivalent to the per-instance
path (duplicates of a pair compute identical memory rows), and the
``lax.cond`` fallback must engage when a batch has more unique pairs than
the static capacity.  Reference semantics under test: the memory updater
math of ``/root/reference/gnnflow/models/modules/memory_updater.py:43-91``
is per-(nid, ts) pure, so deduplication cannot change results.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gnnflow_tpu.data import DstRandEdgeSampler, get_batches, \
    make_synthetic_dataset
from gnnflow_tpu.dynamic_graph import DynamicGraph
from gnnflow_tpu.models.dgnn import DGNN
from gnnflow_tpu.ops.dedup import dedup_instances, expand_rows
from gnnflow_tpu.train import Trainer


def _np_dedup(nid, ts, valid):
    pairs = [(int(n), float(t)) for n, t, v in zip(nid, ts, valid) if v]
    uniq, seen = [], set()
    for p in pairs:
        if p not in seen:
            seen.add(p)
            uniq.append(p)
    return uniq


class TestDedupInstances:
    def test_golden_small(self):
        nid = jnp.array([3, 1, 3, 2, 1, 3], jnp.int32)
        ts = jnp.array([1.0, 2.0, 1.0, 2.0, 2.0, 5.0], jnp.float32)
        valid = jnp.array([1, 1, 1, 1, 1, 1], bool)
        uniq_nid, uniq_ts, inv, n, _, _ = dedup_instances(nid, ts, valid, cap=8)
        assert int(n) == 4  # (3,1), (1,2), (2,2), (3,5)
        got = set()
        for i in range(6):
            s = int(inv[i])
            assert int(uniq_nid[s]) == int(nid[i])
            assert float(uniq_ts[s]) == float(ts[i])
            got.add(s)
        assert len(got) == 4
        # duplicates share a slot
        assert int(inv[0]) == int(inv[2])
        assert int(inv[1]) == int(inv[4])

    def test_invalid_rows_excluded(self):
        nid = jnp.array([-1, 5, 5, -1], jnp.int32)
        ts = jnp.array([0.0, 3.0, 3.0, 9.0], jnp.float32)
        valid = jnp.array([0, 1, 1, 0], bool)
        uniq_nid, uniq_ts, inv, n, _, _ = dedup_instances(nid, ts, valid, cap=4)
        assert int(n) == 1
        assert int(uniq_nid[0]) == 5
        assert float(uniq_ts[0]) == 3.0
        assert int(inv[1]) == 0 and int(inv[2]) == 0

    def test_all_invalid(self):
        nid = jnp.array([1, 2], jnp.int32)
        ts = jnp.zeros((2,), jnp.float32)
        valid = jnp.zeros((2,), bool)
        _, _, _, n, _, _ = dedup_instances(nid, ts, valid, cap=4)
        assert int(n) == 0

    @pytest.mark.parametrize("seed", [0, 1])
    def test_random_vs_numpy(self, seed):
        rng = np.random.RandomState(seed)
        L = 1000
        nid = rng.randint(0, 40, L).astype(np.int32)
        ts = rng.randint(0, 6, L).astype(np.float32)
        valid = rng.rand(L) > 0.3
        uniq = _np_dedup(nid, ts, valid)
        uniq_nid, uniq_ts, inv, n, sidx, rank_sorted = \
            dedup_instances(jnp.asarray(nid), jnp.asarray(ts),
                            jnp.asarray(valid), cap=512)
        # sorted decomposition consistency: inv[sidx[p]] == rank_sorted[p]
        np.testing.assert_array_equal(
            np.asarray(inv)[np.asarray(sidx)], np.asarray(rank_sorted))
        assert np.all(np.diff(np.asarray(rank_sorted)) >= 0)
        assert int(n) == len(uniq)
        inv = np.asarray(inv)
        un, ut = np.asarray(uniq_nid), np.asarray(uniq_ts)
        for i in range(L):
            if valid[i]:
                assert un[inv[i]] == nid[i]
                assert ut[inv[i]] == ts[i]

    def test_expand_rows_unaligned(self):
        rows = jnp.arange(12.0).reshape(4, 3)
        inv = jnp.array([2, 0, 2, 3, 1], jnp.int32)
        out = expand_rows(rows, inv)
        np.testing.assert_array_equal(np.asarray(out),
                                      np.asarray(rows)[np.asarray(inv)])


def _train_losses(dedup_factor, steps=8, batch_size=400, dim_node=0,
                  node_feats=None):
    train, val, test, full, nf, ef = make_synthetic_dataset(
        num_src=150, num_dst=40, num_edges=4000, dim_edge=12,
        dim_node=dim_node, seed=7)
    g = DynamicGraph(initial_pool_size=4096, maximum_pool_size=1 << 22,
                     mem_resource_type="hbm", minimum_block_size=8,
                     insertion_policy="insert")
    g.add_edges(full.src, full.dst, full.time, full.eid, add_reverse=True)
    dg = g.device_graph()
    model = DGNN(dim_node=dim_node, dim_edge=12, dim_time=16, dim_embed=32,
                 num_layers=1, num_snapshots=1, att_head=2,
                 dropout=0.0, att_dropout=0.0, use_memory=True,
                 dim_memory=32)
    trainer = Trainer(model, fanouts=[10], sample_strategy="recent",
                      lr=1e-3, dedup_factor=dedup_factor)
    nf_arr = jnp.asarray(nf) if (dim_node and nf is not None) else None
    state = trainer.init_state(jax.random.PRNGKey(0), dg, batch_size,
                               nf_arr, jnp.asarray(ef),
                               num_nodes=g.max_vertex_id() + 1)
    neg = DstRandEdgeSampler(train.dst, seed=1)
    losses = []
    rng = np.random.RandomState(0)
    for i, batch in enumerate(get_batches(train, batch_size, neg,
                                          rng=rng)):
        if i >= steps:
            break
        state, loss, _, _ = trainer.train_step(state, dg, nf_arr,
                                               jnp.asarray(ef), batch)
        losses.append(float(loss))
    return losses, state


class TestDedupTraining:
    def test_matches_per_instance_path(self):
        """Dedup on vs off: identical losses and final memory state."""
        l_plain, s_plain = _train_losses(None)
        l_dedup, s_dedup = _train_losses(0.5)
        np.testing.assert_allclose(l_dedup, l_plain, rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(
            np.asarray(s_dedup.memory.data), np.asarray(s_plain.memory.data),
            rtol=2e-4, atol=2e-5)

    def test_overflow_falls_back(self):
        """A capacity below the unique count must engage the per-instance
        fallback branch and still match exactly."""
        l_plain, _ = _train_losses(None)
        # cap = ceil(0.001*L/256)*256 = 256 < uniques for 400-root batches
        l_tiny, _ = _train_losses(0.001)
        np.testing.assert_allclose(l_tiny, l_plain, rtol=1e-6, atol=1e-7)

    def test_with_node_features(self):
        """Dedup with a node-feature table (compact fusion path)."""
        l_plain, s_plain = _train_losses(None, dim_node=32)
        l_dedup, s_dedup = _train_losses(0.5, dim_node=32)
        np.testing.assert_allclose(l_dedup, l_plain, rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(
            np.asarray(s_dedup.memory.data), np.asarray(s_plain.memory.data),
            rtol=2e-4, atol=2e-5)


class TestSortedSegmentSum:
    @pytest.mark.parametrize("L,cap,D", [(700, 300, 128), (256, 256, 128),
                                         (1000, 64, 256)])
    def test_kernel_vs_segment_sum(self, L, cap, D):
        from gnnflow_tpu.ops.segment_pallas import sorted_segment_sum
        rng = np.random.RandomState(0)
        # non-decreasing dense segment ids
        steps = rng.rand(L) < (cap / L * 0.9)
        seg = np.minimum(np.cumsum(steps), cap - 1).astype(np.int32)
        dhs = rng.randn(L, D).astype(np.float32)
        want = np.zeros((cap, D), np.float32)
        np.add.at(want, seg, dhs)
        got = sorted_segment_sum(jnp.asarray(dhs), jnp.asarray(seg), cap,
                                 True)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5,
                                   atol=1e-5)

    def test_expand_compact_grad(self):
        from gnnflow_tpu.ops.segment_pallas import expand_compact
        rng = np.random.RandomState(1)
        L, cap, D = 500, 128, 128
        inv = rng.randint(0, 100, L).astype(np.int32)
        order = np.argsort(inv, kind="stable").astype(np.int32)
        rank_sorted = inv[order]
        up = rng.randn(cap, D).astype(np.float32)
        dh = rng.randn(L, D).astype(np.float32)

        def f_ref(u):
            return jnp.vdot(u[jnp.asarray(inv)], jnp.asarray(dh))

        def f_new(u):
            return jnp.vdot(expand_compact(
                u, jnp.asarray(inv), jnp.asarray(order),
                jnp.asarray(rank_sorted)), jnp.asarray(dh))

        g_ref = jax.grad(f_ref)(jnp.asarray(up))
        g_new = jax.grad(f_new)(jnp.asarray(up))
        np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                                   rtol=1e-5, atol=1e-5)

    def test_dedup_pallas_uniq_extraction(self):
        """The first-masked segment-sum winner extraction (TPU path,
        interpret mode) must match the scatter path exactly."""
        rng = np.random.RandomState(3)
        L = 3000
        nid = rng.randint(0, 50, L).astype(np.int32)
        ts = rng.randint(0, 7, L).astype(np.float32)
        valid = rng.rand(L) > 0.2
        a = dedup_instances(jnp.asarray(nid), jnp.asarray(ts),
                            jnp.asarray(valid), cap=512, use_pallas=False)
        b = dedup_instances(jnp.asarray(nid), jnp.asarray(ts),
                            jnp.asarray(valid), cap=512, use_pallas=True)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
