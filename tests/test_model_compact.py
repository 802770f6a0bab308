"""Model-level compaction for windowed multi-snapshot configs.

Deeper layers stay compact through feature gathers and attention;
embeddings expand at layer boundaries (``expand_blocks``).  With
dropout 0 and recent sampling the path must match the padded path
exactly (same picks, masked-slot algebra unchanged); overflow must fall
back to the padded path bit-exactly.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gnnflow_tpu.data import DstRandEdgeSampler, get_batches, \
    make_synthetic_dataset
from gnnflow_tpu.dynamic_graph import DynamicGraph
from gnnflow_tpu.models.dgnn import DGNN
from gnnflow_tpu.train import Trainer


def _setup():
    train, _, _, full, _, ef = make_synthetic_dataset(
        num_src=120, num_dst=30, num_edges=5000, dim_edge=12, seed=5,
        time_scale=1.0)
    g = DynamicGraph(initial_pool_size=4096, maximum_pool_size=1 << 22,
                     mem_resource_type="hbm", minimum_block_size=8,
                     insertion_policy="insert")
    g.add_edges(full.src, full.dst, full.time, full.eid, add_reverse=True)
    return train, g, ef


def _losses(model_compact, strategy, window, steps=6, factor=0.5,
            fanouts=(5, 5), num_devices=0, batch=250):
    train, g, ef = _setup()
    dg = g.device_graph()
    model = DGNN(dim_node=0, dim_edge=12, dim_time=16, dim_embed=32,
                 num_layers=len(fanouts), num_snapshots=3, att_head=2,
                 dropout=0.0, att_dropout=0.0, use_memory=False)
    trainer = Trainer(model, fanouts=list(fanouts),
                      sample_strategy=strategy,
                      num_snapshots=3, snapshot_time_window=window,
                      prop_time=True, lr=1e-3,
                      compact_factor=factor,
                      model_compact=model_compact)
    ef_arr = jnp.asarray(ef)
    state = trainer.init_state(jax.random.PRNGKey(0), dg, batch, None,
                               ef_arr, num_nodes=g.max_vertex_id() + 1)
    if num_devices:
        from gnnflow_tpu.parallel import make_mesh, shard_trainer
        shard_trainer(trainer, make_mesh(num_devices))
        assert trainer.model_compact == model_compact  # DP keeps it
    neg = DstRandEdgeSampler(train.dst, seed=1)
    losses = []
    rng = np.random.RandomState(0)
    for i, batch_ in enumerate(get_batches(train, batch, neg, rng=rng)):
        if i >= steps:
            break
        state, loss, _, _ = trainer.train_step(state, dg, None, ef_arr,
                                               batch_)
        losses.append(float(loss))
    return losses


def test_recent_matches_padded_exactly():
    a = _losses(False, "recent", 3.0)
    b = _losses(True, "recent", 3.0)
    np.testing.assert_allclose(b, a, rtol=1e-6, atol=1e-7)


def test_overflow_falls_back_exactly():
    """A tiny cap forces the overflow cond onto the padded branch —
    results must match the padded path bitwise."""
    a = _losses(False, "recent", 3.0, factor=0.02)
    b = _losses(True, "recent", 3.0, factor=0.02)
    # ulp-level fusion differences across the cond boundary are expected
    np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6)


def test_3layer_recent_matches_padded_exactly():
    """N-layer generalization: a 3-layer windowed config must be
    loss-equal compact-vs-padded (nested per-boundary conds)."""
    a = _losses(False, "recent", 3.0, fanouts=(4, 3, 3), steps=4)
    b = _losses(True, "recent", 3.0, fanouts=(4, 3, 3), steps=4)
    np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6)


def test_3layer_partial_overflow_falls_back_exactly():
    """A cap that fits boundary 1 but overflows boundary 2 exercises the
    NESTED fallback (compact layer 1, padded layer 2) — still exact."""
    a = _losses(False, "recent", 8.0, fanouts=(4, 3, 3), steps=4,
                factor=0.3)
    b = _losses(True, "recent", 8.0, fanouts=(4, 3, 3), steps=4,
                factor=0.3)
    np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6)


def test_dp_sharded_compact_matches_single_device():
    """Model compaction survives GSPMD sharding: 8-device DP DySAT with
    model_compact on is loss-equal to the unsharded compact run (and
    hence, by the tests above, to the padded path)."""
    a = _losses(True, "recent", 3.0, steps=4, batch=240)
    b = _losses(True, "recent", 3.0, steps=4, batch=240, num_devices=8)
    np.testing.assert_allclose(b, a, rtol=5e-4)


def _part_losses(model_compact, steps=4, mode="routed", factor=0.5,
                 batch=240):
    """Windowed DySAT-style config on a PARTITIONED store (round 5:
    block compaction's packing math is store-independent; packed roots
    sample through the routed layer sampler)."""
    from gnnflow_tpu.parallel import (PartitionedDynamicGraph,
                                      get_partitioner, make_mesh)
    from gnnflow_tpu.parallel.partitioned_trainer import PartitionedTrainer
    train, g, ef = _setup()
    full_len = None  # _setup already ingested the single store; redo split
    train_d = train
    mesh = make_mesh(4)
    pg = PartitionedDynamicGraph(
        4, mesh=mesh, initial_pool_size=4096,
        maximum_pool_size=1 << 22, mem_resource_type="hbm",
        minimum_block_size=8, insertion_policy="insert")
    # re-create the raw stream for partitioning (same seed as _setup)
    _, _, _, full, _, _ = make_synthetic_dataset(
        num_src=120, num_dst=30, num_edges=5000, dim_edge=12, seed=5,
        time_scale=1.0)
    part = get_partitioner("hash", 4)
    parts, _ = part.partition(full.src, full.dst, full.time, full.eid)
    pg.add_partitioned_edges(parts)
    pg.set_partition_table(part.get_partition_table())
    model = DGNN(dim_node=0, dim_edge=12, dim_time=16, dim_embed=32,
                 num_layers=2, num_snapshots=3, att_head=2,
                 dropout=0.0, att_dropout=0.0, use_memory=False)
    tr = PartitionedTrainer(
        model, mesh, sampling_mode=mode, fanouts=[5, 5], lr=1e-3,
        num_snapshots=3, snapshot_time_window=3.0, prop_time=True,
        compact_factor=factor, model_compact=model_compact,
        auto_calibrate=False)
    dg = pg.device_graph()
    efj = jnp.asarray(ef)
    state = tr.init_state(jax.random.PRNGKey(0), dg, batch, None, efj,
                          num_nodes=pg.max_vertex_id() + 1)
    neg = DstRandEdgeSampler(train_d.dst, seed=1)
    losses = []
    rng = np.random.RandomState(0)
    for i, b in enumerate(get_batches(train_d, batch, neg, rng=rng)):
        if i >= steps:
            break
        state, loss, _, _ = tr.train_step(state, dg, None, efj, b)
        losses.append(float(loss))
    return losses


def test_partitioned_compact_matches_partitioned_padded():
    a = _part_losses(False)
    b = _part_losses(True)
    np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6)


def test_partitioned_compact_overflow_falls_back():
    a = _part_losses(False, factor=0.02)
    b = _part_losses(True, factor=0.02)
    np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6)


def test_uniform_trains_and_is_finite():
    """Uniform picks draw different RNG per shape; assert the compact
    path trains sanely (finite, decreasing-ish) rather than bit-equal."""
    b = _losses(True, "uniform", 3.0, steps=8)
    assert all(np.isfinite(b))
    assert b[-1] < b[0] + 0.1


def test_expand_blocks_golden_and_grad():
    from gnnflow_tpu.ops.segment_pallas import expand_blocks
    rng = np.random.RandomState(0)
    B, cap, F, d = 5, 3, 2, 4
    rst = rng.randn(B + cap * F, d).astype(np.float32)
    rank = np.array([1, cap, 0, cap, 1], np.int32)  # blocks 1,-,0,-,1
    out = np.asarray(expand_blocks(jnp.asarray(rst), jnp.asarray(rank),
                                   cap, F))
    assert out.shape == (B * (1 + F), d)
    np.testing.assert_array_equal(out[:B], rst[:B])
    tail = rst[B:].reshape(cap, F, d)
    for b in range(B):
        want = tail[rank[b]] if rank[b] < cap else np.zeros((F, d))
        np.testing.assert_array_equal(out[B + b * F: B + (b + 1) * F],
                                      want)
    # grad: compare against the naive (XLA-transposed) formulation —
    # NB rank 1 appears twice, so slot 1's gradient must SUM both? No:
    # rank is injective on valid blocks in real use; with duplicates the
    # custom VJP keeps one.  Use an injective rank for the grad check.
    rank2 = jnp.asarray(np.array([1, cap, 0, cap, 2], np.int32))
    g = jnp.asarray(rng.randn(B * (1 + F), d).astype(np.float32))

    def f_ref(x):
        head = x[:B]
        tail = jnp.concatenate(
            [x[B:].reshape(cap, F * d),
             jnp.zeros((1, F * d))], axis=0)
        body = tail[jnp.clip(rank2, 0, cap)].reshape(B * F, d)
        return jnp.vdot(jnp.concatenate([head, body]), g)

    def f_new(x):
        return jnp.vdot(expand_blocks(x, rank2, cap, F), g)

    ga = jax.grad(f_ref)(jnp.asarray(rst))
    gb = jax.grad(f_new)(jnp.asarray(rst))
    np.testing.assert_allclose(np.asarray(gb), np.asarray(ga),
                               rtol=1e-6, atol=1e-6)
