"""Per-node GRU pre-projection path (ops/gru_gather.py).

Matmul-then-gather must equal gather-then-matmul row-for-row: the table
path must reproduce the per-instance FusedGRUCell trajectory (losses and
memory state) in both f32 and bf16 compute, and checkpoints must be
interchangeable (identical param trees)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gnnflow_tpu.data import DstRandEdgeSampler, get_batches, \
    make_synthetic_dataset
from gnnflow_tpu.dynamic_graph import DynamicGraph
from gnnflow_tpu.models.dgnn import DGNN
from gnnflow_tpu.train import Trainer


def _run(gru_table, compute_dtype=None, dim_node=0, steps=8,
         batch_size=400):
    train, _, _, full, nf, ef = make_synthetic_dataset(
        num_src=150, num_dst=40, num_edges=4000, dim_edge=12,
        dim_node=dim_node, seed=7)
    g = DynamicGraph(initial_pool_size=4096, maximum_pool_size=1 << 22,
                     mem_resource_type="hbm", minimum_block_size=8,
                     insertion_policy="insert")
    g.add_edges(full.src, full.dst, full.time, full.eid, add_reverse=True)
    dg = g.device_graph()
    model = DGNN(dim_node=dim_node, dim_edge=12, dim_time=16,
                 dim_embed=32, num_layers=1, num_snapshots=1, att_head=2,
                 dropout=0.0, att_dropout=0.0, use_memory=True,
                 dim_memory=32, compute_dtype=compute_dtype)
    trainer = Trainer(model, fanouts=[10], sample_strategy="recent",
                      lr=1e-3, gru_table=gru_table)
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


def test_table_matches_per_instance_f32():
    """f32: identical accumulation -> the whole trajectory matches."""
    l_a, s_a = _run(False, None)
    l_b, s_b = _run(True, None)
    np.testing.assert_allclose(l_b, l_a, rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(s_b.memory.data),
                               np.asarray(s_a.memory.data),
                               rtol=2e-4, atol=2e-5)


def test_table_matches_per_instance_bf16_one_step():
    """bf16: the forward pass is value-identical (matmul-then-gather ==
    gather-then-matmul row-for-row), so one step's loss and memory
    write-back must match tightly; multi-step trajectories drift because
    the weight-grad matmuls round differently across the two
    (mathematically equal) formulations."""
    l_a, s_a = _run(False, "bfloat16", steps=1)
    l_b, s_b = _run(True, "bfloat16", steps=1)
    np.testing.assert_allclose(l_b, l_a, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(s_b.memory.data),
                               np.asarray(s_a.memory.data),
                               rtol=1e-5, atol=1e-6)


def test_table_with_node_features():
    l_a, s_a = _run(False, dim_node=32)
    l_b, s_b = _run(True, dim_node=32)
    np.testing.assert_allclose(l_b, l_a, rtol=2e-5, atol=2e-6)


def test_param_tree_identical():
    """Checkpoints are interchangeable between the two paths."""
    import jax.tree_util as jtu
    _, s_a = _run(False, steps=1)
    _, s_b = _run(True, steps=1)
    pa = [jtu.keystr(k) for k, _ in jtu.tree_flatten_with_path(
        s_a.params)[0]]
    pb = [jtu.keystr(k) for k, _ in jtu.tree_flatten_with_path(
        s_b.params)[0]]
    assert pa == pb


def test_prepare_input_bf16_matches_plain():
    """The bf16-packed pull returns bf16-rounded values with EXACT
    timestamps/ptr for both single- and multi-slot mailboxes."""
    from gnnflow_tpu.models import memory as memory_lib
    from gnnflow_tpu.common import MFG
    rng = np.random.RandomState(0)
    for slots in (1, 4):
        st = memory_lib.init_memory(50, 16, 8, mailbox_slots=slots)
        data = rng.randn(*st.data.shape).astype(np.float32) * 3
        data[:, -1] = rng.randint(0, 9, 50)  # ptr column
        st = st.replace(data=jnp.asarray(data))
        B, F = 6, 4
        mfg = MFG(root_nids=jnp.asarray(rng.randint(0, 50, B), jnp.int32),
                  root_ts=jnp.asarray(rng.rand(B), jnp.float32),
                  nbr_nids=jnp.asarray(rng.randint(0, 50, (B, F)),
                                       jnp.int32),
                  nbr_ts=jnp.asarray(rng.rand(B, F), jnp.float32),
                  nbr_dts=jnp.zeros((B, F), jnp.float32),
                  nbr_eids=jnp.zeros((B, F), jnp.int32),
                  nbr_mask=jnp.ones((B, F), bool))
        a = memory_lib.prepare_input(st, mfg)
        b = memory_lib.prepare_input_bf16(st, mfg)
        for k in a:
            av, bv = np.asarray(a[k], np.float32), np.asarray(
                b[k], np.float32)
            if k in ("mem_ts", "mail_ts", "mail_ptr"):
                np.testing.assert_array_equal(av, bv, err_msg=k)
            else:
                np.testing.assert_allclose(av, bv, rtol=8e-3, atol=8e-3,
                                           err_msg=k)


def test_calibrate_picks_factors():
    """calibrate() measures occupancy/duplication on real batches and
    picks the static compaction factors (dense windows disable the
    inter-layer compaction; extreme duplication enables dedup)."""
    train, _, _, full, _, ef = make_synthetic_dataset(
        num_src=60, num_dst=15, num_edges=6000, dim_edge=8, seed=3)
    g = DynamicGraph(initial_pool_size=4096, maximum_pool_size=1 << 22,
                     mem_resource_type="hbm", minimum_block_size=8,
                     insertion_policy="insert")
    g.add_edges(full.src, full.dst, full.time, full.eid, add_reverse=True)
    dg = g.device_graph()
    model = DGNN(dim_node=0, dim_edge=8, dim_time=8, dim_embed=16,
                 num_layers=2, num_snapshots=3, att_head=2, dropout=0.0,
                 att_dropout=0.0, use_memory=False)
    trainer = Trainer(model, fanouts=[5, 5], sample_strategy="uniform",
                      num_snapshots=3, snapshot_time_window=1.0,
                      prop_time=True, lr=1e-3)
    neg = DstRandEdgeSampler(train.dst, seed=1)
    batches = list(get_batches(train, 300, neg))[-3:]
    stats = trainer.calibrate(dg, batches)
    assert stats["occupancy"] is not None
    # the chosen factor must cover the measured occupancy with headroom
    # (or be disabled when occupancy is high)
    if stats["compact_factor"] is not None:
        assert stats["compact_factor"] >= stats["occupancy"]
    # trainer still trains after re-jit
    ef_arr = jnp.asarray(ef)
    state = trainer.init_state(jax.random.PRNGKey(0), dg, 300, None,
                               ef_arr, num_nodes=g.max_vertex_id() + 1)
    state, loss, _, _ = trainer.train_step(state, dg, None, ef_arr,
                                           batches[0])
    assert np.isfinite(float(loss))


def test_calibrate_memory_duplication():
    """With a memory model, calibrate reports the unique-(nid, ts)
    fraction and only enables dedup under extreme duplication."""
    train, _, _, full, _, ef = make_synthetic_dataset(
        num_src=150, num_dst=40, num_edges=4000, dim_edge=12, seed=7)
    g = DynamicGraph(initial_pool_size=4096, maximum_pool_size=1 << 22,
                     mem_resource_type="hbm", minimum_block_size=8,
                     insertion_policy="insert")
    g.add_edges(full.src, full.dst, full.time, full.eid, add_reverse=True)
    dg = g.device_graph()
    model = DGNN(dim_node=0, dim_edge=12, dim_time=16, dim_embed=32,
                 num_layers=1, num_snapshots=1, att_head=2, dropout=0.0,
                 att_dropout=0.0, use_memory=True, dim_memory=32)
    trainer = Trainer(model, fanouts=[10], sample_strategy="recent",
                      lr=1e-3)
    neg = DstRandEdgeSampler(train.dst, seed=1)
    stats = trainer.calibrate(dg, list(get_batches(train, 400, neg))[:2])
    assert stats["uniq_frac"] is not None
    if stats["uniq_frac"] > 0.08:
        assert stats["dedup_factor"] is None
