"""End-to-end training: models must actually learn on synthetic data.

The minimum end-to-end slice from SURVEY.md §7 (stage 4): TGAT-style
attention trained for link prediction, evaluated by AP/AUC — plus the TGN
memory path.  AP must clearly beat chance (0.5) after a couple of epochs.
"""
import numpy as np
import jax
import pytest

from gnnflow_tpu.data import (DstRandEdgeSampler, get_batches,
                              make_synthetic_dataset)
from gnnflow_tpu.dynamic_graph import DynamicGraph
from gnnflow_tpu.models.dgnn import DGNN
from gnnflow_tpu.train import Trainer
from gnnflow_tpu.utils import average_precision_score, roc_auc_score


def _setup(dim_edge=16, num_edges=6000):
    train, val, test, full, node_feats, edge_feats = \
        make_synthetic_dataset(num_src=200, num_dst=50,
                               num_edges=num_edges, dim_edge=dim_edge,
                               seed=3)
    g = DynamicGraph(initial_pool_size=4096, maximum_pool_size=1 << 22,
                     mem_resource_type="hbm", minimum_block_size=8,
                     insertion_policy="insert")
    # bipartite interaction stream -> undirected store (WIKI-style,
    # config.py:126 ``undirected: True``) so dst nodes have history too
    g.add_edges(full.src, full.dst, full.time, full.eid, add_reverse=True)
    return train, val, full, g, edge_feats


def _run_training(model, trainer, train, val, full, g, edge_feats,
                  batch_size=500, epochs=3, seed=0):
    dg = g.device_graph()
    ef = jax.numpy.asarray(edge_feats) if edge_feats is not None else None
    state = trainer.init_state(jax.random.PRNGKey(seed), dg, batch_size,
                               None, ef, num_nodes=g.max_vertex_id() + 1)
    train_neg = DstRandEdgeSampler(train.dst, seed=1)
    val_neg = DstRandEdgeSampler(full.dst, seed=2)
    rng = np.random.RandomState(seed)
    for _ in range(epochs):
        for batch in get_batches(train, batch_size, train_neg, rng=rng):
            state, loss, _, _ = trainer.train_step(
                state, dg, None, ef, batch)
    # validation
    scores, labels = [], []
    for batch in get_batches(val, batch_size, val_neg):
        state, loss, pos, neg = trainer.eval_step(state, dg, None, ef,
                                                  batch)
        k = batch.num_valid
        scores.append(np.asarray(pos)[:k])
        scores.append(np.asarray(neg)[:k])
        labels.append(np.ones(k))
        labels.append(np.zeros(k))
    y = np.concatenate(scores)
    t = np.concatenate(labels)
    return average_precision_score(t, y), roc_auc_score(t, y)


@pytest.mark.slow
def test_tgat_learns():
    train, val, full, g, edge_feats = _setup()
    model = DGNN(dim_node=0, dim_edge=16, dim_time=16, dim_embed=32,
                 num_layers=1, num_snapshots=1, att_head=2,
                 dropout=0.1, att_dropout=0.1, use_memory=False)
    trainer = Trainer(model, fanouts=[10], sample_strategy="recent",
                      lr=1e-3)
    ap, auc = _run_training(model, trainer, train, val, full, g,
                            edge_feats)
    assert ap > 0.70, f"TGAT AP too low: {ap}"
    assert auc > 0.70, f"TGAT AUC too low: {auc}"


@pytest.mark.slow
def test_tgn_learns():
    train, val, full, g, edge_feats = _setup()
    model = DGNN(dim_node=0, dim_edge=16, dim_time=16, dim_embed=32,
                 num_layers=1, num_snapshots=1, att_head=2,
                 dropout=0.1, att_dropout=0.1, use_memory=True,
                 dim_memory=32)
    trainer = Trainer(model, fanouts=[10], sample_strategy="recent",
                      lr=1e-3)
    ap, auc = _run_training(model, trainer, train, val, full, g,
                            edge_feats)
    assert ap > 0.70, f"TGN AP too low: {ap}"
    assert auc > 0.70, f"TGN AUC too low: {auc}"


@pytest.mark.slow
def test_dysat_learns():
    train, val, full, g, edge_feats = _setup()
    model = DGNN(dim_node=0, dim_edge=16, dim_time=0, dim_embed=32,
                 num_layers=2, num_snapshots=3, att_head=2,
                 dropout=0.1, att_dropout=0.1, use_memory=False)
    trainer = Trainer(model, fanouts=[5, 5], sample_strategy="uniform",
                      num_snapshots=3, snapshot_time_window=500.0,
                      prop_time=True, lr=1e-3)
    ap, auc = _run_training(model, trainer, train, val, full, g,
                            edge_feats, batch_size=300, epochs=2)
    assert ap > 0.65, f"DySAT AP too low: {ap}"


def test_metrics_match_sklearn():
    from sklearn import metrics as skm
    rng = np.random.RandomState(0)
    y = rng.randint(0, 2, 500)
    s = rng.rand(500) + 0.3 * y
    np.testing.assert_allclose(
        average_precision_score(y, s), skm.average_precision_score(y, s),
        rtol=1e-9)
    np.testing.assert_allclose(
        roc_auc_score(y, s), skm.roc_auc_score(y, s), rtol=1e-9)


@pytest.mark.slow
def test_tgn_learns_bf16():
    """Mixed-precision (bfloat16 compute) must reach the same AP."""
    train, val, full, g, edge_feats = _setup()
    model = DGNN(dim_node=0, dim_edge=16, dim_time=16, dim_embed=32,
                 num_layers=1, num_snapshots=1, att_head=2,
                 dropout=0.1, att_dropout=0.1, use_memory=True,
                 dim_memory=32, compute_dtype="bfloat16")
    trainer = Trainer(model, fanouts=[10], sample_strategy="recent",
                      lr=1e-3)
    ap, auc = _run_training(model, trainer, train, val, full, g,
                            edge_feats)
    assert ap > 0.70, f"bf16 TGN AP too low: {ap}"


def test_scan_epoch_matches_per_step():
    """train_steps_scan must produce the same losses as per-step calls."""
    train, val, full, g, edge_feats = _setup(num_edges=2000)
    import jax.numpy as jnp
    model = DGNN(dim_node=0, dim_edge=16, dim_time=8, dim_embed=16,
                 num_layers=1, num_snapshots=1, att_head=2, dropout=0.0,
                 att_dropout=0.0, use_memory=True, dim_memory=16)
    trainer = Trainer(model, fanouts=[5], lr=1e-3)
    dg = g.device_graph()
    ef = jnp.asarray(edge_feats)
    B = 200
    neg = DstRandEdgeSampler(train.dst, seed=1)
    tns, tss, eis, vs = [], [], [], []
    for b in get_batches(train, B, neg):
        v = np.zeros(B, bool); v[:b.num_valid] = True
        tns.append(b.target_nodes); tss.append(b.ts); eis.append(b.eids)
        vs.append(v)
    TN = jnp.asarray(np.stack(tns), jnp.int32)
    TS = jnp.asarray(np.stack(tss), jnp.float32)
    EI = jnp.asarray(np.stack(eis), jnp.int32)
    VA = jnp.asarray(np.stack(vs))

    s1 = trainer.init_state(jax.random.PRNGKey(0), dg, B, None, ef,
                            num_nodes=g.max_vertex_id() + 1)
    s2 = trainer.init_state(jax.random.PRNGKey(0), dg, B, None, ef,
                            num_nodes=g.max_vertex_id() + 1)
    losses1 = []
    for i in range(TN.shape[0]):
        s1, loss, _, _ = trainer.train_step_arrays(
            s1, dg, None, ef, TN[i], TS[i], EI[i], VA[i])
        losses1.append(float(loss))
    s2, losses2 = trainer.train_steps_scan(s2, dg, None, ef, TN, TS, EI,
                                           VA)
    np.testing.assert_allclose(losses1, np.asarray(losses2), rtol=2e-4)


@pytest.mark.slow
def test_apan_learns():
    """APAN (transformer updater + 5-slot mailbox) link prediction."""
    train, val, full, g, edge_feats = _setup()
    model = DGNN(dim_node=0, dim_edge=16, dim_time=16, dim_embed=32,
                 num_layers=1, num_snapshots=1, att_head=2,
                 dropout=0.1, att_dropout=0.1, use_memory=True,
                 dim_memory=32, memory_updater="transformer",
                 mailbox_slots=5)
    trainer = Trainer(model, fanouts=[10], sample_strategy="recent",
                      lr=1e-3)
    ap, auc = _run_training(model, trainer, train, val, full, g,
                            edge_feats)
    assert ap > 0.70, f"APAN AP too low: {ap}"
