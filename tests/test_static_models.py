"""Static model (GraphSAGE/GAT) tests: shapes + end-to-end learning with
is_static sampling (ts = +inf), mirroring the reference's static path."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gnnflow_tpu.data import (DstRandEdgeSampler, get_batches,
                              make_synthetic_dataset)
from gnnflow_tpu.dynamic_graph import DynamicGraph
from gnnflow_tpu.models import build_model
from gnnflow_tpu.train import Trainer
from gnnflow_tpu.utils import average_precision_score


def _setup(dim_node=16):
    train, val, test, full, nf, _ = make_synthetic_dataset(
        num_src=150, num_dst=40, num_edges=4000, dim_node=dim_node,
        dim_edge=0, seed=5)
    g = DynamicGraph(initial_pool_size=4096, maximum_pool_size=1 << 22,
                     mem_resource_type="hbm", minimum_block_size=8,
                     insertion_policy="insert")
    g.add_edges(full.src, full.dst, full.time, full.eid, add_reverse=True)
    return train, val, full, g, nf


@pytest.mark.parametrize("name,cfg", [
    ("graphsage", dict(dim_embed=32, num_layers=2, aggregator="mean",
                       fanouts=[5, 5], sample_strategy="uniform",
                       is_static=True)),
    ("gat", dict(dim_embed=16, num_layers=2, att_head=4,
                 dropout=0.0, att_dropout=0.0, fanouts=[5, 5],
                 sample_strategy="uniform", is_static=True)),
])
def test_static_model_learns(name, cfg):
    train, val, full, g, nf = _setup()
    model, sk = build_model(name, cfg, dim_node=16, dim_edge=0)
    trainer = Trainer(model, lr=3e-3, **sk)
    dg = g.device_graph()
    nfj = jnp.asarray(nf)
    B = 200
    state = trainer.init_state(jax.random.PRNGKey(0), dg, B, nfj, None,
                               num_nodes=g.max_vertex_id() + 1)
    neg = DstRandEdgeSampler(train.dst, seed=1)
    rng = np.random.RandomState(0)
    for _ in range(5):
        for batch in get_batches(train, B, neg, rng=rng):
            state, loss, _, _ = trainer.train_step(state, dg, nfj, None,
                                                   batch)
    scores, labels = [], []
    vneg = DstRandEdgeSampler(full.dst, seed=2)
    for batch in get_batches(val, B, vneg):
        state, loss, pos, negs = trainer.eval_step(state, dg, nfj, None,
                                                   batch)
        k = batch.num_valid
        scores += [np.asarray(pos)[:k], np.asarray(negs)[:k]]
        labels += [np.ones(k), np.zeros(k)]
    ap = average_precision_score(np.concatenate(labels),
                                 np.concatenate(scores))
    assert ap > 0.6, f"{name} AP too low: {ap}"
