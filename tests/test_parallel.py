"""Multi-device data-parallel tests on the virtual 8-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gnnflow_tpu.data import (DstRandEdgeSampler, get_batches,
                              make_synthetic_dataset)
from gnnflow_tpu.dynamic_graph import DynamicGraph
from gnnflow_tpu.models.dgnn import DGNN
from gnnflow_tpu.parallel import make_mesh, shard_trainer
from gnnflow_tpu.train import Trainer


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def _build(seed=3):
    train, val, test, full, _, ef_np = make_synthetic_dataset(
        num_src=100, num_dst=30, num_edges=2000, dim_edge=8, seed=seed)
    g = DynamicGraph(initial_pool_size=4096, maximum_pool_size=1 << 22,
                     mem_resource_type="hbm", minimum_block_size=8,
                     insertion_policy="insert")
    g.add_edges(full.src, full.dst, full.time, full.eid, add_reverse=True)
    return train, full, g, jnp.asarray(ef_np)


@pytest.mark.parametrize("use_memory", [False, True])
def test_dp_train_step_runs(use_memory):
    train, full, g, ef = _build()
    dg = g.device_graph()
    model = DGNN(dim_node=0, dim_edge=8, dim_time=8, dim_embed=16,
                 num_layers=1, num_snapshots=1, att_head=2,
                 dropout=0.1, att_dropout=0.1, use_memory=use_memory,
                 dim_memory=16 if use_memory else None)
    trainer = Trainer(model, fanouts=[5], sample_strategy="recent",
                      lr=1e-3)
    B = 160  # divisible by 8
    state = trainer.init_state(jax.random.PRNGKey(0), dg, B, None, ef,
                               num_nodes=g.max_vertex_id() + 1)
    mesh = make_mesh(8)
    shard_trainer(trainer, mesh)
    neg = DstRandEdgeSampler(train.dst, seed=1)
    losses = []
    for i, batch in enumerate(get_batches(train, B, neg)):
        state, loss, pos, negs = trainer.train_step(state, dg, None, ef,
                                                    batch)
        losses.append(float(loss))
        if i >= 3:
            break
    assert np.isfinite(losses).all()


def test_dp_matches_single_device():
    """The sharded step must produce the same numbers as the unsharded one
    (SPMD is a placement, not a semantics, change)."""
    train, full, g, ef = _build()
    dg = g.device_graph()
    model = DGNN(dim_node=0, dim_edge=8, dim_time=8, dim_embed=16,
                 num_layers=1, num_snapshots=1, att_head=2,
                 dropout=0.0, att_dropout=0.0, use_memory=True,
                 dim_memory=16)
    B = 160

    def run(sharded):
        trainer = Trainer(model, fanouts=[5], sample_strategy="recent",
                          lr=1e-3)
        state = trainer.init_state(jax.random.PRNGKey(0), dg, B, None, ef,
                                   num_nodes=g.max_vertex_id() + 1)
        if sharded:
            shard_trainer(trainer, make_mesh(8))
        neg = DstRandEdgeSampler(train.dst, seed=1)
        out = []
        for i, batch in enumerate(get_batches(train, B, neg)):
            state, loss, pos, negs = trainer.train_step(
                state, dg, None, ef, batch)
            out.append(float(loss))
            if i >= 2:
                break
        return out

    a = run(False)
    b = run(True)
    np.testing.assert_allclose(a, b, rtol=2e-4)
