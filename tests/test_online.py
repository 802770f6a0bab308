"""Online/continual learning loop test (counterpart of the reference's
``online_edge_prediction.py`` semantics): incremental ingestion,
prequential evaluation, replay retraining, sliding-window eviction."""
import numpy as np
import jax
import jax.numpy as jnp

from gnnflow_tpu.data import (DstRandEdgeSampler, get_batches,
                              make_synthetic_dataset)
from gnnflow_tpu.dynamic_graph import DynamicGraph
from gnnflow_tpu.models.dgnn import DGNN
from gnnflow_tpu.train import Trainer
from gnnflow_tpu.utils import average_precision_score


def test_online_loop_with_eviction():
    train, val, test, full, _, ef = make_synthetic_dataset(
        num_src=100, num_dst=30, num_edges=4000, dim_edge=8, seed=7)
    g = DynamicGraph(initial_pool_size=4096, maximum_pool_size=1 << 22,
                     mem_resource_type="hbm", minimum_block_size=8,
                     insertion_policy="insert")
    p1 = full[:1200]
    g.add_edges(p1.src, p1.dst, p1.time, p1.eid, add_reverse=True)

    model = DGNN(dim_node=0, dim_edge=8, dim_time=8, dim_embed=16,
                 num_layers=1, num_snapshots=1, att_head=2, dropout=0.1,
                 att_dropout=0.1, use_memory=False)
    trainer = Trainer(model, fanouts=[5], lr=1e-3)
    efj = jnp.asarray(ef)
    B = 200
    num_nodes = int(max(full.src.max(), full.dst.max())) + 1
    state = trainer.init_state(jax.random.PRNGKey(0), g.device_graph(), B,
                               None, efj, num_nodes=num_nodes)
    neg = DstRandEdgeSampler(p1.dst, seed=1)
    rng = np.random.RandomState(0)

    # phase 1 pretrain
    for _ in range(3):
        for batch in get_batches(p1, B, neg, rng=rng):
            state, loss, _, _ = trainer.train_step(
                state, g.device_graph(), None, efj, batch)

    # phase 2: 7 increments of 400 edges
    aps = []
    seen = p1
    for step in range(7):
        lo, hi = 1200 + step * 400, 1200 + (step + 1) * 400
        chunk = full[lo:hi]
        # prequential eval BEFORE ingesting
        scores, labels = [], []
        for batch in get_batches(chunk, B, neg):
            state, _, pos, negs = trainer.eval_step(
                state, g.device_graph(), None, efj, batch)
            k = batch.num_valid
            scores += [np.asarray(pos)[:k], np.asarray(negs)[:k]]
            labels += [np.ones(k), np.zeros(k)]
        aps.append(average_precision_score(np.concatenate(labels),
                                           np.concatenate(scores)))
        g.add_edges(chunk.src, chunk.dst, chunk.time, chunk.eid,
                    add_reverse=True)
        neg.add_dst_list(chunk.dst)
        seen = seen.concat(chunk)
        # retrain every 3 steps with replay + sliding window
        if (step + 1) % 3 == 0:
            evicted = g.offload_old_blocks(float(chunk.time[-1]) - 3000.0)
            assert evicted >= 0
            idx = np.sort(rng.choice(len(seen) - len(chunk), 200,
                                     replace=False))
            replay = seen[idx].concat(chunk)
            order = np.argsort(replay.time, kind="stable")
            replay = replay[order]
            for batch in get_batches(replay, B, neg):
                state, loss, _, _ = trainer.train_step(
                    state, g.device_graph(), None, efj, batch)
    # the model must stay clearly better than chance throughout
    assert np.mean(aps) > 0.6, f"online mean AP too low: {np.mean(aps)}"
