"""Online (continual) temporal link prediction.

Counterpart of ``/root/reference/scripts/online_edge_prediction.py``:
phase 1 pretrains offline on the first ``--phase1-ratio`` of the stream;
phase 2 runs ``--phase2-steps`` increments: ingest the next chunk →
prequential evaluation on it (AP/AUC-over-time) → optional retraining with
replay of old data (``--replay-ratio``) and sliding-window eviction via
``offload_old_blocks`` (``online_edge_prediction.py:348-355``).
"""
import argparse
import logging
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from gnnflow_tpu.config import get_default_config
from gnnflow_tpu.data import (DstRandEdgeSampler, EdgeTable, get_batches,
                              load_dataset, load_feat,
                              make_synthetic_dataset)
from gnnflow_tpu.dynamic_graph import build_dynamic_graph
from gnnflow_tpu.models import build_model
from gnnflow_tpu.train import Trainer
from gnnflow_tpu.utils import average_precision_score, roc_auc_score

parser = argparse.ArgumentParser()
parser.add_argument("--model", default="TGN")
parser.add_argument("--data", default="SYNTHETIC")
parser.add_argument("--data-dir", default=None)
parser.add_argument("--epoch", type=int, default=5,
                    help="epochs per retrain")
parser.add_argument("--lr", type=float, default=1e-4)
parser.add_argument("--seed", type=int, default=42)
parser.add_argument("--phase1-ratio", type=float, default=0.3)
parser.add_argument("--phase2-steps", type=int, default=100)
parser.add_argument("--retrain-interval", type=int, default=10,
                    help="retrain every N incremental steps (0=never)")
parser.add_argument("--replay-ratio", type=float, default=0.5)
parser.add_argument("--time-window", type=float, default=0,
                    help="sliding window: evict edges older than "
                         "now - window before retraining (0=keep all)")
parser.add_argument("--synthetic-edges", type=int, default=100_000)
args = parser.parse_args()

logging.basicConfig(level=logging.INFO,
                    format="%(asctime)s %(levelname)s %(message)s")


def main():
    import jax
    import jax.numpy as jnp

    model_config, data_config = get_default_config(args.model, "synthetic")
    try:
        model_config, data_config = get_default_config(
            args.model, args.data.lower())
    except AssertionError:
        pass

    if args.data != "SYNTHETIC":
        try:
            _, _, _, full = load_dataset(args.data, args.data_dir)
            node_feats, edge_feats = load_feat(args.data, args.data_dir)
        except ValueError:
            logging.warning("dataset not found; using synthetic")
            args.data = "SYNTHETIC"
    if args.data == "SYNTHETIC":
        _, _, _, full, node_feats, edge_feats = make_synthetic_dataset(
            num_src=2000, num_dst=500, num_edges=args.synthetic_edges,
            dim_edge=100, seed=args.seed)

    n = len(full)
    p1_end = int(n * args.phase1_ratio)
    phase1 = full[:p1_end]
    chunk_size = max(1, (n - p1_end) // args.phase2_steps)

    dgraph = build_dynamic_graph(**data_config)
    dgraph.add_edges(phase1.src, phase1.dst, phase1.time, phase1.eid,
                     add_reverse=data_config["undirected"])

    dim_node = 0 if node_feats is None else node_feats.shape[1]
    dim_edge = 0 if edge_feats is None else edge_feats.shape[1]
    # memory must cover nodes that only appear later in the stream
    num_nodes = int(max(full.src.max(), full.dst.max())) + 1

    model, sampler_kwargs = build_model(args.model, model_config,
                                        dim_node, dim_edge)
    batch_size = min(model_config["batch_size"], max(256, chunk_size))
    trainer = Trainer(model, lr=args.lr, **sampler_kwargs)
    nfj = jnp.asarray(node_feats) if node_feats is not None else None
    efj = jnp.asarray(edge_feats) if edge_feats is not None else None

    dg = dgraph.device_graph()
    state = trainer.init_state(jax.random.PRNGKey(args.seed), dg,
                               batch_size, nfj, efj, num_nodes=num_nodes)
    neg = DstRandEdgeSampler(phase1.dst, seed=args.seed)
    rng = np.random.RandomState(args.seed)

    def train_on(state, data, epochs):
        dg = dgraph.device_graph()
        for _ in range(epochs):
            for batch in get_batches(data, batch_size, neg, rng=rng):
                state, loss, _, _ = trainer.train_step(state, dg, nfj,
                                                       efj, batch)
        return state, float(loss)

    # phase-1 checkpoint/resume (online_edge_prediction.py:259-294)
    from gnnflow_tpu.models import memory as memory_lib
    from gnnflow_tpu.utils.checkpoint import (load_checkpoint,
                                              save_checkpoint)
    ckpt_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "..", f"{args.model}_online_phase1.ckpt")
    if os.path.exists(ckpt_path):
        ckpt = load_checkpoint(ckpt_path)
        state = state.replace(
            params=jax.tree.map(jnp.asarray, ckpt["params"]),
            memory=(memory_lib.restore_memory(ckpt["memory"])
                    if ckpt["memory"] else state.memory))
        logging.info("phase 1: resumed from %s", ckpt_path)
    else:
        logging.info("phase 1: pretraining on %d edges", len(phase1))
        t0 = time.time()
        state, loss = train_on(state, phase1, args.epoch)
        logging.info("phase 1 done in %.1fs (loss %.4f)",
                     time.time() - t0, loss)
        mem_bk = (memory_lib.backup_memory(state.memory)
                  if state.memory is not None else None)
        save_checkpoint(ckpt_path, state.params, mem_bk)

    aps, aucs = [], []
    seen = phase1
    for step in range(args.phase2_steps):
        lo = p1_end + step * chunk_size
        hi = min(lo + chunk_size, n)
        if lo >= n:
            break
        chunk = full[lo:hi]
        # 1) prequential evaluation on the incoming chunk (graph still
        #    reflects only the past)
        scores, labels = [], []
        for batch in get_batches(chunk, batch_size, neg):
            state, _, pos, negs = trainer.eval_step(
                state, dgraph.device_graph(), nfj, efj, batch)
            k = batch.num_valid
            scores += [np.asarray(pos)[:k], np.asarray(negs)[:k]]
            labels += [np.ones(k), np.zeros(k)]
        y, t = np.concatenate(scores), np.concatenate(labels)
        ap = average_precision_score(t, y)
        auc = roc_auc_score(t, y)
        aps.append(ap)
        aucs.append(auc)
        # 2) ingest the chunk
        dgraph.add_edges(chunk.src, chunk.dst, chunk.time, chunk.eid,
                         add_reverse=data_config["undirected"])
        neg.add_dst_list(chunk.dst)
        seen = seen.concat(chunk)
        # 3) optional retraining with replay + sliding window
        if args.retrain_interval and \
                (step + 1) % args.retrain_interval == 0:
            if args.time_window > 0:
                evicted = dgraph.offload_old_blocks(
                    float(chunk.time[-1]) - args.time_window)
                logging.info("step %d: evicted %d old edges", step,
                             evicted)
            n_replay = int(len(chunk) * args.replay_ratio)
            if n_replay > 0 and len(seen) > len(chunk):
                idx = np.sort(rng.choice(
                    len(seen) - len(chunk), size=n_replay, replace=False))
                replay = seen[idx]
                retrain = replay.concat(chunk)
                order = np.argsort(retrain.time, kind="stable")
                retrain = retrain[order]
            else:
                retrain = chunk
            state, loss = train_on(state, retrain, args.epoch)
            logging.info("step %d: retrained on %d edges (loss %.4f)",
                         step, len(retrain), loss)
        if (step + 1) % 10 == 0:
            logging.info("step %d: AP %.4f (mean %.4f) AUC %.4f", step,
                         ap, np.mean(aps), auc)

    logging.info("phase 2 complete: mean AP %.4f mean AUC %.4f over %d "
                 "steps", np.mean(aps), np.mean(aucs), len(aps))


if __name__ == "__main__":
    main()
