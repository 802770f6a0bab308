"""Inference / evaluation of a trained checkpoint.

Counterpart of ``/root/reference/scripts/inference.py``: load a checkpoint,
compute test AP/AUC, optionally sweep snapshot time windows and dump
embeddings for offline visualization (the reference's t-SNE step,
``inference.py:173-232`` — we save the raw embeddings instead of plotting
since the image lacks display/network).
"""
import argparse
import faulthandler
import logging
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from gnnflow_tpu.config import get_default_config
from gnnflow_tpu.data import (DstRandEdgeSampler, get_batches, load_dataset,
                              load_feat, make_synthetic_dataset)
from gnnflow_tpu.dynamic_graph import build_dynamic_graph
from gnnflow_tpu.models import build_model
from gnnflow_tpu.train import Trainer
from gnnflow_tpu.utils import average_precision_score, roc_auc_score
from gnnflow_tpu.utils.checkpoint import load_checkpoint

parser = argparse.ArgumentParser()
parser.add_argument("--model", default="TGN")
parser.add_argument("--data", default="SYNTHETIC")
parser.add_argument("--data-dir", default=None)
parser.add_argument("--checkpoint", default=None)
parser.add_argument("--seed", type=int, default=42)
parser.add_argument("--synthetic-edges", type=int, default=100_000)
parser.add_argument("--time-windows", type=float, nargs="*", default=[0],
                    help="snapshot time windows to sweep")
parser.add_argument("--batch-size", type=int, default=None)
parser.add_argument("--dump-embeddings", default=None,
                    help="npz path: per-window node embeddings (+ scores), "
                         "the reference's t-SNE input "
                         "(inference.py:173-232)")
args = parser.parse_args()

logging.basicConfig(level=logging.INFO,
                    format="%(asctime)s %(levelname)s %(message)s")
if os.environ.get("GNNFLOW_WATCHDOG"):
    faulthandler.dump_traceback_later(int(os.environ["GNNFLOW_WATCHDOG"]),
                                      repeat=True)


def main():
    import jax
    import jax.numpy as jnp
    import gnnflow_tpu.models.memory as memory_lib

    model_config, data_config = get_default_config(args.model, "synthetic")
    try:
        model_config, data_config = get_default_config(
            args.model, args.data.lower())
    except AssertionError:
        pass

    if args.data != "SYNTHETIC":
        train, val, test, full = load_dataset(args.data, args.data_dir)
        node_feats, edge_feats = load_feat(args.data, args.data_dir)
    else:
        train, val, test, full, node_feats, edge_feats = \
            make_synthetic_dataset(num_src=2000, num_dst=500,
                                   num_edges=args.synthetic_edges,
                                   dim_edge=100, seed=args.seed)

    dgraph = build_dynamic_graph(**data_config)
    dgraph.add_edges(full.src, full.dst, full.time, full.eid,
                     add_reverse=data_config["undirected"])
    num_nodes = dgraph.max_vertex_id() + 1
    dim_node = 0 if node_feats is None else node_feats.shape[1]
    dim_edge = 0 if edge_feats is None else edge_feats.shape[1]
    nfj = jnp.asarray(node_feats) if node_feats is not None else None
    efj = jnp.asarray(edge_feats) if edge_feats is not None else None

    ckpt_path = args.checkpoint or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..",
        f"{args.model}.ckpt")

    dump = {}
    for window in args.time_windows:
        cfg = dict(model_config)
        if window:
            cfg["snapshot_time_window"] = window
        model, sampler_kwargs = build_model(args.model, cfg, dim_node,
                                            dim_edge)
        trainer = Trainer(model, **sampler_kwargs)
        dg = dgraph.device_graph()
        batch_size = args.batch_size or cfg["batch_size"]
        state = trainer.init_state(jax.random.PRNGKey(args.seed), dg,
                                   batch_size, nfj, efj,
                                   num_nodes=num_nodes)
        if os.path.exists(ckpt_path):
            ckpt = load_checkpoint(ckpt_path)
            state = state.replace(
                params=jax.tree.map(jnp.asarray, ckpt["params"]),
                memory=(memory_lib.restore_memory(ckpt["memory"])
                        if ckpt["memory"] else state.memory))
            logging.info("loaded checkpoint %s", ckpt_path)
        else:
            logging.warning("no checkpoint at %s; evaluating random init",
                            ckpt_path)

        neg = DstRandEdgeSampler(full.dst, seed=args.seed)
        scores, labels = [], []
        for batch in get_batches(test, batch_size, neg):
            state, _, pos, negs = trainer.eval_step(state, dg, nfj, efj,
                                                    batch)
            k = batch.num_valid
            scores += [np.asarray(pos)[:k], np.asarray(negs)[:k]]
            labels += [np.ones(k), np.zeros(k)]
        y, t = np.concatenate(scores), np.concatenate(labels)
        ap = average_precision_score(t, y)
        auc = roc_auc_score(t, y)
        logging.info("window %s: test ap %.4f auc %.4f", window, ap, auc)

        if args.dump_embeddings:
            # actual node embeddings via return_embed=True — the t-SNE
            # input of the reference (inference.py:173-232); one
            # (nids, embeddings) pair per swept window
            embeds, nids = [], []
            for batch in get_batches(test, batch_size, neg):
                e = np.asarray(trainer.embed_step(state, dg, nfj, efj,
                                                  batch))
                k = batch.num_valid
                b = batch.batch_size
                embeds += [e[:k], e[b: b + k]]          # src + dst blocks
                nids += [batch.target_nodes[:k],
                         batch.target_nodes[b: b + k]]
            dump[f"embeddings_w{window}"] = np.concatenate(embeds)
            dump[f"nids_w{window}"] = np.concatenate(nids)
            dump[f"scores_w{window}"] = y
            dump[f"labels_w{window}"] = t

    if args.dump_embeddings:
        np.savez(args.dump_embeddings, **dump)
        logging.info("saved embeddings to %s", args.dump_embeddings)


if __name__ == "__main__":
    main()
