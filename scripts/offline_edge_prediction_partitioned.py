"""Partitioned (multi-worker) temporal link-prediction training.

Counterpart of
``/root/reference/scripts/offline_edge_prediction_multi_node_kvstore.py``:
the graph is partitioned across mesh devices by a streaming partitioner,
features and TGN memory are sharded KV tables, sampling is distributed
(shard_map psum-merge), and the batch is data-parallel — all inside one
fused jitted step.

On a single-chip machine, validate with a virtual mesh:
``JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8
python scripts/offline_edge_prediction_partitioned.py --num-devices 8``.
On a real multi-chip/multi-host slice the same program runs over ICI/DCN.
"""
import argparse
import logging
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from gnnflow_tpu.config import get_default_config
from gnnflow_tpu.data import (DstRandEdgeSampler, get_batches, load_dataset,
                              load_feat, make_synthetic_dataset)
from gnnflow_tpu.models import build_model
from gnnflow_tpu.utils import average_precision_score, roc_auc_score

parser = argparse.ArgumentParser()
parser.add_argument("--model", default="TGN")
parser.add_argument("--data", default="SYNTHETIC")
parser.add_argument("--data-dir", default=None)
parser.add_argument("--epoch", type=int, default=5)
parser.add_argument("--lr", type=float, default=1e-4)
parser.add_argument("--seed", type=int, default=42)
parser.add_argument("--num-devices", type=int, default=None)
parser.add_argument("--partition-strategy", default="hash",
                    choices=["hash", "roundrobin", "edgecount",
                             "timestampsum", "timestampavg", "fennel",
                             "fennel_edge", "metis"])
parser.add_argument("--sampling-mode", default="routed",
                    choices=["routed", "replicated"],
                    help="routed = owner-routed all-to-all (O(B/P) "
                         "per-device work); replicated = psum-merge")
parser.add_argument("--capacity-factor", default="auto",
                    help="routed bucket capacity factor; 'auto' derives "
                         "it from the partition-table histogram")
parser.add_argument("--ingestion-batch-size", type=int, default=100_000)
parser.add_argument("--synthetic-edges", type=int, default=100_000)
parser.add_argument("--platform", default=None,
                    help="force jax platform (e.g. cpu for a virtual "
                         "multi-device mesh via XLA_FLAGS)")
args = parser.parse_args()

if args.platform:
    import jax
    jax.config.update("jax_platforms", args.platform)

logging.basicConfig(level=logging.INFO,
                    format="%(asctime)s %(levelname)s %(message)s")


def main():
    import jax
    import jax.numpy as jnp

    from gnnflow_tpu.parallel import (PartitionedDynamicGraph,
                                      ShardedFeatureStore,
                                      dispatch_full_dataset,
                                      get_partitioner, make_mesh,
                                      shard_memory_state)
    from gnnflow_tpu.parallel.partition import partition_metrics
    from gnnflow_tpu.parallel.partitioned_trainer import PartitionedTrainer

    model_config, data_config = get_default_config(args.model, "synthetic")
    try:
        model_config, data_config = get_default_config(
            args.model, args.data.lower())
    except AssertionError:
        pass

    if args.data != "SYNTHETIC":
        train_d, val_d, test_d, full = load_dataset(args.data,
                                                    args.data_dir)
        node_feats, edge_feats = load_feat(args.data, args.data_dir)
        ext_roll = np.concatenate([
            np.zeros(len(train_d), np.int64),
            np.ones(len(val_d), np.int64),
            np.full(len(test_d), 2, np.int64)])
    else:
        train_d, val_d, test_d, full, node_feats, edge_feats = \
            make_synthetic_dataset(num_src=2000, num_dst=500,
                                   num_edges=args.synthetic_edges,
                                   dim_edge=100, seed=args.seed)
        ext_roll = np.zeros(len(full), np.int64)
        ext_roll[len(train_d):len(train_d) + len(val_d)] = 1
        ext_roll[len(train_d) + len(val_d):] = 2

    n_dev = args.num_devices or len(jax.devices())
    mesh = make_mesh(n_dev)
    logging.info("mesh: %d devices (%s)", n_dev, jax.devices()[0])

    partitioner = get_partitioner(args.partition_strategy, n_dev)
    pg = PartitionedDynamicGraph(n_dev, mesh=mesh, **data_config)
    t0 = time.time()
    train_data, store = dispatch_full_dataset(
        full, ext_roll, partitioner, pg, mesh,
        node_feats=node_feats, edge_feats=edge_feats,
        ingestion_batch_size=args.ingestion_batch_size,
        undirected=data_config["undirected"])
    m = partition_metrics(partitioner, full.src, full.dst)
    logging.info("dispatch done in %.1fs; load factor %.3f edge-cut "
                 "%.1f%%", time.time() - t0, m["load_factor"],
                 m["edge_cut"] * 100)

    num_nodes = pg.max_vertex_id() + 1
    dim_node = 0 if node_feats is None else node_feats.shape[1]
    dim_edge = 0 if edge_feats is None else edge_feats.shape[1]
    model, sampler_kwargs = build_model(args.model, model_config,
                                        dim_node, dim_edge)
    batch_size = model_config["batch_size"]
    batch_size -= batch_size % n_dev
    lr = args.lr * math.sqrt(n_dev)
    cf = args.capacity_factor
    if cf != "auto":
        cf = float(cf)
    trainer = PartitionedTrainer(model, mesh, lr=lr,
                                 sampling_mode=args.sampling_mode,
                                 capacity_factor=cf,
                                 **sampler_kwargs)

    dg = pg.device_graph()
    state = trainer.init_state(jax.random.PRNGKey(args.seed), dg,
                               batch_size, store.node_array,
                               store.edge_array, num_nodes=num_nodes)
    if state.memory is not None:
        state = state.replace(
            memory=shard_memory_state(state.memory, mesh))

    train_neg = DstRandEdgeSampler(train_data.dst, seed=args.seed)
    val_neg = DstRandEdgeSampler(full.dst, seed=args.seed + 1)
    rng = np.random.RandomState(args.seed)
    val_data = full[int(np.searchsorted(ext_roll, 1)):
                    int(np.searchsorted(ext_roll, 2))]

    import gnnflow_tpu.models.memory as memory_lib
    from gnnflow_tpu.parallel import routed_load_stats
    pt_host = np.asarray(dg.partition_table)
    if args.sampling_mode == "routed":
        logging.info("routed capacity_factor: %.2f%s",
                     trainer.capacity_factor,
                     " (auto from partition histogram)"
                     if args.capacity_factor == "auto" else "")
    for epoch in range(args.epoch):
        t0 = time.time()
        total = 0
        cvs, overflow, fallbacks, nbatches = [], 0, 0, 0
        # reference protocol: reset TGN memory at each epoch start after
        # the first (offline_edge_prediction.py:355-363)
        if epoch > 0 and state.memory is not None:
            state = state.replace(
                memory=memory_lib.reset_memory(state.memory))
        for batch in get_batches(train_data, batch_size, train_neg,
                                 rng=rng):
            if args.sampling_mode == "routed":
                # sampling-load observability: per-owner routed root
                # counts (the reference's per-worker sampling-time CV,
                # dist_sampler.py:108-127) + skew-guard fallback audit
                s = routed_load_stats(pt_host, batch.target_nodes,
                                      n_dev, trainer.capacity_factor)
                cvs.append(s["cv"])
                overflow += s["overflow"]
                fallbacks += int(s["fallback"])
                nbatches += 1
            state, loss, _, _ = trainer.train_step(
                state, dg, store.node_array, store.edge_array, batch)
            total += 3 * batch.num_valid
        jax.block_until_ready(state.params)
        dt = time.time() - t0
        if cvs:
            logging.info(
                "epoch %d sampling load: CV %.3f (max %.3f), overflow "
                "roots %d, replicated-fallback batches %d/%d", epoch,
                float(np.mean(cvs)), float(np.max(cvs)), overflow,
                fallbacks, nbatches)
        # layer-dedup engagement + drift re-calibration (same feedback
        # loop as the single-store offline script)
        tstats = trainer.tier_take_stats(state)
        if tstats and tstats["total"]:
            logging.info(
                "epoch %d layer-dedup takes %s (tiers %s, fallback "
                "rate %.2f)", epoch, tstats["counts"], tstats["tiers"],
                tstats["fallback_rate"])
            state = trainer.maybe_recalibrate(
                state, dg,
                np.concatenate([train_data.src[-batch_size:],
                                train_data.dst[-batch_size:],
                                train_data.dst[-batch_size:]]),
                np.tile(train_data.time[-batch_size:], 3))
        # validation
        scores, labels = [], []
        for batch in get_batches(val_data, batch_size, val_neg):
            state, _, pos, neg = trainer.eval_step(
                state, dg, store.node_array, store.edge_array, batch)
            k = batch.num_valid
            scores += [np.asarray(pos)[:k], np.asarray(neg)[:k]]
            labels += [np.ones(k), np.zeros(k)]
        ap = average_precision_score(np.concatenate(labels),
                                     np.concatenate(scores))
        auc = roc_auc_score(np.concatenate(labels),
                            np.concatenate(scores))
        logging.info("epoch %d: %.2fs, %.0f samples/s, val ap %.4f "
                     "auc %.4f", epoch, dt, total / dt, ap, auc)


if __name__ == "__main__":
    main()
