"""Multi-process (multi-host) partitioned training — the torchrun analogue.

Counterpart of the reference's multi-node launch
(``/root/reference/scripts/run_offline_multi_node.sh`` +
``offline_edge_prediction_multi_node_kvstore.py``): one OS process per
host, rendezvous at a coordinator, then a single SPMD program over the
global device mesh.  Each process ingests only the graph partitions its
local devices own (per-machine ingestion, ``dispatcher.py:62-73``); the
partition table is computed identically everywhere by a deterministic
partitioner — no rank-0 broadcast needed (verified by digest).

Launch (one command per host / per process):

    python scripts/offline_edge_prediction_multiprocess.py \
        --coordinator HOST0:12345 --num-processes 2 --process-id $i

On a real TPU pod slice, omit ``--platform``/``--local-device-count``
(each process finds its local chips).  For CPU validation:

    XLA_FLAGS=--xla_force_host_platform_device_count=4 \
    python scripts/offline_edge_prediction_multiprocess.py \
        --coordinator localhost:12345 --num-processes 2 --process-id $i \
        --platform cpu
"""
import argparse
import logging
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

parser = argparse.ArgumentParser()
parser.add_argument("--model", default="TGN")
parser.add_argument("--data", default="SYNTHETIC")
parser.add_argument("--data-dir", default=None)
parser.add_argument("--epoch", type=int, default=3)
parser.add_argument("--lr", type=float, default=1e-4)
parser.add_argument("--seed", type=int, default=42)
parser.add_argument("--coordinator", required=True)
parser.add_argument("--num-processes", type=int, required=True)
parser.add_argument("--process-id", type=int, required=True)
parser.add_argument("--partition-strategy", default="hash",
                    choices=["hash", "roundrobin"],
                    help="must be deterministic + state-free so every "
                         "process derives the same table")
parser.add_argument("--sampling-mode", default="routed",
                    choices=["routed", "replicated"])
parser.add_argument("--cache", default=None,
                    help="LRUCache|LFUCache|FIFOCache — features stay in "
                         "the process-spanning sharded KV store and reach "
                         "the model through a cache buffer (misses = "
                         "sharded pulls), the reference's KV-backed cache "
                         "(gnnflow/cache/cache.py:364-377). Each process "
                         "keeps a full graph replica for host sampling "
                         "(the per-machine shared graph).")
parser.add_argument("--edge-cache-ratio", type=float, default=0.2)
parser.add_argument("--node-cache-ratio", type=float, default=0.2)
parser.add_argument("--ingestion-batch-size", type=int, default=100_000)
parser.add_argument("--synthetic-edges", type=int, default=50_000)
parser.add_argument("--max-steps", type=int, default=0,
                    help="truncate each epoch (smoke tests)")
parser.add_argument("--platform", default=None)
args = parser.parse_args()

if args.platform:
    import jax
    jax.config.update("jax_platforms", args.platform)

logging.basicConfig(
    level=logging.INFO,
    format=f"%(asctime)s p{args.process_id} %(levelname)s %(message)s")


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec as P

    from gnnflow_tpu.config import get_default_config
    from gnnflow_tpu.data import (DstRandEdgeSampler, get_batches,
                                  load_dataset, load_feat,
                                  make_synthetic_dataset)
    from gnnflow_tpu.models import build_model
    from gnnflow_tpu.parallel import (PartitionedDynamicGraph,
                                      get_partitioner)
    from gnnflow_tpu.parallel.dist_context import (
        dispatch_full_dataset_multiprocess, global_mesh, initialize,
        shutdown)
    from gnnflow_tpu.parallel.partitioned_trainer import PartitionedTrainer
    from gnnflow_tpu.utils import (average_precision_score, roc_auc_score)

    pid, nproc = initialize(args.coordinator, args.num_processes,
                            args.process_id)
    n_dev = jax.device_count()
    mesh = global_mesh()
    logging.info("global mesh: %d devices over %d processes", n_dev,
                 nproc)

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
        train_d, val_d, _, full, node_feats, edge_feats = \
            make_synthetic_dataset(num_src=2000, num_dst=500,
                                   num_edges=args.synthetic_edges,
                                   dim_edge=100, seed=args.seed)
        ext_roll = np.zeros(len(full), np.int64)
        ext_roll[len(train_d):len(train_d) + len(val_d)] = 1
        ext_roll[len(train_d) + len(val_d):] = 2

    partitioner = get_partitioner(args.partition_strategy, n_dev)
    pg = PartitionedDynamicGraph(n_dev, mesh=mesh, local_only=True,
                                 **data_config)
    t0 = time.time()
    train_data, store = dispatch_full_dataset_multiprocess(
        full, ext_roll, partitioner, pg, mesh,
        node_feats=node_feats, edge_feats=edge_feats,
        ingestion_batch_size=args.ingestion_batch_size,
        undirected=data_config["undirected"])
    logging.info("dispatch done in %.1fs (%d local edges in %d owned "
                 "partitions)", time.time() - t0, pg.num_edges(),
                 len(pg.owned))

    num_nodes = pg.max_vertex_id() + 1
    dim_node = 0 if node_feats is None else node_feats.shape[1]
    dim_edge = 0 if edge_feats is None else edge_feats.shape[1]
    model, sampler_kwargs = build_model(args.model, model_config,
                                        dim_node, dim_edge)
    batch_size = model_config["batch_size"]
    batch_size -= batch_size % n_dev
    lr = args.lr * math.sqrt(n_dev)
    trainer = PartitionedTrainer(model, mesh, lr=lr,
                                 sampling_mode=args.sampling_mode,
                                 **sampler_kwargs)

    dg = pg.device_graph()
    state = trainer.init_state(jax.random.PRNGKey(args.seed), dg,
                               batch_size, store.node_array,
                               store.edge_array, num_nodes=num_nodes)
    logging.info("state initialized (first compile done)")

    cache = sampler = None
    if args.cache:
        # multi-process KV-backed cache: every process replays the full
        # edge stream into a LOCAL graph replica (the reference's
        # per-machine shared graph) and samples on host; the feature
        # MASTERS stay sharded across the processes (store.*_table) and
        # cache misses become sharded pulls over the global mesh.
        from gnnflow_tpu.cache import CACHES
        from gnnflow_tpu.dynamic_graph import build_dynamic_graph
        from gnnflow_tpu.parallel.kvstore import put_global
        from gnnflow_tpu.temporal_sampler import TemporalSampler

        local_g = build_dynamic_graph(**data_config)
        step = args.ingestion_batch_size
        for lo in range(0, len(full), step):
            chunk = full[lo: lo + step]
            local_g.add_edges(chunk.src, chunk.dst, chunk.time,
                              chunk.eid,
                              add_reverse=data_config["undirected"])
        sampler = TemporalSampler(local_g, **sampler_kwargs)
        cache = CACHES[args.cache](
            args.edge_cache_ratio, args.node_cache_ratio, num_nodes,
            len(full),
            store.node_table if node_feats is not None else None,
            store.edge_table if edge_feats is not None else None)
        cache.edge_major = trainer._edge_major
        cache.init_cache()

        def glob(x):
            return put_global(np.asarray(x), mesh, P())

        def cached_step(state, batch, train):
            mfgs = sampler.sample(batch.target_nodes, batch.ts)
            nfs, efs = cache.fetch_feature(mfgs, batch.eids)
            mfgs_g = jax.tree.map(glob, mfgs)
            valid = np.zeros(batch.batch_size, bool)
            valid[: batch.num_valid] = True
            return trainer._pre_step(
                state, mfgs_g, nfs, efs, cache.target_edge_features,
                glob(np.asarray(batch.eids, np.int32)), glob(valid),
                train)

    train_neg = DstRandEdgeSampler(train_data.dst, seed=args.seed)
    val_neg = DstRandEdgeSampler(full.dst, seed=args.seed + 1)
    rng = np.random.RandomState(args.seed)
    val_data = full[int(np.searchsorted(ext_roll, 1)):
                    int(np.searchsorted(ext_roll, 2))]

    def to_host(x):
        return np.asarray(multihost_utils.global_array_to_host_local_array(
            x, mesh, P()))

    import gnnflow_tpu.models.memory as memory_lib
    from gnnflow_tpu.parallel import routed_load_stats
    pt_host = np.asarray(pg._pt)
    if args.sampling_mode == "routed":
        logging.info("routed capacity_factor: %.2f",
                     trainer.capacity_factor)
    for epoch in range(args.epoch):
        t0 = time.time()
        total = 0
        cvs, overflow, fallbacks, nb = [], 0, 0, 0
        if epoch > 0 and state.memory is not None:
            state = state.replace(
                memory=memory_lib.reset_memory(state.memory))
        if cache is not None:
            cache.reset()
        last_loss = None
        for i, batch in enumerate(get_batches(train_data, batch_size,
                                              train_neg, rng=rng)):
            if cache is not None:
                state, loss, _, _ = cached_step(state, batch, True)
                total += 3 * batch.num_valid
                last_loss = loss
                if args.max_steps and i + 1 >= args.max_steps:
                    break
                continue
            if args.sampling_mode == "routed":
                # per-owner routed-load observability (the reference's
                # sampling-time CV analogue, dist_sampler.py:108-127);
                # batches are process-identical so no all-gather needed
                s = routed_load_stats(pt_host, batch.target_nodes,
                                      n_dev, trainer.capacity_factor)
                cvs.append(s["cv"])
                overflow += s["overflow"]
                fallbacks += int(s["fallback"])
                nb += 1
            state, loss, _, _ = trainer.train_step(
                state, dg, store.node_array, store.edge_array, batch)
            total += 3 * batch.num_valid
            last_loss = loss
            if args.max_steps and i + 1 >= args.max_steps:
                break
        last = float(to_host(last_loss))  # value fetch ends timing
        dt = time.time() - t0
        if cvs:
            logging.info(
                "epoch %d sampling load: CV %.3f (max %.3f), overflow "
                "roots %d, replicated-fallback batches %d/%d", epoch,
                float(np.mean(cvs)), float(np.max(cvs)), overflow,
                fallbacks, nb)
        # layer-dedup engagement + drift re-calibration (same feedback
        # loop as the offline/partitioned scripts; works multi-host
        # since round 5 — probe batches are process-uniform host values)
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
        scores, labels = [], []
        for i, batch in enumerate(get_batches(val_data, batch_size,
                                              val_neg)):
            if cache is not None:
                state, _, pos, neg = cached_step(state, batch, False)
            else:
                state, _, pos, neg = trainer.eval_step(
                    state, dg, store.node_array, store.edge_array, batch)
            k = batch.num_valid
            scores += [to_host(pos)[:k], to_host(neg)[:k]]
            labels += [np.ones(k), np.zeros(k)]
            if args.max_steps and i + 1 >= args.max_steps:
                break
        ap = average_precision_score(np.concatenate(labels),
                                     np.concatenate(scores))
        auc = roc_auc_score(np.concatenate(labels),
                            np.concatenate(scores))
        logging.info("epoch %d: %.2fs, %.0f samples/s, loss %.6f, "
                     "val ap %.4f auc %.4f", epoch, dt, total / dt,
                     last, ap, auc)
        if cache is not None:
            logging.info("cache node hit %.3f edge hit %.3f",
                         cache.cache_node_ratio, cache.cache_edge_ratio)
        print(f"RESULT epoch={epoch} loss={last:.6f} ap={ap:.6f}",
              flush=True)
    shutdown()


if __name__ == "__main__":
    main()
