"""Offline temporal link-prediction training.

TPU-native counterpart of
``/root/reference/scripts/offline_edge_prediction.py``: same CLI surface
(model/data/epochs/lr/cache flags), same protocol (chronological batches
with random epoch start, per-epoch validation, best-AP checkpointing with
memory backup, early stopping, final test AP/AUC), but executed as one
fused jitted step per iteration — no sampling threads or pinned staging.

Multi-device: ``--num-devices N`` shards the batch over a data mesh
(the DDP analogue); lr is scaled by sqrt(N) like the reference
(``offline_edge_prediction.py:196``).

Datasets: reads the reference's ``edges.csv`` format from ``--data-dir``;
``--data SYNTHETIC`` (or a missing dataset directory) generates a
deterministic synthetic interaction stream of comparable shape.
"""
import argparse
import faulthandler
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
from gnnflow_tpu.dynamic_graph import build_dynamic_graph
from gnnflow_tpu.models import build_model
from gnnflow_tpu.train import Trainer, pad_feature_table
from gnnflow_tpu.utils import (EarlyStopMonitor, average_precision_score,
                               roc_auc_score)
from gnnflow_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

datasets = ["REDDIT", "GDELT", "LASTFM", "MAG", "MOOC", "WIKI", "SYNTHETIC"]
model_names = ["TGN", "TGAT", "DySAT", "GRAPHSAGE", "GAT", "APAN"]

parser = argparse.ArgumentParser()
parser.add_argument("--model", choices=model_names, required=True)
parser.add_argument("--data", choices=datasets, required=True)
parser.add_argument("--data-dir", default=None)
parser.add_argument("--epoch", type=int, default=50)
parser.add_argument("--lr", type=float, default=0.0001)
parser.add_argument("--num-chunks", type=int, default=8)
parser.add_argument("--print-freq", type=int, default=100)
parser.add_argument("--seed", type=int, default=42)
parser.add_argument("--ingestion-batch-size", type=int, default=1000)
parser.add_argument("--num-devices", type=int, default=1)
parser.add_argument("--cache", default=None,
                    help="LRUCache|LFUCache|FIFOCache|GNNLabStaticCache")
parser.add_argument("--pipeline", action="store_true",
                    help="prefetch sampling+feature-fetch of batch k+1 "
                         "on a worker thread while batch k trains "
                         "(cache mode only; the reference's sampling "
                         "thread, offline_edge_prediction.py:343-399)")
parser.add_argument("--edge-cache-ratio", type=float, default=0)
parser.add_argument("--calibrate", action="store_true",
                    help="measure deeper-layer occupancy + (nid,ts) "
                         "duplication on a few real batches and pick the "
                         "static compaction factors before training")
parser.add_argument("--cache-transfer-dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="stream cache-miss rows host->device as bf16 "
                         "(half the transfer bytes; values round to bf16)")
parser.add_argument("--node-cache-ratio", type=float, default=0)
parser.add_argument("--snapshot-time-window", type=float, default=0)
parser.add_argument("--synthetic-edges", type=int, default=100_000)
parser.add_argument("--synthetic-dim-edge", type=int, default=100)
parser.add_argument("--features-on-host", action="store_true",
                    help="keep the feature tables host-resident and feed "
                         "the model through the cache only (GDELT/MAG "
                         "scale: tables larger than HBM; requires "
                         "--cache).  The reference's cpu/pinned feature "
                         "placement (gnnflow/utils.py:103-151)")
parser.add_argument("--memory-storage", default="float32",
                    choices=["float32", "bfloat16"],
                    help="bfloat16 halves the memory table's HBM "
                         "footprint (capacity knob for GDELT/MAG-scale "
                         "node counts; float32 is faster when it fits)")
parser.add_argument("--remat-attention", action="store_true",
                    help="jax.checkpoint the attention layers: recompute "
                         "K/V + time encodings in backward instead of "
                         "saving the [B, F, *] intermediates (memory "
                         "knob for deep/wide configs)")
parser.add_argument("--use-scan", action="store_true",
                    help="run each epoch as one lax.scan dispatch "
                         "(fastest; per-iteration logs unavailable)")
args = parser.parse_args()

logging.basicConfig(level=logging.INFO,
                    format="%(asctime)s %(levelname)s %(message)s")
if os.environ.get("GNNFLOW_WATCHDOG"):
    faulthandler.dump_traceback_later(int(os.environ["GNNFLOW_WATCHDOG"]),
                                      repeat=True)
checkpoint_path = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..",
    f"{args.model}.ckpt")


def load_data():
    name = args.data.lower()
    if args.data != "SYNTHETIC":
        try:
            train, val, test, full = load_dataset(args.data, args.data_dir)
            nf, ef = load_feat(args.data, args.data_dir)
            return train, val, test, full, nf, ef, name
        except ValueError:
            logging.warning("dataset %s not found on disk; generating a "
                            "synthetic stream instead", args.data)
    dim_node = 100 if args.model in ("GRAPHSAGE", "GAT") else 0
    train, val, test, full, nf, ef = make_synthetic_dataset(
        num_src=2000, num_dst=500, num_edges=args.synthetic_edges,
        dim_edge=args.synthetic_dim_edge, dim_node=dim_node,
        seed=args.seed)
    return train, val, test, full, nf, ef, "synthetic"


def main():
    import jax
    import jax.numpy as jnp

    np.random.seed(args.seed)
    model_config, data_config = get_default_config(args.model, "synthetic")
    try:
        model_config, data_config = get_default_config(
            args.model, args.data.lower())
    except AssertionError:
        pass
    if args.snapshot_time_window:
        model_config["snapshot_time_window"] = args.snapshot_time_window
    if args.remat_attention:
        model_config["remat_attention"] = True

    train_data, val_data, test_data, full_data, node_feats, edge_feats, \
        dname = load_data()
    logging.info("dataset %s: %d train / %d val / %d test edges",
                 dname, len(train_data), len(val_data), len(test_data))

    dgraph = build_dynamic_graph(**data_config)
    t0 = time.time()
    step = args.ingestion_batch_size
    for lo in range(0, len(full_data), step):
        chunk = full_data[lo: lo + step]
        dgraph.add_edges(chunk.src, chunk.dst, chunk.time, chunk.eid,
                         add_reverse=data_config["undirected"])
    logging.info("graph built in %.2fs: %d vertices, %d edges, %.1f MiB",
                 time.time() - t0, dgraph.num_vertices(),
                 dgraph.num_edges(),
                 dgraph.get_graph_memory_usage() / (1 << 20))

    num_nodes = dgraph.max_vertex_id() + 1
    dim_node = 0 if node_feats is None else node_feats.shape[1]
    dim_edge = 0 if edge_feats is None else edge_feats.shape[1]

    model, sampler_kwargs = build_model(args.model, model_config,
                                        dim_node, dim_edge)
    batch_size = model_config["batch_size"]
    lr = args.lr * math.sqrt(args.num_devices)
    trainer = Trainer(model, lr=lr,
                      memory_storage=args.memory_storage,
                      **sampler_kwargs)

    if args.features_on_host:
        if not args.cache:
            parser.error("--features-on-host requires --cache (features "
                         "reach the model only through the cache buffer)")
        nfj = efj = None  # tables never leave the host
    else:
        nfj = pad_feature_table(node_feats)
        efj = pad_feature_table(edge_feats)
    dg = dgraph.device_graph()

    logging.info("initializing model/optimizer state (first compile)...")
    t0 = time.time()
    state = trainer.init_state(jax.random.PRNGKey(args.seed), dg,
                               batch_size, nfj, efj, num_nodes=num_nodes)
    jax.block_until_ready(state.params)
    logging.info("init_state done in %.1fs", time.time() - t0)

    if args.num_devices > 1:
        from gnnflow_tpu.parallel import make_mesh, shard_trainer
        shard_trainer(trainer, make_mesh(args.num_devices))
        logging.info("data-parallel over %d devices", args.num_devices)

    cache = None
    if args.cache:
        from gnnflow_tpu.cache import CACHES
        from gnnflow_tpu.temporal_sampler import TemporalSampler
        cache = CACHES[args.cache](
            args.edge_cache_ratio, args.node_cache_ratio, num_nodes,
            dgraph.num_edges(), node_feats, edge_feats,
            transfer_dtype=args.cache_transfer_dtype)
        cache.edge_major = trainer._edge_major
        sampler = TemporalSampler(dgraph, **{
            k: v for k, v in sampler_kwargs.items()})
        if args.cache == "GNNLabStaticCache":
            cache.init_cache(sampler=sampler, train_data=train_data,
                             pre_sampling_rounds=2, batch_size=batch_size)
        else:
            cache.init_cache()
        logging.info("cache mem size: %.2f MB",
                     cache.get_mem_size() / 1e6)

    # The Trainer auto-calibrates on the first real batch with no flag;
    # this explicit pass (windowed configs + --calibrate) measures LATE
    # batches instead — occupancy grows over the stream, so end-of-stream
    # stats pick safer caps — and suppresses the in-trainer pass.
    auto_cal = (model_config.get("num_snapshots", 1) > 1
                and model_config.get("snapshot_time_window", 0) > 0)
    if args.calibrate or auto_cal:
        cal_neg = DstRandEdgeSampler(train_data.dst, seed=args.seed)
        cal = trainer.calibrate(
            dg, list(get_batches(train_data, batch_size,
                                 cal_neg))[-3:])
        logging.info("calibration: %s", cal)

    train_neg = DstRandEdgeSampler(train_data.dst, seed=args.seed)
    val_neg = DstRandEdgeSampler(full_data.dst, seed=args.seed + 1)
    test_neg = DstRandEdgeSampler(full_data.dst, seed=args.seed + 2)
    rng = np.random.RandomState(args.seed)

    def run_eval(state, data, neg_sampler):
        scores, labels = [], []
        loss_sum = 0.0
        for batch in get_batches(data, batch_size, neg_sampler):
            if cache is not None:
                mfgs = sampler.sample(batch.target_nodes, batch.ts)
                nfs, efs = cache.fetch_feature(mfgs, batch.eids)
                state, loss, pos, neg = trainer.train_step_prefetched(
                    state, mfgs, nfs, efs, cache.target_edge_features,
                    batch, train=False)
            else:
                state, loss, pos, neg = trainer.eval_step(
                    state, dg, nfj, efj, batch)
            k = batch.num_valid
            sig = 1 / (1 + np.exp(-np.concatenate(
                [np.asarray(pos)[:k], np.asarray(neg)[:k]])))
            scores.append(sig)
            labels.append(np.concatenate([np.ones(k), np.zeros(k)]))
            loss_sum += float(loss)
        y, t = np.concatenate(scores), np.concatenate(labels)
        return state, average_precision_score(t, y), roc_auc_score(t, y), \
            loss_sum

    best_ap, best_e = 0.0, 0
    early_stopper = EarlyStopMonitor()
    import gnnflow_tpu.models.memory as memory_lib

    logging.info("starting training loop")
    from gnnflow_tpu.utils.profiling import PhaseTimer
    timer = PhaseTimer()

    for epoch in range(args.epoch):
        epoch_start = time.time()
        total_samples = 0
        it = 0
        if cache is not None:
            cache.reset()
        # the reference resets TGN memory/mailbox at every epoch start
        # after the first (model.reset(), offline_edge_prediction.py:355-363)
        # so validation-pass state never leaks into the next train epoch
        if epoch > 0 and state.memory is not None:
            state = state.replace(
                memory=memory_lib.reset_memory(state.memory))
        if args.use_scan and cache is None:
            # stage the epoch's batches, run it as one dispatch
            with timer("stage"):
                staged = []
                for batch in get_batches(train_data, batch_size,
                                         train_neg,
                                         num_chunks=args.num_chunks,
                                         rng=rng):
                    v = np.zeros(batch.batch_size, bool)
                    v[: batch.num_valid] = True
                    staged.append((batch.target_nodes, batch.ts,
                                   batch.eids, v))
                    total_samples += 3 * batch.num_valid
                TN = jnp.asarray(np.stack([s[0] for s in staged]),
                                 jnp.int32)
                TS = jnp.asarray(np.stack([s[1] for s in staged]),
                                 jnp.float32)
                EI = jnp.asarray(np.stack([s[2] for s in staged]),
                                 jnp.int32)
                VA = jnp.asarray(np.stack([s[3] for s in staged]))
            with timer("train"):
                state, losses = trainer.train_steps_scan(
                    state, dg, nfj, efj, TN, TS, EI, VA)
                loss = losses[-1]
                float(loss)
            it = TN.shape[0]
        elif cache is not None and args.pipeline:
            # prefetch pipeline: batch k+1's sample+fetch overlaps batch
            # k's device step (FeaturePipeline worker thread)
            from gnnflow_tpu.pipeline import FeaturePipeline
            pipe = FeaturePipeline(sampler, cache, depth=2)
            batches = get_batches(train_data, batch_size, train_neg,
                                  num_chunks=args.num_chunks, rng=rng)
            for batch, mfgs, nfs, efs, tef in pipe.run(batches):
                with timer("train"):
                    state, loss, _, _ = trainer.train_step_prefetched(
                        state, mfgs, nfs, efs, tef, batch)
                total_samples += 3 * batch.num_valid
                it += 1
                if it % args.print_freq == 0:
                    logging.info("epoch %d it %d loss %.4f", epoch, it,
                                 float(loss))
            jax.block_until_ready(state.params)
        else:
            for batch in get_batches(train_data, batch_size, train_neg,
                                     num_chunks=args.num_chunks,
                                     rng=rng):
                if cache is not None:
                    with timer("sample"):
                        mfgs = sampler.sample(batch.target_nodes,
                                              batch.ts)
                    with timer("feature"):
                        nfs, efs = cache.fetch_feature(mfgs, batch.eids)
                    with timer("train"):
                        state, loss, _, _ = \
                            trainer.train_step_prefetched(
                                state, mfgs, nfs, efs,
                                cache.target_edge_features, batch)
                else:
                    with timer("train"):
                        state, loss, _, _ = trainer.train_step(
                            state, dg, nfj, efj, batch)
                total_samples += 3 * batch.num_valid
                it += 1
                if it % args.print_freq == 0:
                    logging.info("epoch %d it %d loss %.4f", epoch, it,
                                 float(loss))
            jax.block_until_ready(state.params)
        epoch_time = time.time() - epoch_start
        logging.info("epoch %d phases: %s", epoch, timer.format())
        timer.reset()
        # in-loop layer-dedup feedback: log per-tier engagement and
        # re-calibrate the cap ladder when the stream drifted enough
        # that >30% of steps fell through to the padded path
        tstats = trainer.tier_take_stats(state)
        if tstats and tstats["total"]:
            logging.info(
                "epoch %d layer-dedup takes %s (tiers %s, "
                "fallback rate %.2f)", epoch, tstats["counts"],
                tstats["tiers"], tstats["fallback_rate"])
            state = trainer.maybe_recalibrate(
                state, dg,
                np.concatenate([train_data.src[-batch_size:],
                                train_data.dst[-batch_size:],
                                train_data.dst[-batch_size:]]),
                np.tile(train_data.time[-batch_size:], 3))
        state, ap, auc, val_loss = run_eval(state, val_data, val_neg)
        logging.info(
            "epoch %d: time %.2fs, throughput %.0f samples/s, "
            "val ap %.4f auc %.4f", epoch, epoch_time,
            total_samples / epoch_time, ap, auc)
        if cache is not None:
            logging.info("cache node hit %.3f edge hit %.3f",
                         cache.cache_node_ratio, cache.cache_edge_ratio)
        if ap > best_ap:
            best_ap, best_e = ap, epoch
            mem_bk = (memory_lib.backup_memory(state.memory)
                      if state.memory is not None else None)
            save_checkpoint(checkpoint_path, state.params, mem_bk,
                            {"epoch": epoch, "ap": ap})
        if early_stopper.early_stop_check(ap):
            logging.info("early stop at epoch %d (best %d)", epoch, best_e)
            break

    logging.info("loading best checkpoint (epoch %d)...", best_e)
    ckpt = load_checkpoint(checkpoint_path)
    state = state.replace(
        params=jax.tree.map(jnp.asarray, ckpt["params"]),
        memory=(memory_lib.restore_memory(ckpt["memory"])
                if ckpt["memory"] else state.memory))
    state, ap, auc, _ = run_eval(state, test_data, test_neg)
    logging.info("Test ap:%.4f  test auc:%.4f", ap, auc)


if __name__ == "__main__":
    main()
