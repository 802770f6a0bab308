"""Train-step throughput across the model family at reference configs.

Mirrors the reference's comparable-run matrix (``gnnflow/config.py``):
TGN (1-layer recent, batch 4000), TGAT (2-layer uniform, batch 600),
DySAT (2-layer 3-snapshot windowed prop_time, batch 600), APAN
(transformer updater + mailbox), GraphSAGE (static, [15,10]) — on the
REDDIT-scale synthetic stream, one chip.  Also reports each model at
batch 4000 (the reference's tiny TGAT/DySAT batches under-utilize any
accelerator; throughput at equal batch shows the hardware picture).
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

parser = argparse.ArgumentParser()
parser.add_argument("--repeats", type=int, default=30)
parser.add_argument("--platform", default=None)
parser.add_argument("--models", default="TGN,TGAT,DySAT,APAN,GRAPHSAGE")
args = parser.parse_args()

if args.platform:
    import jax
    jax.config.update("jax_platforms", args.platform)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from gnnflow_tpu.config import get_default_config
    from gnnflow_tpu.data import (DstRandEdgeSampler, get_batches,
                                  make_synthetic_dataset)
    from gnnflow_tpu.dynamic_graph import DynamicGraph
    from gnnflow_tpu.models.factory import build_model
    from gnnflow_tpu.train import Trainer, pad_feature_table

    num_src, num_dst, num_edges, dim_edge = 10_000, 984, 672_447, 172
    dim_node = 128   # static models (SAGE/GAT) consume node features
    train, _, _, full, nf_np, ef_np = make_synthetic_dataset(
        num_src=num_src, num_dst=num_dst, num_edges=num_edges,
        dim_node=dim_node, dim_edge=dim_edge, seed=42, time_scale=4.0)
    g = DynamicGraph(initial_pool_size=1 << 20,
                     maximum_pool_size=1 << 23, mem_resource_type="hbm",
                     minimum_block_size=62, insertion_policy="insert")
    g.add_edges(full.src, full.dst, full.time, full.eid,
                add_reverse=True)
    ef = pad_feature_table(ef_np)
    nf = pad_feature_table(nf_np)
    dg = g.device_graph()
    neg = DstRandEdgeSampler(train.dst, seed=1)
    results = {}

    def run(name, B):
        mc, _ = get_default_config(name, "REDDIT")
        mc["compute_dtype"] = "bfloat16"
        static = name.lower() in ("graphsage", "gat")
        dn = dim_node if static else 0
        model, skw = build_model(name, mc, dim_node=dn,
                                 dim_edge=dim_edge)
        trainer = Trainer(model, lr=1e-4, **skw)
        nfd = nf if static else None
        state = trainer.init_state(jax.random.PRNGKey(0), dg, B, nfd,
                                   ef, num_nodes=g.max_vertex_id() + 1)
        # stage 16 batches SPREAD over the epoch — early batches sample
        # from short histories and under-represent the steady-state cost
        # (boundary uniqueness grows 0.09 -> 0.83 over the stream with
        # uniform sampling; an early-batch-only measurement flattered
        # TGAT by ~40%)
        n_total = max(1, len(train) // B)
        stride = max(1, n_total // 16)
        batches = []
        for i, b in enumerate(get_batches(train, B, neg)):
            if i % stride:
                continue
            if len(batches) >= 16:
                break
            batches.append((jnp.asarray(b.target_nodes, jnp.int32),
                            jnp.asarray(b.ts, jnp.float32),
                            jnp.asarray(b.eids, jnp.int32)))
        valid = jnp.ones((B,), bool)
        tn, ts, eids = batches[0]
        # public wrapper => first-batch auto-calibration (the production
        # path: layer_dedup/window-compaction/transformer-dedup factors)
        s = trainer.train_step_arrays(state, dg, nfd, ef, tn, ts, eids,
                                      valid, True)
        _ = float(s[1])
        state = s[0]
        t0 = time.perf_counter()
        for i in range(args.repeats):
            btn, bts, beids = batches[i % len(batches)]
            state, loss, _, _ = trainer.train_step_arrays(
                state, dg, nfd, ef, btn, bts, beids, valid, True)
        lv = float(loss)
        dt = (time.perf_counter() - t0) / args.repeats
        thr = 3 * B / dt
        key = f"{name}@B{B}"
        results[key] = {"ms_per_step": round(dt * 1e3, 2),
                        "samples_per_sec": round(thr)}
        print(f"{key:18s} {dt * 1e3:8.2f} ms/step  "
              f"{thr:12,.0f} samples/s  loss {lv:.3f}", flush=True)

    for name in args.models.split(","):
        mc, _ = get_default_config(name, "REDDIT")
        run(name, int(mc["batch_size"]))
        if int(mc["batch_size"]) != 4000:
            run(name, 4000)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
