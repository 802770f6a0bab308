"""A/B the train step: per-instance vs dedup (cond) vs dedup (no cond).

Isolates whether the (nid, ts) dedup fast path wins, and how much the
``lax.cond`` overflow fallback costs, on the headline TGN config."""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

parser = argparse.ArgumentParser()
parser.add_argument("--batch", type=int, default=4000)
parser.add_argument("--repeats", type=int, default=30)
parser.add_argument("--platform", default=None)
args = parser.parse_args()

if args.platform:
    import jax
    jax.config.update("jax_platforms", args.platform)


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "..", ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass

    from gnnflow_tpu.data import (DstRandEdgeSampler, get_batches,
                                  make_synthetic_dataset)
    from gnnflow_tpu.dynamic_graph import DynamicGraph
    from gnnflow_tpu.models.dgnn import DGNN
    from gnnflow_tpu.train import Trainer, pad_feature_table

    num_src, num_dst, num_edges, dim_edge = 10_000, 984, 672_447, 172
    train, _, _, full, _, ef_np = make_synthetic_dataset(
        num_src=num_src, num_dst=num_dst, num_edges=num_edges,
        dim_edge=dim_edge, seed=42, time_scale=4.0)
    g = DynamicGraph(initial_pool_size=1 << 20, maximum_pool_size=1 << 23,
                     mem_resource_type="hbm", minimum_block_size=62,
                     insertion_policy="insert")
    for lo in range(0, len(full), 100_000):
        sl = slice(lo, min(lo + 100_000, len(full)))
        g.add_edges(full.src[sl], full.dst[sl], full.time[sl],
                    full.eid[sl], add_reverse=True)
    ef = pad_feature_table(ef_np)
    dg = g.device_graph()
    B = args.batch
    neg = DstRandEdgeSampler(train.dst, seed=1)
    n_cycle = 16
    batches = []
    for i, b in enumerate(get_batches(train, B, neg)):
        if i >= n_cycle:
            break
        batches.append((jnp.asarray(b.target_nodes, jnp.int32),
                        jnp.asarray(b.ts, jnp.float32),
                        jnp.asarray(b.eids, jnp.int32)))
    valid = jnp.ones((B,), bool)

    def run_variant(name, dedup_factor, skip_cond=False, train=True):
        model = DGNN(dim_node=0, dim_edge=dim_edge, dim_time=100,
                     dim_embed=100, num_layers=1, num_snapshots=1,
                     att_head=2, dropout=0.2, att_dropout=0.2,
                     use_memory=True, dim_memory=100,
                     compute_dtype="bfloat16")
        trainer = Trainer(model, fanouts=[10], sample_strategy="recent",
                          lr=1e-4, dedup_factor=dedup_factor)
        orig_cond = jax.lax.cond
        try:
            if skip_cond:
                # bypass the overflow cond: always take the fast branch
                jax.lax.cond = lambda p, t, f, *op: t(*op)
            state = trainer.init_state(jax.random.PRNGKey(0), dg, B, None,
                                       ef, num_nodes=g.max_vertex_id() + 1)
            step = trainer._train_step
            tn, ts, eids = batches[0]
            s = step(state, dg, None, ef, tn, ts, eids, valid, train)
            _ = float(s[1])  # compile + settle
            state = s[0]
            t0 = time.perf_counter()
            for i in range(args.repeats):
                btn, bts, beids = batches[i % n_cycle]
                state, loss, _, _ = step(state, dg, None, ef, btn, bts,
                                         beids, valid, train)
            lv = float(loss)
            dt = (time.perf_counter() - t0) / args.repeats * 1e3
        finally:
            jax.lax.cond = orig_cond
        print(f"{name:28s} {dt:7.3f} ms/step   loss {lv:.4f}", flush=True)
        return dt

    run_variant("per-instance (dedup off)", None)
    run_variant("dedup 0.35 + cond", 0.35)
    run_variant("dedup 0.35 no-cond", 0.35, skip_cond=True)
    run_variant("dedup 0.20 no-cond", 0.20, skip_cond=True)
    run_variant("eval per-instance", None, train=False)
    run_variant("eval dedup 0.35 no-cond", 0.35, skip_cond=True,
                train=False)


if __name__ == "__main__":
    main()
