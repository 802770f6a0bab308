"""Per-component timing of the fused TGN train step (real TPU).

Times nested prefixes of the step as separate jits (each ends with a
value fetch — block_until_ready can return early on the tunnel):

  sample -> +memory pull -> +GRU -> +attention fwd -> full fwd
  -> fwd+bwd+adam -> full step (incl. memory write-back)

The deltas localize the bandwidth/latency cost; drives kernel decisions.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

parser = argparse.ArgumentParser()
parser.add_argument("--batch", type=int, default=4000)
parser.add_argument("--repeats", type=int, default=20)
parser.add_argument("--platform", default=None)
parser.add_argument("--memory-storage", default="float32",
                    choices=["float32", "bfloat16"])
parser.add_argument("--gru-impl", default="xla", choices=["xla", "pallas"])
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
    from gnnflow_tpu.models import memory as memory_lib
    from gnnflow_tpu.ops.sampling import sample_hops
    from gnnflow_tpu.train import (Trainer, fetch_features,
                                  link_pred_loss, pad_feature_table)

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
    model = DGNN(dim_node=0, dim_edge=dim_edge, dim_time=100,
                 dim_embed=100, num_layers=1, num_snapshots=1, att_head=2,
                 dropout=0.2, att_dropout=0.2, use_memory=True,
                 dim_memory=100, compute_dtype="bfloat16",
                 gru_impl=args.gru_impl)
    trainer = Trainer(model, fanouts=[10], sample_strategy="recent",
                      lr=1e-4, memory_storage=args.memory_storage)
    state = trainer.init_state(jax.random.PRNGKey(0), dg, B, None, ef,
                               num_nodes=g.max_vertex_id() + 1)
    neg = DstRandEdgeSampler(train.dst, seed=1)
    # Cycle distinct batches: repeating one batch overstates throughput
    # (second visit hits warm DRAM rows / identical gather paths).
    n_cycle = 16
    batches = []
    for i, b in enumerate(get_batches(train, B, neg)):
        if i >= n_cycle:
            break
        batches.append((jnp.asarray(b.target_nodes, jnp.int32),
                        jnp.asarray(b.ts, jnp.float32),
                        jnp.asarray(b.eids, jnp.int32)))
    tn, ts, eids = batches[0]
    valid = jnp.ones((B,), bool)
    iters = trainer._iters(dg)

    def stage_sample(state, dg, ef, tn, ts, eids):
        mfgs = sample_hops(dg, tn, ts, fanouts=(10,), strategy="recent",
                           search_iters=iters, key=None)
        return mfgs[0][0].nbr_eids.sum()

    def stage_pull(state, dg, ef, tn, ts, eids):
        mfgs = sample_hops(dg, tn, ts, fanouts=(10,), strategy="recent",
                           search_iters=iters, key=None)
        mi = memory_lib.prepare_input(state.memory, mfgs[0][0])
        return mi["mem"].sum() + mi["mail"].sum()

    def stage_feats(state, dg, ef, tn, ts, eids):
        mfgs = sample_hops(dg, tn, ts, fanouts=(10,), strategy="recent",
                           search_iters=iters, key=None)
        mi = memory_lib.prepare_input(state.memory, mfgs[0][0])
        nfs, efs = fetch_features(mfgs, None, ef, None, dim_edge)
        return mi["mem"].sum() + efs[0][0].sum()

    def stage_fwd(state, dg, ef, tn, ts, eids):
        mfgs = sample_hops(dg, tn, ts, fanouts=(10,), strategy="recent",
                           search_iters=iters, key=None)
        mi = memory_lib.prepare_input(state.memory, mfgs[0][0])
        nfs, efs = fetch_features(mfgs, None, ef, None, dim_edge)
        pos, negs, last = model.apply(
            {"params": state.params}, mfgs, nfs, efs, mi, train=False)
        return pos.sum() + negs.sum()

    def stage_grad(state, dg, ef, tn, ts, eids):
        mfgs = sample_hops(dg, tn, ts, fanouts=(10,), strategy="recent",
                           search_iters=iters, key=None)
        mi = memory_lib.prepare_input(state.memory, mfgs[0][0])
        nfs, efs = fetch_features(mfgs, None, ef, None, dim_edge)

        def loss_fn(p):
            pos, negs, last = model.apply(
                {"params": p}, mfgs, nfs, efs, mi, train=False)
            return link_pred_loss(pos, negs, valid)
        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return loss + jax.tree.reduce(
            lambda a, b: a + b.sum(), grads, jnp.float32(0))

    def stage_full(state, dg, ef, tn, ts, eids):
        new_state, loss, _, _ = trainer._step(
            state, dg, None, ef, tn, ts, eids, valid, True)
        # consume params + memory so XLA cannot DCE the optimizer update
        # or the write-back
        psum = jax.tree.reduce(lambda a, b: a + b.sum(),
                               new_state.params, jnp.float32(0))
        return loss + new_state.memory.data[0, 0] + psum

    stages = [("sample", stage_sample), ("pull", stage_pull),
              ("feats", stage_feats), ("fwd", stage_fwd),
              ("grad", stage_grad), ("full", stage_full)]
    out = {}
    prev = 0.0
    for name, fn in stages:
        f = jax.jit(fn)
        float(f(state, dg, ef, tn, ts, eids))  # compile + warm
        float(f(state, dg, ef, tn, ts, eids))
        t0 = time.perf_counter()
        for i in range(args.repeats):
            btn, bts, beids = batches[i % n_cycle]
            v = f(state, dg, ef, btn, bts, beids)
        float(v)
        dt = (time.perf_counter() - t0) / args.repeats * 1e3
        out[name] = round(dt, 3)
        print(f"{name:>8}: {dt:7.3f} ms  (+{dt - prev:6.3f})", flush=True)
        prev = dt
    print(json.dumps(out))


if __name__ == "__main__":
    main()
