"""Capture + parse a device profile of the headline train step.

The reference profiles with nsys (``benchmarks/profile.sh``); the TPU
equivalent is ``jax.profiler.trace`` — which works over the remote
(axon) runtime.  This tool traces N steps, parses the xplane proto with
``jax.profiler.ProfileData`` and prints per-op device times.

Reading the output: fusion event durations are trustworthy compute
times; async ``copy-start`` durations include dependency waits and
OVERLAP each other (their sum exceeds wall time) — use them to spot
what XLA stages/copies, not to add up.  The ``jit__step`` event is the
wall time per step.
"""
import argparse
import collections
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

parser = argparse.ArgumentParser()
parser.add_argument("--model", default="TGN",
                    help="registry model name (TGN/TGAT/DySAT/APAN/...)")
parser.add_argument("--batch", type=int, default=4000)
parser.add_argument("--steps", type=int, default=8)
parser.add_argument("--out", default="/tmp/gnnflow_trace")
parser.add_argument("--top", type=int, default=30)
parser.add_argument("--platform", default=None)
args = parser.parse_args()

if args.platform:
    import jax
    jax.config.update("jax_platforms", args.platform)


def capture():
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
    dim_node = 128
    train, _, _, full, nf_np, ef_np = make_synthetic_dataset(
        num_src=num_src, num_dst=num_dst, num_edges=num_edges,
        dim_node=dim_node, dim_edge=dim_edge, seed=42, time_scale=4.0)
    g = DynamicGraph(initial_pool_size=1 << 20,
                     maximum_pool_size=1 << 23, mem_resource_type="hbm",
                     minimum_block_size=62, insertion_policy="insert")
    g.add_edges(full.src, full.dst, full.time, full.eid,
                add_reverse=True)
    ef = pad_feature_table(ef_np)
    dg = g.device_graph()
    B = args.batch
    mc, _ = get_default_config(args.model, "REDDIT")
    mc["compute_dtype"] = "bfloat16"
    static = args.model.lower() in ("graphsage", "gat")
    model, skw = build_model(args.model, mc,
                             dim_node=dim_node if static else 0,
                             dim_edge=dim_edge)
    tr = Trainer(model, lr=1e-4, **skw)
    nf = pad_feature_table(nf_np) if static else None
    state = tr.init_state(jax.random.PRNGKey(0), dg, B, nf, ef,
                          num_nodes=g.max_vertex_id() + 1)
    neg = DstRandEdgeSampler(train.dst, seed=1)
    batches = []
    for i, b in enumerate(get_batches(train, B, neg)):
        if i >= args.steps:
            break
        batches.append((jnp.asarray(b.target_nodes, jnp.int32),
                        jnp.asarray(b.ts, jnp.float32),
                        jnp.asarray(b.eids, jnp.int32)))
    valid = jnp.ones((B,), bool)
    tn, ts, eids = batches[0]
    # public wrapper => first-batch auto-calibration (the production
    # path: layer_dedup / window compaction / transformer dedup)
    s = tr.train_step_arrays(state, dg, nf, ef, tn, ts, eids, valid,
                             True)
    _ = float(s[1])   # compile + settle (value fetch, not block_until_ready)
    state = s[0]
    with jax.profiler.trace(args.out):
        for btn, bts, beids in batches:
            state, loss, _, _ = tr.train_step_arrays(
                state, dg, nf, ef, btn, bts, beids, valid, True)
        _ = float(loss)


def report():
    from jax.profiler import ProfileData
    files = sorted(glob.glob(os.path.join(
        args.out, "plugins/profile/*/*.xplane.pb")))
    if not files:
        print("no xplane.pb found under", args.out)
        return
    p = ProfileData.from_file(files[-1])
    tot = collections.Counter()
    cnt = collections.Counter()
    for plane in p.planes:
        if "TPU" not in plane.name and "Device" not in plane.name:
            continue
        for line in plane.lines:
            for ev in line.events:
                tot[ev.name] += ev.duration_ns
                cnt[ev.name] += 1
    n = args.steps
    for name, ns in tot.most_common(args.top):
        print(f"{ns / n / 1e6:9.4f} ms/step  x{cnt[name]:4d}  "
              f"{name[:110]}")


if __name__ == "__main__":
    capture()
    report()
