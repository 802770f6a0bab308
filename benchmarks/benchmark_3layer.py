"""3-layer windowed multi-snapshot step cost: padded vs the model-level
fast paths (VERDICT r3 item 8 — the N-layer compaction landed in round 2
with CPU tests but no TPU measurement existed for L >= 3).

Measures a 3-layer DySAT-style config (3 snapshots, windowed, prop_time)
at batch 2000 on the real chip in three modes:

- padded      : no model-level compaction (layer_dedup=None,
                model_compact=False)
- snapshot-dedup ladder : per-snapshot (nid, ts) dedup tiers (explicit)
- auto        : whatever first-batch auto-calibration picks

Run: python benchmarks/benchmark_3layer.py  (one real TPU process only)
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(
    os.path.dirname(__file__), "..")))


def main():
    import jax
    import jax.numpy as jnp

    from gnnflow_tpu.data import (DstRandEdgeSampler, get_batches,
                                  make_synthetic_dataset)
    from gnnflow_tpu.dynamic_graph import DynamicGraph
    from gnnflow_tpu.models.dgnn import DGNN
    from gnnflow_tpu.train import Trainer, pad_feature_table

    num_src, num_dst, num_edges, dim_edge = 10_000, 984, 672_447, 172
    train, _, _, full, _, ef_np = make_synthetic_dataset(
        num_src=num_src, num_dst=num_dst, num_edges=num_edges,
        dim_edge=dim_edge, seed=42, time_scale=4.0)
    g = DynamicGraph(initial_pool_size=1 << 20,
                     maximum_pool_size=1 << 23,
                     mem_resource_type="hbm", minimum_block_size=62,
                     insertion_policy="insert")
    g.add_edges(full.src, full.dst, full.time, full.eid,
                add_reverse=True)
    dg = g.device_graph()
    ef = pad_feature_table(ef_np)
    B = 2000
    window = float(full.time.max()) / 10.0   # ~w=10000-equivalent fill
    neg = DstRandEdgeSampler(train.dst, seed=1)

    def run(tag, **tr_kwargs):
        model = DGNN(dim_node=0, dim_edge=dim_edge, dim_time=100,
                     dim_embed=100, num_layers=3, num_snapshots=3,
                     att_head=2, dropout=0.1, att_dropout=0.1,
                     use_memory=False, compute_dtype="bfloat16")
        tr = Trainer(model, fanouts=[10, 5, 5],
                     sample_strategy="uniform", num_snapshots=3,
                     snapshot_time_window=window, prop_time=True,
                     lr=1e-4, **tr_kwargs)
        state = tr.init_state(jax.random.PRNGKey(0), dg, B, None, ef,
                              num_nodes=g.max_vertex_id() + 1)
        staged = []
        stride = max(1, (len(train) // B) // 8)
        for i, b in enumerate(get_batches(train, B, neg)):
            if i % stride:
                continue
            if len(staged) >= 8:
                break
            v = np.zeros(b.batch_size, bool)
            v[: b.num_valid] = True
            staged.append((jnp.asarray(b.target_nodes, jnp.int32),
                           jnp.asarray(b.ts, jnp.float32),
                           jnp.asarray(b.eids, jnp.int32),
                           jnp.asarray(v)))
        tn, ts, ei, va = staged[0]
        s = tr.train_step_arrays(state, dg, None, ef, tn, ts, ei, va,
                                 True)
        float(s[1])
        state = s[0]
        means = []
        k = 0
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(10):
                tn, ts, ei, va = staged[k % len(staged)]
                k += 1
                state, loss, _, _ = tr.train_step_arrays(
                    state, dg, None, ef, tn, ts, ei, va, True)
            float(loss)
            means.append((time.perf_counter() - t0) / 10)
        tstats = tr.tier_take_stats(state)
        print(f"{tag}: median {np.median(means)*1e3:.1f} ms/step "
              f"(min {min(means)*1e3:.1f} max {max(means)*1e3:.1f}) "
              f"layer_dedup={tr.layer_dedup} "
              f"compact={tr.compact_factor} takes="
              f"{tstats['counts'] if tstats else None}", flush=True)

    import sys
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "padded"):
        run("padded", layer_dedup=None, model_compact=False,
            compact_factor=None, auto_calibrate=False)
    if which in ("all", "auto"):
        run("auto")
    if which in ("all", "ladder"):
        run("ladder(0.45)", layer_dedup=0.45, model_compact=False,
            compact_factor=None, auto_calibrate=False)
    if which in ("all", "ladder2"):
        # multi-tier ladders are affordable for deep configs since
        # round 5: the chain applies the ladder only at the layer-1
        # boundary (deeper boundaries take the largest cap), so branch
        # bodies grow additively instead of (tiers+1)^(L-1) — the shape
        # that measured >40 min of XLA compile as nested full ladders
        run("ladder2(0.45,0.7)", layer_dedup=(0.45, 0.7),
            model_compact=False, compact_factor=None,
            auto_calibrate=False)


if __name__ == "__main__":
    main()
