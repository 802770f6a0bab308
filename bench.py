"""Headline benchmark: TGN training throughput + the full model matrix.

Mirrors the reference's headline configuration (TGN: 1 layer, fanout [10],
recent sampling, batch 4000, dims 100/100/172 — ``gnnflow/config.py:28-43``
+ REDDIT stats: 10,984 nodes / 672,447 edges / 172-dim features) on a
deterministic synthetic stream of the same shape (no network access for the
real dataset).

Throughput counts target nodes per second — ``total_samples += num_target
nodes`` == 3B per iteration, as in
``scripts/offline_edge_prediction.py:478-515``.

The reference publishes no numbers (BASELINE.json ``published: {}``).
``vs_baseline`` is computed against 200,000 samples/s — the approximate
single-A100 TGN/REDDIT training throughput of the TGL system the reference
builds on (TGL paper reports ~10 s/epoch for REDDIT ≈ 670k edges × 3
samples; GNNFlow's pipelined sampler is comparable).  That comparator is
an ESTIMATE (``extra.baseline_estimated``); the absolute numbers
(``ms_per_step``, bytes/step, latency/bandwidth floors) are the
self-describing claims.

Besides the TGN headline, ``extra.models`` reports ms/step +
samples/s for every model family at its reference config (TGAT 2-layer
uniform, DySAT 2-layer 3-snapshot windowed, APAN mailbox, GraphSAGE
static) at batch 4000, so a regression anywhere in the matrix shows up
in ``BENCH_r{N}.json``.  Set ``BENCH_MODELS=0`` to skip the matrix (TGN
headline only).

Prints the headline JSON line IMMEDIATELY after the TGN epoch measurement
(so a stalled matrix compile can never void the run), then — once the model
matrix finishes — re-prints the line with ``extra.models`` merged in.  A
consumer taking either the first or the last JSON line on stdout gets a
valid result.  ``BENCH_BUDGET_S`` (default 1200 s) bounds the whole run:
remaining matrix models are skipped with ``"skipped_budget"`` markers once
the deadline nears, and a SIGALRM at the budget flushes whatever partial
result exists and exits 0 instead of hanging into an external timeout.
"""
import json
import os
import signal
import sys
import time

import numpy as np

BASELINE_SAMPLES_PER_SEC = 200_000.0  # est. GNNFlow/TGL, TGN-REDDIT, 1xA100

# --- wall-clock budget (round-4 lesson: the driver's run timed out with
# zero output because nothing printed until the full matrix finished) ----
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1200"))
_T_START = time.monotonic()
_PARTIAL = {"result": None}  # best result so far, flushed by the alarm


def _remaining():
    return BUDGET_S - (time.monotonic() - _T_START)


def _emit(result):
    print(json.dumps(result), flush=True)


def _on_alarm(signum, frame):
    # Last resort: budget expired mid-stage (likely a tunnel compile
    # stall).  Flush the best partial result (or an explicit error line)
    # and exit 0 so the harness records SOMETHING instead of rc=124/null.
    res = _PARTIAL["result"]
    if res is None:
        res = {"metric": "tgn_reddit_train_throughput", "value": 0,
               "unit": "samples/s", "vs_baseline": 0,
               "extra": {"error": "budget_expired_before_headline",
                         "budget_s": BUDGET_S}}
    else:
        res = dict(res)
        res["extra"] = dict(res.get("extra", {}))
        res["extra"]["budget_expired"] = True
    _emit(res)
    sys.stdout.flush()
    os._exit(0)

# v5e single-chip specs for the honesty floors
HBM_BYTES_PER_SEC = 819e9       # v5e HBM bandwidth
GATHER_NS_PER_ROW = 9.0         # measured v5e row-gather latency floor


def _stage_batches(get_batches, train, batch_size, neg, jnp, limit=None,
                   spread=False):
    """``spread=True`` takes ``limit`` batches strided across the epoch
    instead of the first ``limit`` — early batches sample from short
    histories and under-represent the steady-state step cost."""
    stride = 1
    if spread and limit:
        stride = max(1, (len(train) // batch_size) // limit)
    staged = []
    total = 0
    taken = 0
    for i, batch in enumerate(get_batches(train, batch_size, neg)):
        if spread and i % stride:
            continue
        if limit is not None and taken >= limit:
            break
        taken += 1
        valid = np.zeros(batch.batch_size, bool)
        valid[: batch.num_valid] = True
        staged.append((
            jnp.asarray(batch.target_nodes, jnp.int32),
            jnp.asarray(batch.ts, jnp.float32),
            jnp.asarray(batch.eids, jnp.int32),
            jnp.asarray(valid)))
        total += 3 * batch.num_valid
    return staged, total


def run_model_matrix(jax, jnp, dg, g, full, train, nf, ef, dim_node,
                     dim_edge, repeats=12, reserve_s=90.0):
    """Per-dispatch ms/step for every non-headline model family at its
    reference config, batch 4000 (the equal-batch hardware picture —
    the reference's tiny TGAT/DySAT default batches under-utilize any
    accelerator).  Mirrors ``benchmarks/benchmark_models.py``."""
    from gnnflow_tpu.config import get_default_config
    from gnnflow_tpu.data import DstRandEdgeSampler, get_batches
    from gnnflow_tpu.models.factory import build_model
    from gnnflow_tpu.train import Trainer

    neg = DstRandEdgeSampler(train.dst, seed=1)
    out = {}
    B = 4000
    repeats = int(os.environ.get("BENCH_REPEATS", repeats))
    groups = int(os.environ.get("BENCH_GROUPS", 3))  # -> variance picture
    names = ("TGAT", "DySAT", "APAN", "GRAPHSAGE", "GAT")
    only = os.environ.get("BENCH_ONLY")
    if only:
        names = tuple(n for n in names if n in only.split(","))
    for name in names:
        if _remaining() < reserve_s:
            # Not enough budget left to compile + measure another model:
            # record the skip explicitly instead of hanging into the
            # external timeout (round-4 lesson).
            out[name] = {"skipped_budget": True}
            continue
        try:
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
            staged, _ = _stage_batches(get_batches, train, B, neg, jnp,
                                       limit=8, spread=True)
            tn, ts, eids, valid = staged[0]
            # train_step_arrays (not _train_step): the public wrapper
            # triggers first-batch auto-calibration, i.e. the production
            # path (layer-dedup tiers for TGAT, transformer dedup for
            # APAN, snapshot dedup / window compaction for DySAT)
            s = trainer.train_step_arrays(state, dg, nfd, ef, tn, ts,
                                          eids, valid, True)
            float(s[1])  # warmup ends with a value fetch
            state = s[0]
            means = []
            k = 0
            for _ in range(groups):
                t0 = time.perf_counter()
                for _ in range(repeats):
                    tn, ts, eids, valid = staged[k % len(staged)]
                    k += 1
                    state, loss, _, _ = trainer.train_step_arrays(
                        state, dg, nfd, ef, tn, ts, eids, valid, True)
                float(loss)
                means.append((time.perf_counter() - t0) / repeats)
            dt = float(np.median(means))
            out[name] = {"ms_per_step": round(dt * 1e3, 2),
                         "ms_per_step_min": round(min(means) * 1e3, 2),
                         "ms_per_step_max": round(max(means) * 1e3, 2),
                         "samples_per_sec": round(3 * B / dt),
                         "batch": B}
            tstats = trainer.tier_take_stats(state)
            if tstats and tstats["total"]:
                out[name]["dedup_tiers"] = list(tstats["tiers"])
                out[name]["tier_takes"] = tstats["counts"]
        except Exception as e:  # one model failing must not hide the rest
            out[name] = {"error": f"{type(e).__name__}: {e}"[:300]}
        finally:
            # drop device buffers deterministically before the next
            # model: lingering state/staged arrays skew the next
            # model's HBM layout (observed: APAN 34.6 ms inside the
            # full matrix vs 28.99 alone)
            model = trainer = state = staged = s = None
            import gc
            gc.collect()
    return out


def main():
    if hasattr(signal, "SIGALRM"):
        signal.signal(signal.SIGALRM, _on_alarm)
        signal.alarm(max(1, int(BUDGET_S)))

    import jax
    import jax.numpy as jnp

    # persistent compilation cache: cold-process compiles over the remote
    # tunnel take minutes; cached executables load in seconds
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
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

    # REDDIT-shaped synthetic stream (10,984 nodes; 672,447 edges; 172-dim
    # edge features).  Static models (matrix) consume 128-dim node feats.
    num_src, num_dst, num_edges, dim_edge = 10_000, 984, 672_447, 172
    dim_node = 128
    train, val, test, full, nf_np, ef_np = make_synthetic_dataset(
        num_src=num_src, num_dst=num_dst, num_edges=num_edges,
        dim_node=dim_node, dim_edge=dim_edge, seed=42, time_scale=4.0)

    g = DynamicGraph(initial_pool_size=1 << 20, maximum_pool_size=1 << 23,
                     mem_resource_type="hbm", minimum_block_size=62,
                     insertion_policy="insert")
    ingest_start = time.time()
    # batched ingestion like the reference (ingestion_batch_size chunks)
    step = 100_000
    for lo in range(0, len(full), step):
        sl = slice(lo, min(lo + step, len(full)))
        g.add_edges(full.src[sl], full.dst[sl], full.time[sl],
                    full.eid[sl], add_reverse=True)
    ingest_time = time.time() - ingest_start

    # f32 feature table: measured FASTER end-to-end than bf16 despite the
    # gather stage itself improving (row gathers are per-row latency-bound,
    # and the bf16 rows cost extra convert work downstream) — see
    # BASELINE.md negative results
    ef = pad_feature_table(ef_np)
    nf = pad_feature_table(nf_np)
    dg = g.device_graph()  # 128-aligned rows: 2x faster gathers

    batch_size = 4000
    if os.environ.get("BENCH_HEADLINE", "1") == "0":
        # matrix-only mode (BENCH_ONLY reruns): skip the TGN headline
        # so slow-compiling models fit a wall-clock budget
        extra = {"device": str(jax.devices()[0]),
                 "models": run_model_matrix(
                     jax, jnp, dg, g, full, train, nf, ef, dim_node,
                     dim_edge)}
        _emit({"metric": "model_matrix_only", "value": 0,
               "unit": "ms", "vs_baseline": 0, "extra": extra})
        return
    # bfloat16 compute (params f32) — standard TPU mixed precision;
    # AP parity with f32 verified in tests/test_end_to_end.py
    model = DGNN(dim_node=0, dim_edge=dim_edge, dim_time=100,
                 dim_embed=100, num_layers=1, num_snapshots=1, att_head=2,
                 dropout=0.2, att_dropout=0.2, use_memory=True,
                 dim_memory=100, compute_dtype="bfloat16")
    trainer = Trainer(model, fanouts=[10], sample_strategy="recent",
                      lr=1e-4)
    state = trainer.init_state(jax.random.PRNGKey(0), dg, batch_size,
                               None, ef, num_nodes=g.max_vertex_id() + 1)
    neg = DstRandEdgeSampler(train.dst, seed=1)

    # Pre-stage the epoch's batches on device (negative sampling + padding
    # is host work independent of training; the reference hides it behind
    # DataLoader workers, we hide it by staging up front).
    staged, total_samples = _stage_batches(get_batches, train, batch_size,
                                           neg, jnp)

    # The epoch runs as ONE dispatch via lax.scan over the staged batches
    # (the framework's production path).  NB: timings must end with a real
    # value fetch — block_until_ready alone can return early on tunneled
    # device runtimes.
    TN = jnp.stack([s[0] for s in staged])
    TS = jnp.stack([s[1] for s in staged])
    EI = jnp.stack([s[2] for s in staged])
    VA = jnp.stack([s[3] for s in staged])
    n_iters = len(staged)

    # warmup epoch (compile + runtime warmup)
    state, losses = trainer.train_steps_scan(state, dg, None, ef,
                                             TN, TS, EI, VA)
    float(losses[-1])
    # timed epoch
    t0 = time.time()
    state, losses = trainer.train_steps_scan(state, dg, None, ef,
                                             TN, TS, EI, VA)
    loss = losses[-1]
    float(loss)
    epoch_time = time.time() - t0

    throughput = total_samples / epoch_time
    ms_per_step = epoch_time / n_iters * 1e3

    # --- honesty floors (see BASELINE.md perf model) -------------------
    # per step at the headline shape: B=4000, roots L0 = 3B = 12000,
    # instances L = L0*(1+fanout) = 132k, sampled edges E = L0*fanout.
    L0 = 3 * batch_size
    L = L0 * 11
    E = L0 * 10
    mem_row_bf16 = 512 * 2          # bf16-packed pull row (lane-padded)
    ef_row = 256 * 4                # lane-padded 172-dim f32 row
    wb_row = 475 * 4                # write-back row (f32 scatter)
    est_bytes = (L * mem_row_bf16   # memory pull
                 + E * ef_row       # edge-feature gather
                 + 3 * 2 * batch_size * wb_row   # write-back RMW-ish
                 + L * 100 * 2 * 6)              # GRU/attn activations
    gather_rows = L + E + 4 * batch_size
    bw_floor_ms = est_bytes / HBM_BYTES_PER_SEC * 1e3
    latency_floor_ms = gather_rows * GATHER_NS_PER_ROW * 1e-6

    extra = {
        "epoch_time_s": round(epoch_time, 3),
        "ms_per_step": round(ms_per_step, 2),
        "iters": n_iters,
        "ingest_time_s": round(ingest_time, 3),
        "final_loss": round(float(loss), 4),
        "device": str(jax.devices()[0]),
        "baseline_estimated": True,
        "baseline_samples_per_sec": BASELINE_SAMPLES_PER_SEC,
        # absolute self-describing claims: estimated HBM bytes moved per
        # step and the two step-time floors (v5e row gathers are
        # LATENCY-bound at ~9 ns/row, so the latency floor — not
        # bandwidth — is the binding one at this shape)
        "est_hbm_bytes_per_step": int(est_bytes),
        "bw_roofline_ms": round(bw_floor_ms, 2),
        "gather_rows_per_step": int(gather_rows),
        "gather_latency_floor_ms": round(latency_floor_ms, 2),
    }
    result = {
        "metric": "tgn_reddit_train_throughput",
        "value": round(throughput, 1),
        "unit": "samples/s",
        "vs_baseline": round(throughput / BASELINE_SAMPLES_PER_SEC, 3),
        "extra": extra,
    }
    # Emit the headline NOW — the matrix (5 models × compile + calibrate
    # + 3×12 repeats) must never be able to void the measurement.
    _emit(result)
    _PARTIAL["result"] = result

    if os.environ.get("BENCH_MODELS", "1") != "0":
        extra["models"] = run_model_matrix(
            jax, jnp, dg, g, full, train, nf, ef, dim_node, dim_edge)
        # Re-print with the matrix merged so a last-JSON-line consumer
        # sees the full picture; a first-line consumer already has the
        # (identical) headline numbers.
        _emit(result)
    if hasattr(signal, "SIGALRM"):
        signal.alarm(0)


if __name__ == "__main__":
    main()
