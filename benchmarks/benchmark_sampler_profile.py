"""Decompose the uniform multi-snapshot sample into stages.

The uniform 2-layer 3-snapshot config (DySAT shape) is the slowest
sampler path; this isolates where the time goes so optimization targets
the real cost:

- l1:        layer-1 only ([3, B] roots, searches + picks)
- pairs2:    layer-2 (off, len) pair-table lookups alone
- search2:   layer-2 boundary searches alone (2 x S x B*(1+F))
- picks2:    layer-2 per-pick triple gathers alone (S x B*(1+F) x F rows)
- select2:   the one-hot (dst, eid, ts) select alone on pre-gathered rows
- full:      the whole 2-layer sample_hops
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

parser = argparse.ArgumentParser()
parser.add_argument("--num-edges", type=int, default=672447)
parser.add_argument("--batch-size", type=int, default=4000)
parser.add_argument("--repeats", type=int, default=10)
parser.add_argument("--platform", default=None)
args = parser.parse_args()
if args.platform:
    import jax
    jax.config.update("jax_platforms", args.platform)


def main():
    import jax
    import jax.numpy as jnp

    from gnnflow_tpu.data import make_synthetic_dataset
    from gnnflow_tpu.dynamic_graph import DynamicGraph
    from gnnflow_tpu.ops import sampling as S

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "..", ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    _, _, _, full, _, _ = make_synthetic_dataset(
        num_src=10000, num_dst=984, num_edges=args.num_edges,
        dim_edge=0, seed=0)
    g = DynamicGraph(initial_pool_size=1 << 20,
                     maximum_pool_size=1 << 24,
                     mem_resource_type="hbm", minimum_block_size=62,
                     insertion_policy="insert")
    g.add_edges(full.src, full.dst, full.time, full.eid, add_reverse=True)
    dg = g.device_graph()
    iters = dg.search_iters

    rng = np.random.RandomState(0)
    b3 = args.batch_size * 3
    roots = jnp.asarray(rng.randint(0, 10000, b3), jnp.int32)
    ts = jnp.asarray((rng.rand(b3) * float(full.time.max()))
                     .astype(np.float32))
    key = jax.random.PRNGKey(0)
    SN, F, W = 3, 10, 1000.0
    B2 = b3 * (1 + F)          # layer-2 roots per snapshot

    out = {}

    def timeit(name, fn, *a):
        jf = jax.jit(fn)
        r = jf(*a)
        float(jnp.sum(jax.tree_util.tree_leaves(r)[0]))
        t0 = time.perf_counter()
        for _ in range(args.repeats):
            r = jf(*a)
        float(jnp.sum(jax.tree_util.tree_leaves(r)[0]))
        ms = (time.perf_counter() - t0) / args.repeats * 1e3
        out[name] = round(ms, 2)
        print(f"{name:>10}: {ms:8.2f} ms", flush=True)

    # ---- full 2-layer
    def consume(mfgs):
        # sum over EVERY output so no snapshot/layer is DCE'd
        return sum(m.nbr_nids.sum() + m.nbr_eids.sum()
                   + m.nbr_ts.sum() for layer in mfgs for m in layer)

    def run_full(k):
        mfgs = S.sample_hops(dg, roots, ts, fanouts=(F, F),
                             strategy="uniform", num_snapshots=SN,
                             window=W, search_iters=iters, key=k)
        return consume(mfgs)

    # ---- layer 1 only
    def run_l1(k):
        R = jnp.stack([roots] * SN)
        T = jnp.stack([ts] * SN)
        ms = S.sample_layer_snapshots(dg, R, T, fanout=F,
                                      strategy="uniform",
                                      num_snapshots=SN, window=W,
                                      search_iters=iters,
                                      shared_roots=True, key=k)
        return consume([ms])

    # layer-2 root set (from a real layer-1 sample, fetched once)
    R1 = jnp.stack([roots] * SN)
    T1 = jnp.stack([ts] * SN)
    m1 = jax.jit(lambda k: [(m.all_nodes(), m.all_ts())
                            for m in S.sample_layer_snapshots(
                                dg, R1, T1, fanout=F, strategy="uniform",
                                num_snapshots=SN, window=W,
                                search_iters=iters, key=k)])(key)
    R2 = jnp.stack([r for r, _ in m1])           # [SN, B2]
    T2 = jnp.stack([t for _, t in m1])

    def run_l2(k):
        ms = S.sample_layer_snapshots(dg, R2, T2, fanout=F,
                                      strategy="uniform",
                                      num_snapshots=SN, window=W,
                                      search_iters=iters, key=k)
        return consume([ms])

    # ---- layer-2 pair lookups only
    def run_pairs2(R):
        valid = R >= 0
        nid = jnp.where(valid, R, 0)
        return S._root_off_len(dg, nid, valid)

    # ---- layer-2 searches only
    def run_search2b(R, T):
        valid = R >= 0
        nid = jnp.where(valid, R, 0)
        off, ln = S._root_off_len(dg, nid, valid)
        end_ts = T
        start_ts = end_ts - W
        both = S._lower_bound_multi(
            dg.e_ts, off, ln,
            jnp.stack([start_ts, end_ts]), iters)
        return both

    # ---- layer-2 picks only (random idx, right shape)
    idx2 = jnp.asarray(
        rng.randint(0, args.num_edges, (SN, B2, F)), jnp.int32)

    def run_picks2(idx):
        d, e, t = S._gather_triples(dg.e_triples, idx)
        return d.sum() + e.sum() + t.sum()

    # ---- select alone: one-hot select over pre-gathered rows
    flat = idx2.reshape(-1)
    row = flat // S._TRIPLES_PER_ROW
    lane = 3 * (flat - row * S._TRIPLES_PER_ROW)

    def run_select2(rows_in, lane):
        d, e, t = S._select_triples(rows_in, lane)
        return d.sum() + e.sum() + t.sum()

    rows_pre = jax.jit(
        lambda r: dg.e_triples[jnp.clip(r, 0, dg.e_triples.shape[0] - 1)]
    )(row)

    timeit("full", run_full, key)
    timeit("l1", run_l1, key)
    timeit("l2", run_l2, key)
    timeit("pairs2", run_pairs2, R2)
    timeit("search2", run_search2b, R2, T2)
    timeit("picks2", run_picks2, idx2)
    timeit("rows_only", lambda r: dg.e_triples[
        jnp.clip(r, 0, dg.e_triples.shape[0] - 1)].sum(axis=-1), row)
    timeit("select2", run_select2, rows_pre, lane)
    import json
    print(json.dumps(out))


if __name__ == "__main__":
    main()
