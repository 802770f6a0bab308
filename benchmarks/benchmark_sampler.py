"""Sampler throughput benchmark.

Counterpart of ``/root/reference/benchmarks/benchmark_sampler.py``:
measures temporal sampling throughput (target vertices/s and sampled
edges/s, mean ± std over repeats) for recent/uniform strategies and
multi-layer configs over a REDDIT-scale synthetic stream.
"""
import argparse
import sys
import os
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

parser = argparse.ArgumentParser()
parser.add_argument("--num-edges", type=int, default=672447)
parser.add_argument("--num-src", type=int, default=10000)
parser.add_argument("--num-dst", type=int, default=984)
parser.add_argument("--batch-size", type=int, default=4000)
parser.add_argument("--repeats", type=int, default=10)
parser.add_argument("--impl", choices=["xla", "pallas"], default="xla")
args = parser.parse_args()


def main():
    import jax
    import jax.numpy as jnp

    from gnnflow_tpu.data import make_synthetic_dataset
    from gnnflow_tpu.dynamic_graph import DynamicGraph
    from gnnflow_tpu.ops.sampling import sample_hops

    _, _, _, full, _, _ = make_synthetic_dataset(
        num_src=args.num_src, num_dst=args.num_dst,
        num_edges=args.num_edges, dim_edge=0, seed=0)
    g = DynamicGraph(initial_pool_size=1 << 20,
                     maximum_pool_size=1 << 24,
                     mem_resource_type="hbm", minimum_block_size=62,
                     insertion_policy="insert")
    g.add_edges(full.src, full.dst, full.time, full.eid,
                add_reverse=True)
    dg = g.device_graph()
    # max-degree-bounded search depth — what the Trainer uses
    iters = dg.search_iters

    configs = [
        ("recent-1hop-f10", dict(fanouts=(10,), strategy="recent")),
        ("uniform-1hop-f10", dict(fanouts=(10,), strategy="uniform")),
        ("recent-2hop-f10x10", dict(fanouts=(10, 10), strategy="recent")),
        ("uniform-2hop-f10x10", dict(fanouts=(10, 10),
                                     strategy="uniform")),
        ("uniform-3snap-w1000", dict(fanouts=(10, 10),
                                     strategy="uniform",
                                     num_snapshots=3, window=1000.0)),
        ("uniform-3snap-w1000-compact",
         dict(fanouts=(10, 10), strategy="uniform", num_snapshots=3,
              window=1000.0, compact_factor=0.25)),
    ]
    rng = np.random.RandomState(0)
    b3 = args.batch_size * 3
    roots = jnp.asarray(rng.randint(0, args.num_src, b3), jnp.int32)
    ts = jnp.asarray((rng.rand(b3) * float(full.time.max()))
                     .astype(np.float32))

    print(f"device: {jax.devices()[0]}; batch(3B)={b3}; "
          f"graph edges={g.num_edges()}")
    for name, cfg in configs:
        key = jax.random.PRNGKey(0)

        @jax.jit
        def run(k, _cfg=tuple(sorted(cfg.items()))):
            return sample_hops(dg, roots, ts, search_iters=iters, key=k,
                               **dict(_cfg))

        out = run(key)  # compile
        edges = sum(int(m.num_sampled_edges()) for layer in out
                    for m in layer)
        # dispatch a pipelined burst per repeat so host->device dispatch
        # latency amortizes (as inside the fused train step); end each
        # burst with a real VALUE fetch (block_until_ready can return
        # early on tunneled runtimes)
        burst = 20
        times = []
        for r in range(args.repeats):
            t0 = time.time()
            outs = [run(jax.random.fold_in(key, r * burst + i))
                    for i in range(burst)]
            float(outs[-1][0][0].nbr_nids.sum())
            times.append((time.time() - t0) / burst)
        times = np.array(times)
        v_per_s = b3 / times.mean()
        e_per_s = edges / times.mean()
        print(f"{name:24s} {times.mean()*1e3:7.2f} ± "
              f"{times.std()*1e3:5.2f} ms | {v_per_s:12.0f} vert/s | "
              f"{e_per_s:12.0f} sampled-edges/s")


if __name__ == "__main__":
    main()
