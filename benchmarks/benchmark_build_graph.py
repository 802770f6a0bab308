"""Graph build benchmark.

Counterpart of ``/root/reference/benchmarks/benchmark_build_graph.py``:
ingestion throughput (edges/s) at several ingestion batch sizes, plus
memory usage (graph + metadata) and device-refresh time.
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

parser = argparse.ArgumentParser()
parser.add_argument("--num-edges", type=int, default=1_000_000)
parser.add_argument("--num-nodes", type=int, default=100_000)
parser.add_argument("--batch-sizes", type=int, nargs="*",
                    default=[1000, 10_000, 100_000, 1_000_000])
args = parser.parse_args()


def main():
    import jax

    from gnnflow_tpu.dynamic_graph import DynamicGraph
    from gnnflow_tpu import csrc

    rng = np.random.RandomState(0)
    src = rng.randint(0, args.num_nodes, args.num_edges)
    dst = rng.randint(0, args.num_nodes, args.num_edges)
    ts = np.sort(rng.rand(args.num_edges).astype(np.float32) * 1e6)

    print(f"native ingestion helper: {csrc.have_native()}")
    for bs in args.batch_sizes:
        g = DynamicGraph(initial_pool_size=1 << 20,
                         maximum_pool_size=1 << 25,
                         mem_resource_type="hbm", minimum_block_size=16,
                         insertion_policy="insert")
        t0 = time.time()
        for lo in range(0, args.num_edges, bs):
            sl = slice(lo, lo + bs)
            g.add_edges(src[sl], dst[sl], ts[sl])
        build = time.time() - t0
        t0 = time.time()
        dg = g.device_graph()
        jax.block_until_ready(dg.e_ts)
        xfer = time.time() - t0
        print(f"batch {bs:>9}: build {build:6.2f}s "
              f"({args.num_edges/build:>10.0f} edges/s) | device "
              f"refresh {xfer:5.2f}s | graph "
              f"{g.get_graph_memory_usage()/(1<<20):6.1f} MiB | meta "
              f"{g.get_metadata_memory_usage()/(1<<20):5.1f} MiB | "
              f"avg chain len {g.avg_linked_list_length():.1f}")


if __name__ == "__main__":
    main()
