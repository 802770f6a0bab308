"""Partitioner benchmark.

Counterpart of ``/root/reference/benchmarks/benchmark_partitioner.py`` and
``tests/test_partition.py:92-150``: streams an edge list through every
strategy, reporting throughput (edges/s), load factor, and edge-cut %.
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

parser = argparse.ArgumentParser()
parser.add_argument("--num-edges", type=int, default=500_000)
parser.add_argument("--num-nodes", type=int, default=50_000)
parser.add_argument("--num-partitions", type=int, default=4)
parser.add_argument("--chunk", type=int, default=50_000)
args = parser.parse_args()


def main():
    from gnnflow_tpu.parallel.partition import (get_partitioner,
                                                partition_metrics)

    rng = np.random.RandomState(0)
    # power-law-ish community-structured stream
    comm = rng.randint(0, args.num_partitions * 8, args.num_edges)
    size = args.num_nodes // (args.num_partitions * 8)
    src = comm * size + rng.randint(0, size, args.num_edges)
    intra = rng.rand(args.num_edges) < 0.8
    dst_comm = np.where(intra, comm,
                        rng.randint(0, args.num_partitions * 8,
                                    args.num_edges))
    dst = dst_comm * size + rng.randint(0, size, args.num_edges)
    ts = np.sort(rng.rand(args.num_edges).astype(np.float32))
    eid = np.arange(args.num_edges)

    for strat in ["hash", "roundrobin", "edgecount", "timestampsum",
                  "timestampavg", "fennel", "fennel_edge"]:
        p = get_partitioner(strat, args.num_partitions)
        t0 = time.time()
        for lo in range(0, args.num_edges, args.chunk):
            sl = slice(lo, lo + args.chunk)
            p.partition(src[sl], dst[sl], ts[sl], eid[sl])
        dt = time.time() - t0
        m = partition_metrics(p, src, dst)
        print(f"{strat:14s} {args.num_edges/dt:>12.0f} edges/s | "
              f"load factor {m['load_factor']:.3f} | "
              f"edge cut {m['edge_cut']*100:5.1f}%")


if __name__ == "__main__":
    main()
