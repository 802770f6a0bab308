"""Offline partition-table generation.

Counterpart of ``/root/reference/scripts/gen_init_pt.py`` (which runs DGL
METIS over the first 60% of the stream and saves the vertex->partition
table).  METIS is not available here; any streaming strategy (Fennel by
default, which also optimizes edge-cut) produces the table, saved as
``partition_data/<dataset>_<strategy>_partition.npz`` and loadable via
``get_partitioner(..., partition_table=...)`` / the ``metis`` strategy.
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from gnnflow_tpu.data import load_dataset, make_synthetic_dataset
from gnnflow_tpu.parallel.partition import (get_partitioner,
                                            partition_metrics)

parser = argparse.ArgumentParser()
parser.add_argument("--data", default="SYNTHETIC")
parser.add_argument("--data-dir", default=None)
parser.add_argument("--num-partitions", type=int, default=4)
parser.add_argument("--strategy", default="fennel")
parser.add_argument("--ratio", type=float, default=0.6,
                    help="fraction of the stream used (reference uses "
                         "the first 60%%)")
parser.add_argument("--chunk", type=int, default=100_000)
parser.add_argument("--out-dir", default=None)
args = parser.parse_args()


def main():
    if args.data == "SYNTHETIC":
        _, _, _, full, _, _ = make_synthetic_dataset(
            num_src=2000, num_dst=500, num_edges=100_000, dim_edge=0)
    else:
        _, _, _, full = load_dataset(args.data, args.data_dir)
    n = int(len(full) * args.ratio)
    part = get_partitioner(args.strategy, args.num_partitions)
    for lo in range(0, n, args.chunk):
        sl = slice(lo, min(lo + args.chunk, n))
        part.partition(full.src[sl], full.dst[sl], full.time[sl],
                       full.eid[sl])
    m = partition_metrics(part, full.src[:n], full.dst[:n])
    print(f"strategy={args.strategy} partitions={args.num_partitions} "
          f"load_factor={m['load_factor']:.3f} "
          f"edge_cut={m['edge_cut']*100:.1f}%")
    out_dir = args.out_dir or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..",
        "partition_data")
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(
        out_dir, f"{args.data.lower()}_{args.strategy}_partition.npz")
    np.savez(path, partition_table=part.get_partition_table())
    print(f"saved {path}")


if __name__ == "__main__":
    main()
