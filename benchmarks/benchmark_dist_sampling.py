"""Distributed-sampling scaling benchmark: routed vs replicated.

Measures sampled-edges/s of the two distributed sampling modes at
P = 1/2/4/8 partitions.  On this environment the mesh is virtual (CPU
host devices, ``--platform cpu``), so absolute numbers are not TPU
numbers — the *trend* is the signal: the replicated (psum-merge) mode
does O(B·F) sampling work per device regardless of P, while the
owner-routed all-to-all mode does O(capacity_factor·B/P·F)
(the reference's routed RPC design, ``dist_sampler.py:159-242``).

Usage (virtual mesh):
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python benchmarks/benchmark_dist_sampling.py --platform cpu
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

parser = argparse.ArgumentParser()
parser.add_argument("--num-edges", type=int, default=500_000)
parser.add_argument("--num-nodes", type=int, default=20_000)
parser.add_argument("--batch", type=int, default=12_000)
parser.add_argument("--fanouts", type=int, nargs="*", default=[10, 10])
parser.add_argument("--repeats", type=int, default=10)
parser.add_argument("--mesh-sizes", type=int, nargs="*",
                    default=[1, 2, 4, 8])
parser.add_argument("--capacity-factor", type=float, default=4.0)
parser.add_argument("--platform", default=None)
args = parser.parse_args()

if args.platform:
    import jax
    jax.config.update("jax_platforms", args.platform)


def main():
    import jax
    import jax.numpy as jnp

    from gnnflow_tpu.parallel import (PartitionedDynamicGraph,
                                      get_partitioner, make_mesh,
                                      routed_overflow_check,
                                      sample_hops_partitioned,
                                      sample_hops_routed)

    rng = np.random.RandomState(0)
    src = rng.randint(0, args.num_nodes, args.num_edges).astype(np.int64)
    dst = rng.randint(0, args.num_nodes, args.num_edges).astype(np.int64)
    ts = np.sort(rng.rand(args.num_edges).astype(np.float32) * 1e6)
    eid = np.arange(args.num_edges, dtype=np.int64)

    B = args.batch
    roots = rng.randint(0, args.num_nodes, B).astype(np.int32)
    root_ts = np.full(B, 1e6, np.float32)
    edges_per_sample = B * args.fanouts[0]
    for f in args.fanouts[1:]:
        edges_per_sample += edges_per_sample * f  # rough upper bound

    results = []
    for n in args.mesh_sizes:
        if n > len(jax.devices()):
            continue
        mesh = make_mesh(n)
        part = get_partitioner("hash", n)
        pg = PartitionedDynamicGraph(n, mesh=mesh,
                                     initial_pool_size=1 << 20,
                                     maximum_pool_size=1 << 25,
                                     mem_resource_type="hbm",
                                     minimum_block_size=16,
                                     insertion_policy="insert")
        parts, _ = part.partition(src, dst, ts, eid)
        pg.add_partitioned_edges(parts)
        pg.set_partition_table(part.get_partition_table())
        pgv = pg.device_graph()
        iters = max(1, int(pgv.e_ts.shape[1]).bit_length())
        ov = routed_overflow_check(np.asarray(pgv.partition_table), roots,
                                   n, args.capacity_factor)

        r = jnp.asarray(roots)
        t = jnp.asarray(root_ts)
        for mode, fn in (("routed", sample_hops_routed),
                         ("replicated", sample_hops_partitioned)):
            kw = dict(fanouts=args.fanouts, strategy="recent",
                      search_iters=iters)
            if mode == "routed":
                kw["capacity_factor"] = args.capacity_factor

            # ONE jitted program per (mode, P): compile once, then time
            # pure dispatches (a per-call shard_map retrace would swamp
            # the measurement)
            @jax.jit
            def sample_once(r, t):
                mfgs = fn(pgv, mesh, r, t, **kw)
                return sum(m.num_sampled_edges()
                           for layer in mfgs for m in layer)

            total = int(sample_once(r, t))  # compile + warmup
            t0 = time.perf_counter()
            for _ in range(args.repeats):
                total = int(sample_once(r, t))  # value fetch ends timing
            dt = (time.perf_counter() - t0) / args.repeats
            eps = total / dt
            results.append(dict(mode=mode, P=n, ms=dt * 1e3,
                                sampled_edges=total,
                                edges_per_s=eps, overflow=ov))
            print(f"P={n} {mode:>10}: {dt*1e3:8.2f} ms  "
                  f"{eps/1e6:6.2f} M sampled-edges/s  "
                  f"(sampled {total}, overflow {ov})")

    print(json.dumps(results))


if __name__ == "__main__":
    main()
