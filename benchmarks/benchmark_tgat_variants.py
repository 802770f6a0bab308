"""TGAT step variants on the real chip (round 5, VERDICT item 2).

The round-5 profile of the 47.4 ms TGAT step (profile_step.py):

    10.97 ms  edge-feature gather  bf16[1.32M, 256] <- f32[672k, 256]
     3.87 ms  multiply_reduce_fusion (f32[100], f32[100])   <- bias grads
     3.70 ms  fusion.388 bf16[100,200] <- bf16[10,132000,100]{1,2,0}  dW
     3.59 ms  fusion.13  bf16[10,132000,200] elementwise (K/V)
     2.18 ms  select_reduce (sampling scalar-gather trick)
     1.70 ms  copy.134  bf16[10,132000,172] {2,1,0}->{1,2,0} relayout
     1.50 ms  fusion.30 pad/concat 172->200
     1.35 ms  fusion.356 bf16[172,200] dW

i.e. ~9 ms of backward weight/bias-grad reductions that re-read the
[10,132000,*] activations at ~10x off HBM roofline (264 MB ~ 0.32 ms),
plus the 1.32M-row gather at the ~9 ns/row latency floor.

Variants measured here:

  default      edge_major=True (the production config)
  bmajor       edge_major=False (b-major gather; XLA picks layouts)

Plus microbenches of the dW contraction in the two layouts it could run
in, to see whether the 3-D edge-major activation layout is what makes
the reduction slow.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

parser = argparse.ArgumentParser()
parser.add_argument("--reps", type=int, default=12)
parser.add_argument("--groups", type=int, default=3)
parser.add_argument("--batch", type=int, default=4000)
parser.add_argument("--skip-steps", action="store_true")
parser.add_argument("--skip-micro", action="store_true")
parser.add_argument("--variants", default="default,bmajor,remat",
                    help="comma list: default,bmajor,remat")
parser.add_argument("--platform", default=None)
args = parser.parse_args()

if args.platform:
    import jax
    jax.config.update("jax_platforms", args.platform)

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


def build():
    num_src, num_dst, num_edges, dim_edge = 10_000, 984, 672_447, 172
    train, _, _, full, _, ef_np = make_synthetic_dataset(
        num_src=num_src, num_dst=num_dst, num_edges=num_edges,
        dim_node=128, dim_edge=dim_edge, seed=42, time_scale=4.0)
    g = DynamicGraph(initial_pool_size=1 << 20,
                     maximum_pool_size=1 << 23, mem_resource_type="hbm",
                     minimum_block_size=62, insertion_policy="insert")
    step = 100_000
    for lo in range(0, len(full), step):
        sl = slice(lo, min(lo + step, len(full)))
        g.add_edges(full.src[sl], full.dst[sl], full.time[sl],
                    full.eid[sl], add_reverse=True)
    return g, train, pad_feature_table(ef_np), dim_edge


def measure(name, cfg_over, g, train, ef, dim_edge):
    mc, _ = get_default_config("TGAT", "REDDIT")
    mc["compute_dtype"] = "bfloat16"
    mc.update(cfg_over)
    model, skw = build_model("TGAT", mc, dim_node=0, dim_edge=dim_edge)
    trainer = Trainer(model, lr=1e-4, **skw)
    dg = g.device_graph()
    state = trainer.init_state(jax.random.PRNGKey(0), dg, args.batch,
                               None, ef, num_nodes=g.max_vertex_id() + 1)
    neg = DstRandEdgeSampler(train.dst, seed=1)
    staged = []
    for i, b in enumerate(get_batches(train, args.batch, neg)):
        if i >= 8:
            break
        valid = np.zeros(b.batch_size, bool)
        valid[: b.num_valid] = True
        staged.append((jnp.asarray(b.target_nodes, jnp.int32),
                       jnp.asarray(b.ts, jnp.float32),
                       jnp.asarray(b.eids, jnp.int32),
                       jnp.asarray(valid)))
    tn, ts, eids, valid = staged[0]
    s = trainer.train_step_arrays(state, dg, None, ef, tn, ts, eids,
                                  valid, True)
    float(s[1])
    state = s[0]
    means = []
    k = 0
    for _ in range(args.groups):
        t0 = time.perf_counter()
        for _ in range(args.reps):
            tn, ts, eids, valid = staged[k % len(staged)]
            k += 1
            state, loss, _, _ = trainer.train_step_arrays(
                state, dg, None, ef, tn, ts, eids, valid, True)
        float(loss)
        means.append((time.perf_counter() - t0) / args.reps)
    print(f"{name:28s} median {np.median(means)*1e3:7.2f} ms  "
          f"min {min(means)*1e3:7.2f}  max {max(means)*1e3:7.2f}",
          flush=True)


def microbench_dw():
    """dW-style contraction: [F, B, 100] x [F, B, 200] -> [100, 200]
    in 3-D edge-major vs flat 2-D form."""
    F, B = 10, 132000
    rng = np.random.RandomState(0)
    x3 = jnp.asarray(rng.randn(F, B, 100).astype(np.float32)).astype(
        jnp.bfloat16)
    y3 = jnp.asarray(rng.randn(F, B, 200).astype(np.float32)).astype(
        jnp.bfloat16)
    x2 = x3.reshape(F * B, 100)
    y2 = y3.reshape(F * B, 200)

    @jax.jit
    def dw3(x, y):
        return jnp.sum(jax.lax.dot_general(
            x, y, (((0, 1), (0, 1)), ((), ())),
            preferred_element_type=jnp.float32))

    @jax.jit
    def dw2(x, y):
        return jnp.sum(jax.lax.dot_general(
            x, y, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))

    for name, fn, a, b in (("dw 3-D [F,B,100]x[F,B,200]", dw3, x3, y3),
                           ("dw 2-D [FB,100]x[FB,200]", dw2, x2, y2)):
        float(fn(a, b))
        ts = []
        # amortize the tunnel's per-fetch roundtrip (~20 ms) over a
        # group of async dispatches ending in ONE value fetch
        for _ in range(5):
            t0 = time.perf_counter()
            outs = [fn(a, b) for _ in range(16)]
            float(outs[-1]) + float(outs[0])
            ts.append((time.perf_counter() - t0) / 16)
        ts = np.array(ts) * 1e3
        print(f"{name:28s} median {np.median(ts):7.3f} ms  "
              f"min {ts.min():7.3f}", flush=True)


if __name__ == "__main__":
    if not args.skip_micro:
        microbench_dw()
    if not args.skip_steps:
        variants = {
            "default": ("tgat default (edge-major)", {}),
            "bmajor": ("tgat b-major", {"edge_major": False}),
            # remat the attention layers: recompute K/V + time enc in
            # backward instead of saving the [B, F, *] intermediates
            "remat": ("tgat remat-attention", {"remat_attention": True}),
        }
        g, train, ef, de = build()
        for key in args.variants.split(","):
            name, over = variants[key.strip()]
            measure(name, over, g, train, ef, de)
