"""Microbenchmark: edge-feature gather chain variants at TGAT shapes.

The TGAT profile (round 5) shows the layer-0 edge-feature chain costing
~16.4 ms of the 51.4 ms step: gather [1.32M, 256] 11.3 ms + reshape to
[132k, 10, 256] 2.8 ms (a real retile: F=10 pads to 16 sublanes) +
{2,1,0}->{0,2,1} relayout 2.3 ms feeding the batched K/V matmul.

Variants measured here (each ends in the consumer layout:
``transpose-like`` read via a tiny batched matmul so XLA must produce
the {0,2,1}-friendly operand):

  flat:   gather with flat ids -> reshape [B,F,D] -> slice (current)
  ids2d:  gather with [B,F] ids directly (no reshape op)
  tflat:  gather flat -> one explicit transpose to [F,B,D]-major form

Timing: warm up with value fetch (tunnel!), then median of repeats.
"""
import argparse
import sys
import os
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

parser = argparse.ArgumentParser()
parser.add_argument("--rows", type=int, default=672447)
parser.add_argument("--b", type=int, default=132000)
parser.add_argument("--f", type=int, default=10)
parser.add_argument("--width", type=int, default=256)
parser.add_argument("--dim", type=int, default=172)
parser.add_argument("--reps", type=int, default=30)
args = parser.parse_args()

R, B, F, W, D = args.rows, args.b, args.f, args.width, args.dim
rng = np.random.RandomState(0)
table = jnp.asarray(rng.randn(R, W).astype(np.float32))
ids = jnp.asarray(rng.randint(0, R, (B, F)).astype(np.int32))
mask = jnp.asarray(rng.rand(B, F) < 0.9)
# a consumer matmul in the batched [B, F, *] form the real model uses
wk = jnp.asarray(rng.randn(D, 64).astype(np.float32))


def consume(ef):
    # batched matmul (same contraction pattern as the w_kv MultiLinear)
    y = jax.lax.dot_general(ef, wk.astype(jnp.bfloat16),
                            (((2,), (0,)), ((), ())))
    return jnp.sum(y.astype(jnp.float32))


@jax.jit
def step_flat(table, ids, mask):
    flat = jnp.clip(ids.reshape(-1), 0, R - 1)
    rows = table[flat].astype(jnp.bfloat16).reshape(B, F, W)[..., :D]
    rows = jnp.where(mask[..., None], rows, 0)
    return consume(rows)


@jax.jit
def step_ids2d(table, ids, mask):
    idc = jnp.clip(ids, 0, R - 1)
    rows = table[idc].astype(jnp.bfloat16)[..., :D]
    rows = jnp.where(mask[..., None], rows, 0)
    return consume(rows)


@jax.jit
def step_gather_only_flat(table, ids, mask):
    flat = jnp.clip(ids.reshape(-1), 0, R - 1)
    rows = table[flat].astype(jnp.bfloat16)
    return jnp.sum(rows.astype(jnp.float32))


@jax.jit
def step_gather_only_2d(table, ids, mask):
    idc = jnp.clip(ids, 0, R - 1)
    rows = table[idc].astype(jnp.bfloat16)
    return jnp.sum(rows.astype(jnp.float32))


def bench(fn, name):
    v = fn(table, ids, mask)
    float(v)  # real value fetch (block_until_ready lies on the tunnel)
    ts = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        float(fn(table, ids, mask))
        ts.append(time.perf_counter() - t0)
    ts = np.array(ts) * 1e3
    print(f"{name:22s} median {np.median(ts):7.3f} ms  "
          f"min {ts.min():7.3f}  max {ts.max():7.3f}")


bench(step_gather_only_flat, "gather-only flat")
bench(step_gather_only_2d, "gather-only ids2d")
bench(step_flat, "chain flat (current)")
bench(step_ids2d, "chain ids2d")


# --- follow-ups: locality + convert-fusion effects -----------------------
ids_sorted = jnp.sort(ids.reshape(-1)).reshape(B, F)
ids_local = jnp.asarray(
    (np.clip(np.arange(B * F) // 2 + rng.randint(-50, 50, B * F), 0, R - 1)
     ).astype(np.int32).reshape(B, F))


@jax.jit
def step_gather_f32(table, ids, mask):
    flat = jnp.clip(ids.reshape(-1), 0, R - 1)
    rows = table[flat]
    return jnp.sum(rows)


def bench2(fn, tab, idv, name):
    v = fn(tab, idv, mask)
    float(v)
    ts = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        float(fn(tab, idv, mask))
        ts.append(time.perf_counter() - t0)
    ts = np.array(ts) * 1e3
    print(f"{name:28s} median {np.median(ts):7.3f} ms  min {ts.min():7.3f}")


bench2(step_gather_f32, table, ids, "gather f32-sum random")
bench2(step_gather_only_flat, table, ids_sorted, "gather bf16 sorted ids")
bench2(step_gather_only_flat, table, ids_local, "gather bf16 local ids")


# --- in-jit repetition: true per-op cost without tunnel dispatch ---------
K = 10
ids_many = jnp.asarray(rng.randint(0, R, (K, B, F)).astype(np.int32))


def scan_bench(body, name, tab=None):
    tab = table if tab is None else tab

    @jax.jit
    def run(table, ids_many):
        def step(c, idv):
            return c + body(table, idv), None
        out, _ = jax.lax.scan(step, jnp.float32(0), ids_many)
        return out

    float(run(tab, ids_many))
    ts = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        float(run(tab, ids_many))
        ts.append(time.perf_counter() - t0)
    ts = np.array(ts) * 1e3 / K
    print(f"scan {name:24s} median {np.median(ts):7.3f} ms/op  "
          f"min {ts.min():7.3f}")


def g_flat(table, idv):
    flat = jnp.clip(idv.reshape(-1), 0, R - 1)
    rows = table[flat].astype(jnp.bfloat16)
    return jnp.sum(rows.astype(jnp.float32))


def g_chain(table, idv):
    flat = jnp.clip(idv.reshape(-1), 0, R - 1)
    rows = table[flat].astype(jnp.bfloat16).reshape(B, F, W)[..., :D]
    rows = jnp.where(mask[..., None], rows, 0)
    return consume(rows)


scan_bench(g_flat, "gather-only")
scan_bench(g_chain, "chain (current)")


# --- layout-crossing variants (attention-like consumer) ------------------
def consume_att(y):
    # y: [B, F, O] in batched-land; softmax over F + weighted sum
    s = jax.nn.softmax(y.astype(jnp.float32).sum(-1), axis=1)  # [B, F]
    out = jnp.sum(y * s[..., None].astype(y.dtype), axis=1)    # [B, O]
    return jnp.sum(out.astype(jnp.float32))


wk_full = jnp.asarray(rng.randn(W, 200).astype(np.float32))  # zero-padded rows
wk_full = wk_full.at[D:].set(0)


def c_current(table, idv):
    flat = jnp.clip(idv.reshape(-1), 0, R - 1)
    rows = table[flat].astype(jnp.bfloat16).reshape(B, F, W)[..., :D]
    rows = jnp.where(mask[..., None], rows, 0)
    y = jax.lax.dot_general(rows, wk_full[:D].astype(jnp.bfloat16),
                            (((2,), (0,)), ((), ())))
    return consume_att(y)


def c_padkernel(table, idv):
    # no slice: matmul the full 256-wide rows against a zero-padded kernel
    flat = jnp.clip(idv.reshape(-1), 0, R - 1)
    rows = table[flat].astype(jnp.bfloat16).reshape(B, F, W)
    rows = jnp.where(mask[..., None], rows, 0)
    y = jax.lax.dot_general(rows, wk_full.astype(jnp.bfloat16),
                            (((2,), (0,)), ((), ())))
    return consume_att(y)


def c_flatmm(table, idv):
    # project on the FLAT gather output; only the 200-wide result crosses
    flat = jnp.clip(idv.reshape(-1), 0, R - 1)
    rows = table[flat].astype(jnp.bfloat16)          # [B*F, W] flat land
    yf = rows @ wk_full.astype(jnp.bfloat16)          # [B*F, 200]
    y = yf.reshape(B, F, 200)
    y = jnp.where(mask[..., None], y, 0)
    return consume_att(y)


scan_bench(c_current, "att current")
scan_bench(c_padkernel, "att padded-kernel")
scan_bench(c_flatmm, "att flat-matmul")


# --- f-major chain: gather [F, B, W] with F leading ----------------------
# flat f-major gather reshapes to [F, B, W] as a pure bitcast (B % 8 == 0:
# tile grouping unchanged), matmuls collapse to clean 2-D form, and the
# softmax/aggregate become leading-dim reduces — no retile, no {0,2,1}.
mask_t = mask.T  # [F, B]


def c_fmajor(table, idv):
    flat = jnp.clip(idv.T.reshape(-1), 0, R - 1)      # f-major order
    rows = table[flat].astype(jnp.bfloat16).reshape(F, B, W)[..., :D]
    rows = jnp.where(mask_t[..., None], rows, 0)
    y = jax.lax.dot_general(rows, wk_full[:D].astype(jnp.bfloat16),
                            (((2,), (0,)), ((), ())))  # [F, B, O]
    s = jax.nn.softmax(y.astype(jnp.float32).sum(-1), axis=0)   # [F, B]
    out = jnp.sum(y * s[..., None].astype(y.dtype), axis=0)     # [B, O]
    return jnp.sum(out.astype(jnp.float32))


scan_bench(c_fmajor, "att f-major")


# and with a backward pass (the relayout taxes double in the grad)
def grad_bench(body, name):
    def loss(tab, idv):
        return body(tab, idv)

    g = jax.grad(loss)

    @jax.jit
    def run(table, ids_many):
        def step(c, idv):
            return c + jnp.sum(g(table, idv)[:4, :4]), None
        out, _ = jax.lax.scan(step, jnp.float32(0), ids_many)
        return out

    float(run(table, ids_many))
    ts = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        float(run(table, ids_many))
        ts.append(time.perf_counter() - t0)
    ts = np.array(ts) * 1e3 / K
    print(f"grad {name:24s} median {np.median(ts):7.3f} ms/op  "
          f"min {ts.min():7.3f}")


grad_bench(c_current, "att current")
grad_bench(c_fmajor, "att f-major")


# --- eid-dedup infimum (VERDICT r4 item 2): unique-then-fetch ------------
# The reference dedups edge-feature fetches on GPU (cache.py:305-312,
# torch.unique-then-fetch).  On TPU every dedup scheme still ends in an
# EXPANSION back to per-slot rows — itself an N-row gather at the same
# ~9 ns/row latency floor as the direct fetch.  The cheapest possible
# dedup is therefore "project the WHOLE table through the step's linear
# map (MXU, ~0.5 ms), then expansion-gather the narrow projected rows":
# zero dedup machinery, maximal sharing.  If even that loses to the
# direct gather, every sort/scatter-based variant loses by more.
wproj = jnp.asarray(rng.randn(W, 200).astype(np.float32))
proj_static = (table.astype(jnp.bfloat16) @ wproj.astype(jnp.bfloat16))


def g_dedup_infimum(table, idv):
    flat = jnp.clip(idv.reshape(-1), 0, R - 1)
    # weights change every step -> the projection is per-step work
    proj = table.astype(jnp.bfloat16) @ wproj.astype(jnp.bfloat16)
    rows = proj[flat]                       # expansion gather: N rows
    return jnp.sum(rows.astype(jnp.float32))


def g_expand_only(tab, idv):
    # pure expansion-gather cost from a pre-projected [R, 200] bf16
    # table (isolates the row-latency floor at the narrow width;
    # passed as an operand — a baked 269 MB constant overflows the
    # remote-compile request)
    flat = jnp.clip(idv.reshape(-1), 0, R - 1)
    rows = tab[flat]
    return jnp.sum(rows.astype(jnp.float32))


scan_bench(g_dedup_infimum, "dedup infimum (proj+expand)")
scan_bench(g_expand_only, "expand-only [R,200] bf16", tab=proj_static)
