"""Microbenchmark: fused Pallas GRU kernel vs the XLA cell, isolated.

Times fwd and fwd+param-grad at the headline shape ([132k, 372+100] mail
+ time against a 100-wide hidden state) — decides the default gru_impl
and block size.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

parser = argparse.ArgumentParser()
parser.add_argument("--n", type=int, default=132000)
parser.add_argument("--repeats", type=int, default=30)
parser.add_argument("--platform", default=None)
args = parser.parse_args()
if args.platform:
    import jax
    jax.config.update("jax_platforms", args.platform)


def main():
    import jax
    import jax.numpy as jnp
    from gnnflow_tpu.ops.gru_pallas import gru_memory_fused

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "..", ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    n, f, dr, dt = args.n, 100, 372, 100
    rng = np.random.RandomState(0)
    mem = jnp.asarray(rng.randn(n, f), jnp.float32)
    mail = jnp.asarray(rng.randn(n, dr), jnp.float32)
    dts = jnp.asarray(rng.rand(n), jnp.float32)
    ki = jnp.asarray(rng.randn(dr + dt, 3 * f), jnp.float32) * 0.05
    bi = jnp.asarray(rng.randn(3 * f), jnp.float32) * 0.05
    kh = jnp.asarray(rng.randn(f, 3 * f), jnp.float32) * 0.05
    bh = jnp.asarray(rng.randn(3 * f), jnp.float32) * 0.05
    tw = jnp.asarray(1.0 / 10 ** np.linspace(0, 9, dt), jnp.float32)
    tb = jnp.zeros((dt,), jnp.float32)
    params = (ki, bi, kh, bh, tw, tb)

    def xla_impl(p, cd):
        ki, bi, kh, bh, tw, tb = p
        tf = jnp.cos(dts[:, None] * tw + tb)
        x = [mail.astype(cd) @ ki[:dr].astype(cd),
             tf.astype(cd) @ ki[dr:].astype(cd)]
        gi = x[0] + x[1] + bi.astype(cd)
        gh = mem.astype(cd) @ kh.astype(cd) + bh.astype(cd)
        r = jax.nn.sigmoid(gi[:, :f] + gh[:, :f])
        z = jax.nn.sigmoid(gi[:, f:2 * f] + gh[:, f:2 * f])
        nn_ = jnp.tanh(gi[:, 2 * f:] + r * gh[:, 2 * f:])
        h = (1.0 - z) * nn_ + z * mem.astype(cd)
        return h.astype(jnp.float32)

    out = {}

    def fetch(v):
        # tunnel gotcha: timed regions must end with a real value fetch;
        # one output leaf forces the whole computation it came from
        return float(jnp.sum(jax.tree_util.tree_leaves(v)[0]))

    def timeit(name, fn, *a):
        jf = jax.jit(fn)
        fetch(jf(*a))
        fetch(jf(*a))
        t0 = time.perf_counter()
        for _ in range(args.repeats):
            v = jf(*a)
        fetch(v)
        ms = (time.perf_counter() - t0) / args.repeats * 1e3
        out[name] = round(ms, 3)
        print(f"{name:>28}: {ms:7.3f} ms", flush=True)

    interp = jax.default_backend() == "cpu"
    for cd in ("bfloat16",):
        timeit(f"xla_fwd_{cd}",
               lambda p: jnp.sum(xla_impl(p, cd)), params)
        timeit(f"xla_grad_{cd}", jax.grad(
            lambda p: jnp.sum(jnp.sin(xla_impl(p, cd))),
            ), params)
        for br in (512, 1024, 2048):
            timeit(f"pallas{br}_fwd_{cd}",
                   lambda p, br=br: jnp.sum(gru_memory_fused(
                       mem, mail, dts, *p, cd, br, interp)), params)
            timeit(f"pallas{br}_grad_{cd}", jax.grad(
                lambda p, br=br: jnp.sum(jnp.sin(gru_memory_fused(
                    mem, mail, dts, *p, cd, br, interp)))), params)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
