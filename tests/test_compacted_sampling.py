"""Compacted inter-layer sampling must match the uncompacted path.

The windowed multi-snapshot configs (DySAT) leave most neighbor slots
invalid; ``sample_hops(compact_factor=f)`` packs the valid F-wide blocks
of the previous layer before sampling the next one — the padded analogue
of the reference's ``thrust::remove_if`` compaction
(``/root/reference/gnnflow/csrc/temporal_sampler.cu:191-199``).

Contract:
- ``recent`` strategy: bit-identical MFGs to the uncompacted path
  (deterministic picks per root).
- ``uniform`` strategy: identical validity masks (they depend only on
  window candidate counts); picks land inside the window.
- overflow (more valid blocks than capacity): falls back to the full
  path — results still exact.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gnnflow_tpu.common import INVALID_NID
from gnnflow_tpu.data import make_synthetic_dataset
from gnnflow_tpu.dynamic_graph import DynamicGraph
from gnnflow_tpu.ops.sampling import sample_hops


def _graph(num_edges=20000, seed=0):
    _, _, _, full, _, _ = make_synthetic_dataset(
        num_src=500, num_dst=100, num_edges=num_edges, dim_edge=0,
        seed=seed)
    g = DynamicGraph(initial_pool_size=1 << 15,
                     maximum_pool_size=1 << 20,
                     mem_resource_type="hbm", minimum_block_size=8,
                     insertion_policy="insert")
    g.add_edges(full.src, full.dst, full.time, full.eid, add_reverse=True)
    return g, full


def _mfgs_equal(a, b):
    for la, lb in zip(a, b):
        for ma, mb in zip(la, lb):
            np.testing.assert_array_equal(np.asarray(ma.root_nids),
                                          np.asarray(mb.root_nids))
            np.testing.assert_array_equal(np.asarray(ma.nbr_nids),
                                          np.asarray(mb.nbr_nids))
            np.testing.assert_array_equal(np.asarray(ma.nbr_eids),
                                          np.asarray(mb.nbr_eids))
            np.testing.assert_array_equal(np.asarray(ma.nbr_mask),
                                          np.asarray(mb.nbr_mask))
            np.testing.assert_allclose(np.asarray(ma.nbr_ts),
                                       np.asarray(mb.nbr_ts))
            np.testing.assert_allclose(np.asarray(ma.nbr_dts),
                                       np.asarray(mb.nbr_dts))


@pytest.mark.parametrize("factor", [0.25, 0.5])
def test_recent_compacted_bit_identical(factor):
    g, full = _graph()
    dg = g.device_graph()
    rng = np.random.RandomState(0)
    roots = jnp.asarray(rng.randint(0, 600, 256), jnp.int32)
    ts = jnp.asarray(
        (rng.rand(256) * float(full.time.max())).astype(np.float32))
    kw = dict(fanouts=(5, 5), strategy="recent", num_snapshots=3,
              window=float(full.time.max()) / 50.0,
              search_iters=dg.search_iters)
    ref = jax.jit(lambda: sample_hops(dg, roots, ts, **kw))()
    got = jax.jit(lambda: sample_hops(dg, roots, ts,
                                      compact_factor=factor, **kw))()
    _mfgs_equal(ref, got)


def test_recent_compacted_overflow_falls_back():
    g, full = _graph()
    dg = g.device_graph()
    rng = np.random.RandomState(1)
    roots = jnp.asarray(rng.randint(0, 600, 128), jnp.int32)
    # late timestamps + wide window -> nearly every block valid -> the
    # tiny capacity must overflow and the cond fallback must produce the
    # exact uncompacted result
    ts = jnp.full((128,), float(full.time.max()), jnp.float32)
    kw = dict(fanouts=(5, 5), strategy="recent", num_snapshots=2,
              window=float(full.time.max()),
              search_iters=dg.search_iters)
    ref = jax.jit(lambda: sample_hops(dg, roots, ts, **kw))()
    got = jax.jit(lambda: sample_hops(dg, roots, ts,
                                      compact_factor=0.01, **kw))()
    # sanity: the overflow condition really holds (snapshot 1 covers the
    # full history; snapshot 0's window [ts-2W, ts-W) is empty here)
    inner = ref[1][1]
    assert int(inner.nbr_mask.any(axis=1).sum()) > int(0.01 * 128) + 1
    _mfgs_equal(ref, got)


def test_uniform_compacted_masks_and_window_membership():
    g, full = _graph()
    dg = g.device_graph()
    rng = np.random.RandomState(2)
    roots = jnp.asarray(rng.randint(0, 600, 256), jnp.int32)
    ts = jnp.asarray(
        (rng.rand(256) * float(full.time.max())).astype(np.float32))
    W = float(full.time.max()) / 50.0
    kw = dict(fanouts=(5, 5), strategy="uniform", num_snapshots=3,
              window=W, search_iters=dg.search_iters)
    key = jax.random.PRNGKey(7)
    ref = jax.jit(lambda: sample_hops(dg, roots, ts, key=key, **kw))()
    got = jax.jit(lambda: sample_hops(dg, roots, ts, key=key,
                                      compact_factor=0.25, **kw))()
    S = 3
    for layer in range(2):
        for s in range(S):
            ma, mb = ref[layer][s], got[layer][s]
            # masks depend only on candidate counts -> exact
            np.testing.assert_array_equal(np.asarray(ma.nbr_mask),
                                          np.asarray(mb.nbr_mask))
            np.testing.assert_array_equal(np.asarray(ma.root_nids),
                                          np.asarray(mb.root_nids))
            # picked edges must lie inside the snapshot window
            mask = np.asarray(mb.nbr_mask)
            rts = np.asarray(mb.root_ts)[:, None]
            end = rts - (S - s - 1) * W
            start = rts - (S - s) * W
            ets = np.asarray(mb.nbr_ts)  # prop_time False -> edge ts
            assert np.all(ets[mask] >= np.broadcast_to(start, ets.shape)[mask])
            assert np.all(ets[mask] < np.broadcast_to(end, ets.shape)[mask])
            # invalid slots are INVALID_NID
            assert np.all(np.asarray(mb.nbr_nids)[~mask] == INVALID_NID)
