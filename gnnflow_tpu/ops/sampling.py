"""Jittable temporal neighbor sampling over the flat T-CSR store.

TPU-native counterpart of the reference CUDA kernels
(``/root/reference/gnnflow/csrc/sampling_kernels.cu``) and sampler driver
(``csrc/temporal_sampler.cu``).  Where the reference launches one GPU thread
per (root, fanout-slot) walking per-vertex block chains, here every vertex's
history is one contiguous time-sorted run, so a layer sample is:

1. a **vectorized binary search** over all roots for the snapshot window
   ``[start_ts, end_ts)`` (the ``LowerBound`` of ``csrc/utils.cu:96``),
2. a dense gather of the selected edges into padded ``[B, fanout]`` outputs.

Snapshot-window math matches ``sampling_kernels.cu:29-40`` exactly:
- ``num_snapshots == 1``: ``start = 0`` if ``|window| < 1e-6`` else
  ``root_ts - window``; ``end = root_ts``.
- else snapshot ``i`` covers
  ``[root_ts-(S-i)*W, root_ts-(S-i-1)*W)``.

Strategies (``SamplingPolicy`` in ``csrc/api.cc``):
- ``recent``: the ``k``-th most recent in-window edge per slot
  (``sampling_kernels.cu:86-104``).
- ``uniform``: each slot draws uniformly (with replacement) from the
  in-window candidates, like ``curand() % num_candidates``
  (``sampling_kernels.cu:202-270``).

Invalid slots carry ``INVALID_NID`` — the padded-mask replacement for the
reference's ``thrust::remove_if`` compaction (``temporal_sampler.cu:191-199``).
Everything here runs under ``jax.jit`` (inside the train step itself).
"""
from __future__ import annotations

import functools
from typing import List, Sequence

import jax
import jax.numpy as jnp
from jax import lax

from gnnflow_tpu.common import INVALID_NID, MFG, NID_DTYPE, TS_DTYPE
from gnnflow_tpu.dynamic_graph import DeviceGraph


_LANES = 128  # TPU lane width: gathers fetch aligned 128-wide rows


def _rows(arr: jax.Array) -> jax.Array:
    """View a flat pool as [C/128, 128] (pool capacities are pow2>=1024)."""
    return arr.reshape(-1, _LANES)


def _gather_scalars(arr: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather ``arr[idx]`` for flat int indices of any shape.

    TPU scalar gathers cost ~16ns/element; fetching the aligned 128-lane
    row each index lives in and selecting with a one-hot mask is ~10x
    faster (wide-slice gather + VPU reduce)."""
    shape = idx.shape
    flat = idx.reshape(-1)
    row = flat // _LANES
    lane = flat - row * _LANES
    rows = _rows(arr)[row]                                  # [M, 128]
    onehot = lane[:, None] == jax.lax.broadcasted_iota(
        jnp.int32, (1, _LANES), 1)
    out = jnp.sum(jnp.where(onehot, rows, 0), axis=-1, dtype=arr.dtype) \
        if jnp.issubdtype(arr.dtype, jnp.integer) \
        else jnp.sum(jnp.where(onehot, rows, 0), axis=-1)
    return out.reshape(shape).astype(arr.dtype)


def _gather_windows(arr: jax.Array, start: jax.Array,
                    picks: jax.Array) -> jax.Array:
    """Gather ``arr[picks]`` where ``picks[b, f]`` all lie within
    ``[start[b], start[b] + width)`` for ``width <= 128``.

    One [B, 2, 128] aligned row-gather per array + one-hot selection —
    the contiguous-window fast path for recent sampling (slots
    ``[e_idx-F, e_idx)`` are adjacent in the time-sorted region)."""
    B, F = picks.shape
    row0 = jnp.clip(start // _LANES, 0, arr.shape[0] // _LANES - 2)
    rows = _rows(arr)[row0[:, None] + jnp.arange(2)[None, :]]  # [B,2,128]
    win = rows.reshape(B, 2 * _LANES)
    sel = jnp.clip(picks - row0[:, None] * _LANES, 0, 2 * _LANES - 1)
    onehot = sel[:, :, None] == jax.lax.broadcasted_iota(
        jnp.int32, (1, 1, 2 * _LANES), 2)
    return jnp.sum(jnp.where(onehot, win[:, None, :], 0), axis=-1,
                   dtype=arr.dtype) \
        if jnp.issubdtype(arr.dtype, jnp.integer) \
        else jnp.sum(jnp.where(onehot, win[:, None, :], 0),
                     axis=-1).astype(arr.dtype)


def _lower_bound(e_ts: jax.Array, off: jax.Array, ln: jax.Array,
                 target: jax.Array, iters: int) -> jax.Array:
    """First index ``i`` in ``[0, ln)`` with ``e_ts[off+i] >= target``,
    vectorized over a batch of (off, ln, target) triples.

    ``off``/``ln``/``target`` may carry an extra leading dim to search
    several targets per row in one fused loop (one gather per iteration
    regardless of how many searches run)."""
    lo = jnp.zeros_like(ln)
    hi = ln

    def body(_, lohi):
        lo, hi = lohi
        active = lo < hi
        mid = (lo + hi) // 2
        idx = jnp.clip(off + mid, 0, e_ts.shape[0] - 1)
        go_right = _gather_scalars(e_ts, idx) < target
        lo = jnp.where(active & go_right, mid + 1, lo)
        hi = jnp.where(active & ~go_right, mid, hi)
        return lo, hi

    lo, _ = lax.fori_loop(0, iters, body, (lo, hi))
    return lo


def snapshot_window(root_ts: jax.Array, snapshot_idx: int,
                    num_snapshots: int, window: float):
    """(start_ts, end_ts) per root — ``sampling_kernels.cu:29-40``."""
    if num_snapshots == 1:
        end = root_ts
        start = (jnp.zeros_like(root_ts) if abs(window) < 1e-6
                 else root_ts - window)
    else:
        end = root_ts - (num_snapshots - snapshot_idx - 1) * window
        start = end - window
    return start, end


@functools.partial(
    jax.jit,
    static_argnames=("fanout", "strategy", "snapshot_idx", "num_snapshots",
                     "window", "prop_time", "search_iters"))
def sample_layer(g: DeviceGraph, roots: jax.Array, root_ts: jax.Array,
                 *, fanout: int, strategy: str = "recent",
                 snapshot_idx: int = 0, num_snapshots: int = 1,
                 window: float = 0.0, prop_time: bool = False,
                 search_iters: int = 32,
                 key: jax.Array | None = None) -> MFG:
    """Sample one layer/snapshot for ``roots`` at ``root_ts`` → padded MFG.

    ``roots`` may contain ``INVALID_NID`` entries (padded upstream roots);
    they yield fully-masked rows.
    """
    if strategy not in ("recent", "uniform"):
        raise ValueError(f"strategy must be 'recent' or 'uniform'")
    B = roots.shape[0]
    roots = roots.astype(NID_DTYPE)
    root_ts = root_ts.astype(TS_DTYPE)

    valid_root = roots >= 0
    nid = jnp.where(valid_root, roots, 0)
    off = g.row_off[nid]
    ln = jnp.where(valid_root, g.row_len[nid], 0)

    start_ts, end_ts = snapshot_window(
        root_ts, snapshot_idx, num_snapshots, window)

    if num_snapshots == 1 and abs(window) < 1e-6:
        # full-history window: start is always index 0 (the TGN/TGAT
        # default) — one search instead of two
        s_idx = jnp.zeros_like(ln)
        e_idx = _lower_bound(g.e_ts, off, ln, end_ts, search_iters)
    else:
        # fuse both searches into one loop: a single [2, B] gather per
        # iteration instead of two sequential [B] gathers
        both = _lower_bound(
            g.e_ts,
            jnp.stack([off, off]), jnp.stack([ln, ln]),
            jnp.stack([start_ts, end_ts]), search_iters)
        s_idx, e_idx = both[0], both[1]
    num_candidates = e_idx - s_idx  # [B]

    if strategy == "recent":
        # slot k takes the k-th most recent in-window edge; picks are a
        # contiguous run [e_idx-F, e_idx) -> aligned-window fast gather
        k = jnp.arange(fanout, dtype=jnp.int32)[None, :]           # [1,F]
        pick = e_idx[:, None] - 1 - k                              # [B,F]
        mask = pick >= s_idx[:, None]
        idx = jnp.clip(off[:, None] + pick, 0, g.e_dst.shape[0] - 1)
        win_start = off + jnp.maximum(e_idx - fanout, 0)
        if fanout <= 128:
            dsts = _gather_windows(g.e_dst, win_start, idx)
            eids_ = _gather_windows(g.e_eid, win_start, idx)
            tss = _gather_windows(g.e_ts, win_start, idx)
        else:
            dsts, eids_, tss = g.e_dst[idx], g.e_eid[idx], g.e_ts[idx]
    else:
        if key is None:
            raise ValueError("uniform sampling requires a PRNG key")
        u = jax.random.uniform(key, (B, fanout), dtype=jnp.float32)
        nc = num_candidates[:, None]
        r = jnp.minimum((u * nc).astype(jnp.int32),
                        jnp.maximum(nc - 1, 0))
        pick = e_idx[:, None] - 1 - r
        mask = jnp.broadcast_to(nc > 0, (B, fanout))
        idx = jnp.clip(off[:, None] + pick, 0, g.e_dst.shape[0] - 1)
        dsts = _gather_scalars(g.e_dst, idx)
        eids_ = _gather_scalars(g.e_eid, idx)
        tss = _gather_scalars(g.e_ts, idx)

    nbr_nids = jnp.where(mask, dsts, INVALID_NID)
    nbr_eids = jnp.where(mask, eids_, 0)
    edge_ts = jnp.where(mask, tss, 0.0)
    nbr_dts = jnp.where(mask, root_ts[:, None] - edge_ts, 0.0)
    nbr_ts = jnp.where(
        mask,
        jnp.broadcast_to(root_ts[:, None], edge_ts.shape)
        if prop_time else edge_ts,
        0.0)

    return MFG(root_nids=roots, root_ts=root_ts, nbr_nids=nbr_nids,
               nbr_ts=nbr_ts, nbr_dts=nbr_dts, nbr_eids=nbr_eids,
               nbr_mask=mask)


@functools.partial(
    jax.jit,
    static_argnames=("fanout", "strategy", "num_snapshots", "window",
                     "prop_time", "search_iters"))
def sample_layer_snapshots(
        g: DeviceGraph, roots: jax.Array, root_ts: jax.Array, *,
        fanout: int, strategy: str = "recent", num_snapshots: int = 1,
        window: float = 0.0, prop_time: bool = False,
        search_iters: int = 32,
        key: jax.Array | None = None) -> List[MFG]:
    """All snapshots of one layer in ONE fused pass.

    ``roots``/``root_ts`` are [S, B] (per-snapshot root sets).  The S
    windowed binary searches run as a single stacked loop and the picks as
    one gather — S× fewer kernels than per-snapshot calls (the DySAT
    path).  Semantics identical to ``sample_layer`` per snapshot."""
    S, B = roots.shape
    roots = roots.astype(NID_DTYPE)
    root_ts = root_ts.astype(TS_DTYPE)
    valid_root = roots >= 0
    nid = jnp.where(valid_root, roots, 0)
    off = g.row_off[nid]
    ln = jnp.where(valid_root, g.row_len[nid], 0)

    snap = jnp.arange(S, dtype=TS_DTYPE)[:, None]         # [S, 1]
    if num_snapshots == 1:
        end_ts = root_ts
        start_ts = (jnp.zeros_like(root_ts) if abs(window) < 1e-6
                    else root_ts - window)
    else:
        end_ts = root_ts - (num_snapshots - snap - 1) * window
        start_ts = end_ts - window

    both = _lower_bound(
        g.e_ts, jnp.stack([off, off]), jnp.stack([ln, ln]),
        jnp.stack([start_ts, end_ts]), search_iters)      # [2, S, B]
    s_idx, e_idx = both[0], both[1]
    num_candidates = e_idx - s_idx

    if strategy == "recent":
        k = jnp.arange(fanout, dtype=jnp.int32)[None, None, :]
        pick = e_idx[..., None] - 1 - k                   # [S, B, F]
        mask = pick >= s_idx[..., None]
        idx = jnp.clip(off[..., None] + pick, 0, g.e_dst.shape[0] - 1)
        win_start = (off + jnp.maximum(e_idx - fanout, 0)).reshape(-1)
        flat_idx = idx.reshape(S * B, fanout)
        if fanout <= 128:
            dsts = _gather_windows(g.e_dst, win_start, flat_idx)
            eids_ = _gather_windows(g.e_eid, win_start, flat_idx)
            tss = _gather_windows(g.e_ts, win_start, flat_idx)
        else:
            dsts = g.e_dst[flat_idx]
            eids_ = g.e_eid[flat_idx]
            tss = g.e_ts[flat_idx]
        dsts = dsts.reshape(S, B, fanout)
        eids_ = eids_.reshape(S, B, fanout)
        tss = tss.reshape(S, B, fanout)
    else:
        if key is None:
            raise ValueError("uniform sampling requires a PRNG key")
        u = jax.random.uniform(key, (S, B, fanout), dtype=jnp.float32)
        nc = num_candidates[..., None]
        r = jnp.minimum((u * nc).astype(jnp.int32),
                        jnp.maximum(nc - 1, 0))
        pick = e_idx[..., None] - 1 - r
        mask = jnp.broadcast_to(nc > 0, (S, B, fanout))
        idx = jnp.clip(off[..., None] + pick, 0, g.e_dst.shape[0] - 1)
        dsts = _gather_scalars(g.e_dst, idx)
        eids_ = _gather_scalars(g.e_eid, idx)
        tss = _gather_scalars(g.e_ts, idx)

    nbr_nids = jnp.where(mask, dsts, INVALID_NID)
    nbr_eids = jnp.where(mask, eids_, 0)
    edge_ts = jnp.where(mask, tss, 0.0)
    nbr_dts = jnp.where(mask, root_ts[..., None] - edge_ts, 0.0)
    nbr_ts = jnp.where(
        mask,
        jnp.broadcast_to(root_ts[..., None], edge_ts.shape)
        if prop_time else edge_ts, 0.0)
    return [MFG(root_nids=roots[s], root_ts=root_ts[s],
                nbr_nids=nbr_nids[s], nbr_ts=nbr_ts[s],
                nbr_dts=nbr_dts[s], nbr_eids=nbr_eids[s],
                nbr_mask=mask[s]) for s in range(S)]


def sample_hops(g: DeviceGraph, roots: jax.Array, root_ts: jax.Array,
                *, fanouts: Sequence[int], strategy: str = "recent",
                num_snapshots: int = 1, window: float = 0.0,
                prop_time: bool = False, search_iters: int = 32,
                key: jax.Array | None = None) -> List[List[MFG]]:
    """Multi-layer, multi-snapshot k-hop sampling.

    Layer ``i+1`` roots are layer ``i``'s ``all_nodes`` per snapshot
    (``temporal_sampler.cu:279-305``).  The returned list is reversed so
    ``mfgs[0]`` is the innermost (deepest) layer — matching the reference's
    ``mfgs.reverse()`` in ``temporal_sampler.py:163-165``: model layer ``l``
    consumes ``mfgs[l]`` and the dst rows of ``mfgs[l]`` are the src rows of
    ``mfgs[l+1]``.
    """
    num_layers = len(fanouts)
    mfgs: List[List[MFG]] = []
    per_snap_roots = [(roots, root_ts)] * num_snapshots
    for layer in range(num_layers):
        lkey = (jax.random.fold_in(key, layer) if key is not None
                else None)
        if num_snapshots > 1:
            # all snapshots of this layer in one fused pass
            R = jnp.stack([r for r, _ in per_snap_roots])
            T = jnp.stack([t for _, t in per_snap_roots])
            layer_mfgs = sample_layer_snapshots(
                g, R, T, fanout=fanouts[layer], strategy=strategy,
                num_snapshots=num_snapshots, window=window,
                prop_time=prop_time, search_iters=search_iters,
                key=lkey)
        else:
            layer_mfgs = [sample_layer(
                g, roots if layer == 0 else per_snap_roots[0][0],
                root_ts if layer == 0 else per_snap_roots[0][1],
                fanout=fanouts[layer], strategy=strategy,
                snapshot_idx=0, num_snapshots=1, window=window,
                prop_time=prop_time, search_iters=search_iters,
                key=lkey)]
        per_snap_roots = [(m.all_nodes(), m.all_ts())
                          for m in layer_mfgs]
        mfgs.append(layer_mfgs)
    mfgs.reverse()
    return mfgs
