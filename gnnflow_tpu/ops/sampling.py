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
import math
from typing import List, Sequence

import jax
import jax.numpy as jnp
from jax import lax

from gnnflow_tpu.common import (EID_DTYPE, INVALID_NID,
                                MFG, NID_DTYPE, TS_DTYPE)
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


_TRIPLES_PER_ROW = 42  # 3 lanes per edge, 42 edges per 128-lane row


def build_triple_pool(e_dst: jax.Array, e_ts: jax.Array,
                      e_eid: jax.Array) -> jax.Array:
    """Interleave (dst, eid, ts-bits) into a [ceil(C/42), 128] i32 pool.

    Edge slot ``j`` lives in row ``j//42`` at lanes ``3*(j%42)+{0,1,2}``
    (dst, eid, ts); lanes 126-127 are padding.  A pick then needs ONE
    128-lane row fetch for all three values — TPU gather cost is purely
    per-element (~2.8 ns/row regardless of locality), so this beats three
    separate pools 3× and a 384-wide packed pool 2×.  Built with static
    reshapes only (no scatter); cheap enough to run on device at every
    store refresh."""
    C = e_dst.shape[0]
    n = -(-C // _TRIPLES_PER_ROW)
    pad = n * _TRIPLES_PER_ROW - C
    tsb = lax.bitcast_convert_type(e_ts, jnp.int32)
    cols = [jnp.pad(a.astype(jnp.int32), (0, pad)) for a in
            (e_dst, e_eid, tsb)]
    inter = jnp.stack(cols, axis=-1).reshape(n, 3 * _TRIPLES_PER_ROW)
    return jnp.pad(inter, ((0, 0), (0, _LANES - 3 * _TRIPLES_PER_ROW)))


def _select_triples(rows: jax.Array, lane: jax.Array):
    """Select (dst, eid, ts) from gathered triple-pool rows.

    ``rows`` is [M, W] (W = 128 or 256), ``lane`` [M] or [M, F] holds the
    dst lane index of each pick within its row window."""
    W = rows.shape[-1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, W), 2)
    ln = lane if lane.ndim == 2 else lane[:, None]
    r = rows[:, None, :] if rows.ndim == 2 else rows

    def sel(off):
        oh = ln[..., None] + off == iota
        return jnp.sum(jnp.where(oh, r, 0), axis=-1, dtype=jnp.int32)

    dst, eid, tsb = sel(0), sel(1), sel(2)
    ts = lax.bitcast_convert_type(tsb, jnp.float32)
    if lane.ndim == 1:
        dst, eid, ts = dst[:, 0], eid[:, 0], ts[:, 0]
    return dst, eid, ts


def _gather_triples(tp: jax.Array, idx: jax.Array):
    """Per-pick gather from the triple pool: ONE row fetch per pick.

    ``idx`` holds edge-slot ids of any shape; returns (dst, eid, ts)
    arrays of the same shape."""
    shape = idx.shape
    flat = idx.reshape(-1)
    row = flat // _TRIPLES_PER_ROW
    lane = 3 * (flat - row * _TRIPLES_PER_ROW)
    rows = tp[jnp.clip(row, 0, tp.shape[0] - 1)]          # [M, 128]
    dst, eid, ts = _select_triples(rows, lane)
    return (dst.reshape(shape).astype(NID_DTYPE),
            eid.reshape(shape).astype(EID_DTYPE),
            ts.reshape(shape).astype(TS_DTYPE))


def _gather_triples_window(tp: jax.Array, start: jax.Array,
                           picks: jax.Array):
    """Windowed triple gather: all of a root's picks lie in
    ``[start, start + width)`` with ``width <= 43`` (true for recent
    sampling, picks are the contiguous run ``[e_idx-F, e_idx)``), so TWO
    row fetches per root cover every pick."""
    B, F = picks.shape
    r0 = jnp.clip(start // _TRIPLES_PER_ROW, 0, tp.shape[0] - 2)
    rows = tp[r0[:, None] + jnp.arange(2, dtype=jnp.int32)[None, :]]
    rows = rows.reshape(B, 2 * _LANES)
    d = jnp.clip(picks - r0[:, None] * _TRIPLES_PER_ROW,
                 0, 2 * _TRIPLES_PER_ROW - 1)  # triple offset in window
    lane = 3 * d + 2 * (d >= _TRIPLES_PER_ROW)  # row 1 starts at lane 128
    dst, eid, ts = _select_triples(rows, lane)
    return (dst.astype(NID_DTYPE), eid.astype(EID_DTYPE),
            ts.astype(TS_DTYPE))


_PAIRS_PER_ROW = 64  # (off, len) pairs per 128-lane row


def build_pair_table(row_off: jax.Array, row_len: jax.Array) -> jax.Array:
    """Interleave (row_off, row_len) into a [ceil(N/64), 128] i32 table:
    vertex ``v`` at row ``v//64``, lanes ``2*(v%64)+{0,1}``.  The
    per-root (off, len) lookup then costs ONE gather element instead of
    two (gather cost is per-element on TPU)."""
    N = row_off.shape[0]
    n = -(-N // _PAIRS_PER_ROW)
    pad = n * _PAIRS_PER_ROW - N
    cols = [jnp.pad(a.astype(jnp.int32), (0, pad))
            for a in (row_off, row_len)]
    return jnp.stack(cols, axis=-1).reshape(n, _LANES)


def _gather_pairs(vp: jax.Array, nid: jax.Array):
    """(off, len) per vertex from the pair table — one row fetch each."""
    shape = nid.shape
    flat = nid.reshape(-1)
    row = flat // _PAIRS_PER_ROW
    lane = 2 * (flat - row * _PAIRS_PER_ROW)
    rows = vp[jnp.clip(row, 0, vp.shape[0] - 1)]            # [M, 128]
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)

    def sel(o):
        return jnp.sum(jnp.where(lane[:, None] + o == iota, rows, 0),
                       axis=-1, dtype=jnp.int32)

    return sel(0).reshape(shape), sel(1).reshape(shape)


def _root_off_len(g: DeviceGraph, nid: jax.Array, valid: jax.Array):
    """Per-root (off, len) lookup via the packed pair table when present."""
    if getattr(g, "v_pairs", None) is not None:
        off, ln = _gather_pairs(g.v_pairs, nid)
    else:
        off = _gather_scalars(g.row_off, nid)
        ln = _gather_scalars(g.row_len, nid)
    return off, jnp.where(valid, ln, 0)


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


def _lower_bound_multi(e_ts: jax.Array, off: jax.Array, ln: jax.Array,
                       targets: jax.Array, iters: int) -> jax.Array:
    """First index ``i`` in ``[0, ln)`` with ``e_ts[off+i] >= target``
    for ``K`` targets per (off, ln) query: ``targets`` is
    ``[K, *off.shape]`` and the result matches that shape.

    Hierarchical search (the dominant sampler cost is HBM row fetches,
    so the goal is one full-width row gather per search instead of
    ``iters``):

    1. **Coarse**: count, over the per-128-row *first timestamps*
       (``e_ts[::128]`` — ≤1/128th of the pool, cache-resident), the rows
       of the run that precede ``target`` — a masked vector compare over
       one 2-row aligned window.  Only rows whose first element lies
       strictly inside ``[off, off+ln)`` participate, so pool slack /
       other vertices never pollute the search.  The window FETCH depends
       only on (off, ln), so all ``K`` targets of a query (snapshot
       boundaries share one root) reuse a single fetch — the point of the
       multi-target form.
    2. **Fine**: gather that single 128-lane row per target and count
       in-run elements ``< target``."""
    coarse = _coarsen(e_ts.reshape(-1, _LANES)[:, 0])

    K = targets.shape[0]
    shape = targets.shape
    foff = off.reshape(-1)
    fln = ln.reshape(-1)
    ft = targets.reshape(K, -1)             # [K, M]
    row_lo = foff >> 7                      # row holding the run start
    row_hi = jnp.where(fln > 0, (foff + fln - 1) >> 7, row_lo)
    # goal: rp = last row r in [row_lo, row_hi] with coarse[r] < target
    # (row_lo always qualifies by convention — its first element may
    # predate the run, the fine phase masks it out).
    if iters > 14:
        # 3-level: one more coarsening (e_ts[::16384]) bounds any degree
        # up to 2^21 per 256-lane window; unrolled pre-narrowing beyond.
        coarse2 = _coarsen(coarse.reshape(-1, _LANES)[:, 0])
        lo2 = jnp.broadcast_to(((row_lo >> 7) + 1)[None], (K,) + row_lo.shape)
        hi2 = jnp.broadcast_to(((row_hi >> 7) + 1)[None], lo2.shape)
        if iters > 21:                       # degree > 2M edges/vertex
            lo2, hi2 = lo2.reshape(-1), hi2.reshape(-1)
            ftf = ft.reshape(-1)
            for _ in range(iters - 21):
                active = lo2 < hi2
                mid = (lo2 + hi2) // 2
                go_right = _gather_scalars(coarse2, mid) < ftf
                lo2 = jnp.where(active & go_right, mid + 1, lo2)
                hi2 = jnp.where(active & ~go_right, mid, hi2)
            lo2 = lo2.reshape(K, -1)
            hi2 = hi2.reshape(K, -1)
            rp2 = (lo2 - 1) + _window_count(
                coarse2, lo2.reshape(-1), hi2.reshape(-1),
                ft.reshape(-1)).reshape(K, -1)
        else:
            # shared window fetch across the K targets of each query
            rp2 = (lo2 - 1) + _window_count_multi(
                coarse2, lo2[0], hi2[0], ft)
        lo1 = jnp.maximum(row_lo[None], rp2 * _LANES)
        hi1 = jnp.minimum(row_hi[None], rp2 * _LANES + _LANES - 1)
        # level-1 windows depend on rp2, hence per-target: unshared count
        rp = lo1 + _window_count(
            coarse, (lo1 + 1).reshape(-1), (hi1 + 1).reshape(-1),
            ft.reshape(-1)).reshape(K, -1)
    else:                                   # degree <= 16384: 2-level
        rp = row_lo[None] + _window_count_multi(
            coarse, row_lo + 1, row_hi + 1, ft)

    frp = rp.reshape(-1)                    # [K*M]
    rows = _rows(e_ts)[frp]                 # one gather per search
    pos = frp[:, None] * _LANES + jnp.arange(_LANES, dtype=jnp.int32)
    toff = jnp.tile(foff, K)
    tln = jnp.tile(fln, K)
    in_run = (pos >= toff[:, None]) & (pos < (toff + tln)[:, None])
    cnt = jnp.sum(in_run & (rows < ft.reshape(-1)[:, None]), axis=-1,
                  dtype=jnp.int32)
    i = jnp.maximum(frp * _LANES - toff, 0) + cnt
    return jnp.minimum(i, tln).reshape(shape)


def _lower_bound(e_ts: jax.Array, off: jax.Array, ln: jax.Array,
                 target: jax.Array, iters: int) -> jax.Array:
    """Single-target form of :func:`_lower_bound_multi` (``off``/``ln``/
    ``target`` share one shape)."""
    return _lower_bound_multi(e_ts, off, ln, target[None], iters)[0]


def _coarsen(c: jax.Array) -> jax.Array:
    """Pad a coarse level to >=256 entries and a 128 multiple so 2-row
    window gathers are always in-bounds."""
    pad = max(2 * _LANES - c.shape[0], (-c.shape[0]) % _LANES)
    return jnp.pad(c, (0, pad)) if pad > 0 else c


def _window_count(arr: jax.Array, lo: jax.Array, hi: jax.Array,
                  target: jax.Array) -> jax.Array:
    """``#{r in [lo, hi) : arr[r] < target}`` for ``hi - lo <= 129``
    (``arr`` sorted on that range), via ONE 2-row aligned window gather
    — 2 gather elements per query, loop-free."""
    base = jnp.clip((lo - 1) >> 7, 0, arr.shape[0] // _LANES - 2)
    w = _rows(arr)[base[:, None]
                   + jnp.arange(2, dtype=jnp.int32)[None, :]]
    w = w.reshape(-1, 2 * _LANES)           # [M, 256]
    pos = base[:, None] * _LANES + jnp.arange(2 * _LANES,
                                              dtype=jnp.int32)[None, :]
    ok = (pos >= lo[:, None]) & (pos < hi[:, None])
    return jnp.sum(ok & (w < target[:, None]), axis=-1, dtype=jnp.int32)


def _window_count_multi(arr: jax.Array, lo: jax.Array, hi: jax.Array,
                        targets: jax.Array) -> jax.Array:
    """:func:`_window_count` for ``K`` targets per (lo, hi) window:
    ``targets`` is [K, M], result [K, M].  The 2-row window gather and
    in-window mask are computed ONCE per query and reused across the K
    targets — snapshot boundaries of one root share both."""
    base = jnp.clip((lo - 1) >> 7, 0, arr.shape[0] // _LANES - 2)
    w = _rows(arr)[base[:, None]
                   + jnp.arange(2, dtype=jnp.int32)[None, :]]
    w = w.reshape(-1, 2 * _LANES)           # [M, 256]
    pos = base[:, None] * _LANES + jnp.arange(2 * _LANES,
                                              dtype=jnp.int32)[None, :]
    ok = (pos >= lo[:, None]) & (pos < hi[:, None])
    return jnp.sum(ok[None] & (w[None] < targets[:, :, None]), axis=-1,
                   dtype=jnp.int32)


def snapshot_window(root_ts: jax.Array, snapshot_idx: int,
                    num_snapshots: int, window: float):
    """(start_ts, end_ts) per root — ``sampling_kernels.cu:29-40``."""
    if num_snapshots == 1:
        end = root_ts
        start = (jnp.zeros_like(root_ts) if abs(window) < 1e-6
                 else root_ts - window)
    else:
        # multiplicative form (not ``end - window``): bitwise-identical
        # to the chained-boundary search in ``sample_layer_snapshots``
        end = root_ts - (num_snapshots - snapshot_idx - 1) * window
        start = root_ts - (num_snapshots - snapshot_idx) * window
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
    off, ln = _root_off_len(g, nid, valid_root)

    start_ts, end_ts = snapshot_window(
        root_ts, snapshot_idx, num_snapshots, window)

    if num_snapshots == 1 and abs(window) < 1e-6:
        # full-history window: start is always index 0 (the TGN/TGAT
        # default) — one search instead of two
        s_idx = jnp.zeros_like(ln)
        e_idx = _lower_bound(g.e_ts, off, ln, end_ts, search_iters)
    else:
        # both boundaries in one multi-target search: the coarse window
        # fetch is shared (one per root, not one per boundary)
        both = _lower_bound_multi(
            g.e_ts, off, ln,
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
        if g.e_triples is not None and fanout <= _TRIPLES_PER_ROW + 1:
            dsts, eids_, tss = _gather_triples_window(
                g.e_triples, win_start, idx)
        elif fanout <= 128:
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
        if g.e_triples is not None:
            dsts, eids_, tss = _gather_triples(g.e_triples, idx)
        else:
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
                     "prop_time", "search_iters", "shared_roots"))
def sample_layer_snapshots(
        g: DeviceGraph, roots: jax.Array, root_ts: jax.Array, *,
        fanout: int, strategy: str = "recent", num_snapshots: int = 1,
        window: float = 0.0, prop_time: bool = False,
        search_iters: int = 32, shared_roots: bool = False,
        key: jax.Array | None = None) -> List[MFG]:
    """All snapshots of one layer in ONE fused pass.

    ``roots``/``root_ts`` are [S, B] (per-snapshot root sets).  The S
    windowed binary searches run as a single stacked loop and the picks as
    one gather — S× fewer kernels than per-snapshot calls (the DySAT
    path).  Semantics identical to ``sample_layer`` per snapshot.

    ``shared_roots=True`` asserts every snapshot has the SAME (root, ts)
    rows (true for the first layer, where the batch roots fan out to all
    snapshots).  Then the (off, len) lookup runs once per root instead of
    S times, and because adjacent snapshot windows share a boundary
    (snapshot ``s`` ends where ``s+1`` starts), the 2S boundary searches
    collapse to S+1 chained ones."""
    S, B = roots.shape
    roots = roots.astype(NID_DTYPE)
    root_ts = root_ts.astype(TS_DTYPE)
    valid_root = roots >= 0
    nid = jnp.where(valid_root, roots, 0)

    snap = jnp.arange(S, dtype=TS_DTYPE)[:, None]         # [S, 1]
    if num_snapshots == 1:
        end_ts = root_ts
        start_ts = (jnp.zeros_like(root_ts) if abs(window) < 1e-6
                    else root_ts - window)
    else:
        end_ts = root_ts - (num_snapshots - snap - 1) * window
        start_ts = root_ts - (num_snapshots - snap) * window

    if shared_roots and num_snapshots > 1:
        off1, ln1 = _root_off_len(g, nid[0], valid_root[0])   # [B]
        # chained boundaries b_j = ts - (S-j)*W, j = 0..S: snapshot s is
        # [b_s, b_{s+1}) — S+1 searches instead of 2S, coarse fetch shared
        j = jnp.arange(S + 1, dtype=TS_DTYPE)[:, None]
        bounds = _lower_bound_multi(
            g.e_ts, off1, ln1,
            root_ts[0][None] - (num_snapshots - j) * window,
            search_iters)                                     # [S+1, B]
        s_idx, e_idx = bounds[:S], bounds[1:]
        off = jnp.broadcast_to(off1[None], (S, B))
    else:
        off, ln = _root_off_len(g, nid, valid_root)
        both = _lower_bound_multi(
            g.e_ts, off, ln,
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
        if g.e_triples is not None and fanout <= _TRIPLES_PER_ROW + 1:
            dsts, eids_, tss = _gather_triples_window(
                g.e_triples, win_start, flat_idx)
        elif fanout <= 128:
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
        if g.e_triples is not None:
            dsts, eids_, tss = _gather_triples(g.e_triples, idx)
        else:
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


def _nth_valid_block(csum: jax.Array, cap: int) -> jax.Array:
    """``csum`` is [S, B] inclusive per-snapshot counts of valid blocks.
    Returns [S, cap]: the index of the ``q``-th valid block per snapshot
    (``B`` when ``q >= total``).  One hierarchical lower-bound per (s, q)
    — the S coarse window fetches are shared across all ``cap`` targets."""
    S, B = csum.shape
    Bp = -(-B // _LANES) * _LANES
    flat = jnp.pad(csum, ((0, 0), (0, Bp - B)),
                   constant_values=jnp.int32(1 << 30)).reshape(-1)
    off = jnp.arange(S, dtype=jnp.int32) * Bp                # [S]
    ln = jnp.full((S,), B, jnp.int32)
    targets = jnp.broadcast_to(
        jnp.arange(1, cap + 1, dtype=jnp.int32)[:, None], (cap, S))
    iters = max(1, (B - 1).bit_length())
    return _lower_bound_multi(flat, off, ln, targets, iters).T  # [S, cap]


def _sample_layer_compacted(
        g: DeviceGraph, prev_mfgs: List[MFG], cap: int, *,
        fanout: int, strategy: str, num_snapshots: int, window: float,
        prop_time: bool, search_iters: int,
        key: jax.Array | None) -> List[MFG]:
    """Sample the next layer over a COMPACTED root set.

    The padded-MFG analogue of the reference's ``thrust::remove_if``
    compaction (``temporal_sampler.cu:191-199``): in windowed
    multi-snapshot configs most neighbor slots of the previous layer are
    invalid (empty windows), yet the padded design pays full search+pick
    cost for every slot.  Here the valid F-wide neighbor blocks of each
    snapshot are packed into a fixed ``cap``-block prefix, the layer is
    sampled over ``[B + cap*F]`` roots instead of ``[B*(1+F)]``, and the
    outputs are expanded back to full shape by a row gather — results are
    identical to the uncompacted path (for ``uniform``, up to the RNG
    assignment of picks within a window; validity masks are identical).

    If more than ``cap`` blocks are valid, falls back to the uncompacted
    path via ``lax.cond`` (both branches compiled, one executed) — never
    drops neighbors.
    """
    S = len(prev_mfgs)
    B1 = prev_mfgs[0].num_dst
    F = prev_mfgs[0].fanout
    R_full = jnp.stack([m.all_nodes() for m in prev_mfgs])    # [S, B2]
    T_full = jnp.stack([m.all_ts() for m in prev_mfgs])
    roots_S = jnp.stack([m.root_nids for m in prev_mfgs])     # [S, B1]
    rts_S = jnp.stack([m.root_ts for m in prev_mfgs])

    kwargs = dict(fanout=fanout, strategy=strategy,
                  num_snapshots=num_snapshots, window=window,
                  prop_time=prop_time, search_iters=search_iters)

    def full_path():
        return sample_layer_snapshots(g, R_full, T_full, key=key,
                                      **kwargs)

    bv = jnp.stack([m.nbr_mask.any(axis=1) for m in prev_mfgs])
    csum = jnp.cumsum(bv.astype(jnp.int32), axis=1)           # [S, B1]
    total = csum[:, -1]

    def compact_path():
        blk = _nth_valid_block(csum, cap)                     # [S, cap]
        nbr_n = jnp.stack([m.nbr_nids for m in prev_mfgs])    # [S, B1, F]
        nbr_t = jnp.stack([m.nbr_ts for m in prev_mfgs])
        gn = jnp.concatenate(
            [nbr_n, jnp.full((S, 1, F), INVALID_NID, nbr_n.dtype)], 1)
        gt = jnp.concatenate([nbr_t, jnp.zeros((S, 1, F), nbr_t.dtype)], 1)
        cn = jnp.take_along_axis(gn, blk[:, :, None], axis=1)  # [S,cap,F]
        ct = jnp.take_along_axis(gt, blk[:, :, None], axis=1)
        Rc = jnp.concatenate([roots_S, cn.reshape(S, cap * F)], axis=1)
        Tc = jnp.concatenate([rts_S, ct.reshape(S, cap * F)], axis=1)
        mc = sample_layer_snapshots(g, Rc, Tc, key=key, **kwargs)

        # expand each [B1 + cap*F, F2] field back to [B1*(1+F), F2]:
        # block i of the full layout maps to compact slot csum[i]-1 when
        # valid, else to the all-invalid pad slot ``cap``
        rank = jnp.where(bv, csum - 1, cap)                   # [S, B1]
        out = []
        for s in range(S):
            m = mc[s]

            def expand(fc, fill):
                F2 = fc.shape[1]
                head = fc[:B1]
                tail = jnp.concatenate(
                    [fc[B1:].reshape(cap, F * F2),
                     jnp.full((1, F * F2), fill, fc.dtype)], axis=0)
                body = tail[rank[s]].reshape(B1 * F, F2)
                return jnp.concatenate([head, body], axis=0)

            out.append(MFG(
                root_nids=R_full[s], root_ts=T_full[s],
                nbr_nids=expand(m.nbr_nids, INVALID_NID),
                nbr_ts=expand(m.nbr_ts, 0.0),
                nbr_dts=expand(m.nbr_dts, 0.0),
                nbr_eids=expand(m.nbr_eids, 0),
                nbr_mask=expand(m.nbr_mask, False)))
        return out

    return lax.cond(jnp.any(total > cap), full_path, compact_path)


def boundary_overflow(prev_mfgs: List[MFG], cap: int) -> jax.Array:
    """Traced bool: does any snapshot of ``prev_mfgs`` have more valid
    neighbor blocks than ``cap``?  Computable from the parent layer's
    masks alone — BEFORE any deeper sampling — so the model-compaction
    cond wastes no work when it falls back."""
    bv = jnp.stack([m.nbr_mask.any(axis=1) for m in prev_mfgs])
    return jnp.any(jnp.sum(bv.astype(jnp.int32), axis=1) > cap)


def sample_deeper_compact(
        g: DeviceGraph, prev_mfgs: List[MFG], cap: int, *,
        fanout: int = 0, strategy: str = "recent", num_snapshots: int = 1,
        window: float = 0.0, prop_time: bool = False,
        search_iters: int = 32, key: jax.Array | None = None,
        sample_fn=None):
    """Sample one deeper layer over the COMPACT root set, keeping the
    result compact for the model (the full-pipeline analogue of the
    reference feeding *compacted* ``all_nodes`` to the next layer,
    ``temporal_sampler.cu:279-305``).

    Valid F-wide neighbor blocks of each snapshot pack into a ``cap``-
    block prefix; the returned MFGs have ``num_dst = B + cap*F``.  The
    caller expands the layer's output EMBEDDINGS via
    ``ops/segment_pallas.expand_blocks`` with the returned ``rank``
    [S, B].  Only exact when :func:`boundary_overflow` is False.

    ``sample_fn(Rc, Tc) -> list[MFG]`` overrides the store sampler for
    the packed roots — the block-packing math is store-independent, so a
    partitioned trainer passes its routed layer sampler here and block
    compaction composes with the partitioned graph store.
    """
    S = len(prev_mfgs)
    prev = prev_mfgs
    B1 = prev[0].num_dst
    F = prev[0].fanout
    bv = jnp.stack([m.nbr_mask.any(axis=1) for m in prev])
    csum = jnp.cumsum(bv.astype(jnp.int32), axis=1)           # [S, B1]
    blk = _nth_valid_block(csum, cap)                         # [S, cap]
    nbr_n = jnp.stack([m.nbr_nids for m in prev])
    nbr_t = jnp.stack([m.nbr_ts for m in prev])
    gn = jnp.concatenate(
        [nbr_n, jnp.full((S, 1, F), INVALID_NID, nbr_n.dtype)], 1)
    gt = jnp.concatenate(
        [nbr_t, jnp.zeros((S, 1, F), nbr_t.dtype)], 1)
    cn = jnp.take_along_axis(gn, blk[:, :, None], axis=1)
    ct = jnp.take_along_axis(gt, blk[:, :, None], axis=1)
    roots_S = jnp.stack([m.root_nids for m in prev])
    rts_S = jnp.stack([m.root_ts for m in prev])
    Rc = jnp.concatenate([roots_S, cn.reshape(S, cap * F)], axis=1)
    Tc = jnp.concatenate([rts_S, ct.reshape(S, cap * F)], axis=1)
    if sample_fn is not None:
        mc = sample_fn(Rc, Tc)
    else:
        mc = sample_layer_snapshots(
            g, Rc, Tc, fanout=fanout, strategy=strategy,
            num_snapshots=num_snapshots, window=window,
            prop_time=prop_time, search_iters=search_iters, key=key)
    rank = jnp.where(bv, csum - 1, cap)                       # [S, B1]
    return mc, rank


def sample_hops(g: DeviceGraph, roots: jax.Array, root_ts: jax.Array,
                *, fanouts: Sequence[int], strategy: str = "recent",
                num_snapshots: int = 1, window: float = 0.0,
                prop_time: bool = False, search_iters: int = 32,
                compact_factor: float | None = None,
                key: jax.Array | None = None) -> List[List[MFG]]:
    """Multi-layer, multi-snapshot k-hop sampling.

    Layer ``i+1`` roots are layer ``i``'s ``all_nodes`` per snapshot
    (``temporal_sampler.cu:279-305``).  The returned list is reversed so
    ``mfgs[0]`` is the innermost (deepest) layer — matching the reference's
    ``mfgs.reverse()`` in ``temporal_sampler.py:163-165``: model layer ``l``
    consumes ``mfgs[l]`` and the dst rows of ``mfgs[l]`` are the src rows of
    ``mfgs[l+1]``.

    ``compact_factor``: when set (0 < f <= 1) and the config is windowed
    multi-snapshot, deeper layers sample over a compacted root set of at
    most ``ceil(f * num_prev_roots)`` valid neighbor blocks (see
    :func:`_sample_layer_compacted`); overflow falls back to the full
    path, so results never change.
    """
    num_layers = len(fanouts)
    mfgs: List[List[MFG]] = []
    per_snap_roots = [(roots, root_ts)] * num_snapshots
    layer_mfgs: List[MFG] = []
    for layer in range(num_layers):
        lkey = (jax.random.fold_in(key, layer) if key is not None
                else None)
        if num_snapshots > 1:
            if layer > 0 and compact_factor is not None:
                cap = min(prev_num_dst, max(
                    1, math.ceil(compact_factor * prev_num_dst)))
                layer_mfgs = _sample_layer_compacted(
                    g, layer_mfgs, cap, fanout=fanouts[layer],
                    strategy=strategy, num_snapshots=num_snapshots,
                    window=window, prop_time=prop_time,
                    search_iters=search_iters, key=lkey)
            else:
                # all snapshots of this layer in one fused pass
                R = jnp.stack([r for r, _ in per_snap_roots])
                T = jnp.stack([t for _, t in per_snap_roots])
                layer_mfgs = sample_layer_snapshots(
                    g, R, T, fanout=fanouts[layer], strategy=strategy,
                    num_snapshots=num_snapshots, window=window,
                    prop_time=prop_time, search_iters=search_iters,
                    shared_roots=(layer == 0), key=lkey)
        else:
            layer_mfgs = [sample_layer(
                g, roots if layer == 0 else per_snap_roots[0][0],
                root_ts if layer == 0 else per_snap_roots[0][1],
                fanout=fanouts[layer], strategy=strategy,
                snapshot_idx=0, num_snapshots=1, window=window,
                prop_time=prop_time, search_iters=search_iters,
                key=lkey)]
        prev_num_dst = layer_mfgs[0].num_dst
        per_snap_roots = [(m.all_nodes(), m.all_ts())
                          for m in layer_mfgs]
        mfgs.append(layer_mfgs)
    mfgs.reverse()
    return mfgs
