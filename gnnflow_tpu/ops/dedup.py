"""Exact (nid, ts) instance deduplication for the memory/GRU path.

The innermost MFG of a TGN batch holds ``L = B·(1+F)`` node *instances*
(roots + padded neighbor slots).  The memory updater's output for an
instance is a pure function of ``(nid, ts)`` and the (read-only within the
step) memory state — and measured streams repeat the same ``(nid, ts)``
pair heavily: at the REDDIT-scale headline config only ~13-17% of the
132k instances are unique.  The reference pays this redundancy in RPC
dedup (`/root/reference/gnnflow/models/modules/memory.py:156-190` uniquifies
before pulling) but still runs its GRU per-instance; on TPU the GRU itself
is the bandwidth hot spot, so we dedup the *compute*:

1. sort the ``(nid, ts-bits)`` pairs (2-key i32 variadic sort — measured
   ~0.05 ms for 132k rows on v5e),
2. rank unique pairs by ``cumsum`` over the change mask,
3. scatter winners into a fixed ``cap``-row compact table and every
   instance's unique slot into an inverse map.

The GRU then runs over ``cap`` rows and results are expanded back with one
128-lane-aligned row gather (the padded analogue of gather-by-inverse in
``np.unique(return_inverse=True)``).  ``cap`` is static; if a batch has
more uniques than ``cap`` the caller falls back to the per-instance path
(``lax.cond``), so results are exact for every input.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def dedup_instances(
        nid: jax.Array, ts: jax.Array, valid: jax.Array, cap: int,
        use_pallas: bool = None,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Deduplicate ``(nid, ts)`` instance pairs.

    Args:
        nid: [L] int32 node ids (value < 2^31-1; invalid rows may hold
            anything, including ``INVALID_NID``).
        ts: [L] float32 timestamps (compared bitwise).
        valid: [L] bool; invalid rows are excluded from the unique set.
        cap: static capacity of the compact table.

    Returns:
        ``(uniq_nid, uniq_ts, inv, n_uniq, sidx, rank_sorted)`` where
        ``uniq_nid``/``uniq_ts`` [cap] hold each unique pair (unused rows
        hold 0/0.0 — winner values are scattered from the sorted keys, so
        no gather is paid), ``inv`` [L] maps every instance to its unique
        slot (clamped to ``cap-1``; only meaningful when
        ``n_uniq <= cap``), ``n_uniq`` is the traced unique count
        (invalid-only inputs give 0), and ``sidx``/``rank_sorted`` [L]
        give the sorted decomposition of ``inv`` (``inv[sidx[p]] ==
        rank_sorted[p]``, ``rank_sorted`` non-decreasing) consumed by the
        sorted-segment-sum expansion VJP
        (:mod:`gnnflow_tpu.ops.segment_pallas`).
    """
    L = nid.shape[0]
    big = jnp.int32(np.iinfo(np.int32).max)
    tsb = lax.bitcast_convert_type(ts.astype(jnp.float32), jnp.int32)
    # invalid rows get the (maximal) sentinel key so they sort last and
    # are never marked unique
    k1 = jnp.where(valid, nid.astype(jnp.int32), big)
    k2 = jnp.where(valid, tsb, big)
    iota = lax.iota(jnp.int32, L)
    s1, s2, sidx = lax.sort((k1, k2, iota), num_keys=2)
    valid_s = s1 != big
    change = jnp.concatenate([
        jnp.ones((1,), bool),
        (s1[1:] != s1[:-1]) | (s2[1:] != s2[:-1])])
    first = change & valid_s
    rank = jnp.cumsum(first.astype(jnp.int32)) - 1    # [-1 .. n_uniq-1]
    n_uniq = rank[-1] + 1
    rank_sorted = jnp.clip(rank, 0, cap - 1)
    inv = jnp.zeros((L,), jnp.int32).at[sidx].set(
        rank_sorted, unique_indices=True)
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        # winner extraction without TPU scatters (measured ~0.7 ms EACH
        # for a [132k]->[cap] i32 scatter): each rank has exactly one
        # ``first`` row, so a first-masked sorted-segment-sum IS the
        # select.  i32 values ride exactly as two 16-bit halves in f32.
        from gnnflow_tpu.ops.segment_pallas import sorted_segment_sum
        f = first.astype(jnp.float32)
        cols = [
            f * jnp.right_shift(s1, 16).astype(jnp.float32),
            f * jnp.bitwise_and(s1, 0xFFFF).astype(jnp.float32),
            f * jnp.right_shift(s2, 16).astype(jnp.float32),
            f * jnp.bitwise_and(s2, 0xFFFF).astype(jnp.float32),
        ]
        vals = jnp.stack(cols, axis=1)                 # [L, 4]
        vals = jnp.pad(vals, ((0, 0), (0, 124)))       # lane multiple
        packed = sorted_segment_sum(vals, rank_sorted, cap,
                                    jax.default_backend() == "cpu")
        uniq_nid = (packed[:, 0].astype(jnp.int32) << 16) \
            | packed[:, 1].astype(jnp.int32)
        uniq_tsb = (packed[:, 2].astype(jnp.int32) << 16) \
            | packed[:, 3].astype(jnp.int32)
    else:
        # all-distinct slot ids (overflow/non-winner rows land >= cap
        # and are dropped) let the scatters assert unique_indices
        slot = jnp.where(first, rank, cap + iota)
        uniq_nid = jnp.zeros((cap,), jnp.int32).at[slot].set(
            s1, mode="drop", unique_indices=True)
        uniq_tsb = jnp.zeros((cap,), jnp.int32).at[slot].set(
            s2, mode="drop", unique_indices=True)
    uniq_ts = lax.bitcast_convert_type(uniq_tsb, jnp.float32)
    return uniq_nid, uniq_ts, inv, n_uniq, sidx, rank_sorted


def expand_rows(compact: jax.Array, inv: jax.Array,
                lanes: int = 128) -> jax.Array:
    """Gather ``compact[inv]`` with the column axis padded to a lane
    multiple first.

    TPU row gathers from non-128-aligned row widths hit a pathological
    path (measured ~65x slower for a [132k] gather of 100-wide vs
    128-wide rows on v5e); the pad makes the gather fetch aligned lanes
    and the slice back fuses into the consumers."""
    d = compact.shape[-1]
    pad = (-d) % lanes
    if pad:
        compact = jnp.pad(compact, ((0, 0), (0, pad)))
    out = compact[inv]
    return out[:, :d] if pad else out
