"""Deterministic scatter helpers for functional state updates.

The reference resolves duplicate node ids in TGN memory write-back with a
scatter-permutation idiom that keeps the **last** occurrence
(``/root/reference/gnnflow/models/modules/memory.py:233-253``).  JAX scatter
with duplicate indices is order-unspecified, so we derive an explicit
winner mask via a stable sort instead — deterministic on TPU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def unique_keep_last_mask(nids: jax.Array,
                          valid: jax.Array | None = None) -> jax.Array:
    """Boolean mask selecting, for each distinct id, its last occurrence.

    ``valid`` (optional) marks rows that participate at all; invalid rows are
    never winners.  Shape-preserving and jit-friendly.
    """
    m = nids.shape[0]
    if valid is None:
        valid = jnp.ones((m,), dtype=bool)
    # Push invalid rows to a sentinel bucket so they can't shadow real ids.
    sentinel = jnp.iinfo(nids.dtype).max
    keyed = jnp.where(valid, nids, sentinel)
    perm = jnp.argsort(keyed, stable=True)
    sorted_ids = keyed[perm]
    is_last = jnp.concatenate(
        [sorted_ids[:-1] != sorted_ids[1:], jnp.ones((1,), dtype=bool)])
    mask = jnp.zeros((m,), dtype=bool).at[perm].set(is_last)
    return mask & valid


def scatter_rows(table: jax.Array, nids: jax.Array, rows: jax.Array,
                 winner_mask: jax.Array) -> jax.Array:
    """Write ``rows[i]`` into ``table[nids[i]]`` for winner rows only.

    Losers are routed to a scratch row appended beyond the live range, so a
    single XLA scatter suffices (no predicated writes).  ``table`` may be
    1-D or 2-D with leading dim >= max(nid)+1.
    """
    n = table.shape[0]
    safe_idx = jnp.where(winner_mask, nids, n)  # out-of-range drops the row
    return table.at[safe_idx].set(rows, mode="drop")
