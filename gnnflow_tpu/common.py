"""Core type constants and the padded message-flow-graph (MFG) structure.

TPU-native counterpart of the reference's ``SamplingResult`` / DGL block
(``/root/reference/gnnflow/csrc/common.h:13-21`` defines NIDType=int64,
TimestampType=float32, EIDType=int64, kInvalidNID=-1).  On TPU we use int32
node/edge ids on device (configurable) and replace variable-length compacted
edge lists with **dense padded** ``[num_dst, fanout]`` neighbor tensors plus a
validity mask — the idiomatic XLA representation (static shapes, no
``thrust::remove_if`` compaction, gathers stay dense).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

# Device-side dtypes.  The reference uses int64 ids (csrc/common.h:13-15);
# int32 suffices for every supported dataset (< 2^31 nodes/edges) and is
# substantially faster on TPU.
NID_DTYPE = jnp.int32
EID_DTYPE = jnp.int32
TS_DTYPE = jnp.float32

# Invalid-neighbor sentinel (csrc/common.h:20 ``kInvalidNID = -1``).
INVALID_NID = -1

# Timestamp used for "static" (non-temporal) sampling; the reference uses
# float32 max (temporal_sampler.py:72-76).
STATIC_TS = float(np.finfo(np.float32).max)


class MFG(struct.PyTreeNode):
    """A padded message flow graph for one (layer, snapshot).

    Equivalent information to the reference MFG built in
    ``temporal_sampler.py:149-165`` (srcdata ID/ts, edata dt/ID, row/col),
    but with fixed shapes:

    - ``num_dst`` target nodes come first (rows of ``root_*``),
    - each has exactly ``fanout`` padded neighbor slots (``nbr_*``),
    - ``nbr_mask`` marks valid sampled edges; invalid slots hold
      ``INVALID_NID`` / zeros.

    ``all_nodes`` (the reference's ``srcdata['ID']``) is
    ``concat([root_nids, nbr_nids.reshape(-1)])`` and is the root set of the
    next (deeper) sampling layer.
    """

    root_nids: jax.Array   # [B] int32
    root_ts: jax.Array     # [B] float32
    nbr_nids: jax.Array    # [B, F] int32 (INVALID_NID when invalid)
    nbr_ts: jax.Array      # [B, F] float32 (edge ts, or root ts if prop_time)
    nbr_dts: jax.Array     # [B, F] float32 (root_ts - edge_ts)
    nbr_eids: jax.Array    # [B, F] int32
    nbr_mask: jax.Array    # [B, F] bool

    @property
    def num_dst(self) -> int:
        return self.root_nids.shape[0]

    @property
    def fanout(self) -> int:
        return self.nbr_nids.shape[1]

    @property
    def num_all(self) -> int:
        return self.num_dst * (1 + self.fanout)

    def all_nodes(self) -> jax.Array:
        """[B*(1+F)] node ids: dst nodes first, then padded neighbors."""
        return jnp.concatenate(
            [self.root_nids, self.nbr_nids.reshape(-1)])

    def all_ts(self) -> jax.Array:
        """[B*(1+F)] timestamps aligned with :meth:`all_nodes`."""
        return jnp.concatenate([self.root_ts, self.nbr_ts.reshape(-1)])

    def all_mask(self) -> jax.Array:
        """[B*(1+F)] validity: dst rows always valid, neighbor rows masked."""
        return jnp.concatenate([
            jnp.ones((self.num_dst,), dtype=bool),
            self.nbr_mask.reshape(-1)])

    def num_sampled_edges(self) -> jax.Array:
        """Total number of valid sampled edges (traced scalar)."""
        return jnp.sum(self.nbr_mask.astype(jnp.int32))
