"""TGN node memory + mailbox as functional device state.

Parity with ``/root/reference/gnnflow/models/modules/memory.py`` (Memory)
and ``memory_updater.py`` (GRUMemeoryUpdater), re-designed functionally:
the four state tensors live in one pytree threaded through the jitted train
step; write-back is a deterministic sort-based unique-keep-last scatter
(the reference's scatter-permutation idiom, ``memory.py:233-253``).

Known reference quirk preserved for parity: mailbox timestamps are taken as
``last_updated_ts[:2B]`` (src-block then dst-block order) while mails/nids
are interleaved ``[s0,d0,s1,d1,...]`` (``memory.py:228-232``) — i.e.
``mail_ts`` is block-ordered, not interleaved.  TGL does the same.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from gnnflow_tpu.common import MFG
from gnnflow_tpu.models.modules import Linear, TimeEncode
from gnnflow_tpu.ops.segment import unique_keep_last_mask


class MemoryState(struct.PyTreeNode):
    """Per-node memory state (``memory.py:58-66``).

    Packed as ONE row table holding
    ``[mem | mem_ts | mails (S*dim_raw) | mail_ts (S) | ptr]`` per node —
    the layout the reference uses for partitioned memory rows
    (``kvstore.py:159-177``), generalized to ``mailbox_slots = S`` mail
    slots (S > 1 is the APAN-style circular mailbox; ``ptr`` is the
    per-node write cursor).  On TPU this makes the per-batch memory pull
    a single row gather; the logical tensors are column views."""

    data: jax.Array
    dim_memory: int = struct.field(pytree_node=False)
    mailbox_slots: int = struct.field(pytree_node=False, default=1)

    @property
    def num_nodes(self) -> int:
        return self.data.shape[0]

    @property
    def dim_raw(self) -> int:
        s = self.mailbox_slots
        return (self.data.shape[1] - self.dim_memory - 2 - s) // s

    # -- column views (the reference's four tensors) --------------------

    @property
    def node_memory(self) -> jax.Array:
        return self.data[:, : self.dim_memory]

    @property
    def node_memory_ts(self) -> jax.Array:
        return self.data[:, self.dim_memory]

    @property
    def mailbox(self) -> jax.Array:
        """[N, dim_raw] (S==1) or [N, S, dim_raw]."""
        dm, s, dr = self.dim_memory, self.mailbox_slots, self.dim_raw
        block = self.data[:, dm + 1: dm + 1 + s * dr]
        return block if s == 1 else block.reshape(-1, s, dr)

    @property
    def mailbox_ts(self) -> jax.Array:
        s = self.mailbox_slots
        block = self.data[:, -1 - s: -1]
        return block[:, 0] if s == 1 else block

    @property
    def mailbox_ptr(self) -> jax.Array:
        return self.data[:, -1]


def init_memory(num_nodes: int, dim_memory: int, dim_edge: int,
                dtype=jnp.float32, mailbox_slots: int = 1) -> MemoryState:
    dim_raw = 2 * dim_memory + dim_edge
    cols = dim_memory + 1 + mailbox_slots * (dim_raw + 1) + 1
    return MemoryState(
        data=jnp.zeros((num_nodes, cols), dtype),
        dim_memory=dim_memory, mailbox_slots=mailbox_slots)


def reset_memory(state: MemoryState) -> MemoryState:
    return jax.tree.map(jnp.zeros_like, state)


def resize_memory(state: MemoryState, num_nodes: int) -> MemoryState:
    """Grow (zero-filled) to ``num_nodes`` rows (``memory.py:112-131``)."""
    if num_nodes <= state.num_nodes:
        return state
    pad = num_nodes - state.num_nodes
    return state.replace(data=jnp.pad(state.data, [(0, pad), (0, 0)]))


def backup_memory(state: MemoryState) -> Dict:
    """Host-side snapshot (``memory.py:133-141``)."""
    return {k: jax.device_get(v) for k, v in
            dict(node_memory=state.node_memory,
                 node_memory_ts=state.node_memory_ts,
                 mailbox=state.mailbox,
                 mailbox_ts=state.mailbox_ts,
                 mailbox_ptr=state.mailbox_ptr).items()}


def restore_memory(backup: Dict) -> MemoryState:
    mem = jnp.asarray(backup["node_memory"])
    mail = jnp.asarray(backup["mailbox"])
    mail_ts = jnp.asarray(backup["mailbox_ts"])
    slots = 1 if mail.ndim == 2 else mail.shape[1]
    n = mem.shape[0]
    ptr = jnp.asarray(backup.get("mailbox_ptr",
                                 jnp.zeros((n,), mem.dtype)))
    data = jnp.concatenate([
        mem,
        jnp.asarray(backup["node_memory_ts"])[:, None],
        mail.reshape(n, -1),
        mail_ts.reshape(n, -1),
        ptr.reshape(n, 1)], axis=1)
    return MemoryState(data=data, dim_memory=mem.shape[1],
                       mailbox_slots=slots)


def prepare_input(state: MemoryState, mfg: MFG) -> Dict[str, jax.Array]:
    """Pull memory rows for the MFG's node set (``memory.py:156-190``).

    The reference uniquifies before pulling purely to reduce RPC traffic;
    a direct gather yields identical values (pull happens before any
    write), and the packed layout makes it ONE row gather."""
    nids = mfg.all_nodes()
    safe = jnp.clip(nids, 0, state.num_nodes - 1)
    rows = state.data[safe]
    dm = state.dim_memory
    s, dr = state.mailbox_slots, state.dim_raw
    n = rows.shape[0]
    mails = rows[:, dm + 1: dm + 1 + s * dr]
    mail_ts = rows[:, dm + 1 + s * dr: -1]
    if s == 1:
        return {"mem": rows[:, :dm], "mem_ts": rows[:, dm],
                "mail": mails, "mail_ts": mail_ts[:, 0]}
    return {
        "mem": rows[:, :dm],
        "mem_ts": rows[:, dm],
        # most recent mail = slot (ptr-1) mod S; also expose all slots
        "mail": mails.reshape(n, s, dr),
        "mail_ts": mail_ts,
        "mail_ptr": rows[:, -1],
    }


class GRUMemoryUpdater(nn.Module):
    """GRU-cell memory updater (``memory_updater.py:13-91``).

    ``__call__`` consumes the innermost MFG + pulled memory inputs and
    returns ``(h, last_updated)`` where ``h`` is the updated memory for all
    MFG nodes (optionally fused with projected node features) and
    ``last_updated`` holds the detached (nid, memory, ts) of dst rows for
    deferred write-back."""

    dim_node: int
    dim_edge: int
    dim_time: int
    dim_embed: int
    dim_memory: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, mfg: MFG, mem_input: Dict[str, jax.Array],
                 node_feats: Optional[jax.Array] = None
                 ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        cdt = self.dtype or jnp.float32
        mail = mem_input["mail"]
        if mail.ndim == 3:
            # multi-slot mailbox: the GRU consumes the latest mail
            S = mail.shape[1]
            slot = (mem_input["mail_ptr"].astype(jnp.int32) - 1) % S
            sel = slot[:, None] == jnp.arange(S)[None, :]
            mail = jnp.sum(jnp.where(sel[..., None], mail, 0), axis=1)
        mail = mail.astype(cdt)
        mem = mem_input["mem"].astype(cdt)
        all_ts = mfg.all_ts()

        x = mail
        if self.dim_time > 0:
            tf = TimeEncode(self.dim_time)(all_ts - mem_input["mem_ts"])
            x = jnp.concatenate([mail, tf.astype(cdt)], axis=-1)

        from gnnflow_tpu.models.modules import FusedGRUCell
        updated = FusedGRUCell(features=self.dim_memory,
                               dtype=self.dtype)(mem, x)
        updated = updated.astype(jnp.float32)

        num_dst = mfg.num_dst
        last_updated = {
            "last_updated_nid": jax.lax.stop_gradient(
                mfg.all_nodes()[:num_dst]),
            "last_updated_memory": jax.lax.stop_gradient(
                updated[:num_dst]),
            "last_updated_ts": jax.lax.stop_gradient(all_ts[:num_dst]),
        }

        if self.dim_node > 0 and node_feats is not None:
            if self.dim_node == self.dim_memory:
                h = node_feats + updated
            else:
                h = updated + Linear(self.dim_memory,
                                     name="node_feat_proj")(node_feats)
        else:
            h = updated
        return h, last_updated


class TransformerMemoryUpdater(nn.Module):
    """APAN-style attention memory updater (TGL ``TransformerMemoryUpdater``):
    the mail itself attends over the current memory via a single-query
    transformer block instead of a GRU recurrence."""

    dim_node: int
    dim_edge: int
    dim_time: int
    dim_embed: int
    dim_memory: int
    att_head: int = 2
    dropout: float = 0.1

    @nn.compact
    def __call__(self, mfg: MFG, mem_input: Dict[str, jax.Array],
                 node_feats: Optional[jax.Array] = None,
                 train: bool = False):
        mail = mem_input["mail"]     # [n, dr] or [n, S, dr]
        mem = mem_input["mem"]
        all_ts = mfg.all_ts()
        if mail.ndim == 2:
            mail = mail[:, None, :]                        # S = 1
            mail_ts = mem_input["mail_ts"][:, None]
        else:
            mail_ts = mem_input["mail_ts"]                 # [n, S]
        n, S, dr = mail.shape

        x = mail
        if self.dim_time > 0:
            tf = TimeEncode(self.dim_time)(all_ts[:, None] - mail_ts)
            x = jnp.concatenate([mail, tf], axis=-1)       # [n, S, dr+dt]

        # memory queries attend over the S mail slots (TGL's APAN
        # TransformerMemoryUpdater)
        q = Linear(self.dim_memory, name="w_q")(mem)       # [n, dm]
        k = Linear(self.dim_memory, name="w_k")(x)         # [n, S, dm]
        v = Linear(self.dim_memory, name="w_v")(x)
        H = self.att_head
        dh = self.dim_memory // H
        qh = q.reshape(n, 1, H, dh)
        kh = k.reshape(n, S, H, dh)
        vh = v.reshape(n, S, H, dh)
        att = jnp.sum(qh * kh, -1) / jnp.sqrt(jnp.float32(dh))  # [n,S,H]
        att = jax.nn.softmax(att, axis=1)
        att = nn.Dropout(self.dropout, deterministic=not train)(att)
        upd = jnp.sum(vh * att[..., None], axis=1).reshape(
            n, self.dim_memory)
        upd = nn.LayerNorm(epsilon=1e-5)(mem + upd)

        num_dst = mfg.num_dst
        last_updated = {
            "last_updated_nid": jax.lax.stop_gradient(
                mfg.all_nodes()[:num_dst]),
            "last_updated_memory": jax.lax.stop_gradient(upd[:num_dst]),
            "last_updated_ts": jax.lax.stop_gradient(all_ts[:num_dst]),
        }
        if self.dim_node > 0 and node_feats is not None:
            if self.dim_node == self.dim_memory:
                h = node_feats + upd
            else:
                h = upd + Linear(self.dim_memory,
                                 name="node_feat_proj")(node_feats)
        else:
            h = upd
        return h, last_updated


def update_mem_mail(state: MemoryState,
                    last_updated_nid: jax.Array,
                    last_updated_memory: jax.Array,
                    last_updated_ts: jax.Array,
                    edge_feats: Optional[jax.Array] = None,
                    valid: Optional[jax.Array] = None,
                    neg_sample_ratio: int = 1) -> MemoryState:
    """Write back mails and memories of the batch's src/dst nodes
    (``memory.py:192-269``), deduplicating by nid keeping the **last**
    occurrence.  ``valid`` masks padded batch rows (shape [B])."""
    split = 2 + neg_sample_ratio
    b = last_updated_nid.shape[0] // split
    src, dst = last_updated_nid[:b], last_updated_nid[b:2 * b]
    mem_src = last_updated_memory[:b]
    mem_dst = last_updated_memory[b:2 * b]

    if edge_feats is None:
        dim_edge = state.dim_raw - 2 * state.dim_memory
        edge_feats = jnp.zeros((b, dim_edge), state.data.dtype)

    src_mail = jnp.concatenate([mem_src, mem_dst, edge_feats], axis=1)
    dst_mail = jnp.concatenate([mem_dst, mem_src, edge_feats], axis=1)
    # interleave [s0, d0, s1, d1, ...] (memory.py:228-232)
    mail = jnp.stack([src_mail, dst_mail], axis=1).reshape(
        2 * b, src_mail.shape[1])
    nid = jnp.stack([src, dst], axis=1).reshape(-1)
    # NB: block-ordered, not interleaved — reference quirk (see module doc).
    mail_ts = last_updated_ts[:2 * b]

    if valid is None:
        valid = jnp.ones((b,), dtype=bool)
    valid_inter = jnp.stack([valid, valid], axis=1).reshape(-1)
    valid_inter &= nid >= 0
    valid_block = jnp.concatenate([valid, valid]) & (
        last_updated_nid[:2 * b] >= 0)

    dm = state.dim_memory
    n = state.num_nodes
    S, dr = state.mailbox_slots, state.dim_raw
    # NB: column-slice scatters are pathologically slow on TPU; instead
    # read-modify-write FULL rows (gather current row, replace the target
    # columns, scatter whole rows).
    win_mail = unique_keep_last_mask(nid, valid_inter)
    safe_mail = jnp.clip(nid, 0, n - 1)
    cur = state.data[safe_mail]
    if S == 1:
        mail_rows = jnp.concatenate(
            [cur[:, : dm + 1], mail, mail_ts[:, None], cur[:, -1:]],
            axis=1)
    else:
        # APAN circular mailbox: write slot (ptr mod S), advance ptr
        ptr = cur[:, -1].astype(jnp.int32)
        slot = ptr % S
        sel = slot[:, None] == jnp.arange(S)[None, :]
        old_mails = cur[:, dm + 1: dm + 1 + S * dr].reshape(-1, S, dr)
        old_mts = cur[:, dm + 1 + S * dr: -1]
        new_mails = jnp.where(sel[..., None], mail[:, None, :],
                              old_mails).reshape(-1, S * dr)
        new_mts = jnp.where(sel, mail_ts[:, None], old_mts)
        mail_rows = jnp.concatenate(
            [cur[:, : dm + 1], new_mails, new_mts,
             (ptr + 1).astype(cur.dtype)[:, None]], axis=1)
    data = state.data.at[jnp.where(win_mail, nid, n)].set(
        mail_rows, mode="drop")

    nid_mem = last_updated_nid[:2 * b]
    mem_vals = last_updated_memory[:2 * b]
    mem_ts = last_updated_ts[:2 * b]
    win_mem = unique_keep_last_mask(nid_mem, valid_block)
    safe_mem = jnp.clip(nid_mem, 0, n - 1)
    cur = data[safe_mem]  # after the mailbox write (overlapping nids)
    mem_rows = jnp.concatenate(
        [mem_vals, mem_ts[:, None], cur[:, dm + 1:]], axis=1)
    data = data.at[jnp.where(win_mem, nid_mem, n)].set(
        mem_rows, mode="drop")

    return state.replace(data=data)
