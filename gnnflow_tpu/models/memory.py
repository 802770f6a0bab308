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
from jax import lax


def _pack_bf16(x: jax.Array) -> jax.Array:
    """f32/bf16 [..., D] (D even) → i32 [..., D//2] (two bf16 per lane)."""
    b = x.astype(jnp.bfloat16)
    return lax.bitcast_convert_type(
        b.reshape(*b.shape[:-1], -1, 2), jnp.int32)


def _unpack_bf16(x: jax.Array) -> jax.Array:
    """i32 [..., L] → bf16 [..., 2L] (inverse of :func:`_pack_bf16`)."""
    b = lax.bitcast_convert_type(x, jnp.bfloat16)   # [..., L, 2]
    return b.reshape(*x.shape[:-1], -1)


def _pack_f32(x: jax.Array) -> jax.Array:
    return lax.bitcast_convert_type(x.astype(jnp.float32), jnp.int32)


def _unpack_f32(x: jax.Array) -> jax.Array:
    return lax.bitcast_convert_type(x, jnp.float32)


class MemoryState(struct.PyTreeNode):
    """Per-node memory state (``memory.py:58-66``).

    Packed as ONE row table holding
    ``[mem | mem_ts | mails (S*dim_raw) | mail_ts (S) | ptr]`` per node —
    the layout the reference uses for partitioned memory rows
    (``kvstore.py:159-177``), generalized to ``mailbox_slots = S`` mail
    slots (S > 1 is the APAN-style circular mailbox; ``ptr`` is the
    per-node write cursor).  On TPU this makes the per-batch memory pull
    a single row gather; the logical tensors are column views.

    ``storage="bfloat16"`` packs mem/mail values as bf16 *pairs* in int32
    lanes (timestamps stay exact as bitcast f32 lanes), halving the
    memory table's HBM footprint — an OOM headroom knob for graphs whose
    node count makes the f32 table dominate HBM (GDELT/MAG scale).  It is
    NOT a speed knob: measured on v5e the unpack bitcasts cost more than
    the bandwidth they save (TPU row gathers are latency- not
    width-bound), so keep the default ``storage="float32"`` when the
    table fits.  Training math is unchanged up to bf16 storage
    rounding.

    ``mailbox_slots > 1`` (the APAN circular mailbox) splits the state
    into TWO tables: ``data = [N, dm+2]`` rows ``[mem | mem_ts | ptr]``
    and ``mail_data = [N*S, drp]`` per-(node, slot) rows
    ``[mail | mail_ts | pad]`` with ``drp`` lane-aligned.  A circular
    slot write is then ONE full-row scatter at row ``nid*S + ptr%S`` —
    no read-modify-write of the other slots (the round-3 fused layout's
    RMW moved 4×[2b, 3832]-wide rows per step; this moves
    [2b, 384] + [2b, 102]).  Pulls are unharmed: the row-major
    ``[N*S, drp] → [N, S*drp]`` reshape is a free bitcast, so a
    per-node all-slots pull is still one row gather."""

    data: jax.Array
    dim_memory: int = struct.field(pytree_node=False)
    mailbox_slots: int = struct.field(pytree_node=False, default=1)
    storage: str = struct.field(pytree_node=False, default="float32")
    mail_data: Optional[jax.Array] = None
    dim_raw_s: int = struct.field(pytree_node=False, default=0)

    @property
    def packed(self) -> bool:
        return self.storage == "bfloat16"

    @property
    def split(self) -> bool:
        """True when mails live in their own per-slot table (S > 1)."""
        return self.mail_data is not None

    @property
    def num_nodes(self) -> int:
        return self.data.shape[0]

    @property
    def _dm(self) -> int:
        """Lanes occupied by the memory columns."""
        return self.dim_memory // 2 if self.packed else self.dim_memory

    @property
    def dim_raw(self) -> int:
        if self.split:
            return self.dim_raw_s
        s = self.mailbox_slots
        per = (self.data.shape[1] - self._dm - 2 - s) // s
        return 2 * per if self.packed else per

    @property
    def _dr(self) -> int:
        """Lanes occupied by one mail slot (excluding ts/pad)."""
        return self.dim_raw // 2 if self.packed else self.dim_raw

    @property
    def _drp(self) -> int:
        """Lane-aligned width of one ``mail_data`` row (split only)."""
        return self.mail_data.shape[1]

    # -- column views (the reference's four tensors) --------------------

    @property
    def node_memory(self) -> jax.Array:
        block = self.data[:, : self._dm]
        return _unpack_bf16(block).astype(jnp.float32) if self.packed \
            else block

    @property
    def node_memory_ts(self) -> jax.Array:
        col = self.data[:, self._dm]
        return _unpack_f32(col) if self.packed else col

    @property
    def mailbox(self) -> jax.Array:
        """[N, dim_raw] (S==1) or [N, S, dim_raw]."""
        s, dr = self.mailbox_slots, self._dr
        if self.split:
            block = self.mail_data.reshape(
                self.num_nodes, s, self._drp)[:, :, :dr]
            if self.packed:
                block = _unpack_bf16(block).astype(jnp.float32)
            return block
        block = self.data[:, self._dm + 1: self._dm + 1 + s * dr]
        if self.packed:
            block = _unpack_bf16(block).astype(jnp.float32)
        return block if s == 1 else block.reshape(-1, s, self.dim_raw)

    @property
    def mailbox_ts(self) -> jax.Array:
        s = self.mailbox_slots
        if self.split:
            col = self.mail_data.reshape(
                self.num_nodes, s, self._drp)[:, :, self._dr]
            return _unpack_f32(col) if self.packed else col
        block = self.data[:, -1 - s: -1]
        if self.packed:
            block = _unpack_f32(block)
        return block[:, 0] if s == 1 else block

    @property
    def mailbox_ptr(self) -> jax.Array:
        col = self.data[:, -1]
        return col.astype(jnp.float32) if self.packed else col


def _mail_row_lanes(dim_raw: int, packed: bool) -> int:
    """Lane-aligned per-slot row width of the split mail table."""
    lanes = (dim_raw // 2 if packed else dim_raw) + 1
    return -(-lanes // 128) * 128


def init_memory(num_nodes: int, dim_memory: int, dim_edge: int,
                dtype=jnp.float32, mailbox_slots: int = 1,
                storage: str = "float32") -> MemoryState:
    if storage not in ("float32", "bfloat16"):
        raise ValueError(f"unknown memory storage {storage!r}")
    dim_raw = 2 * dim_memory + dim_edge
    if storage == "bfloat16" and (dim_memory % 2 or dim_raw % 2):
        raise ValueError(
            "bfloat16 memory storage needs even dim_memory/dim_raw")
    packed = storage == "bfloat16"
    if mailbox_slots > 1:
        # split layout: [mem | mem_ts | ptr] rows + per-slot mail table
        cols = (dim_memory // 2 if packed else dim_memory) + 2
        sdt = jnp.int32 if packed else dtype
        data = jnp.zeros((num_nodes, cols), sdt)
        drp = _mail_row_lanes(dim_raw, packed)
        mail = jnp.zeros((num_nodes * mailbox_slots, drp), sdt)
        return MemoryState(data=data, mail_data=mail, dim_raw_s=dim_raw,
                           dim_memory=dim_memory,
                           mailbox_slots=mailbox_slots, storage=storage)
    if packed:
        cols = dim_memory // 2 + 1 + mailbox_slots * (dim_raw // 2 + 1) + 1
        data = jnp.zeros((num_nodes, cols), jnp.int32)
    else:
        cols = dim_memory + 1 + mailbox_slots * (dim_raw + 1) + 1
        data = jnp.zeros((num_nodes, cols), dtype)
    return MemoryState(data=data, dim_memory=dim_memory,
                       mailbox_slots=mailbox_slots, storage=storage)


def reset_memory(state: MemoryState) -> MemoryState:
    return jax.tree.map(jnp.zeros_like, state)


def resize_memory(state: MemoryState, num_nodes: int) -> MemoryState:
    """Grow (zero-filled) to ``num_nodes`` rows (``memory.py:112-131``)."""
    if num_nodes <= state.num_nodes:
        return state
    pad = num_nodes - state.num_nodes
    new = state.replace(data=jnp.pad(state.data, [(0, pad), (0, 0)]))
    if state.split:
        # new nodes' slot rows append at the end of the row-major table
        new = new.replace(mail_data=jnp.pad(
            state.mail_data, [(0, pad * state.mailbox_slots), (0, 0)]))
    return new


def backup_memory(state: MemoryState) -> Dict:
    """Host-side snapshot (``memory.py:133-141``)."""
    out = {k: jax.device_get(v) for k, v in
           dict(node_memory=state.node_memory,
                node_memory_ts=state.node_memory_ts,
                mailbox=state.mailbox,
                mailbox_ts=state.mailbox_ts,
                mailbox_ptr=state.mailbox_ptr).items()}
    out["storage"] = state.storage
    return out


def restore_memory(backup: Dict) -> MemoryState:
    mem = jnp.asarray(backup["node_memory"], jnp.float32)
    mail = jnp.asarray(backup["mailbox"], jnp.float32)
    mail_ts = jnp.asarray(backup["mailbox_ts"], jnp.float32)
    slots = 1 if mail.ndim == 2 else mail.shape[1]
    n = mem.shape[0]
    storage = str(backup.get("storage", "float32"))
    packed = storage == "bfloat16"
    ptr = jnp.asarray(backup.get("mailbox_ptr",
                                 jnp.zeros((n,), jnp.float32)))
    mem_ts = jnp.asarray(backup["node_memory_ts"], jnp.float32)
    if slots > 1:
        dim_raw = mail.shape[-1]
        if packed:
            data = jnp.concatenate([
                _pack_bf16(mem), _pack_f32(mem_ts)[:, None],
                ptr.astype(jnp.int32).reshape(n, 1)], axis=1)
            rows = jnp.concatenate([
                _pack_bf16(mail.reshape(n * slots, dim_raw)),
                _pack_f32(mail_ts.reshape(n * slots, 1))], axis=1)
        else:
            data = jnp.concatenate([
                mem, mem_ts[:, None],
                ptr.astype(jnp.float32).reshape(n, 1)], axis=1)
            rows = jnp.concatenate([
                mail.reshape(n * slots, dim_raw),
                mail_ts.reshape(n * slots, 1)], axis=1)
        drp = _mail_row_lanes(dim_raw, packed)
        rows = jnp.pad(rows, [(0, 0), (0, drp - rows.shape[1])])
        return MemoryState(data=data, mail_data=rows, dim_raw_s=dim_raw,
                           dim_memory=mem.shape[1], mailbox_slots=slots,
                           storage=storage)
    if packed:
        data = jnp.concatenate([
            _pack_bf16(mem),
            _pack_f32(mem_ts)[:, None],
            _pack_bf16(mail.reshape(n, -1)),
            _pack_f32(mail_ts.reshape(n, -1)),
            ptr.astype(jnp.int32).reshape(n, 1)], axis=1)
    else:
        data = jnp.concatenate([
            mem,
            mem_ts[:, None],
            mail.reshape(n, -1),
            mail_ts.reshape(n, -1),
            ptr.astype(jnp.float32).reshape(n, 1)], axis=1)
    return MemoryState(data=data, dim_memory=mem.shape[1],
                       mailbox_slots=slots, storage=storage)


class DedupMemoryInput(struct.PyTreeNode):
    """Compact memory-updater input produced by the train step's exact
    ``(nid, ts)`` instance dedup (:mod:`gnnflow_tpu.ops.dedup`).

    Carries the raw :class:`MemoryState` (the pull happens inside the
    updater over the compact row set), the winner instance ids/timestamps,
    and the inverse map expanding compact results back to per-instance
    rows.  ``node_feats`` is the lane-padded node-feature *table* (not
    per-instance rows) so the updater can gather it compactly."""

    state: MemoryState
    uniq_nids: jax.Array          # [cap] int32 winner node ids
    uniq_ts: jax.Array            # [cap] float32 winner timestamps
    inv: jax.Array                # [L] int32 instance -> compact slot
    sidx: Optional[jax.Array] = None         # [L] sorted pos -> instance
    rank_sorted: Optional[jax.Array] = None  # [L] non-decreasing slots
    node_feats: Optional[jax.Array] = None   # [N, >=dim_node] padded table
    dim_node: int = struct.field(pytree_node=False, default=0)


class RawMemoryInput(struct.PyTreeNode):
    """Marker input carrying the raw :class:`MemoryState` — the GRU
    updater's per-node pre-projection path (no [L, 475] row pull; see
    :mod:`gnnflow_tpu.ops.gru_gather`).  Single-slot GRU only."""

    state: MemoryState


def prepare_input_at(state: MemoryState,
                     nids: jax.Array) -> Dict[str, jax.Array]:
    """Pull memory rows for an explicit node-id array (the compact/dedup
    pull; same unpacking as :func:`prepare_input`)."""
    safe = jnp.clip(nids, 0, state.num_nodes - 1)
    if not state.split:
        return _unpack_rows(state, state.data[safe])
    # split (S > 1): one row gather per table.  Both are lane-padded in
    # NODE space (O(N), cheap) — unaligned-width row gathers hit a
    # pathological TPU path.
    s, drL, drp = state.mailbox_slots, state._dr, state._drp
    d = state.data
    padc = (-d.shape[1]) % 128
    if padc:
        d = jnp.pad(d, [(0, 0), (0, padc)])
    rows = d[safe]
    mrows = state.mail_data.reshape(state.num_nodes, s * drp)[safe]
    L = rows.shape[0]
    dm = state._dm
    mem = rows[:, :dm]
    mem_ts = rows[:, dm]
    ptr = rows[:, dm + 1]
    slots = mrows.reshape(L, s, drp)
    mails = slots[:, :, :drL]
    mail_ts = slots[:, :, drL]
    if state.packed:
        mem = _unpack_bf16(mem)
        mem_ts = _unpack_f32(mem_ts)
        mails = _unpack_bf16(mails)
        mail_ts = _unpack_f32(mail_ts)
        ptr = ptr.astype(jnp.float32)
    return {"mem": mem, "mem_ts": mem_ts, "mail": mails,
            "mail_ts": mail_ts, "mail_ptr": ptr}


def _unpack_rows(state: MemoryState, rows: jax.Array) -> Dict[str, jax.Array]:
    dm, s = state._dm, state.mailbox_slots
    dr = state._dr
    n = rows.shape[0]
    mem = rows[:, :dm]
    mem_ts = rows[:, dm]
    mails = rows[:, dm + 1: dm + 1 + s * dr]
    mail_ts = rows[:, dm + 1 + s * dr: -1]
    if state.packed:
        # bf16 views fuse into the GRU matmul reads (no f32 expansion)
        mem = _unpack_bf16(mem)
        mem_ts = _unpack_f32(mem_ts)
        mails = _unpack_bf16(mails)
        mail_ts = _unpack_f32(mail_ts)
    if s == 1:
        return {"mem": mem, "mem_ts": mem_ts,
                "mail": mails, "mail_ts": mail_ts[:, 0]}
    return {
        "mem": mem,
        "mem_ts": mem_ts,
        # most recent mail = slot (ptr-1) mod S; also expose all slots
        "mail": mails.reshape(n, s, state.dim_raw),
        "mail_ts": mail_ts,
        "mail_ptr": rows[:, -1].astype(jnp.float32)
        if state.packed else rows[:, -1],
    }


def prepare_input(state: MemoryState, mfg: MFG) -> Dict[str, jax.Array]:
    """Pull memory rows for the MFG's node set (``memory.py:156-190``).

    The reference uniquifies before pulling purely to reduce RPC traffic;
    a direct gather yields identical values (pull happens before any
    write), and the packed layout makes it ONE row gather."""
    return prepare_input_at(state, mfg.all_nodes())


def prepare_input_bf16(state: MemoryState, mfg: MFG) -> Dict[str, jax.Array]:
    """bf16-packed per-instance pull for bf16 compute mode.

    The node table is cast ONCE per step (N rows, cheap) into a bf16 row
    table with timestamps/ptr carried bitcast-exact as bf16 lane pairs,
    halving the per-instance gather bytes and removing the downstream
    f32→bf16 cast copies of [L, *] intermediates (profiled at ~16 ms/step
    for APAN's 3832-wide rows).  Values round to bf16 — use only with
    ``compute_dtype="bfloat16"`` (which casts them anyway); timestamps
    stay exact."""
    if state.packed:   # already-bf16 packed storage: plain path
        return prepare_input(state, mfg)
    from gnnflow_tpu.ops.gru_gather import (_pack_f32_as_bf16,
                                            _unpack_bf16_as_f32)
    d = state.data
    dm, s, dr = state.dim_memory, state.mailbox_slots, state.dim_raw
    mem = d[:, :dm].astype(jnp.bfloat16)
    mts = _pack_f32_as_bf16(d[:, dm])                       # [N, 4]
    if state.split:
        slots = state.mail_data.reshape(state.num_nodes, s, state._drp)
        mails = slots[:, :, :dr].astype(jnp.bfloat16).reshape(-1, s * dr)
        mlts = _pack_f32_as_bf16(slots[:, :, dr]).reshape(-1, 4 * s)
    else:
        mails = d[:, dm + 1: dm + 1 + s * dr].astype(jnp.bfloat16)
        mlts = _pack_f32_as_bf16(
            d[:, dm + 1 + s * dr: -1]).reshape(-1, 4 * s)   # [N, 4s]
    ptr = _pack_f32_as_bf16(d[:, -1])                       # [N, 4]
    table = jnp.concatenate([mem, mts, mails, mlts, ptr], axis=1)
    w = table.shape[1]
    pad = (-w) % 128
    if pad:
        table = jnp.pad(table, ((0, 0), (0, pad)))
    nids = mfg.all_nodes()
    rows = table[jnp.clip(nids, 0, state.num_nodes - 1)]
    n = rows.shape[0]
    mem_i = rows[:, :dm]
    mem_ts = _unpack_bf16_as_f32(rows[:, dm:dm + 4])
    mail_i = rows[:, dm + 4: dm + 4 + s * dr]
    mail_ts = _unpack_bf16_as_f32(
        rows[:, dm + 4 + s * dr: dm + 4 + s * dr + 4 * s]
        .reshape(n, s, 4))                                  # [n, s]
    if s == 1:
        return {"mem": mem_i, "mem_ts": mem_ts,
                "mail": mail_i, "mail_ts": mail_ts[:, 0]}
    return {"mem": mem_i, "mem_ts": mem_ts,
            "mail": mail_i.reshape(n, s, dr),
            "mail_ts": mail_ts,
            "mail_ptr": _unpack_bf16_as_f32(rows[:, w - 4: w])}


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
    impl: str = "xla"   # "xla" | "pallas" (fused TimeEncode+GRU kernel)

    def _call_table(self, mfg: MFG, state: MemoryState):
        """Per-node pre-projection path (``ops/gru_gather.py``): identical
        GRU math to :class:`FusedGRUCell` with the per-node matmuls hoisted
        out of instance space — no [L, 475] memory-row pull.  Returns the
        per-instance updated memory [L, f] (f32)."""
        from gnnflow_tpu.models.modules import (GRUGateParams, TimeEncode)
        from gnnflow_tpu.ops.gru_gather import gru_node_gather
        f = self.dim_memory
        dm = state.dim_raw
        fan_in = dm + self.dim_time
        # name matches the per-instance cell for checkpoint compatibility
        (ki, bi), (kh, bh) = GRUGateParams(
            fan_in, f, name="FusedGRUCell_0")()
        cdt = self.dtype or jnp.float32
        name = jnp.dtype(cdt).name
        nids = jnp.clip(mfg.all_nodes(), 0, state.num_nodes - 1)
        gi, gh, mem_i, mem_ts_i = gru_node_gather(
            state.node_memory, state.mailbox, state.node_memory_ts,
            ki[:dm], kh, nids, name)
        if self.dim_time > 0:
            tw, tb = TimeEncode(self.dim_time).weights()
            dts = mfg.all_ts() - mem_ts_i
            tf = jnp.cos(dts[:, None] * tw + tb)
            gi = gi + tf.astype(cdt) @ ki[dm:].astype(cdt)
        gi = gi + bi.astype(cdt)
        gh = gh + bh.astype(cdt)
        i_r, i_z, i_n = gi[..., :f], gi[..., f:2 * f], gi[..., 2 * f:]
        h_r, h_z, h_n = gh[..., :f], gh[..., f:2 * f], gh[..., 2 * f:]
        r = nn.sigmoid(i_r + h_r)
        z = nn.sigmoid(i_z + h_z)
        n_ = nn.tanh(i_n + r * h_n)
        return ((1.0 - z) * n_ + z * mem_i.astype(n_.dtype)) \
            .astype(jnp.float32)

    @nn.compact
    def __call__(self, mfg: MFG, mem_input, node_feats=None
                 ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        if isinstance(mem_input, RawMemoryInput):
            if mem_input.state.mailbox_slots != 1:
                raise ValueError("RawMemoryInput requires a single-slot "
                                 "mailbox")
            updated = self._call_table(mfg, mem_input.state)
            if self.dim_node > 0:
                proj = None if self.dim_node == self.dim_memory else \
                    Linear(self.dim_memory, name="node_feat_proj")
                h = updated if node_feats is None else \
                    updated + (node_feats if proj is None
                               else proj(node_feats))
            else:
                h = updated
            num_dst = mfg.num_dst
            last_updated = {
                "last_updated_nid": jax.lax.stop_gradient(
                    mfg.all_nodes()[:num_dst]),
                "last_updated_memory": jax.lax.stop_gradient(
                    updated[:num_dst]),
                "last_updated_ts": jax.lax.stop_gradient(
                    mfg.all_ts()[:num_dst]),
            }
            return h, last_updated
        dedup = isinstance(mem_input, DedupMemoryInput)
        if dedup:
            di = mem_input
            mem_input = prepare_input_at(di.state, di.uniq_nids)
            row_ts = di.uniq_ts
        else:
            row_ts = mfg.all_ts()
        mail = mem_input["mail"]
        if mail.ndim == 3:
            # multi-slot mailbox: the GRU consumes the latest mail
            S = mail.shape[1]
            slot = (mem_input["mail_ptr"].astype(jnp.int32) - 1) % S
            sel = slot[:, None] == jnp.arange(S)[None, :]
            mail = jnp.sum(jnp.where(sel[..., None], mail, 0), axis=1)
        mem = mem_input["mem"]  # casts fuse into the GRU matmul reads

        from gnnflow_tpu.models.modules import FusedGRUCell, TimeEncode
        cell = FusedGRUCell(features=self.dim_memory, dtype=self.dtype,
                            impl=self.impl)
        if self.dim_time > 0:
            # the time part is handed to the cell as (dts, w, b) so the
            # pallas impl can compute the encoding in-register; mem/mail/
            # dts are detached state (memory.py:58-66), satisfying the
            # fused kernel's params-only gradient contract
            te = TimeEncode(self.dim_time)
            tw, tb = te.weights()
            dts = row_ts - mem_input["mem_ts"]
            updated = cell(mem, [mail], time=(dts, tw, tb))
        else:
            updated = cell(mem, [mail])
        updated = updated.astype(jnp.float32)

        if self.dim_node > 0:
            proj = None if self.dim_node == self.dim_memory else \
                Linear(self.dim_memory, name="node_feat_proj")
        if dedup:
            # fuse (compact) node features BEFORE the expansion so the
            # [L]-row gather happens once; ``updated`` at the dst rows is
            # recovered by a cheap [num_dst] gather for write-back
            from gnnflow_tpu.ops.dedup import expand_rows
            from gnnflow_tpu.ops.segment_pallas import expand_compact
            h_u = updated
            if self.dim_node > 0 and di.node_feats is not None:
                safe = jnp.clip(di.uniq_nids, 0,
                                di.node_feats.shape[0] - 1)
                nf = di.node_feats[safe][:, : self.dim_node]
                h_u = updated + (nf if proj is None else proj(nf))
            if di.sidx is not None:
                # lane-pad, expand with the sorted-segment-sum VJP
                # (XLA's scatter-add transpose is ~50x slower), slice back
                d = h_u.shape[-1]
                pad = (-d) % 128
                hp = jnp.pad(h_u, ((0, 0), (0, pad))) if pad else h_u
                h = expand_compact(hp, di.inv, di.sidx, di.rank_sorted)
                h = h[:, :d] if pad else h
            else:
                h = expand_rows(h_u, di.inv)
            num_dst = mfg.num_dst
            dst_updated = expand_rows(updated, di.inv[:num_dst]) \
                if self.dim_node > 0 and di.node_feats is not None \
                else h[:num_dst]
        else:
            if self.dim_node > 0 and node_feats is not None:
                h = updated + (node_feats if proj is None
                               else proj(node_feats))
            else:
                h = updated
            num_dst = mfg.num_dst
            dst_updated = updated[:num_dst]

        all_ts = mfg.all_ts()
        last_updated = {
            "last_updated_nid": jax.lax.stop_gradient(
                mfg.all_nodes()[:num_dst]),
            "last_updated_memory": jax.lax.stop_gradient(dst_updated),
            "last_updated_ts": jax.lax.stop_gradient(all_ts[:num_dst]),
        }
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
    dtype: Optional[jnp.dtype] = None   # compute dtype (params stay f32)

    @nn.compact
    def __call__(self, mfg: MFG, mem_input,
                 node_feats: Optional[jax.Array] = None,
                 train: bool = False):
        cdt = self.dtype or jnp.float32
        all_ts = mfg.all_ts()
        dedup = isinstance(mem_input, DedupMemoryInput)
        if dedup:
            # exact (nid, ts) dedup: the updater output is a pure
            # function of the pair given the (detached) state, so it
            # runs over the compact winner set and expands at the end
            # (attention-dropout draws collapse across duplicates).
            di = mem_input
            all_ts = di.uniq_ts
            nids_override = jnp.clip(di.uniq_nids, 0,
                                     di.state.num_nodes - 1)
            if di.state.packed:
                mem_input = prepare_input_at(di.state, nids_override)
            else:
                mem_input = RawMemoryInput(state=di.state)
        if isinstance(mem_input, RawMemoryInput):
            # table path: K/V pre-projected over the [N, S, dr] mailbox
            # TABLE (N ≪ L), then ONE slim per-instance gather — deletes
            # the [L, S, dr] raw-mail pull and its layout copies
            # (profiled ~20 ms/step at the APAN headline; see
            # ops/apan_kv.py).  Identical math: matmul-then-gather ==
            # gather-then-matmul row-wise, and the parameter tree
            # (w_kv/kernel+bias via GateParams) matches MultiLinear's,
            # so checkpoints are interchangeable.
            from gnnflow_tpu.models.modules import GateParams
            from gnnflow_tpu.ops.apan_kv import _pad_lanes, apan_table_pull
            state = mem_input.state
            S, dr = state.mailbox_slots, state.dim_raw
            dm_ = state.dim_memory
            kernel, bias = GateParams(
                dr + self.dim_time, 2 * self.dim_memory, name="w_kv")()
            nids = nids_override if dedup else \
                jnp.clip(mfg.all_nodes(), 0, state.num_nodes - 1)
            if state.split:
                mail_tab = state.mail_data
            else:
                # S==1 fused layout: mail|mail_ts are contiguous columns
                mail_tab = _pad_lanes(
                    state.data[:, dm_ + 1: dm_ + 2 + dr])
            mem, kv, mail_ts = apan_table_pull(
                state.data[:, :dm_], mail_tab, kernel[:dr], nids, S, dr,
                jnp.dtype(cdt).name)
            n = mem.shape[0]
            if self.dim_time > 0:
                tf = TimeEncode(self.dim_time)(
                    all_ts[:, None] - mail_ts)             # [n, S, dt]
                kv = kv + tf.astype(cdt) @ kernel[dr:].astype(cdt)
            kv = kv + bias.astype(cdt)
        else:
            mail = mem_input["mail"]     # [n, dr] or [n, S, dr]
            mem = mem_input["mem"]
            if mail.ndim == 2:
                mail = mail[:, None, :]                        # S = 1
                mail_ts = mem_input["mail_ts"][:, None]
            else:
                mail_ts = mem_input["mail_ts"]                 # [n, S]
            n, S, dr = mail.shape

            parts = [mail]
            if self.dim_time > 0:
                tf = TimeEncode(self.dim_time)(all_ts[:, None] - mail_ts)
                parts.append(tf.astype(cdt))                   # [n, S, dt]

            # memory queries attend over the S mail slots (TGL's APAN
            # TransformerMemoryUpdater).  K and V are ONE fused
            # projection computed as a sum of per-part matmuls — the
            # wide [n, S, dr+dt] concat never hits HBM.  NB: keep the
            # batched [n, S, *] form — flattening to [n*S, *] 2-D
            # matmuls measured 59.3 -> 78.7 ms/step (XLA picks worse
            # layouts for the gathered rows).
            from gnnflow_tpu.models.modules import MultiLinear
            kv = MultiLinear(2 * self.dim_memory, name="w_kv",
                             dtype=self.dtype)(parts)      # [n, S, 2dm]
        q = Linear(self.dim_memory, name="w_q", dtype=self.dtype)(mem)
        k = kv[..., : self.dim_memory]
        v = kv[..., self.dim_memory:]
        H = self.att_head
        dh = self.dim_memory // H
        # reshape-free heads: block-indicator matmuls instead of the
        # pathologically tiled [n, S, H, dh] reshapes (see
        # TemporalAttentionLayer)
        dm = self.dim_memory
        sel = (jnp.arange(dm)[:, None] // dh ==
               jnp.arange(H)[None, :]).astype(cdt)         # [dm, H]
        qk = (q[:, None, :] * k).astype(cdt)               # [n, S, dm]
        att = jax.lax.dot_general(
            qk, sel, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) \
            / jnp.sqrt(jnp.float32(dh))                    # [n, S, H]
        att = jax.nn.softmax(att, axis=1)
        att = nn.Dropout(self.dropout, deterministic=not train)(att)
        att_exp = jax.lax.dot_general(
            att.astype(cdt), sel, (((2,), (1,)), ((), ())))
        upd = jnp.sum(v * att_exp, axis=1)                 # [n, dm]
        upd = nn.LayerNorm(epsilon=1e-5)(
            mem.astype(jnp.float32) + upd.astype(jnp.float32))

        num_dst = mfg.num_dst
        if dedup:
            # fuse (compact) node features, expand to per-instance rows
            # (same machinery as the GRU dedup path)
            from gnnflow_tpu.ops.dedup import expand_rows
            from gnnflow_tpu.ops.segment_pallas import expand_compact
            h_u = upd
            fused_nf = self.dim_node > 0 and di.node_feats is not None
            if fused_nf:
                safe = jnp.clip(di.uniq_nids, 0,
                                di.node_feats.shape[0] - 1)
                nf = di.node_feats[safe][:, : self.dim_node]
                h_u = upd + (nf if self.dim_node == self.dim_memory
                             else Linear(self.dim_memory,
                                         name="node_feat_proj")(nf))
            d = h_u.shape[-1]
            pad = (-d) % 128
            hp = jnp.pad(h_u, ((0, 0), (0, pad))) if pad else h_u
            h = expand_compact(hp, di.inv, di.sidx, di.rank_sorted)
            h = h[:, :d] if pad else h
            dst_updated = expand_rows(upd, di.inv[:num_dst]) if fused_nf \
                else h[:num_dst]
            last_updated = {
                "last_updated_nid": jax.lax.stop_gradient(
                    mfg.all_nodes()[:num_dst]),
                "last_updated_memory": jax.lax.stop_gradient(dst_updated),
                "last_updated_ts": jax.lax.stop_gradient(
                    mfg.all_ts()[:num_dst]),
            }
            return h, last_updated
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
        edge_feats = jnp.zeros((b, dim_edge), mem_src.dtype)

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

    n = state.num_nodes
    S = state.mailbox_slots
    dmL, drL = state._dm, state._dr   # lane widths (packed or not)
    packed = state.packed
    # NB: column-slice scatters are pathologically slow on TPU; instead
    # write FULL rows.  For bf16-packed storage the new columns are
    # encoded first and the row assembled in lane space.
    enc_mail = _pack_bf16(mail) if packed else mail
    enc_mts = _pack_f32(mail_ts)[:, None] if packed else mail_ts[:, None]
    win_mail = unique_keep_last_mask(nid, valid_inter)
    safe_mail = jnp.clip(nid, 0, n - 1)
    if S == 1:
        # FUSED single-scatter write-back: the mail + memory columns
        # together cover every column except ``ptr`` (always 0 when
        # S == 1), so one full-row scatter per unique node replaces the
        # reference's two passes (memory.py:233-269) — no row RMW
        # gathers at all.  Winner orders differ by reference quirk
        # (mail: interleaved, memory: block order); the memory winner's
        # values are joined onto the mail winner's row via an [N]-table
        # index hop.
        nid_mem = last_updated_nid[:2 * b]
        win_mem = unique_keep_last_mask(nid_mem, valid_block)
        memwin = jnp.zeros((n + 1,), jnp.int32).at[
            jnp.where(win_mem, nid_mem, n)].set(
            jnp.arange(2 * b, dtype=jnp.int32), mode="drop")
        midx = memwin[safe_mail]                     # [2b] per mail row
        # 128-lane pad before the row gather (unaligned-width row
        # gathers hit a pathological TPU path)
        lum = last_updated_memory[:2 * b]
        pad = (-lum.shape[1]) % 128
        lum_p = jnp.pad(lum, ((0, 0), (0, pad))) if pad else lum
        mem_w = lum_p[midx][:, : lum.shape[1]]
        mem_ts_w = last_updated_ts[:2 * b][midx]
        enc_mem = _pack_bf16(mem_w) if packed else mem_w
        enc_memts = _pack_f32(mem_ts_w)[:, None] if packed \
            else mem_ts_w[:, None]
        ptr_col = jnp.zeros((2 * b, 1), state.data.dtype)
        rows = jnp.concatenate(
            [enc_mem, enc_memts, enc_mail, enc_mts, ptr_col], axis=1)
        data = state.data.at[jnp.where(win_mail, nid, n)].set(
            rows, mode="drop")
        return state.replace(data=data)
    # S > 1 (APAN circular mailbox): the mail slots live in their own
    # [N·S, drp] per-slot row table (split layout), so the circular
    # write is ONE full-row scatter at row ``nid·S + ptr%S`` — no
    # read-modify-write gather of the 3800-wide fused rows (the round-3
    # RMW moved 4×[2b, 3832] rows/step; this moves [2b, 384] + [2b,
    # dm+2] plus a [2b] scalar ptr gather).
    from gnnflow_tpu.ops.sampling import _gather_scalars
    drp = state._drp
    NS = state.mail_data.shape[0]
    col = state.data[:, -1]
    padn = (-col.shape[0]) % 128
    if padn:
        col = jnp.pad(col, (0, padn))
    ptr = _gather_scalars(col, safe_mail).astype(jnp.int32)
    slot = ptr % S
    row_idx = safe_mail * S + slot
    pad = drp - enc_mail.shape[1] - 1
    mail_rows = jnp.concatenate(
        [enc_mail, enc_mts,
         jnp.zeros((2 * b, pad), state.mail_data.dtype)], axis=1) \
        if pad else jnp.concatenate([enc_mail, enc_mts], axis=1)
    mail_data = state.mail_data.at[
        jnp.where(win_mail, row_idx, NS)].set(mail_rows, mode="drop")

    # memory rows [mem | mem_ts | ptr+1] written at the block-order
    # winners (same nid set as the mail winners, so the ptr advance
    # lands exactly once per written node)
    nid_mem = last_updated_nid[:2 * b]
    mem_vals = last_updated_memory[:2 * b]
    mem_ts = last_updated_ts[:2 * b]
    enc_mem = _pack_bf16(mem_vals) if packed else mem_vals
    enc_memts = _pack_f32(mem_ts)[:, None] if packed else mem_ts[:, None]
    win_mem = unique_keep_last_mask(nid_mem, valid_block)
    i = jnp.arange(2 * b, dtype=jnp.int32)
    ptr_blk = ptr[2 * (i % b) + i // b]   # interleaved -> block order
    mem_rows = jnp.concatenate(
        [enc_mem, enc_memts,
         (ptr_blk + 1).astype(state.data.dtype)[:, None]], axis=1)
    data = state.data.at[jnp.where(win_mem, nid_mem, n)].set(
        mem_rows, mode="drop")

    return state.replace(data=data, mail_data=mail_data)
