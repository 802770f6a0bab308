"""APAN transformer-updater K/V pre-projection + one-gather pull.

The APAN step's dominant cost on v5e was the per-instance mailbox pull:
``L = B(1+F)`` instances (132k at the headline) each pulling an
``[S, dr]`` raw mail block ([132k, 10, 372] — ~1 GB bf16) and feeding
batched K/V matmuls whose ``{0,2,1}`` layout choice forces THREE full
relayout copies of that intermediate (profiled ~14 ms/step of pure
copies, plus ~6 ms of per-instance matmul).

Matmul-then-gather is identical row math (the mailbox is detached state,
``/root/reference/gnnflow/models/modules/memory_updater.py`` — TGL's
``TransformerMemoryUpdater`` — consumes it without gradient): project
K/V ONCE per (node, slot) over the ``[N·S, drp]`` mail table (tiny —
N ≈ 11k ≪ L), pack the projected rows + the node memory + exact
timestamp byte-lanes into one lane-padded table, and make ONE
per-instance row gather of ``[L, dm + S·2dm + ts]`` (~0.57 GB at the
headline, no relayouts: everything downstream is elementwise/softmax).

The only gradient owed is the mail-part kernel's: the custom VJP
computes ``dW = mails[nids]^T @ d_kv`` with an on-the-fly raw gather and
a single 2-D contraction over ``L·S`` — never a scatter-add into node
space (XLA TPU scatter-add is ~200 ns/row).

Inputs come as the split :class:`~gnnflow_tpu.models.memory.MemoryState`
tables (round 4): ``mem_cols = [N, dm]`` memory columns and
``mail = [N·S, drp]`` per-slot rows ``[mail dr | mail_ts 1 | pad]`` with
``drp`` already lane-aligned — the backward gather needs no extra pad
pass.  The single-slot fused layout builds the same two views with O(N)
column slices before calling in.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from gnnflow_tpu.ops.gru_gather import (_pack_f32_as_bf16,
                                        _unpack_bf16_as_f32)


def _pad_lanes(table: jax.Array, lanes: int = 128) -> jax.Array:
    pad = (-table.shape[1]) % lanes
    return jnp.pad(table, ((0, 0), (0, pad))) if pad else table


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def apan_table_pull(mem_cols: jax.Array, mail: jax.Array,
                    kernel_mail: jax.Array,
                    nids: jax.Array, S: int, dr: int,
                    dtype_name: str = "float32"):
    """Pre-projected APAN pull.

    Args:
        mem_cols: [N, dm] f32 node-memory columns.
        mail: [N·S, drp] f32 per-slot mail rows
            (``[mail dr | mail_ts | pad]``, lane-aligned).
        kernel_mail: [dr, 2·dm_mem] f32 — the mail rows of the fused
            ``w_kv`` kernel.
        nids: [L] int32 instance node ids (in range).
        S / dr: mailbox slots, raw mail width (static).
        dtype_name: compute dtype — matches the per-instance path's cast
            discipline so values are identical (bf16: the projected rows
            round to bf16 in the table, exactly like the bf16-packed
            per-instance pull rounded the raw mails).

    Returns:
        ``(mem_i [L, dm], kv_i [L, S, 2·dm_mem], mail_ts_i [L, S])`` in
        the compute dtype (``mail_ts_i`` exact f32 — byte-lane
        transport).
    """
    return _impl(mem_cols, mail, kernel_mail, nids, S, dr, dtype_name)


def _impl(mem_cols, mail, kernel_mail, nids, S, dr, dtype_name):
    cdt = jnp.dtype(dtype_name)
    N = mem_cols.shape[0]
    f2 = kernel_mail.shape[1]
    mem = mem_cols.astype(cdt)
    kv = (mail[:, :dr].astype(cdt)
          @ kernel_mail.astype(cdt)).reshape(N, S * f2)
    mail_ts = mail[:, dr].reshape(N, S)
    if cdt == jnp.bfloat16:
        ts_cols = _pack_f32_as_bf16(mail_ts).reshape(N, 4 * S)
    else:
        ts_cols = mail_ts.astype(cdt)
    table = _pad_lanes(jnp.concatenate([mem, kv, ts_cols], axis=1))
    rows = table[nids]                       # ONE [L, *] row gather
    L = rows.shape[0]
    dm = mem_cols.shape[1]
    mem_i = rows[:, :dm]
    kv_i = rows[:, dm: dm + S * f2].reshape(L, S, f2)
    if cdt == jnp.bfloat16:
        mts_i = _unpack_bf16_as_f32(
            rows[:, dm + S * f2: dm + S * f2 + 4 * S].reshape(L, S, 4))
    else:
        mts_i = rows[:, dm + S * f2: dm + S * f2 + S].astype(jnp.float32)
    return mem_i, kv_i, mts_i


def _fwd(mem_cols, mail, kernel_mail, nids, S, dr, dtype_name):
    out = _impl(mem_cols, mail, kernel_mail, nids, S, dr, dtype_name)
    return out, (mail, nids)


def _bwd(S, dr, dtype_name, res, cts):
    mail, nids = res
    cdt = jnp.dtype(dtype_name)
    _d_mem, d_kv, _d_mts = cts     # state cotangents are discarded
    # the mail table is per-slot lane-padded already, so the gathered
    # [L, S·drp] view reshapes to [L, S, drp] for free and the de-pad
    # slice fuses into the contraction — a row-end pad would force a
    # materialized slice+reshape of the ~1 GB gathered intermediate
    # (profiled 3.6 ms) before the matmul.
    drp = mail.shape[1]
    N = mail.shape[0] // S
    x = mail.astype(cdt).reshape(N, S * drp)[nids] \
        .reshape(-1, S, drp)[..., :dr]
    # dW = Σ_{L,S} x^T d_kv — contract both batch dims in ONE dot_general
    # (no [L·S, ·] reshapes of either operand)
    dW = jax.lax.dot_general(
        x, d_kv.astype(cdt),
        dimension_numbers=(((0, 1), (0, 1)), ((), ())),
        preferred_element_type=jnp.float32)
    return None, None, dW, None


apan_table_pull.defvjp(_fwd, _bwd)
