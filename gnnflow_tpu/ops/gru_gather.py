"""Per-node GRU gate pre-projection + per-instance gather.

The TGN memory updater runs its GRU over ``L = B(1+F)`` *instances* whose
``mem``/``mail`` inputs come from only ``N`` (~11k at REDDIT scale, vs
L = 132k) node rows.  The per-instance formulation pulls [L, 475] f32
rows and feeds wide matmuls — profiled on v5e this costs ~3 ms/step, of
which 1.4 ms is XLA staging the whole memory table into VMEM for the
gather and 0.6 ms a layout/cast copy of the pulled rows.

Matmul-then-gather is identical row math (bitwise, per row): compute the
gate projections ``mail @ W_ih[:dm]`` and ``mem @ W_hh`` ONCE per node
(tiny [N, 3f] matmuls), pack them with the memory values and the memory
timestamps into one lane-padded node table, and make ONE per-instance
row gather.  The memory state is non-differentiable (the reference
detaches it, ``memory_updater.py:70-76``), so the only gradients this op
owes are the weight gradients — the custom VJP computes them from an
on-the-fly gather of the raw node rows (``dW = X[nids]^T @ dgates``),
never scatter-adding into node space (XLA TPU scatter-add is ~200 ns/row).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def _pack_f32_as_bf16(x: jax.Array) -> jax.Array:
    """f32 [...] -> bf16 [..., 4] carrying the exact bits, NaN-proof.

    A naive bitcast into bf16 *pairs* corrupts ~0.4% of arbitrary floats:
    the low half's bit pattern can form a bf16 NaN, and XLA canonicalizes
    NaN payloads in transit (measured on CPU: low-bit corruption of
    timestamps).  Bytes ride as exact small-integer bf16 values (0-255
    are always normal), immune to canonicalization."""
    b = lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint8)
    return b.astype(jnp.bfloat16)


def _unpack_bf16_as_f32(x: jax.Array) -> jax.Array:
    """bf16 [..., 4] -> f32 [...] (inverse of :func:`_pack_f32_as_bf16`)."""
    u = x.astype(jnp.uint32)
    u = (u[..., 0] | (u[..., 1] << 8) | (u[..., 2] << 16)
         | (u[..., 3] << 24))
    return lax.bitcast_convert_type(u, jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def gru_node_gather(mem_t: jax.Array, mail_t: jax.Array,
                    mem_ts_t: jax.Array, ki_mail: jax.Array,
                    kh: jax.Array, nids: jax.Array,
                    dtype_name: str = "float32"):
    """Gate pre-projection over node tables + one per-instance gather.

    Args:
        mem_t: [N, f] f32 node memory.
        mail_t: [N, dm] f32 node mails.
        mem_ts_t: [N] f32 node memory timestamps.
        ki_mail: [dm, 3f] f32 input-gate kernel rows for the mail part.
        kh: [f, 3f] f32 hidden-gate kernel.
        nids: [L] int32 instance node ids (assumed in range).
        dtype_name: compute dtype ("float32" or "bfloat16") — matches the
            per-instance cell's cast discipline so values are identical.

    Returns:
        ``(gi_mail, gh, mem_i, mem_ts_i)`` — [L, 3f] input-gate and
        hidden-gate contributions and [L, f] memory values in the compute
        dtype, plus [L] f32 (exact) memory timestamps.
    """
    return _node_gather_impl(mem_t, mail_t, mem_ts_t, ki_mail, kh, nids,
                             dtype_name)


def _node_gather_impl(mem_t, mail_t, mem_ts_t, ki_mail, kh, nids,
                      dtype_name):
    cdt = jnp.dtype(dtype_name)
    f3 = ki_mail.shape[1]
    f = kh.shape[0]
    giM = mail_t.astype(cdt) @ ki_mail.astype(cdt)   # [N, 3f]
    ghM = mem_t.astype(cdt) @ kh.astype(cdt)         # [N, 3f]
    if cdt == jnp.bfloat16:
        ts_cols = _pack_f32_as_bf16(mem_ts_t)        # exact, 4 lanes
    else:
        ts_cols = mem_ts_t[:, None]
    table = jnp.concatenate(
        [giM, ghM, mem_t.astype(cdt), ts_cols.astype(cdt)
         if cdt != jnp.bfloat16 else ts_cols], axis=1)
    d = table.shape[1]
    pad = (-d) % 128
    if pad:
        table = jnp.pad(table, ((0, 0), (0, pad)))
    rows = table[nids]                               # ONE [L, *] gather
    gi_mail = rows[:, :f3]
    gh = rows[:, f3:2 * f3]
    mem_i = rows[:, 2 * f3:2 * f3 + f]
    if cdt == jnp.bfloat16:
        mem_ts_i = _unpack_bf16_as_f32(
            rows[:, 2 * f3 + f:2 * f3 + f + 4])
    else:
        mem_ts_i = rows[:, 2 * f3 + f]
    return gi_mail, gh, mem_i, mem_ts_i


def _fwd(mem_t, mail_t, mem_ts_t, ki_mail, kh, nids, dtype_name):
    out = _node_gather_impl(mem_t, mail_t, mem_ts_t, ki_mail, kh, nids,
                            dtype_name)
    return out, (mem_t, mail_t, nids)


def _row_gather_padded(table: jax.Array, nids: jax.Array) -> jax.Array:
    """Row gather with the column axis lane-padded first (unaligned-width
    row gathers hit a pathological TPU path)."""
    d = table.shape[1]
    pad = (-d) % 128
    if pad:
        table = jnp.pad(table, ((0, 0), (0, pad)))
    rows = table[nids]
    return rows[:, :d] if pad else rows


def _bwd(dtype_name, res, cts):
    mem_t, mail_t, nids = res
    cdt = jnp.dtype(dtype_name)
    d_gi, d_gh, _d_mem, _d_mts = cts   # state cotangents are discarded
    # dW = X[nids]^T @ dgates — gather the raw rows on the fly (cast as
    # in the forward) instead of scatter-adding into node space
    x_mail = _row_gather_padded(mail_t.astype(cdt), nids)    # [L, dm]
    x_mem = _row_gather_padded(mem_t.astype(cdt), nids)      # [L, f]
    d_ki = jax.lax.dot_general(
        x_mail, d_gi.astype(cdt),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    d_kh = jax.lax.dot_general(
        x_mem, d_gh.astype(cdt),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return None, None, None, d_ki, d_kh, None


gru_node_gather.defvjp(_fwd, _bwd)
