"""Pallas TPU kernel: fused TimeEncode + GRU memory update (fwd + bwd).

The TGN memory update (``GRUMemoryUpdater``,
``/root/reference/gnnflow/models/modules/memory_updater.py:43-91``) is the
bandwidth hot spot of the train step: at headline shapes it runs over
~132k rows of [mail 372 | time 100] against a 100-wide hidden state, and
the XLA lowering materializes the [N, 300] gate pre-activations (forward
residuals for the backward) plus the [N, 100] time encoding — several
hundred MB of HBM round-trips per step on top of the matmul reads.

This kernel computes, per VMEM row tile,

    tf  = cos(dts * tw + tb)                    (TimeEncode, in-register)
    gi  = mail @ Ki_mail + tf @ Ki_time + bi    (MXU)
    gh  = mem @ Kh + bh
    r   = sigmoid(gi_r + gh_r)
    z   = sigmoid(gi_z + gh_z)
    n   = tanh(gi_n + r * gh_n)
    h   = (1 - z) * n + z * mem                 (torch.nn.GRUCell math)

writing ONLY ``h`` to HBM.  The custom VJP recomputes the gates in the
backward kernel (inputs are re-read; nothing is stashed) and accumulates
the weight / bias / time-encode gradients across row tiles in VMEM — the
[N, 3F] gate intermediates never exist in HBM in either direction.

Layout notes (see CLAUDE.md lane-slicing lessons): weights are passed as
NINE per-gate arrays so no unaligned lane slicing or concatenation ever
happens inside the kernel; row tiles need no padding (the ragged last
tile is handled by Pallas bounds-masking in the forward and by masking
the ``dh`` load in the backward, which zeroes every gradient
contribution from out-of-range rows).

GRADIENT CONTRACT: cotangents flow to the parameters only.  ``mem``,
``mail`` and ``dts`` receive ZERO cotangents — they are the node memory /
mailbox state, which the reference treats as detached buffers
(``memory.py:58-66`` stores them as plain tensors outside autograd), so
no real gradient ever flows there.  Do NOT reuse this op for
differentiable inputs (the DySAT snapshot combiner keeps the XLA cell).

CPU tests run with ``interpret=True``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

_ROWS_CONTRACT = (((0,), (0,)), ((), ()))


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _gates(dts, mem, mail, tw, tb, km, kt, kh, bi, bh, cd):
    """Shared fwd recompute: returns (tf_c, mem_c, mail_c, r, z, n, ghn)."""
    tf = jnp.cos(dts * tw + tb)
    mail_c = mail.astype(cd)
    tf_c = tf.astype(cd)
    mem_c = mem.astype(cd)
    gi = [_dot(mail_c, km[g]) + _dot(tf_c, kt[g]) + bi[g] for g in range(3)]
    gh = [_dot(mem_c, kh[g]) + bh[g] for g in range(3)]
    r = jax.nn.sigmoid(gi[0] + gh[0])
    z = jax.nn.sigmoid(gi[1] + gh[1])
    n = jnp.tanh(gi[2] + r * gh[2])
    return tf_c, mem_c, mail_c, r, z, n, gh[2]


def _fwd_kernel(dts_ref, mem_ref, mail_ref, tw_ref, tb_ref,
                km_r, km_z, km_n, kt_r, kt_z, kt_n, kh_r, kh_z, kh_n,
                bi_r, bi_z, bi_n, bh_r, bh_z, bh_n, h_ref, *, cd):
    mem = mem_ref[:]
    _, _, _, r, z, n, _ = _gates(
        dts_ref[:], mem, mail_ref[:], tw_ref[:], tb_ref[:],
        (km_r[:], km_z[:], km_n[:]), (kt_r[:], kt_z[:], kt_n[:]),
        (kh_r[:], kh_z[:], kh_n[:]), (bi_r[:], bi_z[:], bi_n[:]),
        (bh_r[:], bh_z[:], bh_n[:]), cd)
    h_ref[:] = (1.0 - z) * n + z * mem


def _bwd_kernel(dts_ref, mem_ref, mail_ref, tw_ref, tb_ref,
                km_r, km_z, km_n, kt_r, kt_z, kt_n, kh_r, kh_z, kh_n,
                bi_r, bi_z, bi_n, bh_r, bh_z, bh_n, dh_ref,
                dkm_r, dkm_z, dkm_n, dkt_r, dkt_z, dkt_n,
                dkh_r, dkh_z, dkh_n, dbi, dbh, dtw_ref, dtb_ref,
                *, cd, n_rows, block_rows):
    outs = (dkm_r, dkm_z, dkm_n, dkt_r, dkt_z, dkt_n,
            dkh_r, dkh_z, dkh_n, dbi, dbh, dtw_ref, dtb_ref)

    @pl.when(pl.program_id(0) == 0)
    def _zero():
        for ref in outs:
            ref[:] = jnp.zeros_like(ref)

    # Mask the ragged last tile: rows beyond n_rows may hold garbage
    # (even NaN bit patterns), which would poison the row-contracting
    # weight-grad matmuls as NaN*0 — zero the inputs AND dh.
    def rmask(x):
        row = (pl.program_id(0) * block_rows
               + lax.broadcasted_iota(jnp.int32, x.shape, 0))
        return jnp.where(row < n_rows, x, 0.0)

    dts = rmask(dts_ref[:])
    mem = rmask(mem_ref[:])
    kt = (kt_r[:], kt_z[:], kt_n[:])
    tf_c, mem_c, mail_c, r, z, n, ghn = _gates(
        dts, mem, rmask(mail_ref[:]), tw_ref[:], tb_ref[:],
        (km_r[:], km_z[:], km_n[:]), kt,
        (kh_r[:], kh_z[:], kh_n[:]), (bi_r[:], bi_z[:], bi_n[:]),
        (bh_r[:], bh_z[:], bh_n[:]), cd)

    dh = rmask(dh_ref[:])

    dn = dh * (1.0 - z)
    da_n = dn * (1.0 - n * n)
    da_z = dh * (mem - n) * z * (1.0 - z)
    da_r = da_n * ghn * r * (1.0 - r)
    da = (da_r, da_z, da_n)
    dah = (da_r, da_z, da_n * r)

    dkm = (dkm_r, dkm_z, dkm_n)
    dkt = (dkt_r, dkt_z, dkt_n)
    dkh = (dkh_r, dkh_z, dkh_n)
    dtf = jnp.zeros(tf_c.shape, jnp.float32)
    for g in range(3):
        da_c = da[g].astype(cd)
        dkm[g][:] += lax.dot_general(mail_c, da_c, _ROWS_CONTRACT,
                                     preferred_element_type=jnp.float32)
        dkt[g][:] += lax.dot_general(tf_c, da_c, _ROWS_CONTRACT,
                                     preferred_element_type=jnp.float32)
        dkh[g][:] += lax.dot_general(mem_c, dah[g].astype(cd),
                                     _ROWS_CONTRACT,
                                     preferred_element_type=jnp.float32)
        dbi[g:g + 1, :] += jnp.sum(da[g], axis=0, keepdims=True)
        dbh[g:g + 1, :] += jnp.sum(dah[g], axis=0, keepdims=True)
        # dtf = sum_g da_g @ kt_g^T
        dtf += lax.dot_general(da_c, kt[g], (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)

    darg = -jnp.sin(dts * tw_ref[:] + tb_ref[:]) * dtf
    dtw_ref[:] += jnp.sum(darg * dts, axis=0, keepdims=True)
    dtb_ref[:] += jnp.sum(darg, axis=0, keepdims=True)


def _split_weights(ki, bi, kh, bh, dr, f, cd):
    """ki [DR+DT, 3F] (+ bias/hidden) -> per-gate f32/compute-dtype arrays."""
    km = [ki[:dr, g * f:(g + 1) * f].astype(cd) for g in range(3)]
    kt = [ki[dr:, g * f:(g + 1) * f].astype(cd) for g in range(3)]
    khs = [kh[:, g * f:(g + 1) * f].astype(cd) for g in range(3)]
    bis = [bi[g * f:(g + 1) * f].astype(jnp.float32)[None, :]
           for g in range(3)]
    bhs = [bh[g * f:(g + 1) * f].astype(jnp.float32)[None, :]
           for g in range(3)]
    return km, kt, khs, bis, bhs


def _specs(t, f, dr, dt):
    row = lambda i: (i, 0)
    whole = lambda i: (0, 0)
    return [
        pl.BlockSpec((t, 1), row),             # dts
        pl.BlockSpec((t, f), row),             # mem
        pl.BlockSpec((t, dr), row),            # mail
        pl.BlockSpec((1, dt), whole),          # tw
        pl.BlockSpec((1, dt), whole),          # tb
    ] + [pl.BlockSpec((dr, f), whole)] * 3 \
      + [pl.BlockSpec((dt, f), whole)] * 3 \
      + [pl.BlockSpec((f, f), whole)] * 3 \
      + [pl.BlockSpec((1, f), whole)] * 6


def _prep(mem, mail, dts, ki, bi, kh, bh, tw, tb, cd):
    n, f = mem.shape
    dr = mail.shape[1]
    dt = tw.shape[0]
    km, kt, khs, bis, bhs = _split_weights(ki, bi, kh, bh, dr, f, cd)
    ops = [dts.astype(jnp.float32)[:, None], mem.astype(jnp.float32),
           mail.astype(jnp.float32),
           tw.astype(jnp.float32)[None, :], tb.astype(jnp.float32)[None, :],
           *km, *kt, *khs, *bis, *bhs]
    return n, f, dr, dt, ops


def _call_fwd(mem, mail, dts, ki, bi, kh, bh, tw, tb, compute_dtype,
              block_rows, interpret):
    cd = jnp.dtype(compute_dtype) if compute_dtype else jnp.float32
    n, f, dr, dt, ops = _prep(mem, mail, dts, ki, bi, kh, bh, tw, tb, cd)
    t = block_rows
    return pl.pallas_call(
        functools.partial(_fwd_kernel, cd=cd),
        grid=(pl.cdiv(n, t),),
        in_specs=_specs(t, f, dr, dt),
        out_specs=pl.BlockSpec((t, f), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, f), jnp.float32),
        interpret=interpret,
    )(*ops)


def _call_bwd(mem, mail, dts, ki, bi, kh, bh, tw, tb, dh, compute_dtype,
              block_rows, interpret):
    cd = jnp.dtype(compute_dtype) if compute_dtype else jnp.float32
    n, f, dr, dt, ops = _prep(mem, mail, dts, ki, bi, kh, bh, tw, tb, cd)
    t = block_rows
    whole = lambda i: (0, 0)
    out_shapes = ([(dr, f)] * 3 + [(dt, f)] * 3 + [(f, f)] * 3
                  + [(3, f), (3, f), (1, dt), (1, dt)])
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, cd=cd, n_rows=n,
                          block_rows=block_rows),
        grid=(pl.cdiv(n, t),),
        in_specs=_specs(t, f, dr, dt)
        + [pl.BlockSpec((t, f), lambda i: (i, 0))],       # dh
        out_specs=[pl.BlockSpec(s, whole) for s in out_shapes],
        out_shape=[jax.ShapeDtypeStruct(s, jnp.float32)
                   for s in out_shapes],
        interpret=interpret,
    )(*ops, dh.astype(jnp.float32))
    (dkm_r, dkm_z, dkm_n, dkt_r, dkt_z, dkt_n, dkh_r, dkh_z, dkh_n,
     dbi3, dbh3, dtw, dtb) = outs
    dki = jnp.concatenate(
        [jnp.concatenate([dkm_r, dkm_z, dkm_n], axis=1),
         jnp.concatenate([dkt_r, dkt_z, dkt_n], axis=1)], axis=0)
    dkh = jnp.concatenate([dkh_r, dkh_z, dkh_n], axis=1)
    return (dki, dbi3.reshape(-1), dkh, dbh3.reshape(-1),
            dtw[0], dtb[0])


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11))
def gru_memory_fused(mem, mail, dts, ki, bi, kh, bh, tw, tb,
                     compute_dtype=None, block_rows=512, interpret=False):
    """Fused ``h' = GRUCell(mem, [mail | cos(dts*tw + tb)])``.

    Args:
        mem:  [N, F] current node memory (STATE — zero cotangent).
        mail: [N, DR] latest mails (STATE — zero cotangent).
        dts:  [N] time delta ``all_ts - mem_ts`` (STATE — zero cotangent).
        ki:   [DR + DT, 3F] input kernel, rows = [mail | time], cols per
              torch GRUCell gate layout [r | z | n].
        bi:   [3F] input bias.     kh: [F, 3F] hidden kernel.
        bh:   [3F] hidden bias.    tw, tb: [DT] TimeEncode params.
        compute_dtype: matmul operand dtype (e.g. "bfloat16"); gate math
            runs in float32 either way.

    Returns [N, F] float32 updated memory.  See module docstring for the
    gradient contract (parameters only).
    """
    return _call_fwd(mem, mail, dts, ki, bi, kh, bh, tw, tb,
                     compute_dtype, block_rows, interpret)


def _vjp_fwd(mem, mail, dts, ki, bi, kh, bh, tw, tb, compute_dtype,
             block_rows, interpret):
    h = _call_fwd(mem, mail, dts, ki, bi, kh, bh, tw, tb,
                  compute_dtype, block_rows, interpret)
    return h, (mem, mail, dts, ki, bi, kh, bh, tw, tb)


def _vjp_bwd(compute_dtype, block_rows, interpret, res, dh):
    mem, mail, dts, ki, bi, kh, bh, tw, tb = res
    dki, dbi, dkh, dbh, dtw, dtb = _call_bwd(
        mem, mail, dts, ki, bi, kh, bh, tw, tb, dh,
        compute_dtype, block_rows, interpret)
    return (jnp.zeros_like(mem), jnp.zeros_like(mail),
            jnp.zeros_like(dts),
            dki.astype(ki.dtype), dbi.astype(bi.dtype),
            dkh.astype(kh.dtype), dbh.astype(bh.dtype),
            dtw.astype(tw.dtype), dtb.astype(tb.dtype))


gru_memory_fused.defvjp(_vjp_fwd, _vjp_bwd)
