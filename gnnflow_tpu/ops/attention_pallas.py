"""Pallas TPU kernel: fused padded-neighborhood attention.

The temporal attention core (``models/modules.py:TemporalAttentionLayer``)
computes, per destination, masked softmax attention over a fixed-width
padded neighbor axis:

    score[b,f,h] = leaky_relu(sum_d Q[b,h,d] * K[b,f,h,d])
    att          = masked_softmax_f(score)
    out[b,h,d]   = sum_f att[b,f,h] * V[b,f,h,d]

This kernel fuses the whole chain (QK dot, LeakyReLU, masked softmax,
weighted V-sum) over VMEM tiles of the batch axis — one kernel instead of
an XLA fusion chain with [B,F,H] intermediates.  Equivalent to the
reference's ``dgl.ops.edge_softmax`` + SpMM step (``layers.py:150-158``)
but over dense [B, F] neighborhoods.

Gradients: ``neighborhood_attention`` carries a custom VJP whose backward
pass uses plain XLA ops (the backward is matmul-light and XLA fuses it
well); the Pallas kernel accelerates the forward.

Status: correct and compiled on TPU (tested vs the jnp reference to
~6e-6), but at the default shapes (F=10, H=2, dh=50) XLA's own fusion of
this chain is FASTER (0.50 ms vs 1.52 ms at B=12000 on v5e) — the
unrolled lane-slice reductions generate worse vector code than XLA's
fused reduce.  ``TemporalAttentionLayer(attention_impl="pallas")`` opts
in; the default stays "xla".  The kernel is the starting point for
large-fanout configurations where VMEM blocking pays.

CPU tests run with ``interpret=True``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl

_NEG = -1e30


def _reference_impl(q, k, v, mask):
    """Pure-jnp reference (also the VJP recompute path)."""
    B, F, H, dh = k.shape
    att = jax.nn.leaky_relu(
        jnp.sum(q[:, None] * k, axis=-1).astype(jnp.float32),
        negative_slope=0.2)
    att = jnp.where(mask[:, :, None], att, _NEG)
    m = jnp.max(att, axis=1, keepdims=True)
    e = jnp.exp(att - m) * mask[:, :, None]
    s = jnp.sum(e, axis=1, keepdims=True)
    att = e / jnp.maximum(s, 1e-10)
    return jnp.sum(v * att[..., None].astype(v.dtype), axis=1), att


def _make_kernel(F: int, H: int, dh: int):
    """2-D-layout kernel: Mosaic handles (sublane, lane) tensors best, so
    the fanout axis is unrolled (F is small — the sampling fanout) and
    (H, dh) is flattened into the lane dimension D = H*dh."""
    D = H * dh

    def kernel(q_ref, k_ref, v_ref, mask_ref, out_ref):
        q = q_ref[:]                     # [TB, D]
        mask = mask_ref[:]               # [TB, F] f32
        scores = []
        for f in range(F):
            prod = q * k_ref[:, f * D:(f + 1) * D]
            sh = [jnp.sum(prod[:, h * dh:(h + 1) * dh], axis=1,
                          keepdims=True) for h in range(H)]
            s = jnp.concatenate(sh, axis=1).astype(jnp.float32)  # [TB,H]
            s = jnp.where(s >= 0, s, 0.2 * s)       # LeakyReLU(0.2)
            mf = mask[:, f:f + 1]
            s = s * mf + (mf - 1.0) * (-_NEG)       # invalid -> -1e30
            scores.append(s)
        m = scores[0]
        for f in range(1, F):
            m = jnp.maximum(m, scores[f])
        es = [jnp.exp(scores[f] - m) * mask[:, f:f + 1]
              for f in range(F)]
        ssum = es[0]
        for f in range(1, F):
            ssum = ssum + es[f]
        inv = 1.0 / jnp.maximum(ssum, 1e-10)        # [TB, H]
        acc = jnp.zeros_like(q, dtype=jnp.float32)
        for f in range(F):
            att = es[f] * inv                        # [TB, H]
            attD = jnp.concatenate(
                [jnp.repeat(att[:, h:h + 1], dh, axis=1)
                 for h in range(H)], axis=1)         # [TB, D]
            acc = acc + v_ref[:, f * D:(f + 1) * D].astype(jnp.float32) \
                * attD
        out_ref[:] = acc.astype(out_ref.dtype)

    return kernel


def _forward_pallas(q, k, v, mask, block_b: int = 256,
                    interpret: bool = False):
    B, F, H, dh = k.shape
    D = H * dh
    q2 = q.reshape(B, D)
    k2 = k.reshape(B, F * D)
    v2 = v.reshape(B, F * D)
    mask = mask.astype(jnp.float32)
    pad = (-B) % block_b
    if pad:
        q2 = jnp.pad(q2, [(0, pad), (0, 0)])
        k2 = jnp.pad(k2, [(0, pad), (0, 0)])
        v2 = jnp.pad(v2, [(0, pad), (0, 0)])
        mask = jnp.pad(mask, [(0, pad), (0, 0)])
    Bp = B + pad
    out = pl.pallas_call(
        _make_kernel(F, H, dh),
        grid=(Bp // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, D), lambda i: (i, 0)),
            pl.BlockSpec((block_b, F * D), lambda i: (i, 0)),
            pl.BlockSpec((block_b, F * D), lambda i: (i, 0)),
            pl.BlockSpec((block_b, F), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((block_b, D), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((Bp, D), v.dtype),
        interpret=interpret,
    )(q2, k2, v2, mask)
    return out[:B].reshape(B, H, dh)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def neighborhood_attention(q, k, v, mask, interpret=False):
    """Fused masked neighbor attention.

    Args:
        q: [B, H, dh] destination queries.
        k, v: [B, F, H, dh] neighbor keys/values.
        mask: [B, F] validity.

    Returns [B, H, dh] aggregated values (rows with no valid neighbors
    aggregate to zero, matching edge_softmax + sum semantics).
    """
    return _forward_pallas(q, k, v, mask, interpret=interpret)


def _fwd(q, k, v, mask, interpret):
    out = _forward_pallas(q, k, v, mask, interpret=interpret)
    return out, (q, k, v, mask)


def _bwd(interpret, res, g):
    q, k, v, mask = res
    # recompute attention with plain ops; differentiate analytically
    def f(q, k, v):
        out, _ = _reference_impl(q, k, v, mask)
        return out
    _, vjp = jax.vjp(f, q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


neighborhood_attention.defvjp(_fwd, _bwd)
