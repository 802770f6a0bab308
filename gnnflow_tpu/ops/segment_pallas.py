"""Sorted-segment-sum Pallas kernel — the expansion VJP for the dedup path.

The dedup fast path expands compact GRU rows back to per-instance rows
with a gather ``h = up[inv]``; its transpose is a segment reduction
``d_up[r] = sum over instances i with inv[i]==r of dh[i]``.  XLA's TPU
scatter-add is catastrophic at this shape (measured ~27 ms for
[132k,128] -> [46k,128] on v5e, ~200 ns/row); but the dedup sort already
provides the instances in *segment-sorted* order, which makes the
reduction a sequential-bandwidth problem:

1. (XLA) permute cotangents into sorted order: ``dhs = dh[sidx]``,
2. (Pallas) segment ranks are dense (``rank`` increments by at most 1
   per row), so a 256-row block spans < 256 ranks and its block-local
   segment sums are ONE one-hot matmul on the MXU.  Eight blocks
   accumulate into a [2056, D] VMEM window, and each grid step issues a
   single aligned store of that window into the output.

ALIGNMENT INVARIANT: Mosaic silently mis-lowers dynamic VMEM sublane
offsets that are not multiples of 8 (measured wrong results, not an
error).  Every dynamic offset here is therefore 8-aligned: windows are
anchored at ``(rank // 8) * 8`` and the 0-7 row phase is baked into the
one-hot placement matmul instead of the slice offset.

Cross-boundary segments are handled by the *sequential* TPU grid: the
first 8 rows of each step's window are copied (aligned) from the
previous step's accumulator — covering both the rows the aligned anchor
re-spans and the partial sum of the segment spanning the boundary — and
later stores simply re-store every overlapped row complete.

Cost: ~2 x L x D x 4 bytes of DMA + L*264*D MACs ≈ 0.3 ms at the
headline shape — ~80x faster than the XLA scatter.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BL = 256          # rows per one-hot matmul block
_BL8 = _BL + 8     # placement rows incl. the 0-7 alignment phase
_SUP = 8           # blocks accumulated per grid step
_CHUNK = _SUP * _BL
_ACC = _CHUNK + 8  # window rows incl. the alignment phase


def _seg_sum_kernel(seg0_ref, seg_ref, dhs_ref, out_ref, acc_ref,
                    carry_ref, sem):
    """One grid step: accumulate ``_SUP`` blocks into a [ACC, D] VMEM
    window anchored at ``align8(first rank)``, then store it once.

    ``seg0_ref`` [n_blocks + 1] i32 in SMEM: the first rank of every
    256-row block, padded with one trailing copy (scalar-prefetched —
    VMEM scalar reads at dynamic indices do not lower).  ``seg_ref``
    [SUP, BL] i32, ``dhs_ref`` [CHUNK, D] f32 segment-sorted cotangents,
    ``out_ref`` [cap + ACC, D] f32 in ANY/HBM (zero-init via aliasing),
    ``acc_ref`` [ACC, D] f32 (persists across the sequential grid),
    ``carry_ref`` [8, D] f32 staging for the boundary copy."""
    i = pl.program_id(0)
    base = seg0_ref[i * _SUP]
    base8 = (base // 8) * 8

    # boundary rows [base8, base8+8) from the previous window: complete
    # values for ranks below ``base`` plus the partial sum of the
    # boundary segment.  delta is a difference of 8-aligned anchors.
    prev_base = seg0_ref[jnp.maximum(i - 1, 0) * _SUP]
    delta = base8 - (prev_base // 8) * 8

    @pl.when(i == 0)
    def _():
        carry_ref[:] = jnp.zeros_like(carry_ref)

    @pl.when(i > 0)
    def _():
        carry_ref[:] = acc_ref[pl.ds(delta, 8), :]

    acc_ref[:] = jnp.zeros_like(acc_ref)
    acc_ref[0:8, :] = carry_ref[:]

    segs = seg_ref[:]                          # [SUP, BL] aligned read

    def body(k, _):
        # row k of segs via one-hot select (dynamic sublane reads of
        # VMEM refs/values do not lower)
        rows8 = jax.lax.broadcasted_iota(jnp.int32, (_SUP, _BL), 0)
        seg = jnp.sum(jnp.where(rows8 == k, segs, 0), axis=0)   # [BL]
        seg0 = seg0_ref[i * _SUP + k]
        off = seg0 - base8
        off8 = (off // 8) * 8
        sh = off - off8                        # 0..7 alignment phase
        rel = seg - seg0 + sh                  # 0 <= rel < BL8
        rows = jax.lax.broadcasted_iota(jnp.int32, (_BL8, _BL), 0)
        onehot = (rows == rel[None, :]).astype(jnp.float32)
        local = jax.lax.dot_general(
            onehot, dhs_ref[pl.ds(k * _BL, _BL), :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            # HIGHEST: the MXU's default f32 path rounds through bf16
            # passes (measured ~5e-3 rel error) — gradients must match
            # the XLA scatter-add bit-for-bit-ish
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
        cur = acc_ref[pl.ds(off8, _BL8), :]    # off8 is 8-aligned
        acc_ref[pl.ds(off8, _BL8), :] = cur + local
        return 0

    jax.lax.fori_loop(0, _SUP, body, 0)

    # single aligned store; rows below ``base`` re-store the previous
    # step's complete values, overlapped rows above are re-stored
    # complete by later steps
    store = pltpu.make_async_copy(
        acc_ref, out_ref.at[pl.ds(base8, _ACC), :], sem)
    store.start()
    store.wait()


@functools.partial(jax.jit, static_argnums=(2, 3))
def sorted_segment_sum(dhs: jax.Array, seg: jax.Array, cap: int,
                       interpret: bool = False) -> jax.Array:
    """Sum rows of ``dhs`` [L, D] into ``out`` [cap, D] by the
    non-decreasing dense segment ids ``seg`` [L] (values in [0, cap),
    advancing by at most 1 per row — the dedup-rank property).

    ``L`` is padded to a window multiple internally (padding rows carry
    zero cotangents and the trailing segment id, contributing nothing).
    ``D`` must be a lane multiple (128).
    """
    L, D = dhs.shape
    lp = (-L) % _CHUNK
    if lp:
        dhs = jnp.pad(dhs, ((0, lp), (0, 0)))
        seg = jnp.concatenate(
            [seg, jnp.broadcast_to(seg[-1], (lp,))])
    n_super = (L + lp) // _CHUNK
    seg2d = seg.reshape(n_super * _SUP, _BL)
    # first rank per block, plus one trailing copy
    seg0s = jnp.concatenate([seg2d[:, 0], seg[-1:]])
    out_init = jnp.zeros((cap + _ACC, D), jnp.float32)

    def kernel(seg0_ref, seg_ref, dhs_ref, init_ref, out_ref, acc_ref,
               carry_ref, sem):
        del init_ref  # aliased to out_ref
        _seg_sum_kernel(seg0_ref, seg_ref, dhs_ref, out_ref, acc_ref,
                        carry_ref, sem)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_super,),
        in_specs=[
            pl.BlockSpec((_SUP, _BL), lambda i, s: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_CHUNK, D), lambda i, s: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),         # out_init (aliased)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((_ACC, D), jnp.float32),
            pltpu.VMEM((8, D), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((cap + _ACC, D), jnp.float32),
        grid_spec=grid_spec,
        input_output_aliases={3: 0},
        interpret=interpret,
    )(seg0s, seg2d, dhs.astype(jnp.float32), out_init)
    return out[:cap]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def expand_compact(up: jax.Array, inv: jax.Array, sidx: jax.Array,
                   rank_sorted: jax.Array, use_pallas: bool = True):
    """``up[inv]`` with an efficient transpose.

    ``up`` [cap, D] (D a lane multiple), ``inv`` [L] instance -> compact
    slot, ``sidx`` [L] sorted position -> instance, ``rank_sorted`` [L]
    the non-decreasing compact slot per sorted position (all produced by
    :func:`gnnflow_tpu.ops.dedup.dedup_instances`).  The VJP runs the
    sorted-segment-sum Pallas kernel on TPU and
    ``jax.ops.segment_sum`` elsewhere."""
    return up[inv]


def _expand_fwd(up, inv, sidx, rank_sorted, use_pallas):
    return up[inv], (inv, sidx, rank_sorted, up.shape[0])


def _expand_bwd(use_pallas, res, dh):
    inv, sidx, rank_sorted, cap = res
    dhs = dh[sidx]
    if use_pallas:
        interpret = jax.default_backend() == "cpu"
        d_up = sorted_segment_sum(dhs, rank_sorted, cap, interpret)
    else:
        d_up = jax.ops.segment_sum(dhs, rank_sorted, num_segments=cap,
                                   indices_are_sorted=True)
    return d_up.astype(dh.dtype), None, None, None


expand_compact.defvjp(_expand_fwd, _expand_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def expand_blocks(rst: jax.Array, rank: jax.Array, cap: int, fanout: int):
    """Expand compact-layer embeddings to the parent layer's ``h_all``.

    ``rst`` [B + cap*F, d] holds embeddings for the compact root set
    (B parent roots first, then ``cap`` packed F-wide neighbor blocks);
    ``rank`` [B] maps each parent root's neighbor block to its compact
    slot (``cap`` = invalid -> zeros).  Returns [B*(1+F), d].

    The transpose is NOT a scatter-add: ``rank`` is injective on valid
    blocks (each compact slot feeds exactly one parent block), so the
    VJP gathers by the inverse permutation — avoiding XLA's ~200 ns/row
    TPU scatter-add.
    """
    return _expand_blocks_impl(rst, rank, cap, fanout)


def _expand_blocks_impl(rst, rank, cap, fanout):
    B = rank.shape[0]
    d = rst.shape[-1]
    head = rst[:B]
    tail = rst[B:].reshape(cap, fanout * d)
    tail = jnp.concatenate(
        [tail, jnp.zeros((1, fanout * d), rst.dtype)], axis=0)
    body = tail[jnp.clip(rank, 0, cap)]          # [B, F*d]
    return jnp.concatenate([head, body.reshape(B * fanout, d)], axis=0)


def _expand_blocks_fwd(rst, rank, cap, fanout):
    return _expand_blocks_impl(rst, rank, cap, fanout), (rank,)


def _expand_blocks_bwd(cap, fanout, res, g):
    (rank,) = res
    B = rank.shape[0]
    d = g.shape[-1]
    g_head = g[:B]
    g_body = g[B:].reshape(B, fanout * d)
    # inverse permutation: compact slot -> parent block (injective);
    # invalid blocks route to DISTINCT out-of-range slots so the
    # unique_indices promise holds (duplicate dropped indices are UB)
    iota = jnp.arange(B, dtype=jnp.int32)
    slot = jnp.where(rank < cap, rank, cap + iota)
    inv = jnp.full((cap,), B, jnp.int32).at[slot].set(
        iota, mode="drop", unique_indices=True)
    g_body = jnp.concatenate(
        [g_body, jnp.zeros((1, fanout * d), g.dtype)], axis=0)
    d_tail = g_body[inv].reshape(cap * fanout, d)
    return jnp.concatenate([g_head, d_tail], axis=0), None


expand_blocks.defvjp(_expand_blocks_fwd, _expand_blocks_bwd)


def expand_rows_spec(rst: jax.Array, spec, h: int = 0) -> jax.Array:
    """Apply a ``("rows", inv, sidx, rank_sorted)`` dedup-expansion spec
    to compact layer-output embeddings ``rst`` [cap, d].

    Lane-pads ``d`` to a 128 multiple around :func:`expand_compact` (the
    sorted-segment-sum VJP needs lane-aligned rows) and slices back.
    Stacked per-snapshot specs (``inv.ndim == 2``, produced by the
    windowed multi-snapshot dedup) are indexed by snapshot ``h``."""
    _, inv, sidx, rank_sorted = spec
    if inv.ndim == 2:
        inv, sidx, rank_sorted = inv[h], sidx[h], rank_sorted[h]
    d = rst.shape[-1]
    pad = (-d) % 128
    rp = jnp.pad(rst, ((0, 0), (0, pad))) if pad else rst
    out = expand_compact(rp, inv, sidx, rank_sorted)
    return out[:, :d] if pad else out
