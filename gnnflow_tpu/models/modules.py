"""Core neural modules: time encoding, temporal attention, edge predictor.

Behavioral parity with ``/root/reference/gnnflow/models/modules/layers.py``
(the TGL-style layer stack), re-designed for padded MFGs: where the
reference runs DGL ``edge_softmax`` + SpMM over variable-length edge lists,
we compute per-destination masked softmax over the dense ``[B, fanout]``
neighbor axis — pure MXU matmuls + VPU elementwise, no scatter/segment ops.

Linear-layer initialization follows torch defaults (kaiming-uniform weights
with a=sqrt(5) → U(±sqrt(1/fan_in)); bias U(±1/sqrt(fan_in))) so training
dynamics match the reference.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from gnnflow_tpu.common import MFG

# torch nn.Linear default init: kaiming_uniform(a=sqrt(5)) == U(±sqrt(1/fan_in))
torch_kernel_init = nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform")


def torch_bias_init(key, shape, dtype=jnp.float32, fan_in: int = 1):
    bound = 1.0 / np.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class Linear(nn.Module):
    """nn.Dense with torch-default initialization.

    ``dtype`` selects the computation dtype (mixed precision: params stay
    float32, activations/matmul run in e.g. bfloat16)."""

    features: int
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        # fan_in == 0 is legal (zero-width dummy features, layers.py:111-137)
        kinit = torch_kernel_init if fan_in > 0 else nn.initializers.zeros
        kernel = self.param("kernel", kinit, (fan_in, self.features))
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
        y = x @ kernel
        if self.use_bias:
            bias = self.param(
                "bias",
                lambda k, s: torch_bias_init(k, s, fan_in=fan_in),
                (self.features,))
            if self.dtype is not None:
                bias = bias.astype(self.dtype)
            y = y + bias
        return y


class MultiLinear(nn.Module):
    """``concat(parts, -1) @ kernel + bias`` computed as a SUM of per-part
    matmuls against slices of ONE kernel parameter.

    Numerically ≈ ``Linear(features)(concat(parts))`` (same kernel/bias
    layout and initialization, so checkpoints are interchangeable) but the
    wide concatenated input is never materialized in HBM — each part feeds
    its matmul directly (with the bf16 cast fused into the read).  At 100k+
    rows the step is bandwidth-bound, so skipping the concat copy (plus its
    gradient-slicing counterpart in the backward pass) is a measurable win.

    Zero-width parts are skipped (the dummy-feature cases of
    ``layers.py:111-137``)."""

    features: int
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, parts):
        dims = [p.shape[-1] for p in parts]
        fan_in = sum(dims)
        kinit = torch_kernel_init if fan_in > 0 else nn.initializers.zeros
        kernel = self.param("kernel", kinit, (fan_in, self.features))
        if self.dtype is not None:
            kernel = kernel.astype(self.dtype)
        y = None
        off = 0
        for p, d in zip(parts, dims):
            if d == 0:
                continue
            if self.dtype is not None:
                p = p.astype(self.dtype)
            t = p @ kernel[off:off + d]
            y = t if y is None else y + t
            off += d
        if y is None:
            batch = parts[0].shape[:-1] if parts else ()
            y = jnp.zeros((*batch, self.features),
                          self.dtype or jnp.float32)
        if self.use_bias:
            bias = self.param(
                "bias",
                lambda k, s: torch_bias_init(k, s, fan_in=fan_in),
                (self.features,))
            if self.dtype is not None:
                bias = bias.astype(self.dtype)
            y = y + bias
        return y


class KernelParams(nn.Module):
    """Kernel-only parameter holder with torch-default init.

    Same variable tree as ``Linear(features, use_bias=False)`` — modules
    that need the raw weight (to re-associate matmuls) stay
    checkpoint-compatible when instantiated under the Linear's name."""

    in_features: int
    out_features: int

    @nn.compact
    def __call__(self):
        kinit = torch_kernel_init if self.in_features > 0 \
            else nn.initializers.zeros
        return self.param("kernel", kinit,
                          (self.in_features, self.out_features))


class GateParams(nn.Module):
    """Kernel/bias parameter holder with torch-default init.

    Param tree (``<name>/kernel``, ``<name>/bias``) and initialization are
    identical to :class:`Linear`/:class:`MultiLinear` children, so modules
    that need raw weight access (the fused Pallas GRU) stay
    checkpoint-compatible with the matmul formulation."""

    in_features: int
    out_features: int

    def setup(self):
        kinit = torch_kernel_init if self.in_features > 0 \
            else nn.initializers.zeros
        self.kernel = self.param(
            "kernel", kinit, (self.in_features, self.out_features))
        self.bias = self.param(
            "bias",
            lambda k, s: torch_bias_init(k, s, fan_in=self.in_features),
            (self.out_features,))

    def __call__(self):
        return self.kernel, self.bias


class FusedGRUCell(nn.Module):
    """GRU cell with fused 3-gate projections (torch.nn.GRUCell math).

    flax's GRUCell issues one Dense per gate per operand (6 matmuls, 3
    reads of the wide input); here ``x`` and ``h`` are each read once
    through a single 3-gate-wide matmul — the step is bandwidth-bound, so
    this matters at 100k+ rows.

        r = sigmoid(x@Wir + bir + h@Whr + bhr)
        z = sigmoid(x@Wiz + biz + h@Whz + bhz)
        n = tanh  (x@Win + bin + r * (h@Whn + bhn))
        h' = (1 - z) * n + z * h

    ``impl="pallas"`` + a ``time`` input runs the fused Pallas kernel
    (:func:`gnnflow_tpu.ops.gru_pallas.gru_memory_fused`): the time
    encoding is computed in-register and no gate intermediate touches
    HBM.  That path propagates gradients to the PARAMETERS ONLY — ``h``
    and ``x`` must be non-differentiable state (the TGN memory case);
    differentiable-input users (DySAT combiner) keep ``impl="xla"``.
    """

    features: int
    dtype: Optional[jnp.dtype] = None
    impl: str = "xla"          # "xla" | "pallas" (state inputs only)

    @nn.compact
    def __call__(self, h, x, time=None):
        """``x`` may be a list of parts (never concatenated — see
        :class:`MultiLinear`) or a single array.  ``time`` is an optional
        ``(dts, time_w, time_b)`` triple appending a TimeEncode part
        ``cos(dts * w + b)`` to ``x`` (fused in-kernel on the pallas
        path)."""
        f = self.features
        xs = list(x) if isinstance(x, (list, tuple)) else [x]
        dims = [p.shape[-1] for p in xs]
        fan_in = sum(dims) + (time[1].shape[0] if time is not None else 0)
        ki, bi = GateParams(fan_in, 3 * f, name="ih")()
        kh, bh = GateParams(h.shape[-1], 3 * f, name="hh")()

        if self.impl == "pallas" and time is not None and len(xs) == 1:
            from gnnflow_tpu.ops.gru_pallas import gru_memory_fused
            dts, tw, tb = time
            return gru_memory_fused(
                h, xs[0], dts, ki, bi, kh, bh, tw, tb,
                jnp.dtype(self.dtype).name if self.dtype else None,
                512, jax.default_backend() == "cpu")

        if time is not None:
            dts, tw, tb = time
            xs.append(jnp.cos(dts[..., None] * tw + tb))
            dims.append(tw.shape[0])

        cast = (lambda a: a.astype(self.dtype)) if self.dtype is not None \
            else (lambda a: a)
        gi = None
        off = 0
        for p, d in zip(xs, dims):
            if d == 0:
                continue
            t = cast(p) @ cast(ki[off:off + d])
            gi = t if gi is None else gi + t
            off += d
        gi = cast(bi) if gi is None else gi + cast(bi)
        gh = cast(h) @ cast(kh) + cast(bh)
        i_r, i_z, i_n = gi[..., :f], gi[..., f:2 * f], gi[..., 2 * f:]
        h_r, h_z, h_n = gh[..., :f], gh[..., f:2 * f], gh[..., 2 * f:]
        r = nn.sigmoid(i_r + h_r)
        z = nn.sigmoid(i_z + h_z)
        n = nn.tanh(i_n + r * h_n)
        h = h.astype(n.dtype) if self.dtype is not None else h
        return (1.0 - z) * n + z * h


class GRUGateParams(nn.Module):
    """Parameter-only stand-in for :class:`FusedGRUCell`.

    Creates the identical variable tree (``ih``/``hh`` GateParams), so a
    module that computes the GRU math through a different dataflow (the
    per-node pre-projection path) stays checkpoint-compatible with the
    per-instance cell when instantiated with ``name="FusedGRUCell_0"``."""

    fan_in: int
    features: int

    def setup(self):
        self.ih = GateParams(self.fan_in, 3 * self.features, name="ih")
        self.hh = GateParams(self.features, 3 * self.features, name="hh")

    def __call__(self):
        return self.ih(), self.hh()


class TimeEncode(nn.Module):
    """TGAT fixed-frequency time encoding: ``cos(w * dt + b)`` with
    ``w = 1/10^linspace(0, 9, d)`` (``layers.py:16-35``).  Trainable.

    Setup-style so :meth:`weights` can hand the raw params to fused
    kernels (the Pallas GRU computes the encoding in-register)."""

    dim_time: int

    def setup(self):
        self.w = self.param(
            "w",
            lambda key, shape: jnp.asarray(
                1.0 / 10 ** np.linspace(0, 9, self.dim_time,
                                        dtype=np.float32)),
            (self.dim_time,))
        self.b = self.param("b", nn.initializers.zeros, (self.dim_time,))

    def __call__(self, delta_time: jax.Array) -> jax.Array:
        return jnp.cos(delta_time[..., None] * self.w + self.b)

    def weights(self):
        return self.w, self.b


def masked_softmax(scores: jax.Array, mask: jax.Array,
                   axis: int = 1) -> jax.Array:
    """Softmax over ``axis`` with invalid entries excluded; rows with no
    valid entries return all-zeros (matching DGL edge_softmax + sum-agg
    semantics for isolated destinations)."""
    neg = jnp.finfo(scores.dtype).min
    masked = jnp.where(mask, scores, neg)
    m = jnp.max(masked, axis=axis, keepdims=True)
    e = jnp.exp(masked - m) * mask
    s = jnp.sum(e, axis=axis, keepdims=True)
    return e / jnp.maximum(s, 1e-10)


class TemporalAttentionLayer(nn.Module):
    """Transformer attention over a padded MFG
    (``layers.py:38-168`` ``TransfomerAttentionLayer``).

    Q from dst (+zero-time encoding); K/V from src-embed ⊕ edge-feat ⊕
    time-enc(dt); per-edge dot-product scores → LeakyReLU(0.2) →
    per-dst softmax → weighted V sum; out-proj of [agg ‖ dst] → dropout →
    ReLU → LayerNorm."""

    dim_node: int
    dim_edge: int
    dim_time: int
    dim_out: int
    num_head: int
    dropout: float = 0.0
    att_dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None   # compute dtype (params stay f32)
    # "xla" (materialized K/V + block-indicator heads, the measured
    # winner) | "xla_factorized" (K/V-free re-association — measured
    # loser, see _factorized_attention) | "pallas"
    attention_impl: str = "xla"
    # Edge-major (f-leading) neighbor layout: ``edge_feats`` arrives
    # [F, B, dim_edge] (gathered with f-major ids) and all neighbor-axis
    # intermediates run [F, B, *].  The f-major flat gather reshapes to
    # [F, B, W] as a pure BITCAST (tile grouping unchanged when B % 8 ==
    # 0), the K/V matmuls collapse to clean 2-D form, and softmax/
    # aggregate become leading-dim reduces — no sublane retile of the
    # [B·F, W] gather (2.8 ms) and no {2,1,0}→{0,2,1} relayout (2.3 ms)
    # at the TGAT headline.  Only the "xla" impl supports it.
    edge_major: bool = False

    @nn.compact
    def __call__(self, mfg: MFG, h_all: Optional[jax.Array],
                 edge_feats: Optional[jax.Array],
                 train: bool = False) -> jax.Array:
        B, F = mfg.num_dst, mfg.fanout
        use_node = self.dim_node > 0
        use_edge = self.dim_edge > 0
        use_time = self.dim_time > 0
        em = self.edge_major
        if em:
            assert self.attention_impl == "xla", \
                "edge_major requires attention_impl='xla'"
        mask = mfg.nbr_mask.T if em else mfg.nbr_mask  # [F, B] | [B, F]
        nbr_shape = (F, B) if em else (B, F)
        nbr_axis = 0 if em else 1

        if use_node:
            h_dst = h_all[:B]
            h_src = h_all[B:].reshape(B, F, -1)
            if em:
                h_src = jnp.transpose(h_src, (1, 0, 2))
        else:
            # dummy embeddings (layers.py:111-123)
            h_dst = (jnp.zeros((B, 0)) if use_time
                     else jnp.ones((B, self.dim_out)))
            h_src = jnp.zeros(nbr_shape + (0,))

        ef = edge_feats if use_edge else jnp.zeros(nbr_shape + (0,))

        cdt = self.dtype or jnp.float32
        if use_time:
            time_enc = TimeEncode(self.dim_time)
            dts = mfg.nbr_dts.T if em else mfg.nbr_dts
            tf = time_enc(dts)                         # [*, *, dt]
            ztf = time_enc(jnp.zeros((B,), jnp.float32))
        else:
            tf = jnp.zeros(nbr_shape + (0,), cdt)
            ztf = jnp.zeros((B, 0), cdt)
        if not (use_node or use_time):
            h_dst = h_dst.astype(cdt)  # identity-Q path

        if use_node or use_time:
            Q = MultiLinear(self.dim_out, name="w_q",
                            dtype=self.dtype)([h_dst, ztf])
        else:
            Q = h_dst  # identity (layers.py:76-79)

        H = self.num_head
        dh = self.dim_out // H
        use_pallas = (self.attention_impl == "pallas"
                      and not (train and self.att_dropout > 0))
        if self.attention_impl == "xla_factorized" \
                and H <= 4 and dh * H == self.dim_out:
            # Factorized attention (OPT-IN, measured loser on v5e): K
            # and V are never materialized.  score_h = Q_h·K_h
            # distributes over the K/V projection's input parts:
            # Q_h·(x_p @ Wk_p)_h = x_p·(Q_h @ Wk_p_hᵀ), so each part
            # contributes a lane-reduce against a tiny per-root vector;
            # aggregation uses the same identity in reverse.  On paper
            # this removes the [B, F, 2·dim_out] K/V intermediates and
            # their relayouts, but MEASURED MUCH WORSE at the TGAT
            # headline (51.9 -> 77.0 ms/step, TGN 8.2 -> 14.9): XLA
            # does not multi-output-fuse the per-head score/aggregate
            # passes, so each becomes its own ~3.5 ms fusion re-reading
            # the [B, F, d_p] parts with hostile layouts (profiled: 8
            # such fusions ≈ 28 ms).  Kept opt-in, numerically
            # validated, checkpoint-compatible (params in a GateParams
            # named "w_kv" with the MultiLinear's tree).
            agg = self._factorized_attention(Q, h_src, ef, tf, mask,
                                             train)
        else:
            # fused K/V projection (one kernel for K and V) computed as
            # a sum of per-part matmuls — the wide [*, h|e|t] concat
            # never hits HBM.
            # NB: keep the batched [B, F, *] operand form.  Flattening
            # the parts to [B*F, *] 2-D matmuls looks like it should
            # skip the {0,2,1} relayout copies visible in profiles, but
            # measured MUCH worse on v5e (TGAT 58->87 ms, TGN
            # 9.3->11.4, APAN 59->79): XLA's layout assignment for the
            # batched form is the better global choice.
            KV = MultiLinear(2 * self.dim_out, name="w_kv",
                             dtype=self.dtype)([h_src, ef, tf])
            K, V = KV[..., : self.dim_out], KV[..., self.dim_out:]

            if use_pallas:
                # fused Pallas kernel (no attention-dropout path)
                from gnnflow_tpu.ops.attention_pallas import \
                    neighborhood_attention
                agg = neighborhood_attention(
                    Q.reshape(B, H, dh), K.reshape(B, F, H, dh),
                    V.reshape(B, F, H, dh), mask).reshape(B, self.dim_out)
            else:
                # Reshape-free multi-head: the textbook
                # ``reshape(B, F, H, dh)`` head split materializes
                # pathologically tiled [B, F, H, dh] copies on TPU when
                # the batched operands carry the {0,2,1} attention
                # layout (profiled 4.8 ms/step of pure reshapes + 0.8
                # ms of broadcasts at the TGAT headline).  Per-head
                # score/expand are block-diagonal selections over the
                # feature axis, so compute them as matmuls against a
                # constant [D, H] 0/1 block-indicator — MXU work
                # instead of relayouts, and the per-lane selection back
                # (``att @ selᵀ``) is exact (each output lane reads
                # exactly one head's weight).
                D = self.dim_out
                sel = (jnp.arange(D)[:, None] // dh ==
                       jnp.arange(H)[None, :]).astype(cdt)     # [D, H]
                qb = Q[None, :, :] if em else Q[:, None, :]
                qk = (qb * K).astype(cdt)                      # [*, *, D]
                att = jax.lax.dot_general(
                    qk, sel, (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)        # [*, *, H]
                att = nn.leaky_relu(att, negative_slope=0.2)
                att = masked_softmax(att, mask[..., None],
                                     axis=nbr_axis)
                att = nn.Dropout(self.att_dropout,
                                 deterministic=not train)(att)
                att_exp = jax.lax.dot_general(
                    att.astype(cdt), sel, (((2,), (1,)), ((), ())))
                agg = jnp.sum(V * att_exp, axis=nbr_axis)      # [B, D]

        out_parts = [agg, h_dst] if use_node else [agg]
        rst = MultiLinear(self.dim_out, name="w_out",
                          dtype=self.dtype)(out_parts)
        rst = nn.relu(nn.Dropout(self.dropout,
                                 deterministic=not train)(rst))
        return nn.LayerNorm(epsilon=1e-5)(rst.astype(jnp.float32))

    def _factorized_attention(self, Q, h_src, ef, tf, mask, train):
        """Attention without materializing K or V.

        For each head ``h`` and K/V-input part ``x_p`` (src embed, edge
        feat, time enc), the score contribution is
        ``x_p · (Q_h @ Wk_p_hᵀ)`` — a lane reduce of the already-present
        ``[B, F, d_p]`` part against a per-root ``[B, d_p]`` vector —
        and the aggregation contribution is
        ``(Σ_f a_h · x_p) @ Wv_p_h`` — an attention-weighted reduce of
        the raw part followed by a ``[d_p, dh]`` matmul.  Bias terms:
        the K bias adds ``Q_h · bk_h`` to every score; the V bias adds
        ``(Σ_f a_h) · bv_h`` (1 for rows with any valid edge, 0
        otherwise).  Numerically the same sums as the materialized
        form, reordered.  Params live in a GateParams named "w_kv" with
        the same kernel/bias tree as the MultiLinear of the
        materialized path, so checkpoints are interchangeable."""
        B, F = mask.shape
        D, H = self.dim_out, self.num_head
        dh = D // H
        cdt = self.dtype or jnp.float32
        parts = [p.astype(cdt) for p in (h_src, ef, tf)
                 if p.shape[-1] > 0]
        fan_in = sum(p.shape[-1] for p in parts)
        kernel, bias = GateParams(fan_in, 2 * D, name="w_kv")()
        kernel, bias = kernel.astype(cdt), bias.astype(cdt)
        Wk, Wv = kernel[:, :D], kernel[:, D:]
        bk, bv = bias[:D], bias[D:]
        Qc = Q.astype(cdt)

        aggs = []
        for h in range(H):
            lo, hi = h * dh, (h + 1) * dh
            Qh = Qc[:, lo:hi]                               # [B, dh]
            s = Qh @ bk[lo:hi][:, None]                     # [B, 1]
            off = 0
            for p in parts:
                d = p.shape[-1]
                qt = Qh @ Wk[off:off + d, lo:hi].T          # [B, d]
                s = s + jnp.sum(p * qt[:, None, :], axis=-1)
                off += d
            s = nn.leaky_relu(s.astype(jnp.float32),
                              negative_slope=0.2)           # [B, F]
            a = masked_softmax(s, mask, axis=1)
            a = nn.Dropout(self.att_dropout,
                           deterministic=not train)(a).astype(cdt)
            agg_h = jnp.sum(a, axis=1)[:, None] * bv[lo:hi]  # [B, dh]
            off = 0
            for p in parts:
                d = p.shape[-1]
                xa = jnp.sum(p * a[:, :, None], axis=1)     # [B, d]
                agg_h = agg_h + xa @ Wv[off:off + d, lo:hi]
                off += d
            aggs.append(agg_h)
        return jnp.concatenate(aggs, axis=-1) if H > 1 else aggs[0]


class EdgePredictor(nn.Module):
    """Edge prediction head (``layers.py:171-197``): split embeddings into
    (src, pos_dst, neg_dst…) blocks; score = out_fc(relu(src_fc(s)+dst_fc(d))).

    ``neg_ratio`` generalizes the reference's ``tensor_split(3)`` to
    ``tensor_split(2 + ratio)`` (as its memory write-back does,
    ``memory.py:212-223``): ``h`` is ``[(2+r)·B, d]`` and the returned
    negative logits are ``[r·B, 1]`` (each negative scored against the
    tiled source block)."""

    dim_embed: int
    neg_ratio: int = 1

    @nn.compact
    def __call__(self, h: jax.Array):
        b = h.shape[0] // (2 + self.neg_ratio)
        src_h, pos_h, neg_h = h[:b], h[b:2 * b], h[2 * b:]
        src_fc = Linear(self.dim_embed, name="src_fc")
        dst_fc = Linear(self.dim_embed, name="dst_fc")
        out_fc = Linear(1, name="out_fc")
        s = src_fc(src_h)
        p = dst_fc(pos_h)
        n = dst_fc(neg_h)
        if self.neg_ratio > 1:
            s_neg = jnp.tile(s, (self.neg_ratio, 1))
        else:
            s_neg = s
        return out_fc(nn.relu(s + p)), out_fc(nn.relu(s_neg + n))


class MLP(nn.Module):
    """Node-classification head (``layers.py:200-214``)."""

    dim_hid: int
    num_class: int

    @nn.compact
    def __call__(self, x):
        x = Linear(self.dim_hid, name="fc1")(x)
        x = nn.relu(x)
        return Linear(self.num_class, name="fc2")(x)
