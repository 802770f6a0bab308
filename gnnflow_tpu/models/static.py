"""Static GNN baselines: GraphSAGE and GAT over padded MFGs.

Parity with ``/root/reference/gnnflow/models/graphsage.py`` (``SAGE`` over
``dglnn.SAGEConv``) and ``gat.py`` (``GAT`` over ``dglnn.GATConv``):
same layer math, same 3-layer MLP predictor on the elementwise product of
src/dst embeddings, sampled with ``is_static=True`` (timestamps = +inf).
Aggregation over the padded neighbor axis uses validity masks in place of
DGL's segment reductions.
"""
from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from gnnflow_tpu.common import MFG
from gnnflow_tpu.models.modules import Linear


class SAGEConv(nn.Module):
    """GraphSAGE convolution (``dglnn.SAGEConv`` semantics).

    ``dtype`` selects the computation dtype (params stay float32); the
    feature-table gather stays f32 (a bf16 table is a measured loser —
    BASELINE.md) and the cast fuses into the first matmul read."""

    dim_out: int
    aggregator: str = "mean"  # mean | gcn | pool
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, mfg: MFG, h_all: jax.Array) -> jax.Array:
        B, F = mfg.num_dst, mfg.fanout
        cdt = self.dtype or h_all.dtype
        h_dst = h_all[:B]
        h_src = h_all[B:].reshape(B, F, -1).astype(cdt)
        m = mfg.nbr_mask[..., None].astype(cdt)
        deg = jnp.sum(m, axis=1)  # [B, 1]

        if self.aggregator == "mean":
            h_neigh = jnp.sum(h_src * m, axis=1) / jnp.maximum(deg, 1.0)
            rst = Linear(self.dim_out, name="fc_self",
                         dtype=self.dtype)(h_dst) \
                + Linear(self.dim_out, use_bias=False, name="fc_neigh",
                         dtype=self.dtype)(h_neigh)
        elif self.aggregator == "gcn":
            h_neigh = (jnp.sum(h_src * m, axis=1) + h_dst.astype(cdt)) \
                / (deg + 1.0)
            rst = Linear(self.dim_out, name="fc_neigh",
                         dtype=self.dtype)(h_neigh)
        elif self.aggregator == "pool":
            pooled = jnp.where(
                mfg.nbr_mask[..., None],
                nn.relu(Linear(h_src.shape[-1], name="fc_pool",
                               dtype=self.dtype)(h_src)),
                -jnp.inf)
            h_neigh = jnp.max(pooled, axis=1)
            h_neigh = jnp.where(deg > 0, h_neigh, 0.0)
            rst = Linear(self.dim_out, name="fc_self",
                         dtype=self.dtype)(h_dst) \
                + Linear(self.dim_out, use_bias=False, name="fc_neigh",
                         dtype=self.dtype)(h_neigh)
        else:
            raise ValueError(
                f"aggregator {self.aggregator} is not in "
                f"['mean', 'gcn', 'pool']")
        return rst


class GATConv(nn.Module):
    """Graph attention convolution (``dglnn.GATConv`` semantics):
    ``e_ij = LeakyReLU(a_l·Wh_i + a_r·Wh_j)``, softmax over valid
    neighbors, per-head weighted sum.  Zero-in-degree destinations
    aggregate to zero (``allow_zero_in_degree=True``).

    Factorized multi-head (same re-association as
    :class:`~gnnflow_tpu.models.modules.TemporalAttentionLayer`'s
    default path): the projected neighbors ``z_src = h_src @ W`` of
    shape ``[B, F, H·D]`` are NEVER materialized.  Per head ``h``:
    ``a_r·z_src_h = h_src · (W_h @ a_r_h)`` (a lane reduce of the raw
    features against one projected vector), and the output
    ``Σ_f a · z_src_h = (Σ_f a · h_src) @ W_h`` (attention-weight the
    raw features, then one small matmul).  Only destination rows go
    through the projection.  Returns heads FLAT ``[B, H·D]`` (row-major
    (head, dim) lane order, identical to
    ``reshape(B, H, D) → reshape(B, -1)``)."""

    dim_out: int
    num_heads: int
    feat_drop: float = 0.0
    attn_drop: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, mfg: MFG, h_all: jax.Array,
                 train: bool = False) -> jax.Array:
        from gnnflow_tpu.models.modules import KernelParams
        B, F = mfg.num_dst, mfg.fanout
        H, D = self.num_heads, self.dim_out
        din = h_all.shape[-1]
        cdt = self.dtype or h_all.dtype
        h_all = nn.Dropout(self.feat_drop, deterministic=not train)(h_all)
        # same variable tree as Linear(H*D, use_bias=False, name="fc")
        W = KernelParams(din, D * H, name="fc")().astype(cdt)
        h_dst = h_all[:B].astype(cdt)
        h_src = h_all[B:].reshape(B, F, din).astype(cdt)
        z_dst = h_dst @ W                              # [B, H·D]

        attn_l = self.param("attn_l", nn.initializers.xavier_normal(),
                            (H, D))
        attn_r = self.param("attn_r", nn.initializers.xavier_normal(),
                            (H, D))
        mask = mfg.nbr_mask
        neg = jnp.finfo(jnp.float32).min
        outs = []
        for h in range(H):
            lo, hi = h * D, (h + 1) * D
            el = jnp.sum(z_dst[:, lo:hi] * attn_l[h].astype(cdt),
                         axis=-1)                      # [B]
            w_r = W[:, lo:hi] @ attn_r[h].astype(cdt)  # [din]
            er = jnp.sum(h_src * w_r[None, None, :], axis=-1)  # [B, F]
            e = nn.leaky_relu((el[:, None] + er).astype(jnp.float32),
                              negative_slope=0.2)
            a = jax.nn.softmax(jnp.where(mask, e, neg), axis=1)
            a = jnp.where(mask, a, 0.0)
            a = nn.Dropout(self.attn_drop,
                           deterministic=not train)(a).astype(cdt)
            xa = jnp.sum(h_src * a[..., None], axis=1)  # [B, din]
            outs.append(xa @ W[:, lo:hi])               # [B, D]
        return jnp.concatenate(outs, axis=-1) if H > 1 else outs[0]


class ProductMLPPredictor(nn.Module):
    """The SAGE/GAT link predictor: 3-layer MLP on ``src*dst``
    (``graphsage.py:35-40``).  Hidden layers run in ``dtype``; the final
    logit layer computes in float32."""

    dim: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        x = nn.relu(Linear(self.dim, name="fc0", dtype=self.dtype)(x))
        x = nn.relu(Linear(self.dim, name="fc1", dtype=self.dtype)(x))
        return Linear(1, name="fc2")(x.astype(jnp.float32))


class SAGE(nn.Module):
    """GraphSAGE link-prediction model (``graphsage.py:11-70``)."""

    dim_node: int
    dim_embed: int
    num_layers: int = 2
    aggregator: str = "mean"
    use_memory: bool = False  # Trainer-compat
    dim_edge: int = 0
    compute_dtype: Optional[str] = None  # e.g. "bfloat16" mixed precision

    @nn.compact
    def __call__(self, mfgs: List[List[MFG]],
                 node_feats: List[Optional[jax.Array]],
                 edge_feats=None, mem_input=None, train: bool = False,
                 return_embed: bool = False, expansions=None):
        cdt = jnp.dtype(self.compute_dtype) if self.compute_dtype \
            else None
        h = node_feats[0]
        for l in range(self.num_layers):
            h = SAGEConv(self.dim_embed, self.aggregator, dtype=cdt,
                         name=f"l{l}h0")(mfgs[l][0], h)
            if l != self.num_layers - 1:
                h = nn.relu(h)
                if expansions is not None and \
                        expansions[l] is not None:
                    # nid-dedup compaction (static ts are all +inf, so
                    # unique (nid, ts) = unique nid): expand the compact
                    # layer output to the parent's per-instance rows
                    from gnnflow_tpu.ops.segment_pallas import \
                        expand_rows_spec
                    h = expand_rows_spec(h, expansions[l])
        if return_embed:
            return h.astype(jnp.float32), None
        b = h.shape[0] // 3
        src_h, pos_h, neg_h = h[:b], h[b:2 * b], h[2 * b:]
        pred = ProductMLPPredictor(self.dim_embed, dtype=cdt,
                                   name="predictor")
        return pred(src_h * pos_h), pred(src_h * neg_h), None


class GAT(nn.Module):
    """GAT link-prediction model (``gat.py:9-78``)."""

    dim_node: int
    dim_embed: int
    num_layers: int = 2
    attn_head: Sequence[int] = (8, 1)
    feat_drop: float = 0.0
    attn_drop: float = 0.0
    use_memory: bool = False  # Trainer-compat
    dim_edge: int = 0
    compute_dtype: Optional[str] = None  # e.g. "bfloat16" mixed precision

    @nn.compact
    def __call__(self, mfgs: List[List[MFG]],
                 node_feats: List[Optional[jax.Array]],
                 edge_feats=None, mem_input=None, train: bool = False,
                 return_embed: bool = False, expansions=None):
        if self.num_layers != len(self.attn_head):
            raise ValueError("length of attn_head must equal num_layers")
        cdt = jnp.dtype(self.compute_dtype) if self.compute_dtype \
            else None
        h = node_feats[0]
        for l in range(self.num_layers):
            H = self.attn_head[l]
            # GATConv returns heads flat [B, H·D] ((head, dim) lane order)
            out = GATConv(self.dim_embed, H,
                          self.feat_drop, self.attn_drop, dtype=cdt,
                          name=f"l{l}h0")(mfgs[l][0], h, train=train)
            if l != self.num_layers - 1:
                h = nn.elu(out)                            # flatten heads
                if expansions is not None and \
                        expansions[l] is not None:
                    from gnnflow_tpu.ops.segment_pallas import \
                        expand_rows_spec
                    h = expand_rows_spec(h, expansions[l])
            elif H == 1:
                h = out                                    # mean of 1 head
            else:
                # mean over heads without a [B, H, D] reshape: matmul
                # against the constant [H·D, D] averaging indicator.
                D = self.dim_embed
                mean_m = ((jnp.arange(H * D)[:, None] % D ==
                           jnp.arange(D)[None, :]) / H).astype(out.dtype)
                h = out @ mean_m                           # mean heads
        if return_embed:
            return h.astype(jnp.float32), None
        b = h.shape[0] // 3
        src_h, pos_h, neg_h = h[:b], h[b:2 * b], h[2 * b:]
        pred = ProductMLPPredictor(self.dim_embed, dtype=cdt,
                                   name="predictor")
        return pred(src_h * pos_h), pred(src_h * neg_h), None
