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
    """GraphSAGE convolution (``dglnn.SAGEConv`` semantics)."""

    dim_out: int
    aggregator: str = "mean"  # mean | gcn | pool

    @nn.compact
    def __call__(self, mfg: MFG, h_all: jax.Array) -> jax.Array:
        B, F = mfg.num_dst, mfg.fanout
        h_dst = h_all[:B]
        h_src = h_all[B:].reshape(B, F, -1)
        m = mfg.nbr_mask[..., None].astype(h_all.dtype)
        deg = jnp.sum(m, axis=1)  # [B, 1]

        if self.aggregator == "mean":
            h_neigh = jnp.sum(h_src * m, axis=1) / jnp.maximum(deg, 1.0)
            rst = Linear(self.dim_out, name="fc_self")(h_dst) \
                + Linear(self.dim_out, use_bias=False,
                         name="fc_neigh")(h_neigh)
        elif self.aggregator == "gcn":
            h_neigh = (jnp.sum(h_src * m, axis=1) + h_dst) / (deg + 1.0)
            rst = Linear(self.dim_out, name="fc_neigh")(h_neigh)
        elif self.aggregator == "pool":
            pooled = jnp.where(
                mfg.nbr_mask[..., None],
                nn.relu(Linear(h_src.shape[-1], name="fc_pool")(h_src)),
                -jnp.inf)
            h_neigh = jnp.max(pooled, axis=1)
            h_neigh = jnp.where(deg > 0, h_neigh, 0.0)
            rst = Linear(self.dim_out, name="fc_self")(h_dst) \
                + Linear(self.dim_out, use_bias=False,
                         name="fc_neigh")(h_neigh)
        else:
            raise ValueError(
                f"aggregator {self.aggregator} is not in "
                f"['mean', 'gcn', 'pool']")
        return rst


class GATConv(nn.Module):
    """Graph attention convolution (``dglnn.GATConv`` semantics):
    ``e_ij = LeakyReLU(a_l·Wh_i + a_r·Wh_j)``, softmax over valid
    neighbors, per-head weighted sum.  Zero-in-degree destinations
    aggregate to zero (``allow_zero_in_degree=True``)."""

    dim_out: int
    num_heads: int
    feat_drop: float = 0.0
    attn_drop: float = 0.0

    @nn.compact
    def __call__(self, mfg: MFG, h_all: jax.Array,
                 train: bool = False) -> jax.Array:
        B, F = mfg.num_dst, mfg.fanout
        h_all = nn.Dropout(self.feat_drop, deterministic=not train)(h_all)
        z = Linear(self.dim_out * self.num_heads, use_bias=False,
                   name="fc")(h_all)
        z = z.reshape(-1, self.num_heads, self.dim_out)
        z_dst = z[:B]                                  # [B, H, D]
        z_src = z[B:].reshape(B, F, self.num_heads, self.dim_out)

        attn_l = self.param("attn_l", nn.initializers.xavier_normal(),
                            (self.num_heads, self.dim_out))
        attn_r = self.param("attn_r", nn.initializers.xavier_normal(),
                            (self.num_heads, self.dim_out))
        el = jnp.sum(z_dst * attn_l, axis=-1)          # [B, H]
        er = jnp.sum(z_src * attn_r, axis=-1)          # [B, F, H]
        e = nn.leaky_relu(el[:, None, :] + er, negative_slope=0.2)

        mask = mfg.nbr_mask[..., None]
        neg = jnp.finfo(e.dtype).min
        a = jax.nn.softmax(jnp.where(mask, e, neg), axis=1)
        a = jnp.where(mask, a, 0.0)
        a = nn.Dropout(self.attn_drop, deterministic=not train)(a)
        out = jnp.sum(z_src * a[..., None], axis=1)    # [B, H, D]
        return out


class ProductMLPPredictor(nn.Module):
    """The SAGE/GAT link predictor: 3-layer MLP on ``src*dst``
    (``graphsage.py:35-40``)."""

    dim: int

    @nn.compact
    def __call__(self, x):
        x = nn.relu(Linear(self.dim, name="fc0")(x))
        x = nn.relu(Linear(self.dim, name="fc1")(x))
        return Linear(1, name="fc2")(x)


class SAGE(nn.Module):
    """GraphSAGE link-prediction model (``graphsage.py:11-70``)."""

    dim_node: int
    dim_embed: int
    num_layers: int = 2
    aggregator: str = "mean"
    use_memory: bool = False  # Trainer-compat
    dim_edge: int = 0

    @nn.compact
    def __call__(self, mfgs: List[List[MFG]],
                 node_feats: List[Optional[jax.Array]],
                 edge_feats=None, mem_input=None, train: bool = False,
                 return_embed: bool = False, expansions=None):
        h = node_feats[0]
        for l in range(self.num_layers):
            h = SAGEConv(self.dim_embed, self.aggregator,
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
            return h, None
        b = h.shape[0] // 3
        src_h, pos_h, neg_h = h[:b], h[b:2 * b], h[2 * b:]
        pred = ProductMLPPredictor(self.dim_embed, name="predictor")
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

    @nn.compact
    def __call__(self, mfgs: List[List[MFG]],
                 node_feats: List[Optional[jax.Array]],
                 edge_feats=None, mem_input=None, train: bool = False,
                 return_embed: bool = False, expansions=None):
        if self.num_layers != len(self.attn_head):
            raise ValueError("length of attn_head must equal num_layers")
        h = node_feats[0]
        for l in range(self.num_layers):
            out = GATConv(self.dim_embed, self.attn_head[l],
                          self.feat_drop, self.attn_drop,
                          name=f"l{l}h0")(mfgs[l][0], h, train=train)
            if l != self.num_layers - 1:
                h = nn.elu(out.reshape(out.shape[0], -1))  # flatten heads
                if expansions is not None and \
                        expansions[l] is not None:
                    from gnnflow_tpu.ops.segment_pallas import \
                        expand_rows_spec
                    h = expand_rows_spec(h, expansions[l])
            else:
                h = jnp.mean(out, axis=1)                  # mean heads
        if return_embed:
            return h, None
        b = h.shape[0] // 3
        src_h, pos_h, neg_h = h[:b], h[b:2 * b], h[2 * b:]
        pred = ProductMLPPredictor(self.dim_embed, name="predictor")
        return pred(src_h * pos_h), pred(src_h * neg_h), None
