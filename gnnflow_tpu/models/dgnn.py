"""DGNN — the unified dynamic GNN (TGN / TGAT / DySAT / APAN / GAT).

Parity with ``/root/reference/gnnflow/models/dgnn.py:17-143``: a
``num_layers × num_snapshots`` grid of temporal attention layers keyed
``l{l}h{h}``, optional TGN memory + GRU (or APAN transformer) updater,
multi-snapshot combination via an RNN (DySAT), and the EdgePredictor head.

Functional differences from the reference (TPU design):
- MFGs are padded (see :mod:`gnnflow_tpu.common`); features are passed in
  as explicit arrays instead of DGL ``srcdata``/``edata`` mutation.
- Memory state is external (:class:`~gnnflow_tpu.models.memory.MemoryState`)
  and threaded through the train step; ``__call__`` returns the
  ``last_updated`` bundle for deferred write-back exactly like the
  reference's ``model.last_updated`` (``dgnn.py:96``, ``memory_updater``
  return)."""
from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from gnnflow_tpu.common import MFG
from gnnflow_tpu.models.memory import (GRUMemoryUpdater,
                                       TransformerMemoryUpdater)
from gnnflow_tpu.models.modules import (EdgePredictor, Linear,
                                        TemporalAttentionLayer)


class SimpleRNNCell(nn.Module):
    """torch.nn.RNN(tanh) cell — the DySAT snapshot combiner
    (``dgnn.py:92-94``)."""

    features: int

    @nn.compact
    def __call__(self, h, x):
        wi = Linear(self.features, name="ih")
        wh = Linear(self.features, name="hh")
        h = jnp.tanh(wi(x) + wh(h))
        return h, h


class DGNN(nn.Module):
    """Dynamic graph neural network over padded MFGs."""

    dim_node: int
    dim_edge: int
    dim_time: int
    dim_embed: int
    num_layers: int
    num_snapshots: int
    att_head: int
    dropout: float
    att_dropout: float
    use_memory: bool
    dim_memory: Optional[int] = None
    memory_updater: str = "gru"   # "gru" | "transformer" (APAN)
    mailbox_slots: int = 1        # >1: APAN-style circular mailbox
    compute_dtype: Optional[str] = None  # e.g. "bfloat16" mixed precision
    attention_impl: str = "xla"          # "xla" | "pallas"
    # f-leading neighbor layout for the attention stack: edge features
    # arrive [F, B, dim_edge] (see TemporalAttentionLayer.edge_major and
    # Trainer/fetch_features, which read this flag).  Only meaningful
    # with attention_impl == "xla".
    edge_major: bool = False
    gru_impl: str = "xla"                # "xla" | "pallas" (fused memory GRU)
    neg_sample_ratio: int = 1            # negatives per positive edge
    # Rematerialize the attention layers in backward (jax.checkpoint):
    # nothing between the layer inputs and its output is saved, so the
    # [B, F, *] K/V intermediates and time encodings are recomputed and
    # can fuse into the weight-grad reductions instead of round-tripping
    # HBM.  Opt-in; measured on v5e round 5 (see BASELINE.md).
    remat_attention: bool = False

    def setup(self):
        cdt = jnp.dtype(self.compute_dtype) if self.compute_dtype \
            else None
        if self.use_memory:
            assert self.num_snapshots == 1, \
                "memory is not supported for multiple snapshots"
            assert self.dim_memory is not None
            if self.memory_updater == "gru":
                self.updater = GRUMemoryUpdater(
                    self.dim_node, self.dim_edge, self.dim_time,
                    self.dim_embed, self.dim_memory, dtype=cdt,
                    impl=self.gru_impl)
            elif self.memory_updater == "transformer":
                self.updater = TransformerMemoryUpdater(
                    self.dim_node, self.dim_edge, self.dim_time,
                    self.dim_embed, self.dim_memory,
                    att_head=self.att_head, dropout=self.dropout,
                    dtype=cdt)
            else:
                raise ValueError(self.memory_updater)
        dim_node_input = self.dim_memory if self.use_memory \
            else self.dim_node

        layers = {}
        att_cls = TemporalAttentionLayer
        if self.remat_attention:
            # static_argnums counts ``self`` as 0; ``train`` is the 4th
            # user arg and must be passed POSITIONALLY at the call site.
            att_cls = nn.remat(TemporalAttentionLayer, static_argnums=(4,))
        for l in range(self.num_layers):
            for h in range(self.num_snapshots):
                layers[f"l{l}h{h}"] = att_cls(
                    dim_node=dim_node_input if l == 0 else self.dim_embed,
                    dim_edge=self.dim_edge,
                    dim_time=self.dim_time,
                    dim_out=self.dim_embed,
                    num_head=self.att_head,
                    dropout=self.dropout,
                    att_dropout=self.att_dropout,
                    dtype=cdt,
                    attention_impl=self.attention_impl,
                    edge_major=self.edge_major and
                    self.attention_impl == "xla",
                    name=f"l{l}h{h}")
        self.layers = layers

        if self.num_snapshots > 1:
            self.combiner = SimpleRNNCell(self.dim_embed, name="combiner")
        self.edge_predictor = EdgePredictor(self.dim_embed,
                                            neg_ratio=self.neg_sample_ratio,
                                            name="edge_predictor")

    def __call__(self, mfgs: List[List[MFG]],
                 node_feats: List[Optional[jax.Array]],
                 edge_feats: List[List[Optional[jax.Array]]],
                 mem_input: Optional[Dict[str, jax.Array]] = None,
                 train: bool = False,
                 return_embed: bool = False,
                 expansions=None):
        """Forward pass.

        Args:
            mfgs: layer-major list (``mfgs[0]`` innermost), one MFG per
                snapshot.
            node_feats: per-snapshot raw node features for the innermost
                MFG's ``all_nodes`` (None when ``dim_node == 0``).
            edge_feats: ``edge_feats[l][h]`` = [B, F, dim_edge] for
                ``mfgs[l][h]`` (None when ``dim_edge == 0``).
            mem_input: pulled memory rows for the innermost MFG (TGN only).
            expansions: model-compaction specs from
                :func:`~gnnflow_tpu.ops.sampling.sample_hops_model_compact`
                — ``expansions[l]`` expands layer ``l``'s root embeddings
                into layer ``l+1``'s ``h_all`` layout (None entries skip).

        Returns:
            ``(pos_logits, neg_logits, last_updated)`` or
            ``(embed, last_updated)`` if ``return_embed``.
        """
        last_updated = None
        h_in: List[Optional[jax.Array]] = list(node_feats)
        if self.use_memory:
            h0, last_updated = self.updater(
                mfgs[0][0], mem_input, node_feats[0])
            h_in = [h0]

        out = []
        for l in range(self.num_layers):
            next_h: List[Optional[jax.Array]] = []
            for h in range(self.num_snapshots):
                rst = self.layers[f"l{l}h{h}"](
                    mfgs[l][h], h_in[h], edge_feats[l][h], train)
                if l != self.num_layers - 1:
                    if expansions is not None and \
                            expansions[l] is not None:
                        spec = expansions[l]
                        if spec[0] == "rows":
                            # (nid, ts)-dedup compaction: expand unique-
                            # instance embeddings to per-instance rows
                            # (exact scatter-free transpose); stacked
                            # specs = per-snapshot dedup
                            from gnnflow_tpu.ops.segment_pallas import \
                                expand_rows_spec
                            rst = expand_rows_spec(rst, spec, h)
                        else:
                            # windowed-snapshot block compaction
                            from gnnflow_tpu.ops.segment_pallas import \
                                expand_blocks
                            _, rank, cap, fo = spec
                            rst = expand_blocks(rst, rank[h], cap, fo)
                    next_h.append(rst)
                else:
                    out.append(rst)
            h_in = next_h

        if self.num_snapshots == 1:
            embed = out[0]
        else:
            carry = jnp.zeros_like(out[0])
            for snap_embed in out:   # RNN over the snapshot axis
                carry, _ = self.combiner(carry, snap_embed)
            embed = carry

        if return_embed:
            return embed, last_updated
        pos, neg = self.edge_predictor(embed)
        return pos, neg, last_updated
