"""Model factory: build a model + trainer kwargs from a config-registry
entry (the counterpart of the model-construction switch in
``scripts/offline_edge_prediction.py:258-270``)."""
from __future__ import annotations

from typing import Optional

from gnnflow_tpu.models.dgnn import DGNN
from gnnflow_tpu.models.static import GAT, SAGE


def build_model(name: str, model_config: dict, dim_node: int,
                dim_edge: int):
    """Return ``(model, sampler_kwargs)`` for a registry model name."""
    name = name.lower()
    cfg = dict(model_config)
    sampler_kwargs = {
        "fanouts": cfg["fanouts"],
        "sample_strategy": cfg.get("sample_strategy", "recent"),
        "num_snapshots": cfg.get("num_snapshots", 1),
        "snapshot_time_window": cfg.get("snapshot_time_window", 0),
        "prop_time": cfg.get("prop_time", False),
        "is_static": cfg.get("is_static", False),
    }
    if name == "graphsage":
        model = SAGE(dim_node=dim_node, dim_embed=cfg["dim_embed"],
                     num_layers=cfg["num_layers"],
                     aggregator=cfg.get("aggregator", "mean"),
                     compute_dtype=cfg.get("compute_dtype"))
    elif name == "gat" and cfg.get("is_static", False):
        model = GAT(dim_node=dim_node, dim_embed=cfg["dim_embed"],
                    num_layers=cfg["num_layers"],
                    attn_head=tuple([cfg.get("att_head", 8)]
                                    * (cfg["num_layers"] - 1) + [1]),
                    feat_drop=cfg.get("dropout", 0.0),
                    attn_drop=cfg.get("att_dropout", 0.0),
                    compute_dtype=cfg.get("compute_dtype"))
    else:  # tgn / tgat / dysat / apan — the unified DGNN
        model = DGNN(
            dim_node=dim_node, dim_edge=dim_edge,
            dim_time=cfg.get("dim_time", 0),
            dim_embed=cfg["dim_embed"],
            num_layers=cfg["num_layers"],
            num_snapshots=cfg.get("num_snapshots", 1),
            att_head=cfg.get("att_head", 2),
            dropout=cfg.get("dropout", 0.0),
            att_dropout=cfg.get("att_dropout", 0.0),
            use_memory=cfg.get("use_memory", False),
            dim_memory=cfg.get("dim_memory"),
            memory_updater=cfg.get("memory_updater", "gru"),
            mailbox_slots=cfg.get("mailbox_slots", 1),
            compute_dtype=cfg.get("compute_dtype"),
            attention_impl=cfg.get("attention_impl", "xla"),
            edge_major=cfg.get("edge_major",
                               cfg.get("attention_impl", "xla") == "xla"),
            neg_sample_ratio=cfg.get("neg_sample_ratio", 1),
            remat_attention=cfg.get("remat_attention", False))
        sampler_kwargs["neg_sample_ratio"] = cfg.get("neg_sample_ratio", 1)
    return model, sampler_kwargs
