"""Default model/dataset configuration registry.

Behavioral parity with the reference registry
(``/root/reference/gnnflow/config.py:7-179``): same model families
(tgn/tgat/dysat/graphsage/gat), same datasets (wiki/reddit/mooc/lastfm/
gdelt/mag) and the same hyper-parameter values.  Dataset configs are
re-expressed for the TPU store: RMM pool sizes / block-size knobs become
edge-pool capacity and storage placement (HBM vs. host).
"""
from __future__ import annotations

import sys

MiB = 1 << 20
GiB = 1 << 30

MODELS = ["tgn", "tgat", "dysat", "graphsage", "gat", "apan"]
DATASETS = ["wiki", "reddit", "mooc", "lastfm", "gdelt", "mag", "synthetic"]


def get_default_config(model: str, dataset: str):
    """Return ``(model_config, data_config)`` for a model/dataset pair.

    Mirrors ``gnnflow/config.py:7-26``.
    """
    model, dataset = model.lower(), dataset.lower()
    assert model in MODELS and dataset in DATASETS, \
        "Invalid model or dataset."
    mod = sys.modules[__name__]
    return (dict(getattr(mod, f"_{model}_default_config")),
            dict(getattr(mod, f"_{dataset}_default_config")))


# ---------------------------------------------------------------------------
# Model configs — values identical to gnnflow/config.py:28-107.
# ---------------------------------------------------------------------------

_tgn_default_config = {
    "dropout": 0.2,
    "att_head": 2,
    "att_dropout": 0.2,
    "num_layers": 1,
    "fanouts": [10],
    "sample_strategy": "recent",
    "num_snapshots": 1,
    "snapshot_time_window": 0,
    "prop_time": False,
    "use_memory": True,
    "dim_time": 100,
    "dim_embed": 100,
    "dim_memory": 100,
    "batch_size": 4000,
}

_tgat_default_config = {
    "dropout": 0.1,
    "att_head": 2,
    "att_dropout": 0.1,
    "num_layers": 2,
    "fanouts": [10, 10],
    "sample_strategy": "uniform",
    "num_snapshots": 1,
    "snapshot_time_window": 0,
    "prop_time": False,
    "use_memory": False,
    "dim_time": 100,
    "dim_embed": 100,
    "batch_size": 600,
}

_dysat_default_config = {
    "dropout": 0.1,
    "att_head": 2,
    "att_dropout": 0.1,
    "num_layers": 2,
    "fanouts": [10, 10],
    "sample_strategy": "uniform",
    "num_snapshots": 3,
    "snapshot_time_window": 10000,
    "prop_time": True,
    "use_memory": False,
    "dim_time": 0,
    "dim_embed": 100,
    "batch_size": 600,
}

_graphsage_default_config = {
    "dim_embed": 100,
    "num_layers": 2,
    "aggregator": "mean",
    "fanouts": [15, 10],
    "sample_strategy": "uniform",
    "num_snapshots": 1,
    "snapshot_time_window": 0,
    "prop_time": False,
    "use_memory": False,
    "is_static": True,
    "batch_size": 1200,
}

_gat_default_config = {
    "dropout": 0.1,
    "att_head": 2,
    "att_dropout": 0.1,
    "num_layers": 2,
    "fanouts": [10, 10],
    "sample_strategy": "uniform",
    "num_snapshots": 1,
    "snapshot_time_window": 0,
    "prop_time": False,
    "use_memory": False,
    "dim_time": 0,
    "dim_embed": 100,
    "is_static": True,
    "batch_size": 600,
}

# APAN-style asynchronous mailbox variant (mail applied directly, no GRU
# recurrence over time encodings) built on the same memory subsystem; kept
# at TGN-equivalent dimensions.
_apan_default_config = {
    "dropout": 0.1,
    "att_head": 2,
    "att_dropout": 0.1,
    "num_layers": 1,
    "fanouts": [10],
    "sample_strategy": "recent",
    "num_snapshots": 1,
    "snapshot_time_window": 0,
    "prop_time": False,
    "use_memory": True,
    "memory_updater": "transformer",
    "mailbox_slots": 10,
    "dim_time": 100,
    "dim_embed": 100,
    "dim_memory": 100,
    "batch_size": 4000,
}

# ---------------------------------------------------------------------------
# Dataset configs.  The reference's RMM pool knobs (gnnflow/config.py:109-179)
# map to TPU storage as follows:
#   initial/maximum_pool_size (bytes of TemporalBlock pool)
#       -> initial/maximum edge-pool capacity (#edges; each edge costs
#          4(dst)+4(ts)+4(eid) = 12 B on device).
#   mem_resource_type: "cuda" -> "hbm" (device-resident store);
#          "unified"/"pinned" -> "host" (host-resident store, sampled on the
#          CPU backend, MFGs transferred to TPU); "shared" -> "host".
#   minimum_block_size -> minimum per-vertex slack granularity.
# ---------------------------------------------------------------------------


def _data_cfg(init_edges, max_edges, storage, min_slack, undirected,
              node_feature, edge_feature):
    return {
        "initial_pool_size": init_edges,
        "maximum_pool_size": max_edges,
        "mem_resource_type": storage,
        "minimum_block_size": min_slack,
        "insertion_policy": "insert",
        "undirected": undirected,
        "node_feature": node_feature,
        "edge_feature": edge_feature,
    }


_wiki_default_config = _data_cfg(
    1 * MiB, 4 * MiB, "hbm", 18, True, False, True)
_reddit_default_config = _data_cfg(
    2 * MiB, 8 * MiB, "hbm", 62, False, True, True)
_mooc_default_config = _data_cfg(
    1 * MiB, 4 * MiB, "hbm", 59, False, False, True)
_lastfm_default_config = _data_cfg(
    2 * MiB, 8 * MiB, "hbm", 650, False, False, True)
_gdelt_default_config = _data_cfg(
    256 * MiB, 1 * GiB, "host", 123, False, True, True)
_mag_default_config = _data_cfg(
    512 * MiB, 4 * GiB, "host", 11, False, True, False)
# undirected like WIKI (config.py:116): the synthetic stream is a
# bipartite interaction log, and without reverse edges dst-side roots
# have no history — memory-less models (TGAT/DySAT) then produce one
# constant embedding for every dst and AP pins at exactly 0.5.
_synthetic_default_config = _data_cfg(
    1 * MiB, 16 * MiB, "hbm", 16, True, True, True)
