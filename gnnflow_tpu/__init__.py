"""gnnflow_tpu — a TPU-native dynamic graph neural network framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
jasperzhong/GNNFlow (temporal GNN training on dynamic graphs): dynamic
graph storage with incremental insertion, temporal neighbor sampling,
TGN/TGAT/DySAT/APAN and static GraphSAGE/GAT models, feature caches, and
multi-device / multi-host execution via ``jax.sharding``.
"""

from gnnflow_tpu.common import MFG, INVALID_NID, STATIC_TS
from gnnflow_tpu.config import get_default_config
from gnnflow_tpu.dynamic_graph import (DeviceGraph, DynamicGraph,
                                       build_dynamic_graph)
from gnnflow_tpu.temporal_sampler import TemporalSampler

__version__ = "0.1.0"

__all__ = [
    "MFG", "INVALID_NID", "STATIC_TS",
    "get_default_config",
    "DeviceGraph", "DynamicGraph", "build_dynamic_graph",
    "TemporalSampler",
]
