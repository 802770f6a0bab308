from gnnflow_tpu.models.dgnn import DGNN
from gnnflow_tpu.models.factory import build_model
from gnnflow_tpu.models.modules import (EdgePredictor, MLP,
                                        TemporalAttentionLayer, TimeEncode)
from gnnflow_tpu.models.static import GAT, SAGE
from gnnflow_tpu.models import memory

__all__ = ["DGNN", "SAGE", "GAT", "build_model", "EdgePredictor", "MLP",
           "TemporalAttentionLayer", "TimeEncode", "memory"]
