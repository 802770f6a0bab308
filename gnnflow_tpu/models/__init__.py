from gnnflow_tpu.models.dgnn import DGNN
from gnnflow_tpu.models.modules import (EdgePredictor, MLP,
                                        TemporalAttentionLayer, TimeEncode)
from gnnflow_tpu.models import memory

__all__ = ["DGNN", "EdgePredictor", "MLP", "TemporalAttentionLayer",
           "TimeEncode", "memory"]
