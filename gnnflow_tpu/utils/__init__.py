from gnnflow_tpu.utils.metrics import average_precision_score, roc_auc_score
from gnnflow_tpu.utils.early_stop import EarlyStopMonitor

__all__ = [
    "average_precision_score",
    "roc_auc_score",
    "EarlyStopMonitor",
]
