from gnnflow_tpu.ops.sampling import sample_hops, sample_layer
from gnnflow_tpu.ops.segment import unique_keep_last_mask

__all__ = ["sample_hops", "sample_layer", "unique_keep_last_mask"]
