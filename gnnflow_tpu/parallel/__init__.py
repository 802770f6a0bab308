from gnnflow_tpu.parallel.mesh import make_mesh
from gnnflow_tpu.parallel.dp import shard_trainer
from gnnflow_tpu.parallel.partition import get_partitioner
from gnnflow_tpu.parallel.dist_graph import (DistributedTemporalSampler,
                                             PartitionedDynamicGraph,
                                             auto_capacity_factor,
                                             routed_load_stats,
                                             routed_overflow_check,
                                             sample_hops_partitioned,
                                             sample_hops_routed)
from gnnflow_tpu.parallel.kvstore import (ShardedFeatureStore, ShardedTable,
                                          shard_memory_state)
from gnnflow_tpu.parallel.dispatcher import dispatch_full_dataset

__all__ = ["make_mesh", "shard_trainer", "get_partitioner",
           "DistributedTemporalSampler", "PartitionedDynamicGraph",
           "sample_hops_partitioned", "sample_hops_routed",
           "routed_overflow_check", "auto_capacity_factor",
           "routed_load_stats", "ShardedFeatureStore",
           "ShardedTable", "shard_memory_state", "dispatch_full_dataset"]
