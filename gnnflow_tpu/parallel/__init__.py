from gnnflow_tpu.parallel.mesh import make_mesh
from gnnflow_tpu.parallel.dp import shard_trainer

__all__ = ["make_mesh", "shard_trainer"]
