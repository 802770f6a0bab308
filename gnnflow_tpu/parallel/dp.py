"""Data-parallel execution of the fused train step.

The DDP-equivalent (``offline_edge_prediction.py:274-275``): the batch is
sharded along the mesh ``data`` axis, params/optimizer/memory/graph stay
replicated, and GSPMD inserts the gradient all-reduce.  Because the whole
iteration (including TGN memory write-back) is one SPMD program, memory
updates are computed **globally** with deterministic keep-last semantics —
strictly stronger than the reference's racy multi-worker shared-memory
writes (``memory.py:67-96``).
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gnnflow_tpu.parallel.mesh import DATA_AXIS
from gnnflow_tpu.train import Trainer


def shard_trainer(trainer: Trainer, mesh: Mesh,
                  axis: str = DATA_AXIS) -> Trainer:
    """Re-jit the trainer's step with data-parallel shardings.

    Batch tensors (``target_nodes``/``ts``/``eids``/``valid``) are sharded
    along ``axis``; everything else is replicated.  Mutates ``trainer`` in
    place and returns it.
    """
    repl = NamedSharding(mesh, P())
    batch_sharding = NamedSharding(mesh, P(axis))
    # args: state, dg, node_feats, edge_feats, target_nodes, ts, eids, valid
    in_shardings = (repl, repl, repl, repl,
                    batch_sharding, batch_sharding, batch_sharding,
                    batch_sharding)
    # the (nid, ts) GRU dedup sorts the full instance axis — under GSPMD
    # that would all-gather the batch-sharded MFGs; keep DP per-instance.
    # Model-level compaction's block packing (cumsum over the batch axis)
    # is likewise untested under sharding — keep DP on the padded path.
    trainer.dedup_factor = None
    trainer.model_compact = False
    trainer._train_step = jax.jit(
        trainer._step, static_argnums=(8,),
        donate_argnums=(0,),
        in_shardings=in_shardings,
        out_shardings=repl)
    trainer.mesh = mesh
    return trainer
