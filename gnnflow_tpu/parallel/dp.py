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
    # that would all-gather the batch-sharded MFGs; keep DP per-instance
    # (loudly, if the user asked for it — "auto" resolves to None at
    # Trainer init, so a non-None value here was an explicit request).
    # Model-level compaction IS kept under sharding: its block packing
    # (cumsum + lower-bound over the [S, B] mask axis) is a global GSPMD
    # op — loss-equality with the single device is covered by
    # tests/test_model_compact.py.
    if trainer.dedup_factor is not None:
        import logging
        logging.getLogger(__name__).warning(
            "shard_trainer: disabling explicitly-set dedup_factor=%s "
            "(the (nid, ts) dedup sort would all-gather batch-sharded "
            "MFGs under GSPMD)", trainer.dedup_factor)
        trainer.dedup_factor = None
    # ... and keep a later (auto-)calibrate() from re-enabling it
    trainer._auto_knobs["dedup"] = False
    # funnel through _rejit so a later (auto-)calibrate() keeps the
    # DP shardings when it rebuilds the step
    trainer._jit_train_kwargs = dict(in_shardings=in_shardings,
                                     out_shardings=repl)
    trainer._rejit()
    trainer.mesh = mesh
    return trainer
