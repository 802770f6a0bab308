"""First-batch auto-calibration (no flag).

``Trainer`` measures window occupancy / (nid, ts) duplication on the
first real batch and picks the static compaction factors before the
step jits; explicit ``calibrate()`` suppresses it; DP re-jits keep the
GSPMD shardings (``_rejit`` funnel)."""
import numpy as np
import jax
import jax.numpy as jnp

from gnnflow_tpu.data import DstRandEdgeSampler, get_batches, \
    make_synthetic_dataset
from gnnflow_tpu.dynamic_graph import DynamicGraph
from gnnflow_tpu.models.dgnn import DGNN
from gnnflow_tpu.train import Trainer


def _setup(dim_edge=12, seed=5):
    train, _, _, full, _, ef = make_synthetic_dataset(
        num_src=120, num_dst=30, num_edges=5000, dim_edge=dim_edge,
        seed=seed, time_scale=1.0)
    g = DynamicGraph(initial_pool_size=4096, maximum_pool_size=1 << 22,
                     mem_resource_type="hbm", minimum_block_size=8,
                     insertion_policy="insert")
    g.add_edges(full.src, full.dst, full.time, full.eid, add_reverse=True)
    return train, g, ef


def _windowed_trainer(**kw):
    model = DGNN(dim_node=0, dim_edge=12, dim_time=16, dim_embed=32,
                 num_layers=2, num_snapshots=3, att_head=2, dropout=0.0,
                 att_dropout=0.0, use_memory=False)
    return Trainer(model, fanouts=[5, 5], sample_strategy="recent",
                   num_snapshots=3, snapshot_time_window=3.0,
                   prop_time=True, lr=1e-3, **kw)


def test_windowed_auto_calibrates_on_first_step():
    train, g, ef = _setup()
    dg = g.device_graph()
    trainer = _windowed_trainer()
    assert not trainer._calibrated
    efj = jnp.asarray(ef)
    state = trainer.init_state(jax.random.PRNGKey(0), dg, 250, None,
                               efj, num_nodes=g.max_vertex_id() + 1)
    assert not trainer._calibrated  # init does not trigger it
    neg = DstRandEdgeSampler(train.dst, seed=1)
    batch = next(iter(get_batches(train, 250, neg)))
    state, loss, _, _ = trainer.train_step(state, dg, None, efj, batch)
    assert trainer._calibrated
    # the chosen factor is a concrete measured value (or None =
    # compaction disabled at high occupancy)
    assert trainer.compact_factor is None \
        or isinstance(trainer.compact_factor, float)
    assert np.isfinite(float(loss))


def test_explicit_calibrate_suppresses_auto():
    train, g, ef = _setup()
    dg = g.device_graph()
    trainer = _windowed_trainer()
    neg = DstRandEdgeSampler(train.dst, seed=1)
    stats = trainer.calibrate(dg, list(get_batches(train, 250, neg))[:2])
    assert trainer._calibrated
    chosen = trainer.compact_factor
    efj = jnp.asarray(ef)
    state = trainer.init_state(jax.random.PRNGKey(0), dg, 250, None,
                               efj, num_nodes=g.max_vertex_id() + 1)
    batch = next(iter(get_batches(train, 250, neg)))
    trainer.train_step(state, dg, None, efj, batch)
    assert trainer.compact_factor == chosen  # auto pass did not re-pick
    assert "occupancy" in stats


def test_auto_calibrated_dp_matches_single_device():
    """Auto-calibration composes with DP: both runs pick the same factor
    from the same first batch, so losses stay equal — and the calibrate
    re-jit preserves the GSPMD shardings (via _rejit)."""
    from gnnflow_tpu.parallel import make_mesh, shard_trainer

    def run(ndev):
        train, g, ef = _setup()
        dg = g.device_graph()
        trainer = _windowed_trainer()
        efj = jnp.asarray(ef)
        state = trainer.init_state(jax.random.PRNGKey(0), dg, 240, None,
                                   efj, num_nodes=g.max_vertex_id() + 1)
        if ndev:
            shard_trainer(trainer, make_mesh(ndev))
        neg = DstRandEdgeSampler(train.dst, seed=1)
        losses = []
        rng = np.random.RandomState(0)
        for i, b in enumerate(get_batches(train, 240, neg, rng=rng)):
            if i >= 4:
                break
            state, loss, _, _ = trainer.train_step(state, dg, None, efj,
                                                   b)
            losses.append(float(loss))
        assert trainer._calibrated
        return losses

    np.testing.assert_allclose(run(8), run(0), rtol=5e-4)


def test_memory_model_auto_calibrates_dedup_decision():
    train, g, ef = _setup()
    dg = g.device_graph()
    model = DGNN(dim_node=0, dim_edge=12, dim_time=16, dim_embed=32,
                 num_layers=1, num_snapshots=1, att_head=2, dropout=0.0,
                 att_dropout=0.0, use_memory=True, dim_memory=16)
    trainer = Trainer(model, fanouts=[5], lr=1e-3)
    assert not trainer._calibrated  # GRU memory => something to measure
    efj = jnp.asarray(ef)
    state = trainer.init_state(jax.random.PRNGKey(0), dg, 200, None,
                               efj, num_nodes=g.max_vertex_id() + 1)
    neg = DstRandEdgeSampler(train.dst, seed=1)
    batch = next(iter(get_batches(train, 200, neg)))
    state, loss, _, _ = trainer.train_step(state, dg, None, efj, batch)
    assert trainer._calibrated
    # dedup only turns on at extreme duplication (uniq_frac <= 0.08);
    # either way the chosen value is concrete (not "auto")
    assert trainer.dedup_factor is None or trainer.dedup_factor > 0
    assert np.isfinite(float(loss))
