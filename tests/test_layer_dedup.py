"""Deeper-layer (nid, ts) dedup for multi-layer single-snapshot models.

TGAT-family fast path: layer i+1 samples only the unique (nid, ts)
instances of layer i's all_nodes; output embeddings expand back at the
boundary (exact scatter-free transpose).  With dropout 0 and recent
sampling the path must match the padded path exactly; overflow must
fall back exactly; calibration picks the factor from the WORST-CASE
boundary unique fraction (real + stream-end-shifted pseudo-batches) —
uniform picks from a growing unwindowed history push late-stream
uniqueness to ~0.9, where calibration rightly disables the path
(BASELINE.md round 3).  The windowed multi-snapshot variant below
(DySAT family) keys per snapshot, where the window bounds uniqueness
(~0.31 measured) and the dedup holds across the whole stream."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gnnflow_tpu.data import DstRandEdgeSampler, get_batches, \
    make_synthetic_dataset
from gnnflow_tpu.dynamic_graph import DynamicGraph
from gnnflow_tpu.models.dgnn import DGNN
from gnnflow_tpu.train import Trainer


def _setup():
    train, _, _, full, _, ef = make_synthetic_dataset(
        num_src=120, num_dst=30, num_edges=5000, dim_edge=12, seed=5,
        time_scale=1.0)
    g = DynamicGraph(initial_pool_size=4096, maximum_pool_size=1 << 22,
                     mem_resource_type="hbm", minimum_block_size=8,
                     insertion_policy="insert")
    g.add_edges(full.src, full.dst, full.time, full.eid, add_reverse=True)
    return train, g, ef


def _model(num_layers=2):
    return DGNN(dim_node=0, dim_edge=12, dim_time=16, dim_embed=32,
                num_layers=num_layers, num_snapshots=1, att_head=2,
                dropout=0.0, att_dropout=0.0, use_memory=False)


def _losses(layer_dedup, strategy="recent", steps=5, fanouts=(5, 5),
            num_devices=0, auto_calibrate=False, batch=240):
    train, g, ef = _setup()
    dg = g.device_graph()
    trainer = Trainer(_model(len(fanouts)), fanouts=list(fanouts),
                      sample_strategy=strategy, lr=1e-3,
                      layer_dedup=layer_dedup,
                      auto_calibrate=auto_calibrate)
    efj = jnp.asarray(ef)
    state = trainer.init_state(jax.random.PRNGKey(0), dg, batch, None,
                               efj, num_nodes=g.max_vertex_id() + 1)
    if num_devices:
        from gnnflow_tpu.parallel import make_mesh, shard_trainer
        shard_trainer(trainer, make_mesh(num_devices))
    neg = DstRandEdgeSampler(train.dst, seed=1)
    losses = []
    rng = np.random.RandomState(0)
    for i, b in enumerate(get_batches(train, batch, neg, rng=rng)):
        if i >= steps:
            break
        state, loss, _, _ = trainer.train_step(state, dg, None, efj, b)
        losses.append(float(loss))
    return losses, trainer


def test_recent_matches_padded_exactly():
    a, _ = _losses(None)
    b, _ = _losses(0.5)
    np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6)


def test_overflow_falls_back_exactly():
    a, _ = _losses(None)
    b, _ = _losses(0.01)   # cap < n_uniq every step -> padded branch
    np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6)


def test_3layer_matches_padded():
    a, _ = _losses(None, fanouts=(4, 3, 3), steps=4)
    b, _ = _losses(0.6, fanouts=(4, 3, 3), steps=4)
    np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6)


def test_uniform_trains_and_is_finite():
    b, _ = _losses(0.5, strategy="uniform", steps=6)
    assert all(np.isfinite(b))
    assert b[-1] < b[0] + 0.1


def test_auto_calibration_picks_factor():
    losses, trainer = _losses("auto", steps=2, auto_calibrate=True)
    assert trainer._calibrated
    # the boundary fraction on this stream is well under the 0.35 gate,
    # so the factor must be enabled (a concrete float)
    assert isinstance(trainer.layer_dedup, float)
    assert 0 < trainer.layer_dedup <= 0.9
    assert all(np.isfinite(losses))


def test_dp_sharded_matches_single_device():
    a, _ = _losses(0.5, steps=4)
    b, _ = _losses(0.5, steps=4, num_devices=8)
    np.testing.assert_allclose(b, a, rtol=5e-4)


def test_rejects_ineligible_configs():
    with pytest.raises(ValueError):
        Trainer(DGNN(dim_node=0, dim_edge=12, dim_time=16, dim_embed=32,
                     num_layers=1, num_snapshots=1, att_head=2,
                     dropout=0.0, att_dropout=0.0, use_memory=True,
                     dim_memory=16),
                fanouts=[5], layer_dedup=0.5)
    # multi-snapshot needs a window (per-snapshot dedup keys on the
    # windowed (nid, ts) pairs)
    with pytest.raises(ValueError):
        Trainer(DGNN(dim_node=0, dim_edge=12, dim_time=16, dim_embed=32,
                     num_layers=2, num_snapshots=2, att_head=2,
                     dropout=0.0, att_dropout=0.0, use_memory=False),
                fanouts=[5, 5], num_snapshots=2,
                snapshot_time_window=0.0, layer_dedup=0.5)


# ---------------------------------------------------------------------
# Windowed multi-snapshot (DySAT family): per-snapshot dedup


def _snap_losses(layer_dedup, strategy="recent", steps=5,
                 prop_time=True, auto_calibrate=False, compact=None,
                 batch=240, num_devices=0):
    train, g, ef = _setup()
    dg = g.device_graph()
    model = DGNN(dim_node=0, dim_edge=12, dim_time=16, dim_embed=32,
                 num_layers=2, num_snapshots=3, att_head=2, dropout=0.0,
                 att_dropout=0.0, use_memory=False)
    trainer = Trainer(model, fanouts=[5, 5], sample_strategy=strategy,
                      lr=1e-3, num_snapshots=3, snapshot_time_window=2.0,
                      prop_time=prop_time, layer_dedup=layer_dedup,
                      model_compact=bool(compact),
                      compact_factor=compact,
                      auto_calibrate=auto_calibrate)
    efj = jnp.asarray(ef)
    state = trainer.init_state(jax.random.PRNGKey(0), dg, batch, None,
                               efj, num_nodes=g.max_vertex_id() + 1)
    if num_devices:
        from gnnflow_tpu.parallel import make_mesh, shard_trainer
        shard_trainer(trainer, make_mesh(num_devices))
    neg = DstRandEdgeSampler(train.dst, seed=1)
    losses = []
    rng = np.random.RandomState(0)
    for i, b in enumerate(get_batches(train, batch, neg, rng=rng)):
        if i >= steps:
            break
        state, loss, _, _ = trainer.train_step(state, dg, None, efj, b)
        losses.append(float(loss))
    return losses, trainer


def test_snapshot_dedup_dp_sharded_matches_single_device():
    a, _ = _snap_losses(0.6, steps=4)
    b, _ = _snap_losses(0.6, steps=4, num_devices=8)
    np.testing.assert_allclose(b, a, rtol=5e-4)


def test_snapshot_dedup_matches_padded_exactly():
    a, _ = _snap_losses(None)
    b, _ = _snap_losses(0.6)
    np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6)


def test_snapshot_dedup_no_prop_time_matches_padded():
    a, _ = _snap_losses(None, prop_time=False)
    b, _ = _snap_losses(0.6, prop_time=False)
    np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6)


def test_snapshot_dedup_overflow_falls_back_exactly():
    a, _ = _snap_losses(None)
    b, _ = _snap_losses(0.01)   # cap < n_uniq every step
    np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6)


def test_snapshot_dedup_beats_or_defers_to_compaction():
    # auto-calibration must choose exactly one of {layer_dedup, block
    # compaction} for a windowed multi-snapshot config, and when it
    # chooses dedup its capacity must be tighter than the occupancy
    # factor it displaced
    losses, tr = _snap_losses("auto", steps=3, auto_calibrate=True,
                              compact="auto")
    assert tr._calibrated
    assert all(np.isfinite(losses))
    if tr.layer_dedup is not None:
        assert isinstance(tr.layer_dedup, float)
        if tr.compact_factor is not None:
            assert tr.layer_dedup < 0.9 * tr.compact_factor


def test_snapshot_dedup_uniform_trains():
    b, _ = _snap_losses(0.6, strategy="uniform", steps=6)
    assert all(np.isfinite(b))


# ---------------------------------------------------------------------
# Static SAGE/GAT: ts = +inf makes the dedup key nid-only


def _static_losses(cls_name, layer_dedup, steps=4, auto_calibrate=False,
                   batch=240):
    from gnnflow_tpu.models.static import GAT, SAGE
    train, g, ef = _setup()
    # static models consume node features
    rng = np.random.RandomState(7)
    nf = rng.randn(g.max_vertex_id() + 1, 24).astype(np.float32)
    dg = g.device_graph()
    if cls_name == "SAGE":
        model = SAGE(dim_node=24, dim_embed=32, num_layers=2)
    else:
        model = GAT(dim_node=24, dim_embed=32, num_layers=2,
                    attn_head=(4, 1))
    trainer = Trainer(model, fanouts=[5, 5], sample_strategy="recent",
                      lr=1e-3, is_static=True, layer_dedup=layer_dedup,
                      auto_calibrate=auto_calibrate)
    nfj, efj = jnp.asarray(nf), jnp.asarray(ef)
    state = trainer.init_state(jax.random.PRNGKey(0), dg, batch, nfj,
                               efj, num_nodes=g.max_vertex_id() + 1)
    neg = DstRandEdgeSampler(train.dst, seed=1)
    losses = []
    brng = np.random.RandomState(0)
    for i, b in enumerate(get_batches(train, batch, neg, rng=brng)):
        if i >= steps:
            break
        state, loss, _, _ = trainer.train_step(state, dg, nfj, efj, b)
        losses.append(float(loss))
    return losses, trainer


def test_static_sage_dedup_matches_padded_exactly():
    a, _ = _static_losses("SAGE", None)
    b, _ = _static_losses("SAGE", 0.5)
    np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6)


def test_static_sage_overflow_falls_back_exactly():
    a, _ = _static_losses("SAGE", None)
    b, _ = _static_losses("SAGE", 0.01)
    np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6)


def test_static_gat_dedup_matches_padded_exactly():
    a, _ = _static_losses("GAT", None)
    b, _ = _static_losses("GAT", 0.5)
    np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6)


def test_static_auto_calibration_picks_factor():
    losses, tr = _static_losses("SAGE", "auto", auto_calibrate=True)
    assert tr._calibrated
    assert isinstance(tr.layer_dedup, float)
    assert all(np.isfinite(losses))
