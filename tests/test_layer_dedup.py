"""Deeper-layer (nid, ts) dedup for multi-layer single-snapshot models.

TGAT-family fast path: layer i+1 samples only the unique (nid, ts)
instances of layer i's all_nodes; output embeddings expand back at the
boundary (exact scatter-free transpose).  With dropout 0 and recent
sampling the path must match the padded path exactly; overflow must
fall back exactly; calibration picks the factor from the measured
boundary unique fraction.  Measured on v5e: TGAT 2-layer @ 4000 drops
61 -> 32-36 ms/step (BASELINE.md round 3)."""
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
    with pytest.raises(ValueError):
        Trainer(DGNN(dim_node=0, dim_edge=12, dim_time=16, dim_embed=32,
                     num_layers=2, num_snapshots=2, att_head=2,
                     dropout=0.0, att_dropout=0.0, use_memory=False),
                fanouts=[5, 5], num_snapshots=2,
                snapshot_time_window=2.0, layer_dedup=0.5)
