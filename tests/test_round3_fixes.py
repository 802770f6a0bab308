"""Round-3 behavior fixes: gru_table init-time validation, model_compact
honoring a disabled compact_factor, and the w_k/w_v -> w_kv checkpoint
migration."""
import numpy as np
import pytest

from gnnflow_tpu.models.dgnn import DGNN
from gnnflow_tpu.train import Trainer
from gnnflow_tpu.utils.checkpoint import migrate_params


def _apan_model():
    return DGNN(dim_node=0, dim_edge=16, dim_time=8, dim_embed=16,
                num_layers=1, num_snapshots=1, att_head=2,
                dropout=0.0, att_dropout=0.0, use_memory=True, dim_memory=16,
                memory_updater="transformer", mailbox_slots=4)


def test_gru_table_rejects_transformer_updater():
    with pytest.raises(ValueError, match="gru_table"):
        Trainer(_apan_model(), fanouts=[4], gru_table=True)


def test_gru_table_rejects_multi_slot_gru():
    model = DGNN(dim_node=0, dim_edge=16, dim_time=8, dim_embed=16,
                 num_layers=1, num_snapshots=1, att_head=2,
                 dropout=0.0, att_dropout=0.0, use_memory=True, dim_memory=16, mailbox_slots=4)
    with pytest.raises(ValueError, match="gru_table"):
        Trainer(model, fanouts=[4], gru_table=True)


def test_gru_table_rejects_memoryless():
    model = DGNN(dim_node=0, dim_edge=16, dim_time=8, dim_embed=16,
                 num_layers=1, num_snapshots=1, att_head=2,
                 dropout=0.0, att_dropout=0.0, use_memory=False)
    with pytest.raises(ValueError, match="gru_table"):
        Trainer(model, fanouts=[4], gru_table=True)


def test_model_compact_skipped_when_factor_disabled():
    """calibrate() sets compact_factor=None at high occupancy; the step
    must then take the single padded path, not a 0.25-capacity compact
    branch that overflows every step (ADVICE round 2)."""
    model = DGNN(dim_node=0, dim_edge=16, dim_time=0, dim_embed=16,
                 num_layers=2, num_snapshots=2, att_head=2,
                 dropout=0.0, att_dropout=0.0, use_memory=False)
    tr = Trainer(model, fanouts=[4, 4], num_snapshots=2,
                 snapshot_time_window=100.0, prop_time=True)
    assert tr.model_compact                 # auto-on for this config
    tr.compact_factor = None                # calibrate() decided "off"
    called = {"n": 0}
    orig = tr._model_compact_outputs
    tr._model_compact_outputs = lambda *a, **k: (
        called.__setitem__("n", called["n"] + 1), orig(*a, **k))[1]

    import jax
    import jax.numpy as jnp
    from gnnflow_tpu.dynamic_graph import DynamicGraph
    g = DynamicGraph(initial_pool_size=512, maximum_pool_size=1 << 16,
                     mem_resource_type="hbm", minimum_block_size=4,
                     insertion_policy="insert")
    n = 200
    rng = np.random.default_rng(0)
    g.add_edges(rng.integers(0, 50, n), rng.integers(0, 50, n),
                np.sort(rng.uniform(0, 500, n).astype(np.float32)),
                np.arange(n), add_reverse=True)
    dg = g.device_graph()
    ef = jnp.zeros((n + 1, 128), jnp.float32)
    state = tr.init_state(jax.random.PRNGKey(0), dg, 8, None, ef,
                          num_nodes=51)
    b3 = 8 * 3
    tn = jnp.asarray(rng.integers(0, 50, b3), jnp.int32)
    ts = jnp.full((b3,), 400.0, jnp.float32)
    eids = jnp.asarray(rng.integers(0, n, 8), jnp.int32)
    valid = jnp.ones((8,), bool)
    state, loss, _, _ = tr._train_step(state, dg, None, ef, tn, ts,
                                       eids, valid, True)
    assert np.isfinite(float(loss))
    assert called["n"] == 0   # padded path taken


def test_migrate_params_fuses_split_kv():
    rng = np.random.default_rng(1)
    wk = rng.normal(size=(12, 8)).astype(np.float32)
    wv = rng.normal(size=(12, 8)).astype(np.float32)
    bk = rng.normal(size=(8,)).astype(np.float32)
    bv = rng.normal(size=(8,)).astype(np.float32)
    old = {"updater": {"w_k": {"kernel": wk, "bias": bk},
                       "w_v": {"kernel": wv, "bias": bv},
                       "w_q": {"kernel": wk.copy(), "bias": bk.copy()}}}
    new = migrate_params(old)
    u = new["updater"]
    assert "w_k" not in u and "w_v" not in u
    np.testing.assert_array_equal(u["w_kv"]["kernel"],
                                  np.concatenate([wk, wv], axis=-1))
    np.testing.assert_array_equal(u["w_kv"]["bias"],
                                  np.concatenate([bk, bv], axis=-1))
    # x @ fused == [x @ K_k | x @ K_v]
    x = rng.normal(size=(5, 12)).astype(np.float32)
    fused = x @ u["w_kv"]["kernel"] + u["w_kv"]["bias"]
    np.testing.assert_allclose(fused[:, :8], x @ wk + bk, rtol=1e-6)
    np.testing.assert_allclose(fused[:, 8:], x @ wv + bv, rtol=1e-6)


def test_migrate_params_noop_on_current_layout():
    p = {"w_kv": {"kernel": np.ones((4, 4), np.float32),
                  "bias": np.zeros((4,), np.float32)}}
    out = migrate_params({"m": p})
    np.testing.assert_array_equal(out["m"]["w_kv"]["kernel"],
                                  p["w_kv"]["kernel"])
