"""Coverage for checkpointing, eval semantics, config registry breadth,
and profiling utilities."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gnnflow_tpu.config import DATASETS, MODELS, get_default_config
from gnnflow_tpu.data import (DstRandEdgeSampler, get_batches,
                              make_synthetic_dataset)
from gnnflow_tpu.dynamic_graph import DynamicGraph
from gnnflow_tpu.models import build_model
from gnnflow_tpu.models import memory as memory_lib
from gnnflow_tpu.models.dgnn import DGNN
from gnnflow_tpu.train import Trainer
from gnnflow_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
from gnnflow_tpu.utils.profiling import (PhaseTimer, device_memory_stats,
                                         trace)


def _tiny():
    _, _, _, full, _, ef = make_synthetic_dataset(
        num_src=60, num_dst=20, num_edges=1500, dim_edge=8, seed=11)
    g = DynamicGraph(initial_pool_size=2048, maximum_pool_size=1 << 20,
                     mem_resource_type="hbm", minimum_block_size=8,
                     insertion_policy="insert")
    g.add_edges(full.src, full.dst, full.time, full.eid, add_reverse=True)
    return full, g, jnp.asarray(ef)


def test_config_registry_all_pairs_build():
    for m in MODELS:
        for d in DATASETS:
            mc, dc = get_default_config(m, d)
            assert "batch_size" in mc
            assert "mem_resource_type" in dc
            model, sk = build_model(m, mc, dim_node=16, dim_edge=8)
            assert tuple(sk["fanouts"]) == tuple(mc["fanouts"])


def test_eval_step_does_not_update_params_but_updates_memory():
    full, g, ef = _tiny()
    model = DGNN(dim_node=0, dim_edge=8, dim_time=8, dim_embed=16,
                 num_layers=1, num_snapshots=1, att_head=2, dropout=0.0,
                 att_dropout=0.0, use_memory=True, dim_memory=16)
    trainer = Trainer(model, fanouts=[5], lr=1e-2)
    dg = g.device_graph()
    state = trainer.init_state(jax.random.PRNGKey(0), dg, 100, None, ef,
                               num_nodes=g.max_vertex_id() + 1)
    neg = DstRandEdgeSampler(full.dst, seed=1)
    batch = next(iter(get_batches(full, 100, neg)))
    p0 = jax.device_get(state.params)
    m0 = np.asarray(state.memory.data).copy()
    state, loss, _, _ = trainer.eval_step(state, dg, None, ef, batch)
    p1 = jax.device_get(state.params)
    for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(p1)):
        np.testing.assert_array_equal(a, b)
    # memory DOES advance during eval (reference evaluate() updates mail)
    assert not np.array_equal(m0, np.asarray(state.memory.data))
    # train step changes params
    state, loss, _, _ = trainer.train_step(state, dg, None, ef, batch)
    p2 = jax.device_get(state.params)
    assert any(not np.array_equal(a, b) for a, b in
               zip(jax.tree.leaves(p1), jax.tree.leaves(p2)))


def test_checkpoint_roundtrip(tmp_path):
    full, g, ef = _tiny()
    model = DGNN(dim_node=0, dim_edge=8, dim_time=8, dim_embed=16,
                 num_layers=1, num_snapshots=1, att_head=2, dropout=0.0,
                 att_dropout=0.0, use_memory=True, dim_memory=16)
    trainer = Trainer(model, fanouts=[5], lr=1e-3)
    dg = g.device_graph()
    state = trainer.init_state(jax.random.PRNGKey(0), dg, 100, None, ef,
                               num_nodes=g.max_vertex_id() + 1)
    neg = DstRandEdgeSampler(full.dst, seed=1)
    for i, batch in enumerate(get_batches(full, 100, neg)):
        state, loss, _, _ = trainer.train_step(state, dg, None, ef, batch)
        if i >= 1:
            break
    path = str(tmp_path / "m.ckpt")
    save_checkpoint(path, state.params,
                    memory_lib.backup_memory(state.memory),
                    {"epoch": 1, "ap": 0.9})
    ckpt = load_checkpoint(path)
    assert ckpt["extra"]["epoch"] == 1
    restored = memory_lib.restore_memory(ckpt["memory"])
    np.testing.assert_allclose(np.asarray(restored.data),
                               np.asarray(state.memory.data), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(ckpt["params"]),
                    jax.tree.leaves(jax.device_get(state.params))):
        np.testing.assert_allclose(a, b, rtol=1e-6)


def test_phase_timer_and_trace():
    t = PhaseTimer()
    with t("a"):
        pass
    with t("a"):
        pass
    with t("b"):
        pass
    s = t.summary()
    assert s["a"]["count"] == 2 and s["b"]["count"] == 1
    assert "a" in t.format()
    with trace(None):
        pass
    stats = device_memory_stats()
    assert isinstance(stats, dict)
    t.reset()
    assert t.summary() == {}


def test_memory_reset():
    st = memory_lib.init_memory(5, 2, 1)
    st = st.replace(data=st.data.at[1].set(2.0))
    st = memory_lib.reset_memory(st)
    np.testing.assert_allclose(np.asarray(st.data), 0.0)


def test_synthetic_config_is_undirected():
    """The synthetic stream is a WIKI-style bipartite interaction log;
    stored directed, dst-side roots have no history, so memory-less
    models (TGAT/DySAT) emit one constant embedding for every dst and
    val AP pins at exactly 0.5 (reference stores WIKI undirected,
    gnnflow/config.py:116)."""
    from gnnflow_tpu.config import get_default_config
    _, dcfg = get_default_config("dysat", "synthetic")
    assert dcfg["undirected"] is True
