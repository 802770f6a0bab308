"""Static model (GraphSAGE/GAT) tests: shapes + end-to-end learning with
is_static sampling (ts = +inf), mirroring the reference's static path."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gnnflow_tpu.data import (DstRandEdgeSampler, get_batches,
                              make_synthetic_dataset)
from gnnflow_tpu.dynamic_graph import DynamicGraph
from gnnflow_tpu.models import build_model
from gnnflow_tpu.train import Trainer
from gnnflow_tpu.utils import average_precision_score


def _setup(dim_node=16):
    train, val, test, full, nf, _ = make_synthetic_dataset(
        num_src=150, num_dst=40, num_edges=4000, dim_node=dim_node,
        dim_edge=0, seed=5)
    g = DynamicGraph(initial_pool_size=4096, maximum_pool_size=1 << 22,
                     mem_resource_type="hbm", minimum_block_size=8,
                     insertion_policy="insert")
    g.add_edges(full.src, full.dst, full.time, full.eid, add_reverse=True)
    return train, val, full, g, nf


@pytest.mark.parametrize("name,cfg", [
    ("graphsage", dict(dim_embed=32, num_layers=2, aggregator="mean",
                       fanouts=[5, 5], sample_strategy="uniform",
                       is_static=True)),
    ("gat", dict(dim_embed=16, num_layers=2, att_head=4,
                 dropout=0.0, att_dropout=0.0, fanouts=[5, 5],
                 sample_strategy="uniform", is_static=True)),
])
def test_static_model_learns(name, cfg):
    train, val, full, g, nf = _setup()
    model, sk = build_model(name, cfg, dim_node=16, dim_edge=0)
    trainer = Trainer(model, lr=3e-3, **sk)
    dg = g.device_graph()
    nfj = jnp.asarray(nf)
    B = 200
    state = trainer.init_state(jax.random.PRNGKey(0), dg, B, nfj, None,
                               num_nodes=g.max_vertex_id() + 1)
    neg = DstRandEdgeSampler(train.dst, seed=1)
    rng = np.random.RandomState(0)
    for _ in range(5):
        for batch in get_batches(train, B, neg, rng=rng):
            state, loss, _, _ = trainer.train_step(state, dg, nfj, None,
                                                   batch)
    scores, labels = [], []
    vneg = DstRandEdgeSampler(full.dst, seed=2)
    for batch in get_batches(val, B, vneg):
        state, loss, pos, negs = trainer.eval_step(state, dg, nfj, None,
                                                   batch)
        k = batch.num_valid
        scores += [np.asarray(pos)[:k], np.asarray(negs)[:k]]
        labels += [np.ones(k), np.zeros(k)]
    ap = average_precision_score(np.concatenate(labels),
                                 np.concatenate(scores))
    assert ap > 0.6, f"{name} AP too low: {ap}"


def _rand_mfg(rng, B, F):
    from gnnflow_tpu.common import MFG
    return MFG(
        root_nids=jnp.asarray(rng.randint(0, 50, B), jnp.int32),
        root_ts=jnp.full((B,), jnp.inf, jnp.float32),
        nbr_nids=jnp.asarray(rng.randint(0, 50, (B, F)), jnp.int32),
        nbr_ts=jnp.zeros((B, F), jnp.float32),
        nbr_dts=jnp.zeros((B, F), jnp.float32),
        nbr_eids=jnp.zeros((B, F), jnp.int32),
        nbr_mask=jnp.asarray(rng.rand(B, F) < 0.7),
    )


def test_gatconv_reshape_free_matches_textbook_math():
    """The block-indicator GATConv equals the per-head [B,F,H,D]
    formulation (dglnn.GATConv semantics) computed directly in numpy."""
    from gnnflow_tpu.models.static import GATConv
    rng = np.random.RandomState(0)
    B, F, H, D, din = 7, 5, 3, 8, 12
    mfg = _rand_mfg(rng, B, F)
    h_all = jnp.asarray(rng.randn(B * (1 + F), din), jnp.float32)
    conv = GATConv(dim_out=D, num_heads=H)
    params = conv.init(jax.random.PRNGKey(1), mfg, h_all)
    out = conv.apply(params, mfg, h_all)
    assert out.shape == (B, H * D)

    # textbook math in numpy
    W = np.asarray(params["params"]["fc"]["kernel"])
    al = np.asarray(params["params"]["attn_l"])
    ar = np.asarray(params["params"]["attn_r"])
    z = (np.asarray(h_all) @ W).reshape(-1, H, D)
    z_dst, z_src = z[:B], z[B:].reshape(B, F, H, D)
    el = (z_dst * al).sum(-1)                      # [B, H]
    er = (z_src * ar).sum(-1)                      # [B, F, H]
    e = el[:, None, :] + er
    e = np.where(e >= 0, e, 0.2 * e)               # leaky_relu
    mask = np.asarray(mfg.nbr_mask)[..., None]
    e = np.where(mask, e, -np.inf)
    a = np.exp(e - e.max(1, keepdims=True))
    a = np.where(mask, a, 0.0)
    a = a / np.maximum(a.sum(1, keepdims=True), 1e-30)
    ref = (z_src * a[..., None]).sum(1).reshape(B, H * D)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)


def test_gat_head_mean_matches_reshape():
    """GAT's matmul head-mean equals mean over the reshaped head axis."""
    rng = np.random.RandomState(1)
    H, D, B = 4, 6, 9
    out = rng.randn(B, H * D).astype(np.float32)
    mean_m = ((np.arange(H * D)[:, None] % D ==
               np.arange(D)[None, :]) / H).astype(np.float32)
    np.testing.assert_allclose(out @ mean_m,
                               out.reshape(B, H, D).mean(1),
                               rtol=1e-5, atol=1e-6)


def test_static_models_bf16_close_to_f32():
    """compute_dtype='bfloat16' static models track the f32 forward."""
    train, val, full, g, nf = _setup()
    dg = g.device_graph()
    nfj = jnp.asarray(nf)
    B = 200
    neg = DstRandEdgeSampler(train.dst, seed=1)
    batch = next(iter(get_batches(train, B, neg)))
    for name in ("graphsage", "gat"):
        cfg = dict(dim_embed=32, num_layers=2, att_head=4, aggregator="mean",
                   dropout=0.0, att_dropout=0.0, fanouts=[5, 5],
                   sample_strategy="uniform", is_static=True)
        outs = {}
        for cdt in (None, "bfloat16"):
            c = dict(cfg, compute_dtype=cdt)
            model, sk = build_model(name, c, dim_node=16, dim_edge=0)
            trainer = Trainer(model, lr=3e-3, **sk)
            state = trainer.init_state(jax.random.PRNGKey(0), dg, B, nfj,
                                       None, num_nodes=g.max_vertex_id() + 1)
            _, loss, pos, _ = trainer.eval_step(state, dg, nfj, None, batch)
            outs[cdt] = (float(loss), np.asarray(pos))
        assert np.isfinite(outs[None][0]) and np.isfinite(outs["bfloat16"][0])
        np.testing.assert_allclose(outs["bfloat16"][1], outs[None][1],
                                   rtol=0.1, atol=0.15)
