"""Model-stack tests: module math, memory semantics, end-to-end smoke.

Counterpart of the reference ``tests/test_model.py`` (TGN/SAGE/GAT forward
smoke) plus unit checks the reference lacks: TimeEncode golden values,
masked-softmax behavior, unique-keep-last write-back ordering.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gnnflow_tpu.common import MFG
from gnnflow_tpu.models.modules import (TimeEncode, TemporalAttentionLayer,
                                        EdgePredictor, masked_softmax)
from gnnflow_tpu.models import memory as memory_lib
from gnnflow_tpu.models.dgnn import DGNN
from gnnflow_tpu.ops.segment import unique_keep_last_mask


def test_time_encode_golden():
    te = TimeEncode(4)
    params = te.init(jax.random.PRNGKey(0), jnp.zeros((3,)))
    dt = jnp.array([0.0, 1.0, 2.0])
    out = te.apply(params, dt)
    w = 1.0 / 10 ** np.linspace(0, 9, 4, dtype=np.float32)
    expect = np.cos(dt[:, None] * w)
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-5)


def test_masked_softmax():
    scores = jnp.array([[1.0, 2.0, 3.0], [5.0, 5.0, 5.0]])
    mask = jnp.array([[True, True, False], [False, False, False]])
    out = np.asarray(masked_softmax(scores, mask, axis=1))
    e = np.exp(np.array([1.0, 2.0]) - 2.0)
    np.testing.assert_allclose(out[0], [e[0] / e.sum(), e[1] / e.sum(), 0],
                               rtol=1e-6)
    np.testing.assert_allclose(out[1], [0, 0, 0])


def make_mfg(B=4, F=3, seed=0, num_nodes=20):
    rng = np.random.RandomState(seed)
    mask = rng.rand(B, F) < 0.8
    nbr = np.where(mask, rng.randint(0, num_nodes, (B, F)), -1)
    return MFG(
        root_nids=jnp.asarray(rng.randint(0, num_nodes, B), jnp.int32),
        root_ts=jnp.asarray(rng.rand(B) * 10, jnp.float32),
        nbr_nids=jnp.asarray(nbr, jnp.int32),
        nbr_ts=jnp.asarray(rng.rand(B, F) * 10 * mask, jnp.float32),
        nbr_dts=jnp.asarray(rng.rand(B, F) * mask, jnp.float32),
        nbr_eids=jnp.asarray(rng.randint(0, 50, (B, F)) * mask, jnp.int32),
        nbr_mask=jnp.asarray(mask))


@pytest.mark.parametrize("dim_node,dim_edge,dim_time", [
    (8, 4, 8), (0, 4, 8), (8, 0, 8), (0, 0, 0), (0, 4, 0)])
def test_attention_layer_shapes(dim_node, dim_edge, dim_time):
    B, F, D = 4, 3, 16
    mfg = make_mfg(B, F)
    layer = TemporalAttentionLayer(
        dim_node=dim_node, dim_edge=dim_edge, dim_time=dim_time,
        dim_out=D, num_head=2)
    h_all = (jnp.ones((B * (1 + F), dim_node)) if dim_node else None)
    ef = jnp.ones((B, F, dim_edge)) if dim_edge else None
    params = layer.init(jax.random.PRNGKey(0), mfg, h_all, ef)
    out = layer.apply(params, mfg, h_all, ef)
    assert out.shape == (B, D)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("dim_node,dim_edge,dim_time,H", [
    (8, 4, 8, 2), (0, 4, 8, 2), (8, 0, 8, 4), (0, 0, 0, 2), (0, 4, 0, 1),
    (12, 6, 10, 1)])
def test_factorized_attention_matches_materialized(dim_node, dim_edge,
                                                   dim_time, H):
    """The default factorized attention (K/V never materialized) equals
    the materialized xla_kv path on identical params."""
    B, F, D = 5, 4, 16
    mfg = make_mfg(B, F, seed=7)
    rng = np.random.RandomState(2)
    h_all = (jnp.asarray(rng.randn(B * (1 + F), dim_node), jnp.float32)
             if dim_node else None)
    ef = (jnp.asarray(rng.randn(B, F, dim_edge), jnp.float32)
          if dim_edge else None)
    kw = dict(dim_node=dim_node, dim_edge=dim_edge, dim_time=dim_time,
              dim_out=D, num_head=H)
    fac = TemporalAttentionLayer(attention_impl="xla_factorized", **kw)
    mat = TemporalAttentionLayer(**kw)
    params = fac.init(jax.random.PRNGKey(3), mfg, h_all, ef)
    # identical variable trees -> params interchangeable
    out_f = np.asarray(fac.apply(params, mfg, h_all, ef))
    out_m = np.asarray(mat.apply(params, mfg, h_all, ef))
    np.testing.assert_allclose(out_f, out_m, rtol=2e-5, atol=2e-5)


def test_attention_no_valid_neighbors_gives_zero_agg():
    """Rows with zero valid neighbors aggregate to exactly zero before the
    output projection (DGL edge_softmax + sum semantics)."""
    B, F, D = 2, 3, 8
    mfg = make_mfg(B, F)
    mfg = mfg.replace(nbr_mask=jnp.zeros((B, F), bool))
    layer = TemporalAttentionLayer(dim_node=4, dim_edge=0, dim_time=4,
                                   dim_out=D, num_head=2)
    h_all = jnp.ones((B * (1 + F), 4))
    params = layer.init(jax.random.PRNGKey(0), mfg, h_all, None)
    out = layer.apply(params, mfg, h_all, None)
    # agg part zero, so output depends only on h_dst through w_out
    assert out.shape == (B, D)
    assert np.isfinite(np.asarray(out)).all()


def test_edge_predictor():
    ep = EdgePredictor(8)
    h = jnp.ones((9, 8))
    params = ep.init(jax.random.PRNGKey(0), h)
    pos, neg = ep.apply(params, h)
    assert pos.shape == (3, 1) and neg.shape == (3, 1)


def test_unique_keep_last_mask():
    nids = jnp.array([3, 5, 3, 7, 5, 3])
    mask = np.asarray(unique_keep_last_mask(nids))
    assert mask.tolist() == [False, False, False, True, True, True]
    # with validity: last valid occurrence wins
    valid = jnp.array([True, True, True, True, True, False])
    mask = np.asarray(unique_keep_last_mask(nids, valid))
    assert mask.tolist() == [False, False, True, True, True, False]


def test_memory_update_keep_last():
    """Duplicate nodes within a batch: the LAST occurrence's memory/mail
    wins (memory.py:233-253)."""
    state = memory_lib.init_memory(10, 4, 0)
    B = 3
    # batch: src=[1,1,2], dst=[5,6,5]; neg ignored
    nid = jnp.array([1, 1, 2, 5, 6, 5, 7, 8, 9])
    mem = jnp.arange(9 * 4, dtype=jnp.float32).reshape(9, 4)
    ts = jnp.arange(9, dtype=jnp.float32)
    new = memory_lib.update_mem_mail(state, nid, mem, ts)
    # node 1 appears at positions 0,1 -> memory from position 1
    np.testing.assert_allclose(np.asarray(new.node_memory[1]),
                               np.asarray(mem[1]))
    np.testing.assert_allclose(np.asarray(new.node_memory[2]),
                               np.asarray(mem[2]))
    # node 5 appears at dst positions 3 and 5 -> position 5 wins
    np.testing.assert_allclose(np.asarray(new.node_memory[5]),
                               np.asarray(mem[5]))
    np.testing.assert_allclose(np.asarray(new.node_memory_ts[5]), 5.0)
    # untouched nodes remain zero
    np.testing.assert_allclose(np.asarray(new.node_memory[0]), 0.0)
    # mailbox: node 1 gets src_mail from pair index 1: [mem1|mem_dst1]
    np.testing.assert_allclose(np.asarray(new.mailbox[1]),
                               np.concatenate([mem[1], mem[4]]))


def test_memory_padded_rows_ignored():
    state = memory_lib.init_memory(10, 2, 0)
    nid = jnp.array([1, 2, 3, 4, 0, 0])  # B=2, last row padded
    mem = jnp.ones((6, 2))
    ts = jnp.ones((6,))
    valid = jnp.array([True, False])
    new = memory_lib.update_mem_mail(state, nid, mem, ts, valid=valid)
    np.testing.assert_allclose(np.asarray(new.node_memory[1]), 1.0)
    np.testing.assert_allclose(np.asarray(new.node_memory[3]), 1.0)
    np.testing.assert_allclose(np.asarray(new.node_memory[2]), 0.0)
    np.testing.assert_allclose(np.asarray(new.node_memory[4]), 0.0)


def test_memory_backup_restore_resize():
    state = memory_lib.init_memory(4, 2, 1)
    state = state.replace(data=state.data.at[1, :2].set(3.0))
    bk = memory_lib.backup_memory(state)
    restored = memory_lib.restore_memory(bk)
    np.testing.assert_allclose(np.asarray(restored.node_memory[1]), 3.0)
    grown = memory_lib.resize_memory(state, 8)
    assert grown.num_nodes == 8
    np.testing.assert_allclose(np.asarray(grown.node_memory[1]), 3.0)
    np.testing.assert_allclose(np.asarray(grown.node_memory[6]), 0.0)


@pytest.mark.parametrize("slots", [1, 3])
def test_memory_bf16_storage_matches_float32(slots):
    """bfloat16-packed rows behave like the float32 layout up to bf16
    rounding of the stored mem/mail values; timestamps stay EXACT."""
    rng = np.random.RandomState(0)
    n, dm, de = 12, 4, 2
    f32 = memory_lib.init_memory(n, dm, de, mailbox_slots=slots)
    bf = memory_lib.init_memory(n, dm, de, mailbox_slots=slots,
                                storage="bfloat16")
    assert bf.data.dtype == jnp.int32
    assert bf.dim_raw == f32.dim_raw == 2 * dm + de

    for step in range(3):   # several writes to exercise slot rotation
        nid = jnp.asarray(rng.randint(0, n, size=9), jnp.int32)
        mem = jnp.asarray(rng.randn(9, dm), jnp.float32)
        ts = jnp.asarray(rng.rand(9) * 1e5, jnp.float32)
        ef = jnp.asarray(rng.randn(3, de), jnp.float32)
        f32 = memory_lib.update_mem_mail(f32, nid, mem, ts, edge_feats=ef)
        bf = memory_lib.update_mem_mail(bf, nid, mem, ts, edge_feats=ef)

    np.testing.assert_allclose(np.asarray(bf.node_memory),
                               np.asarray(f32.node_memory),
                               rtol=1e-2, atol=1e-2)
    np.testing.assert_array_equal(np.asarray(bf.node_memory_ts),
                                  np.asarray(f32.node_memory_ts))
    np.testing.assert_allclose(np.asarray(bf.mailbox, np.float32),
                               np.asarray(f32.mailbox),
                               rtol=1e-2, atol=1e-2)
    np.testing.assert_array_equal(np.asarray(bf.mailbox_ts),
                                  np.asarray(f32.mailbox_ts))
    np.testing.assert_array_equal(np.asarray(bf.mailbox_ptr),
                                  np.asarray(f32.mailbox_ptr))

    # prepare_input decodes the same values (bf16 for mem/mail)
    mfg = make_mfg(4, 3, seed=7)
    mi_f, mi_b = (memory_lib.prepare_input(s, mfg) for s in (f32, bf))
    np.testing.assert_array_equal(np.asarray(mi_b["mem_ts"]),
                                  np.asarray(mi_f["mem_ts"]))
    np.testing.assert_allclose(np.asarray(mi_b["mem"], np.float32),
                               np.asarray(mi_f["mem"]),
                               rtol=1e-2, atol=1e-2)

    # backup/restore roundtrips the packed layout exactly
    restored = memory_lib.restore_memory(memory_lib.backup_memory(bf))
    assert restored.storage == "bfloat16"
    np.testing.assert_array_equal(np.asarray(restored.data),
                                  np.asarray(bf.data))


def _sample_mfgs(num_layers=1, num_snapshots=1, B=6, F=3):
    mfgs = []
    roots = B
    for l in range(num_layers):
        layer = [make_mfg(roots, F, seed=l * 10 + s)
                 for s in range(num_snapshots)]
        mfgs.append(layer)
        roots = roots * (1 + F)
    mfgs.reverse()
    return mfgs


@pytest.mark.parametrize("cfg", [
    dict(num_layers=1, num_snapshots=1, use_memory=True, dim_memory=8,
         dim_node=0, dim_edge=4, dim_time=8),               # TGN-like
    dict(num_layers=2, num_snapshots=1, use_memory=False,
         dim_node=0, dim_edge=4, dim_time=8),               # TGAT-like
    dict(num_layers=2, num_snapshots=3, use_memory=False,
         dim_node=0, dim_edge=4, dim_time=0),               # DySAT-like
    dict(num_layers=1, num_snapshots=1, use_memory=True, dim_memory=8,
         dim_node=0, dim_edge=4, dim_time=8,
         memory_updater="transformer"),                     # APAN-like
])
def test_dgnn_forward(cfg):
    B, F = 6, 3
    model = DGNN(dim_embed=8, att_head=2, dropout=0.1, att_dropout=0.1,
                 **cfg)
    mfgs = _sample_mfgs(cfg["num_layers"], cfg["num_snapshots"], B, F)
    nfs = [None] * cfg["num_snapshots"]
    efs = [[jnp.ones((m.num_dst, F, 4)) for m in layer] for layer in mfgs]
    mem_input = None
    if cfg["use_memory"]:
        mem = memory_lib.init_memory(20, cfg["dim_memory"], 4)
        mem_input = memory_lib.prepare_input(mem, mfgs[0][0])
    params = model.init({"params": jax.random.PRNGKey(0),
                         "dropout": jax.random.PRNGKey(1)},
                        mfgs, nfs, efs, mem_input, train=True)
    pos, neg, last = model.apply(params, mfgs, nfs, efs, mem_input)
    assert pos.shape == (B // 3, 1) and neg.shape == (B // 3, 1)
    assert np.isfinite(np.asarray(pos)).all()
    if cfg["use_memory"]:
        assert last is not None
        assert last["last_updated_nid"].shape == (B,)


def test_dgnn_remat_attention_matches_baseline():
    """``remat_attention=True`` (jax.checkpoint around the attention
    layers) is a pure backward-memory/schedule change: outputs, loss and
    gradients must be bit-identical to the non-remat model, including
    under dropout (same rng streams)."""
    B, F = 6, 3
    cfg = dict(num_layers=2, num_snapshots=1, use_memory=False,
               dim_node=0, dim_edge=4, dim_time=8)
    mfgs = _sample_mfgs(cfg["num_layers"], cfg["num_snapshots"], B, F)
    nfs = [None]
    efs = [[jnp.ones((m.num_dst, F, 4)) for m in layer] for layer in mfgs]
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1)}

    def build(remat):
        model = DGNN(dim_embed=8, att_head=2, dropout=0.1,
                     att_dropout=0.1, remat_attention=remat, **cfg)
        params = model.init(rngs, mfgs, nfs, efs, None, train=True)

        def loss_fn(p):
            pos, neg, _ = model.apply(
                p, mfgs, nfs, efs, None, train=True,
                rngs={"dropout": jax.random.PRNGKey(2)})
            return jnp.sum(pos ** 2) + jnp.sum(neg ** 2)

        return params, jax.jit(jax.value_and_grad(loss_fn))(params)

    p0, (l0, g0) = build(False)
    p1, (l1, g1) = build(True)
    # remat must not change the parameter tree (checkpoint compatible)
    assert jax.tree_util.tree_structure(p0) == \
        jax.tree_util.tree_structure(p1)
    assert float(l0) == float(l1)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)), g0, g1)


def test_multislot_mailbox_circular_write():
    """APAN circular mailbox: consecutive batches fill successive slots,
    wrapping at S."""
    S = 3
    state = memory_lib.init_memory(8, 2, 0, mailbox_slots=S)
    for step in range(4):
        # batch: src=[1], dst=[2], neg=[3]
        nid = jnp.array([1, 2, 3])
        mem = jnp.full((3, 2), float(step + 1))
        ts = jnp.full((3,), float(step))
        state = memory_lib.update_mem_mail(state, nid, mem, ts)
    mail = np.asarray(state.mailbox)        # [8, 3, 4]
    ptr = np.asarray(state.mailbox_ptr)
    assert ptr[1] == 4 and ptr[2] == 4 and ptr[0] == 0
    # slots hold mails from steps (in write order 0,1,2 then wrap 3->slot 0)
    # node 1's slot 0 was overwritten by step 3 (mem value 4.0)
    np.testing.assert_allclose(mail[1, 0, 0], 4.0)
    np.testing.assert_allclose(mail[1, 1, 0], 2.0)
    np.testing.assert_allclose(mail[1, 2, 0], 3.0)
    mts = np.asarray(state.mailbox_ts)
    np.testing.assert_allclose(mts[1], [3.0, 1.0, 2.0])


def test_apan_multislot_forward():
    B, F = 6, 3
    model = DGNN(dim_node=0, dim_edge=4, dim_time=8, dim_embed=8,
                 att_head=2, dropout=0.0, att_dropout=0.0,
                 num_layers=1, num_snapshots=1, use_memory=True,
                 dim_memory=8, memory_updater="transformer",
                 mailbox_slots=5)
    mfgs = _sample_mfgs(1, 1, B, F)
    efs = [[jnp.ones((m.num_dst, F, 4)) for m in layer] for layer in mfgs]
    mem = memory_lib.init_memory(20, 8, 4, mailbox_slots=5)
    mi = memory_lib.prepare_input(mem, mfgs[0][0])
    assert mi["mail"].shape == (mfgs[0][0].num_all, 5, 20)
    params = model.init({"params": jax.random.PRNGKey(0),
                         "dropout": jax.random.PRNGKey(1)},
                        mfgs, [None], efs, mi, train=True)
    pos, neg, last = model.apply(params, mfgs, [None], efs, mi)
    assert np.isfinite(np.asarray(pos)).all()
    mem2 = memory_lib.update_mem_mail(
        mem, last["last_updated_nid"], last["last_updated_memory"],
        last["last_updated_ts"], edge_feats=jnp.ones((B // 3, 4)))
    assert np.asarray(mem2.mailbox_ptr).max() == 1
