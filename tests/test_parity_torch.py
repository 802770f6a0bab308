"""Per-layer activation parity against the reference math, re-derived in
torch (BASELINE.json: "Match GNNFlow per-layer activations (allclose)").

The torch side below implements the reference equations
(``/root/reference/gnnflow/models/modules/layers.py`` TGAT attention,
``memory_updater.py`` GRU update) independently over the same dense padded
neighborhoods, with weights copied from the flax modules.  We cannot run
the reference's CUDA/DGL build here, so its math — captured in SURVEY.md
§2.3/§3.4 — is the ground truth being checked.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from gnnflow_tpu.models import memory as memory_lib
from gnnflow_tpu.models.modules import (EdgePredictor,
                                        TemporalAttentionLayer)
from tests.test_models import make_mfg

torch.manual_seed(0)


def _t(x):
    return torch.from_numpy(np.asarray(x, dtype=np.float32))


def _linear(params, x):
    """torch apply of a flax Linear param dict."""
    w = _t(params["kernel"])
    y = x @ w
    if "bias" in params:
        y = y + _t(params["bias"])
    return y


def _time_encode(params, dt):
    w = _t(params["w"])
    b = _t(params["b"])
    return torch.cos(dt[..., None] * w + b)


def torch_attention(params, mfg, h_all, edge_feats, dim_out, num_head):
    """The reference TransfomerAttentionLayer forward (layers.py:89-168)
    on a dense padded neighborhood, in torch."""
    B, Fan = mfg.num_dst, mfg.fanout
    h_dst = _t(h_all[:B])
    h_src = _t(h_all[B:]).reshape(B, Fan, -1)
    ef = _t(edge_feats)
    dts = _t(mfg.nbr_dts)
    mask = torch.from_numpy(np.asarray(mfg.nbr_mask))

    tf = _time_encode(params["TimeEncode_0"], dts)
    ztf = _time_encode(params["TimeEncode_0"], torch.zeros(B))

    Q = _linear(params["w_q"], torch.cat([h_dst, ztf], dim=1))
    KV = _linear(params["w_kv"], torch.cat([h_src, ef, tf], dim=2))
    K, V = KV[..., :dim_out], KV[..., dim_out:]

    H = num_head
    dh = dim_out // H
    Qh = Q.reshape(B, 1, H, dh)
    Kh = K.reshape(B, Fan, H, dh)
    Vh = V.reshape(B, Fan, H, dh)

    att = F.leaky_relu((Qh * Kh).sum(-1), negative_slope=0.2)  # [B,F,H]
    # edge_softmax over valid neighbors (empty rows -> zeros)
    att = att.masked_fill(~mask[..., None], float("-inf"))
    att = torch.softmax(att, dim=1)
    att = torch.nan_to_num(att) * mask[..., None]

    agg = (Vh * att[..., None]).sum(1).reshape(B, dim_out)
    rst = _linear(params["w_out"], torch.cat([agg, h_dst], dim=1))
    rst = F.relu(rst)
    return F.layer_norm(rst, (dim_out,),
                        _t(params["LayerNorm_0"]["scale"]),
                        _t(params["LayerNorm_0"]["bias"]), eps=1e-5)


def test_attention_layer_matches_reference_math():
    B, Fan, dn, de, dt, D, H = 16, 5, 12, 8, 16, 32, 2
    mfg = make_mfg(B, Fan, seed=3)
    rng = np.random.RandomState(0)
    h_all = rng.randn(B * (1 + Fan), dn).astype(np.float32)
    ef = rng.randn(B, Fan, de).astype(np.float32)

    layer = TemporalAttentionLayer(dim_node=dn, dim_edge=de, dim_time=dt,
                                   dim_out=D, num_head=H)
    params = layer.init(jax.random.PRNGKey(1), mfg, jnp.asarray(h_all),
                        jnp.asarray(ef))["params"]
    ours = np.asarray(layer.apply({"params": params}, mfg,
                                  jnp.asarray(h_all), jnp.asarray(ef)))

    theirs = torch_attention(
        jax.tree.map(np.asarray, params), mfg, h_all, ef, D, H).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-5)


def test_gru_updater_matches_torch_grucell():
    """FusedGRUCell must match torch.nn.GRUCell (the reference updater's
    core, memory_updater.py:67) with mapped weights."""
    from gnnflow_tpu.models.modules import FusedGRUCell
    n, din, dh = 32, 20, 8
    rng = np.random.RandomState(0)
    x = rng.randn(n, din).astype(np.float32)
    h = rng.randn(n, dh).astype(np.float32)

    cell = FusedGRUCell(features=dh)
    params = cell.init(jax.random.PRNGKey(0), jnp.asarray(h),
                       jnp.asarray(x))["params"]
    ours = np.asarray(cell.apply({"params": params}, jnp.asarray(h),
                                 jnp.asarray(x)))

    tc = torch.nn.GRUCell(din, dh)
    with torch.no_grad():
        # flax kernel [in, 3H] cols (r|z|n) -> torch weight [3H, in]
        tc.weight_ih.copy_(_t(params["ih"]["kernel"]).T)
        tc.weight_hh.copy_(_t(params["hh"]["kernel"]).T)
        tc.bias_ih.copy_(_t(params["ih"]["bias"]))
        tc.bias_hh.copy_(_t(params["hh"]["bias"]))
        theirs = tc(_t(x), _t(h)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=2e-5, atol=2e-6)


def test_edge_predictor_matches_reference_math():
    """EdgePredictor: out_fc(relu(src_fc(s)+dst_fc(d))) (layers.py:186)."""
    D, B = 16, 6
    rng = np.random.RandomState(0)
    hcat = rng.randn(3 * B, D).astype(np.float32)
    ep = EdgePredictor(D)
    params = ep.init(jax.random.PRNGKey(0), jnp.asarray(hcat))["params"]
    pos, neg = ep.apply({"params": params}, jnp.asarray(hcat))

    s, p, n = np.split(hcat, 3)
    sf = _linear(jax.tree.map(np.asarray, params["src_fc"]), _t(s))
    pf = _linear(jax.tree.map(np.asarray, params["dst_fc"]), _t(p))
    nf = _linear(jax.tree.map(np.asarray, params["dst_fc"]), _t(n))
    outp = jax.tree.map(np.asarray, params["out_fc"])
    tpos = _linear(outp, F.relu(sf + pf)).numpy()
    tneg = _linear(outp, F.relu(sf + nf)).numpy()
    np.testing.assert_allclose(np.asarray(pos), tpos, rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(neg), tneg, rtol=1e-5,
                               atol=1e-6)


def test_memory_update_matches_reference_order():
    """update_mem_mail reproduces the reference's write-back contents
    (memory.py:192-269) computed independently in numpy."""
    dm, de, B = 4, 3, 5
    rng = np.random.RandomState(0)
    state = memory_lib.init_memory(20, dm, de)
    nid = rng.randint(0, 20, 3 * B)
    mem = rng.randn(3 * B, dm).astype(np.float32)
    ts = np.sort(rng.rand(3 * B).astype(np.float32))
    ef = rng.randn(B, de).astype(np.float32)
    new = memory_lib.update_mem_mail(
        state, jnp.asarray(nid), jnp.asarray(mem), jnp.asarray(ts),
        edge_feats=jnp.asarray(ef))

    # independent numpy reference of memory.py:222-269
    src, dst = nid[:B], nid[B:2 * B]
    mem_src, mem_dst = mem[:B], mem[B:2 * B]
    src_mail = np.concatenate([mem_src, mem_dst, ef], 1)
    dst_mail = np.concatenate([mem_dst, mem_src, ef], 1)
    mail = np.stack([src_mail, dst_mail], 1).reshape(2 * B, -1)
    nid2 = np.stack([src, dst], 1).reshape(-1)
    mail_ts = ts[:2 * B]
    exp_mail = np.zeros((20, 2 * dm + de), np.float32)
    exp_mts = np.zeros(20, np.float32)
    for i in range(2 * B):        # later occurrences overwrite: keep-last
        exp_mail[nid2[i]] = mail[i]
        exp_mts[nid2[i]] = mail_ts[i]
    exp_mem = np.zeros((20, dm), np.float32)
    exp_memts = np.zeros(20, np.float32)
    for i in range(2 * B):
        exp_mem[nid[i]] = mem[i]
        exp_memts[nid[i]] = ts[i]
    np.testing.assert_allclose(np.asarray(new.mailbox), exp_mail,
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(new.mailbox_ts), exp_mts,
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(new.node_memory), exp_mem,
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(new.node_memory_ts), exp_memts,
                               rtol=1e-6)
