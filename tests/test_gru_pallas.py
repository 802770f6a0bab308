"""Fused Pallas TimeEncode+GRU kernel vs the XLA cell.

The kernel (ops/gru_pallas.py) must match FusedGRUCell + TimeEncode
(torch.nn.GRUCell math, reference memory_updater.py:43-91) in both the
forward value and the parameter gradients; state inputs (mem/mail/dts)
carry zero cotangents by contract.  CPU runs use interpret mode.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnnflow_tpu.ops.gru_pallas import gru_memory_fused


def _ref(mem, mail, dts, ki, bi, kh, bh, tw, tb):
    """Plain-jnp reference of the fused op (f32)."""
    tf = jnp.cos(dts[:, None] * tw + tb)
    x = jnp.concatenate([mail, tf], axis=1)
    f = mem.shape[1]
    gi = x @ ki + bi
    gh = mem @ kh + bh
    r = jax.nn.sigmoid(gi[:, :f] + gh[:, :f])
    z = jax.nn.sigmoid(gi[:, f:2 * f] + gh[:, f:2 * f])
    n = jnp.tanh(gi[:, 2 * f:] + r * gh[:, 2 * f:])
    return (1.0 - z) * n + z * mem


def _inputs(n=1000, f=100, dr=372, dt=100, seed=0):
    rng = np.random.RandomState(seed)
    mem = jnp.asarray(rng.randn(n, f), jnp.float32) * 0.5
    mail = jnp.asarray(rng.randn(n, dr), jnp.float32) * 0.5
    dts = jnp.asarray(rng.rand(n), jnp.float32) * 100
    ki = jnp.asarray(rng.randn(dr + dt, 3 * f), jnp.float32) * 0.05
    bi = jnp.asarray(rng.randn(3 * f), jnp.float32) * 0.05
    kh = jnp.asarray(rng.randn(f, 3 * f), jnp.float32) * 0.05
    bh = jnp.asarray(rng.randn(3 * f), jnp.float32) * 0.05
    tw = jnp.asarray(1.0 / 10 ** np.linspace(0, 9, dt), jnp.float32)
    tb = jnp.asarray(rng.randn(dt), jnp.float32) * 0.1
    return mem, mail, dts, ki, bi, kh, bh, tw, tb


@pytest.mark.parametrize("n", [512, 1000])  # divisible + ragged last tile
def test_forward_matches_reference(n):
    args = _inputs(n=n)
    got = jax.jit(lambda *a: gru_memory_fused(*a, None, 256, True))(*args)
    want = _ref(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_forward_bf16_close_to_f32():
    args = _inputs(n=700)
    got = jax.jit(
        lambda *a: gru_memory_fused(*a, "bfloat16", 256, True))(*args)
    want = _ref(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0.05, atol=0.05)


def test_param_grads_match_reference():
    args = _inputs(n=900)   # ragged: 900 = 3*256 + 132
    mem, mail, dts = args[:3]
    params = args[3:]

    def loss_fused(p):
        h = gru_memory_fused(mem, mail, dts, *p, None, 256, True)
        return jnp.sum(jnp.sin(h))   # nontrivial cotangent

    def loss_ref(p):
        return jnp.sum(jnp.sin(_ref(mem, mail, dts, *p)))

    g_fused = jax.jit(jax.grad(loss_fused))(params)
    g_ref = jax.jit(jax.grad(loss_ref))(params)
    names = ["ki", "bi", "kh", "bh", "tw", "tb"]
    for name, a, b in zip(names, g_fused, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5,
            err_msg=f"grad mismatch for {name}")


def test_state_inputs_get_zero_cotangent():
    args = _inputs(n=300)

    def loss(mem, mail, dts):
        return jnp.sum(gru_memory_fused(mem, mail, dts, *args[3:],
                                        None, 256, True))

    gm, gx, gd = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(*args[:3])
    assert not np.asarray(gm).any()
    assert not np.asarray(gx).any()
    assert not np.asarray(gd).any()


def test_updater_pallas_matches_xla_end_to_end():
    """GRUMemoryUpdater(impl='pallas') == impl='xla': same params tree,
    same forward, same param grads (through flax)."""
    from gnnflow_tpu.models.memory import GRUMemoryUpdater, init_memory
    from gnnflow_tpu.models.memory import prepare_input
    from gnnflow_tpu.common import MFG

    b, fo, dim_e, dim_m = 64, 5, 44, 32
    rng = np.random.RandomState(1)
    mfg = MFG(
        root_nids=jnp.asarray(rng.randint(0, 200, b), jnp.int32),
        root_ts=jnp.asarray(rng.rand(b) * 50, jnp.float32),
        nbr_nids=jnp.asarray(rng.randint(0, 200, (b, fo)), jnp.int32),
        nbr_ts=jnp.asarray(rng.rand(b, fo) * 50, jnp.float32),
        nbr_dts=jnp.asarray(rng.rand(b, fo), jnp.float32),
        nbr_eids=jnp.zeros((b, fo), jnp.int32),
        nbr_mask=jnp.ones((b, fo), bool))
    state = init_memory(200, dim_m, dim_e)
    state = state.replace(data=jnp.asarray(
        rng.randn(*state.data.shape), jnp.float32) * 0.3)
    mi = prepare_input(state, mfg)

    outs, grads = {}, {}
    for impl in ("xla", "pallas"):
        upd = GRUMemoryUpdater(0, dim_e, 24, 16, dim_m, impl=impl)
        params = upd.init(jax.random.PRNGKey(0), mfg, mi)

        def loss(p):
            h, _ = upd.apply(p, mfg, mi)
            return jnp.sum(h * h)

        outs[impl] = upd.apply(params, mfg, mi)[0]
        grads[impl] = jax.jit(jax.grad(loss))(params)

    np.testing.assert_allclose(np.asarray(outs["xla"]),
                               np.asarray(outs["pallas"]),
                               rtol=2e-5, atol=2e-5)
    flat_x = jax.tree_util.tree_leaves_with_path(grads["xla"])
    flat_p = dict(jax.tree_util.tree_leaves_with_path(grads["pallas"]))
    assert len(flat_x) == len(flat_p)
    for path, leaf in flat_x:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_p[path]),
            rtol=5e-4, atol=1e-5, err_msg=str(path))
