"""Pallas fused-attention kernel: correctness vs the jnp reference
(interpret mode on CPU) and gradient equivalence."""
import numpy as np
import jax
import jax.numpy as jnp

from gnnflow_tpu.ops.attention_pallas import (_reference_impl,
                                              neighborhood_attention)


def _inputs(B=70, F=10, H=2, dh=16, seed=0):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(B, H, dh).astype(np.float32))
    k = jnp.asarray(rng.randn(B, F, H, dh).astype(np.float32))
    v = jnp.asarray(rng.randn(B, F, H, dh).astype(np.float32))
    mask = jnp.asarray(rng.rand(B, F) < 0.7)
    # one row fully masked
    mask = mask.at[3].set(False)
    return q, k, v, mask


def test_forward_matches_reference():
    q, k, v, mask = _inputs()
    out = neighborhood_attention(q, k, v, mask, True)
    ref, _ = _reference_impl(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
    # fully-masked row aggregates to zero
    np.testing.assert_allclose(np.asarray(out[3]), 0.0, atol=1e-6)


def test_gradients_match_reference():
    q, k, v, mask = _inputs(B=40)

    def loss_pallas(q, k, v):
        return jnp.sum(neighborhood_attention(q, k, v, mask, True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_reference_impl(q, k, v, mask)[0] ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_jit_and_padding():
    # B not a multiple of the block size exercises the pad path
    q, k, v, mask = _inputs(B=300)
    f = jax.jit(lambda q, k, v: neighborhood_attention(q, k, v, mask,
                                                       True))
    out = f(q, k, v)
    ref, _ = _reference_impl(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
