"""SR-attention kernel: einsum parity (fallback path on CPU) + gradients."""

import jax
import jax.numpy as jnp
import numpy as np

from geo_deep_learning_tpu.ops.pallas.sr_attention import (
    _attention_bwd,
    _einsum_attention,
    sr_attention,
)


def _case(b=2, h=2, lq=1024, lk=64, d=32, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(b, h, lq, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, lk, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, lk, d)).astype(np.float32))
    return q, k, v


def test_fallback_matches_reference_softmax():
    q, k, v = _case()
    out = sr_attention(q, k, v, scale=0.125)
    # reference computation
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * 0.125
    expected = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(s, -1), v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=1e-5)


def test_custom_bwd_matches_autodiff():
    """The hand-written backward must equal autodiff through the einsums."""
    q, k, v = _case(b=1, h=1, lq=64, lk=16, d=8)
    scale = 0.3

    def ref_loss(q, k, v):
        return jnp.sum(_einsum_attention(q, k, v, scale) ** 2)

    gq, gk, gv = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    out = _einsum_attention(q, k, v, scale)
    g = 2 * out  # d(sum out²)/d out
    dq, dk, dv = _attention_bwd(scale, (q, k, v), g)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(gq), atol=1e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(gk), atol=1e-4)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(gv), atol=1e-4)


def test_mit_block_still_differentiable():
    from geo_deep_learning_tpu.models.encoders.mix_transformer import MiTBlock

    m = MiTBlock(num_heads=1, sr_ratio=2, drop_path=0.0)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(1, 8, 8, 32)).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    g = jax.grad(lambda p: jnp.sum(m.apply({"params": p}, x, train=False) ** 2))(
        v["params"]
    )
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(g))
