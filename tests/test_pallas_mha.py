"""Fused MHA kernel logic in pallas interpreter mode (no TPU needed).

On-chip validation lives in BASELINE.md (1.7x vs einsum at DOFA shapes);
this file guards the KERNEL LOGIC — single-block softmax, padded-column
masking, lse-based backward recompute — against regressions on the CPU
mesh via ``interpret=True``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import geo_deep_learning_tpu.ops.pallas.mha as mha


@pytest.fixture(autouse=True)
def interpret_mode():
    old = mha._INTERPRET
    mha._INTERPRET = True
    jax.clear_caches()  # _fwd/_bwd are jitted; flush traces of the real mode
    yield
    mha._INTERPRET = old
    jax.clear_caches()


def _rand(shape, key, dtype=jnp.float32):
    return jax.random.normal(jax.random.PRNGKey(key), shape, dtype)


@pytest.mark.parametrize("l", [1297, 512])
def test_forward_matches_einsum(l):
    b, h, d = 2, 2, 32
    q, k, v = (_rand((b, h, l, d), i) for i in range(3))
    scale = 1.0 / np.sqrt(d)
    lp = mha._pad_len(l)
    pad = lambda x: jnp.pad(x, ((0, 0), (0, 0), (0, lp - l), (0, 0)))
    got = mha._attention(pad(q), pad(k), pad(v), scale, l)[:, :, :l]
    ref = mha._einsum_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_backward_matches_autodiff():
    b, h, l, d = 1, 2, 300, 16
    q, k, v, g = (_rand((b, h, l, d), i) for i in range(4))
    scale = 1.0 / np.sqrt(d)
    lp = mha._pad_len(l)
    pad = lambda x: jnp.pad(x, ((0, 0), (0, 0), (0, lp - l), (0, 0)))

    def loss_kernel(q, k, v):
        out = mha._attention(pad(q), pad(k), pad(v), scale, l)[:, :, :l]
        return (out * g).sum()

    def loss_ref(q, k, v):
        return (mha._einsum_attention(q, k, v, scale) * g).sum()

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-4)


def test_padded_columns_receive_zero_gradient():
    """Gradients flowing to the PAD region of k/v must be exactly zero —
    the masking keeps padded keys out of the softmax entirely."""
    b, h, l, d = 1, 1, 130, 16
    q, k, v = (_rand((b, h, l, d), i) for i in range(3))
    scale = 1.0 / np.sqrt(d)
    lp = mha._pad_len(l)
    pad = lambda x: jnp.pad(x, ((0, 0), (0, 0), (0, lp - l), (0, 0)))

    def loss(kp, vp):
        out = mha._attention(pad(q), kp, vp, scale, l)[:, :, :l]
        return (out**2).sum()

    dk, dv = jax.grad(loss, argnums=(0, 1))(pad(k), pad(v))
    assert np.abs(np.asarray(dk)[:, :, l:]).max() == 0.0
    assert np.abs(np.asarray(dv)[:, :, l:]).max() == 0.0
