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


@pytest.mark.parametrize("l", [1297, 512])
def test_packed_forward_matches_einsum(l):
    """Token-major packed [B, L, 3D] kernel vs the head-major einsum."""
    b, h, hd = 2, 4, 32  # pair=4 -> one 128-lane group
    d = h * hd
    assert h % mha._pair(hd) == 0
    qkv = _rand((b, l, 3 * d), 7)
    scale = 1.0 / np.sqrt(hd)
    got = mha._attention_packed(qkv, h, scale)
    q, k, v = (
        t.reshape(b, l, h, hd).transpose(0, 2, 1, 3)
        for t in jnp.split(qkv, 3, axis=-1)
    )
    ref = (
        mha._einsum_attention(q, k, v, scale)
        .transpose(0, 2, 1, 3)
        .reshape(b, l, d)
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_packed_backward_matches_autodiff():
    b, h, l, hd = 1, 8, 300, 16  # pair=8 -> one 128-lane group
    d = h * hd
    assert h % mha._pair(hd) == 0
    qkv = _rand((b, l, 3 * d), 11)
    g = _rand((b, l, d), 12)
    scale = 1.0 / np.sqrt(hd)

    def loss_kernel(t):
        return (mha._attention_packed(t, h, scale) * g).sum()

    def loss_ref(t):
        q, k, v = (
            u.reshape(b, l, h, hd).transpose(0, 2, 1, 3)
            for u in jnp.split(t, 3, axis=-1)
        )
        o = mha._einsum_attention(q, k, v, scale)
        return (o.transpose(0, 2, 1, 3).reshape(b, l, d) * g).sum()

    gk = jax.grad(loss_kernel)(qkv)
    gr = jax.grad(loss_ref)(qkv)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gr), atol=5e-4)


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
