"""Fused LayerNorm kernel logic in pallas interpreter mode (no TPU).

On-chip wins are recorded in BASELINE.md; this file guards the KERNEL
LOGIC — MXU-matvec lane reductions, fori tile loop + ragged edge,
mu/rstd handoff to the backward, per-tile dgamma/dbeta partials — and
the fallback's parity with ``flax.linen.LayerNorm``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

import geo_deep_learning_tpu.ops.pallas.layernorm as lnk


@pytest.fixture(autouse=True)
def interpret_mode():
    old = lnk._INTERPRET
    lnk._INTERPRET = True
    jax.clear_caches()
    yield
    lnk._INTERPRET = old
    jax.clear_caches()


def _rand(shape, key):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


@pytest.mark.parametrize("l", [1297, 512])
def test_forward_matches_flax(l):
    b, d = 2, 256
    x = _rand((b, l, d), 0)
    gamma = 1.0 + 0.1 * _rand((d,), 1)
    beta = 0.1 * _rand((d,), 2)
    got = lnk._layernorm(x, gamma, beta, 1e-6)
    ref = nn.LayerNorm(epsilon=1e-6).apply(
        {"params": {"scale": gamma, "bias": beta}}, x
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_backward_matches_autodiff():
    b, l, d = 1, 300, 128
    x = _rand((b, l, d), 3)
    gamma = 1.0 + 0.1 * _rand((d,), 4)
    beta = 0.1 * _rand((d,), 5)
    g = _rand((b, l, d), 6)

    def loss_kernel(x, gamma, beta):
        return (lnk._layernorm(x, gamma, beta, 1e-6) * g).sum()

    def loss_ref(x, gamma, beta):
        y = nn.LayerNorm(epsilon=1e-6).apply(
            {"params": {"scale": gamma, "bias": beta}}, x
        )
        return (y * g).sum()

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(x, gamma, beta)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, gamma, beta)
    for a, b_ in zip(gk, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=5e-4, rtol=1e-3
        )


def test_residual_variant_matches_composition():
    """s = x + branch; y = LN(s) — forward AND backward, incl. the fused
    gradient fan-in (ds = dbranch = ds_in + LN_dx)."""
    b, l, d = 2, 300, 128
    x = _rand((b, l, d), 10)
    br = _rand((b, l, d), 11)
    gamma = 1.0 + 0.1 * _rand((d,), 12)
    beta = 0.1 * _rand((d,), 13)
    gs = _rand((b, l, d), 14)
    gy = _rand((b, l, d), 15)

    def kernel(x, br, gamma, beta):
        s, y = lnk._layernorm_res(x, br, gamma, beta, 1e-6)
        return (s * gs).sum() + (y * gy).sum()

    def ref(x, br, gamma, beta):
        s = x + br
        y = nn.LayerNorm(epsilon=1e-6).apply(
            {"params": {"scale": gamma, "bias": beta}}, s
        )
        return (s * gs).sum() + (y * gy).sum()

    np.testing.assert_allclose(
        float(kernel(x, br, gamma, beta)), float(ref(x, br, gamma, beta)),
        rtol=1e-5,
    )
    gk = jax.grad(kernel, argnums=(0, 1, 2, 3))(x, br, gamma, beta)
    gr = jax.grad(ref, argnums=(0, 1, 2, 3))(x, br, gamma, beta)
    for a, b_ in zip(gk, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=5e-4, rtol=1e-3
        )


def test_fallback_matches_flax_bf16():
    """The off-TPU fallback (what CPU training/golden tests hit) must
    track flax's bf16 LayerNorm to bf16 resolution."""
    b, l, d = 2, 130, 256
    x = _rand((b, l, d), 7).astype(jnp.bfloat16)
    gamma = 1.0 + 0.1 * _rand((d,), 8)
    beta = 0.1 * _rand((d,), 9)
    got = lnk.fused_layernorm(x, gamma, beta, 1e-6)
    ref = nn.LayerNorm(epsilon=1e-6, dtype=jnp.bfloat16).apply(
        {"params": {"scale": gamma, "bias": beta}}, x
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), atol=2e-2
    )
