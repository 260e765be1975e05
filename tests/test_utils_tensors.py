"""Unit tests for tensor utilities (parity with reference test_utils_tensors)."""

import jax.numpy as jnp
import numpy as np
import pytest

from geo_deep_learning_tpu.utils.tensors import (
    denormalization,
    manage_bands,
    normalization,
    standardization,
)


def test_normalization_range():
    x = jnp.arange(0, 256, dtype=jnp.float32).reshape(16, 16, 1)
    y = normalization(x)
    assert float(y.min()) == 0.0
    assert float(y.max()) == 1.0


def test_normalization_custom_range():
    x = jnp.array([0.0, 127.5, 255.0])
    y = normalization(x, norm_min=-1.0, norm_max=1.0)
    np.testing.assert_allclose(np.asarray(y), [-1.0, 0.0, 1.0], atol=1e-6)


def test_standardization_math():
    x = jnp.ones((2, 4, 4, 3), dtype=jnp.float32)
    mean = jnp.array([1.0, 0.5, 0.0])
    std = jnp.array([1.0, 0.5, 2.0])
    y = standardization(x, mean, std)
    np.testing.assert_allclose(np.asarray(y[0, 0, 0]), [0.0, 1.0, 0.5], atol=1e-6)


def test_standardization_rejects_bad_stats():
    x = jnp.ones((4, 4, 3))
    with pytest.raises(ValueError, match="per-channel"):
        standardization(x, jnp.ones((3, 1)), jnp.ones((3, 1)))


def test_denormalization_roundtrip():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, size=(8, 8, 3)).astype(np.float32)
    mean = jnp.array([0.4, 0.5, 0.6])
    std = jnp.array([0.2, 0.2, 0.2])
    x = standardization(normalization(jnp.asarray(img)), mean, std)
    back = denormalization(x, mean, std)
    np.testing.assert_allclose(np.asarray(back), np.round(img).clip(0, 255), atol=1.0)
    assert back.dtype == jnp.uint8


def test_manage_bands_select():
    x = jnp.stack([jnp.full((4, 4), i, dtype=jnp.float32) for i in range(5)], axis=-1)
    y = manage_bands(x, [4, 0])
    assert y.shape == (4, 4, 2)
    assert float(y[0, 0, 0]) == 4.0
    assert float(y[0, 0, 1]) == 0.0


def test_manage_bands_out_of_range():
    x = jnp.zeros((4, 4, 3))
    with pytest.raises(ValueError, match="out of range"):
        manage_bands(x, [3])


def test_manage_bands_none_passthrough():
    x = jnp.zeros((4, 4, 3))
    assert manage_bands(x, None) is x
