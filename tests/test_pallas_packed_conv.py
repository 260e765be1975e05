"""ops/pallas/packed_conv: W-packed conv + fused BN-stats kernel.

Interpreter-mode correctness at tiny shapes (conftest forces the CPU
mesh): the kernel must match (a) the same-math XLA reference on packed
tensors and (b) the plain UNPACKED lax conv after unpacking — i.e. the
block-kernel packing is exact, including SAME-padding edges.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import geo_deep_learning_tpu.ops.pallas.packed_conv as pc


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(pc, "_INTERPRET", True)
    monkeypatch.setattr(pc, "_STRIP", 4)
    jax.clear_caches()
    yield
    jax.clear_caches()


def _data(b=2, h=8, w=8, c=64, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(b, h, w, c)).astype(np.float32)
    k = (rng.normal(size=(3, 3, c, c)) * 0.1).astype(np.float32)
    scale = rng.uniform(0.5, 1.5, 2 * c).astype(np.float32)
    shift = (rng.normal(size=2 * c) * 0.2).astype(np.float32)
    return x, k, scale, shift


def test_matches_packed_reference_and_unpacked_conv():
    x, k, scale, shift = _data()
    xp = pc.pack_nhwc(jnp.asarray(x))
    kp = pc.pack_w_kernel(jnp.asarray(k))
    y, stats = pc.packed_conv_bn_stats(
        xp, kp, jnp.asarray(scale), jnp.asarray(shift)
    )
    yr, statsr = pc.reference_packed_conv_bn_stats(
        xp, kp, jnp.asarray(scale), jnp.asarray(shift)
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(yr), atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(stats), np.asarray(statsr), rtol=1e-4, atol=1e-2
    )
    # vs plain unpacked conv on BN+ReLU'd input (packed prologue applies
    # per-slot affine == per-channel affine after unpacking)
    b, h, w, c = x.shape
    xin = np.maximum(
        x.reshape(b, h, w // 2, 2 * c) * scale + shift, 0.0
    ).reshape(b, h, w, c)
    yu = jax.lax.conv_general_dilated(
        jnp.asarray(xin),
        jnp.asarray(k),
        (1, 1),
        "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(
        np.asarray(pc.unpack_nhwc(y)), np.asarray(yu), atol=1e-3
    )


def test_no_prologue_leg_and_stats_slot_combination():
    x, k, _, _ = _data(seed=3)
    xp = pc.pack_nhwc(jnp.asarray(x))
    kp = pc.pack_w_kernel(jnp.asarray(k))
    ident = jnp.ones((128,), jnp.float32)
    zero = jnp.zeros((128,), jnp.float32)
    y, stats = pc.packed_conv_bn_stats(
        xp, kp, ident, zero, apply_bn_relu=False
    )
    yu = jax.lax.conv_general_dilated(
        jnp.asarray(x),
        jnp.asarray(k),
        (1, 1),
        "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    yun = np.asarray(pc.unpack_nhwc(y))
    np.testing.assert_allclose(yun, np.asarray(yu), atol=1e-3)
    # slot-combined stats == true per-channel sums of the unpacked output
    c = x.shape[-1]
    s = np.asarray(stats[0, :c] + stats[0, c:])
    sq = np.asarray(stats[1, :c] + stats[1, c:])
    np.testing.assert_allclose(s, yun.sum(axis=(0, 1, 2)), rtol=1e-4, atol=1e-2)
    np.testing.assert_allclose(
        sq, (yun * yun).sum(axis=(0, 1, 2)), rtol=1e-4, atol=1e-2
    )
