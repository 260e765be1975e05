"""Winograd F(2x2,3x3) conv: reference math + fused Pallas kernel.

The Pallas kernels run in interpreter mode on CPU (like
tests/test_pallas_mha.py), which validates kernel logic without TPU
hardware. Reference workload: the UNet++ decoder's lane-limited 3x3
convs (reference tasks_with_models/segmentation_unetplus.py:126-131
delegates these to smp/cuDNN).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

import geo_deep_learning_tpu.ops.pallas.winograd as wg
from geo_deep_learning_tpu.ops.winograd import (
    rotate_kernel,
    transform_kernel,
    transform_kernel_grad,
    winograd_conv3x3_ref,
)


def direct(x, k):
    return lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


@pytest.fixture()
def interpret():
    old = wg._INTERPRET
    wg._INTERPRET = True
    yield
    wg._INTERPRET = old


@pytest.mark.parametrize(
    "shape",
    [(2, 8, 8, 5, 7), (1, 16, 12, 3, 4), (2, 32, 32, 16, 8)],
)
def test_reference_matches_direct_conv(shape):
    b, h, w, ci, co = shape
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, h, w, ci)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, ci, co)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(winograd_conv3x3_ref(x, k)),
        np.asarray(direct(x, k)),
        atol=1e-4,
    )


def test_transform_kernel_grad_is_vjp():
    rng = np.random.default_rng(1)
    k = jnp.asarray(rng.normal(size=(3, 3, 4, 6)).astype(np.float32))
    du = jnp.asarray(rng.normal(size=(4, 4, 4, 6)).astype(np.float32))
    _, vjp = jax.vjp(transform_kernel, k)
    np.testing.assert_allclose(
        np.asarray(vjp(du)[0]), np.asarray(transform_kernel_grad(du)), atol=1e-5
    )


def test_rotate_kernel_gives_input_gradient():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 3)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 3, 5)).astype(np.float32))
    dy = jnp.asarray(rng.normal(size=(1, 8, 8, 5)).astype(np.float32))
    _, vjp = jax.vjp(lambda x: direct(x, k), x)
    np.testing.assert_allclose(
        np.asarray(vjp(dy)[0]),
        np.asarray(direct(dy, rotate_kernel(k))),
        atol=1e-4,
    )


def test_pallas_forward_matches_direct(interpret):
    rng = np.random.default_rng(3)
    b, h, w, ci, co = 2, 16, 16, 64, 32
    x = jnp.asarray(rng.normal(size=(b, h, w, ci)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, ci, co)).astype(np.float32) * 0.1)
    th = wg.eligible(x.shape, k.shape)
    assert th is not None
    np.testing.assert_allclose(
        np.asarray(wg._winograd_conv(x, k, th)),
        np.asarray(direct(x, k)),
        atol=2e-4,
    )


def test_pallas_gradients_match_autodiff(interpret):
    rng = np.random.default_rng(4)
    b, h, w, ci, co = 2, 16, 16, 64, 32
    x = jnp.asarray(rng.normal(size=(b, h, w, ci)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, ci, co)).astype(np.float32) * 0.1)
    th = wg.eligible(x.shape, k.shape)

    def loss_w(x, k):
        return jnp.sum(jnp.sin(wg._winograd_conv(x, k, th)))

    def loss_d(x, k):
        return jnp.sum(jnp.sin(direct(x, k)))

    gx, gk = jax.grad(loss_w, argnums=(0, 1))(x, k)
    rx, rk = jax.grad(loss_d, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), atol=5e-4)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(rk), atol=5e-3)


def test_eligibility_gates():
    # too-small channel counts fall back to direct conv
    assert wg.eligible((8, 256, 256, 3), (3, 3, 3, 64)) is None
    # odd spatial dims are ineligible
    assert wg.eligible((8, 255, 256, 64), (3, 3, 64, 64)) is None
    # non-3x3 kernels are ineligible
    assert wg.eligible((8, 256, 256, 64), (1, 1, 64, 64)) is None


def test_dispatcher_fallback_matches(interpret):
    # winograd_conv3x3 on an ineligible shape = plain conv
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 3)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 3, 4)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(wg.winograd_conv3x3(x, k)), np.asarray(direct(x, k)), atol=1e-5
    )


def test_conv_module_winograd_param_compat():
    """winograd=True declares the same param tree as winograd=False."""
    from geo_deep_learning_tpu.models.layers import ConvModule

    x = jnp.ones((1, 16, 16, 64), jnp.float32)
    v_plain = ConvModule(features=32).init(jax.random.PRNGKey(0), x)
    v_wino = ConvModule(features=32, winograd=True).init(
        jax.random.PRNGKey(0), x
    )
    assert jax.tree_util.tree_structure(v_plain) == jax.tree_util.tree_structure(
        v_wino
    )
    shapes = lambda v: jax.tree_util.tree_map(lambda a: a.shape, v)
    assert shapes(v_plain) == shapes(v_wino)


def test_quad_helpers_roundtrip():
    from geo_deep_learning_tpu.ops.winograd import (
        pad_and_phase_split,
        quad_in_phases,
        quad_merge,
        quad_split,
    )

    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(2, 8, 10, 3)).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(quad_merge(quad_split(x))), np.asarray(x)
    )
    for a, b in zip(pad_and_phase_split(x), quad_in_phases(quad_split(x))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_quad_conv_matches_direct(interpret):
    from geo_deep_learning_tpu.ops.winograd import quad_merge, quad_split

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 64)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 64, 32)).astype(np.float32) * 0.1)

    def loss_w(x, k):
        yq = wg.winograd_conv3x3_quads(quad_split(x), k)
        return jnp.sum(jnp.sin(quad_merge(yq)))

    def loss_d(x, k):
        return jnp.sum(jnp.sin(direct(x, k)))

    np.testing.assert_allclose(
        np.asarray(quad_merge(wg.winograd_conv3x3_quads(quad_split(x), k))),
        np.asarray(direct(x, k)),
        atol=2e-4,
    )
    gx, gk = jax.grad(loss_w, argnums=(0, 1))(x, k)
    rx, rk = jax.grad(loss_d, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), atol=5e-4)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(rk), atol=5e-3)


def test_quad_column_decoder_matches_baseline():
    """quad_column=True: identical param tree, outputs, and batch stats."""
    from geo_deep_learning_tpu.models.segmentation.unetpp import UnetPlusPlus

    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    m0 = UnetPlusPlus(encoder_name="resnet18", num_classes=2)
    m1 = UnetPlusPlus(encoder_name="resnet18", num_classes=2, quad_column=True)
    vs = m0.init(jax.random.PRNGKey(0), x)
    vs1 = m1.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(vs) == jax.tree_util.tree_structure(vs1)
    np.testing.assert_allclose(
        np.asarray(m0.apply(vs, x).out),
        np.asarray(m1.apply(vs, x).out),
        atol=1e-5,
    )
    o0, u0 = m0.apply(vs, x, train=True, mutable=["batch_stats"])
    o1, u1 = m1.apply(vs, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(
        np.asarray(o0.out), np.asarray(o1.out), atol=1e-4
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(u0), jax.tree_util.tree_leaves(u1)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_multi_part_conv_matches_concat(interpret):
    """v2 kernel: conv over a channel concat given as separate parts."""
    from geo_deep_learning_tpu.ops.winograd import quad_merge, quad_split

    rng = np.random.default_rng(10)
    chs = (48, 16, 32)
    xs = [
        jnp.asarray(rng.normal(size=(2, 16, 16, c)).astype(np.float32))
        for c in chs
    ]
    k = jnp.asarray(
        rng.normal(size=(3, 3, sum(chs), 32)).astype(np.float32) * 0.1
    )

    def direct_cat(xs, k):
        return direct(jnp.concatenate(xs, axis=-1), k)

    def loss_w(xs, k):
        yq = wg.winograd_conv3x3_parts([quad_split(x) for x in xs], k)
        return jnp.sum(jnp.sin(quad_merge(yq)))

    def loss_d(xs, k):
        return jnp.sum(jnp.sin(direct_cat(xs, k)))

    yq = wg.winograd_conv3x3_parts([quad_split(x) for x in xs], k)
    np.testing.assert_allclose(
        np.asarray(quad_merge(yq)), np.asarray(direct_cat(xs, k)), atol=2e-4
    )
    gx, gk = jax.grad(loss_w, argnums=(0, 1))(xs, k)
    rx, rk = jax.grad(loss_d, argnums=(0, 1))(xs, k)
    for a, b in zip(gx, rx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(rk), atol=5e-3)


def test_multi_part_shared_up2_part(interpret):
    """The nearest-up2 part (all four quads identical) is exact."""
    from geo_deep_learning_tpu.ops.winograd import quad_merge, quad_split
    from geo_deep_learning_tpu.ops.resize import resize

    rng = np.random.default_rng(11)
    lo = jnp.asarray(rng.normal(size=(1, 8, 8, 64)).astype(np.float32))
    skip = jnp.asarray(rng.normal(size=(1, 16, 16, 16)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 80, 32)).astype(np.float32) * 0.1)
    up = resize(lo, scale_factor=2.0, method="nearest")
    ref = direct(jnp.concatenate([up, skip], axis=-1), k)
    yq = wg.winograd_conv3x3_parts([(lo, lo, lo, lo), quad_split(skip)], k)
    np.testing.assert_allclose(
        np.asarray(quad_merge(yq)), np.asarray(ref), atol=2e-4
    )


def test_dw_xla_ablation_matches():
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 5)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 5, 7)).astype(np.float32))
    dy = jnp.asarray(rng.normal(size=(2, 8, 8, 7)).astype(np.float32))
    _, vjp = jax.vjp(lambda k: direct(x, k), k)
    np.testing.assert_allclose(
        np.asarray(wg._dw_xla(x, dy)), np.asarray(vjp(dy)[0]), atol=1e-4
    )


def test_unetpp_winograd_variant_runs_cpu():
    """Model builds and runs with winograd=True (falls back on CPU)."""
    from geo_deep_learning_tpu.models.segmentation.unetpp import UnetPlusPlus

    model = UnetPlusPlus(
        encoder_name="resnet18", num_classes=2, winograd=True
    )
    x = jnp.ones((1, 64, 64, 3), jnp.float32)
    vs = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(vs, x)
    assert out.out.shape == (1, 64, 64, 2)
