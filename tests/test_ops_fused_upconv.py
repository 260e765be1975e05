"""Exactness of the fused up4+conv3x3 composite (ops/fused_upconv.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geo_deep_learning_tpu.ops.fused_upconv import up4_conv3x3
from geo_deep_learning_tpu.ops.resize import resize


def _baseline(x, kernel, bias=None):
    xu = resize(x, scale_factor=4.0, method="bilinear")
    y = jax.lax.conv_general_dilated(
        xu, kernel, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    return y if bias is None else y + bias


@pytest.mark.parametrize("grouped", [True, False])
@pytest.mark.parametrize("hw", [(5, 5), (9, 7), (36, 36)])
def test_matches_resize_then_conv(hw, grouped):
    h, w = hw
    kx, kk, kb = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(kx, (2, h, w, 6), jnp.float32)
    kernel = jax.random.normal(kk, (3, 3, 6, 4), jnp.float32)
    bias = jax.random.normal(kb, (4,), jnp.float32)
    ref = np.asarray(jax.jit(_baseline)(x, kernel, bias))
    got = np.asarray(
        jax.jit(lambda *a: up4_conv3x3(*a, grouped=grouped))(x, kernel, bias)
    )
    assert got.shape == (2, 4 * h, 4 * w, 4)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_gradients_match():
    kx, kk = jax.random.split(jax.random.PRNGKey(1))
    x = jax.random.normal(kx, (1, 7, 9, 3), jnp.float32)
    kernel = jax.random.normal(kk, (3, 3, 3, 2), jnp.float32)

    def loss(f):
        return lambda x, k: (f(x, k) ** 2).sum()

    gb = jax.grad(loss(lambda x, k: _baseline(x, k)), argnums=(0, 1))(x, kernel)
    gf = jax.grad(loss(lambda x, k: up4_conv3x3(x, k)), argnums=(0, 1))(x, kernel)
    for b, f in zip(gb, gf):
        np.testing.assert_allclose(np.asarray(f), np.asarray(b), rtol=1e-3, atol=1e-3)


def test_neck_fused_matches_unfused():
    """Same params, fused on/off → same outputs (all scales incl. 4)."""
    from geo_deep_learning_tpu.models.necks.multilevel import MultiLevelNeck

    inputs = [
        jax.random.normal(jax.random.PRNGKey(i), (1, 9, 9, 16), jnp.float32)
        for i in range(4)
    ]
    for use_norm_act in (False, True):
        def mk(fuse):
            return MultiLevelNeck(
                out_channels=[8, 8, 8, 8],
                scales=(4, 2, 1, 0.5),
                use_norm_act=use_norm_act,
                fuse_scale4=fuse,
            )

        fused, unfused = mk(True), mk(False)
        variables = fused.init(jax.random.PRNGKey(42), inputs)
        ref = unfused.apply(variables, inputs)
        got = fused.apply(variables, inputs)
        assert jax.tree_util.tree_structure(
            fused.init(jax.random.PRNGKey(7), inputs)
        ) == jax.tree_util.tree_structure(unfused.init(jax.random.PRNGKey(7), inputs))
        for a, b in zip(got, ref):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
            )


def _baseline_resize_conv(x, kernel, bias, out_hw, align_corners):
    xu = resize(x, size=out_hw, method="bilinear", align_corners=align_corners)
    y = jax.lax.conv_general_dilated(
        xu, kernel, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    return y if bias is None else y + bias


@pytest.mark.parametrize("align_corners", [False, True])
@pytest.mark.parametrize(
    "hw,out_hw",
    [
        ((9, 9), (36, 36)),   # 4x (DOFA neck scale-4)
        ((9, 11), (18, 22)),  # 2x non-square
        ((3, 3), (24, 24)),   # 8x (UperNet deepest level)
        ((5, 7), (40, 56)),   # 8x non-square
        ((7, 7), (7, 7)),     # ratio 1 degenerates to a plain conv
        ((6, 5), (9, 10)),    # non-integer ratio still exact
    ],
)
def test_factored_matches_resize_then_conv(hw, out_hw, align_corners):
    from geo_deep_learning_tpu.ops.fused_upconv import resize_conv3x3_factored

    h, w = hw
    kx, kk, kb = jax.random.split(jax.random.PRNGKey(3), 3)
    x = jax.random.normal(kx, (2, h, w, 6), jnp.float32)
    kernel = jax.random.normal(kk, (3, 3, 6, 4), jnp.float32)
    bias = jax.random.normal(kb, (4,), jnp.float32)
    ref = np.asarray(
        jax.jit(
            lambda *a: _baseline_resize_conv(*a, out_hw, align_corners)
        )(x, kernel, bias)
    )
    got = np.asarray(
        jax.jit(
            lambda *a: resize_conv3x3_factored(*a, out_hw, align_corners)
        )(x, kernel, bias)
    )
    assert got.shape == (2, *out_hw, 4)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_factored_gradients_match():
    from geo_deep_learning_tpu.ops.fused_upconv import resize_conv3x3_factored

    kx, kk = jax.random.split(jax.random.PRNGKey(4))
    x = jax.random.normal(kx, (1, 7, 9, 3), jnp.float32)
    kernel = jax.random.normal(kk, (3, 3, 3, 2), jnp.float32)
    out_hw = (28, 36)

    def loss(f):
        return lambda x, k: (f(x, k) ** 2).sum()

    gb = jax.grad(
        loss(lambda x, k: _baseline_resize_conv(x, k, None, out_hw, False)),
        argnums=(0, 1),
    )(x, kernel)
    gf = jax.grad(
        loss(lambda x, k: resize_conv3x3_factored(x, k, None, out_hw, False)),
        argnums=(0, 1),
    )(x, kernel)
    for b, f in zip(gb, gf):
        np.testing.assert_allclose(np.asarray(f), np.asarray(b), rtol=1e-3, atol=1e-3)


def test_upernet_fused_bottleneck_matches_unfused():
    """Split-fused fpn_bottleneck: identical param tree and outputs."""
    from geo_deep_learning_tpu.models.decoders.upernet import UperNetDecoder

    inputs = [
        jax.random.normal(jax.random.PRNGKey(i), (2, s, s, 24), jnp.float32)
        for i, s in enumerate((24, 12, 6, 3))
    ]
    kw = dict(pool_scales=(1, 2, 3, 6), channels=16, align_corners=False)
    fused = UperNetDecoder(**kw, fuse_bottleneck=True)
    unfused = UperNetDecoder(**kw, fuse_bottleneck=False)
    v = unfused.init(jax.random.PRNGKey(0), inputs)
    assert jax.tree_util.tree_structure(
        fused.init(jax.random.PRNGKey(0), inputs)
    ) == jax.tree_util.tree_structure(v)
    yf, sf = fused.apply(v, inputs, train=True, mutable=["batch_stats"])
    yu, su = unfused.apply(v, inputs, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(yf), np.asarray(yu), rtol=1e-4, atol=1e-4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
        ),
        sf,
        su,
    )
    np.testing.assert_allclose(
        np.asarray(fused.apply(v, inputs, train=False)),
        np.asarray(unfused.apply(v, inputs, train=False)),
        rtol=1e-4,
        atol=1e-4,
    )
