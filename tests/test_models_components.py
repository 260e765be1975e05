"""Shape/numerics tests for model primitives, heads, necks, decoders."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geo_deep_learning_tpu.models.decoders.segformer_mlp import SegFormerMLPDecoder
from geo_deep_learning_tpu.models.decoders.unetpp import UnetPlusPlusDecoder
from geo_deep_learning_tpu.models.decoders.upernet import UperNetDecoder
from geo_deep_learning_tpu.models.heads import FCNHead, SegmentationHead
from geo_deep_learning_tpu.models.layers import adaptive_avg_pool
from geo_deep_learning_tpu.models.necks import MultiLevelNeck


def test_adaptive_avg_pool_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 13, 9, 4)).astype(np.float32)
    for out_size in [(1, 1), (2, 2), (3, 6), (6, 3), (13, 9)]:
        expected = (
            torch.nn.functional.adaptive_avg_pool2d(
                torch.tensor(x).permute(0, 3, 1, 2), out_size
            )
            .permute(0, 2, 3, 1)
            .numpy()
        )
        got = adaptive_avg_pool(jnp.asarray(x), out_size)
        np.testing.assert_allclose(np.asarray(got), expected, atol=1e-5)


def test_segmentation_head_shape():
    m = SegmentationHead(num_classes=5)
    x = jnp.ones((2, 16, 16, 64))
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    assert out.shape == (2, 16, 16, 5)


def test_fcn_head_shape():
    m = FCNHead(channels=32, num_classes=3, num_convs=2)
    x = jnp.ones((2, 8, 8, 64))
    vars_ = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(vars_, x)
    assert out.shape == (2, 8, 8, 3)
    # list input selects in_index
    out2 = m.apply(vars_, [jnp.ones((2, 4, 4, 64)), x])
    assert out2.shape == (2, 8, 8, 3)


def test_multilevel_neck_scales():
    m = MultiLevelNeck(out_channels=[32, 32, 32, 32], scales=[4, 2, 1, 0.5])
    xs = [jnp.ones((1, 16, 16, 96)) for _ in range(4)]
    vars_ = m.init(jax.random.PRNGKey(0), xs)
    outs = m.apply(vars_, xs)
    assert [o.shape[1] for o in outs] == [64, 32, 16, 8]
    assert all(o.shape[-1] == 32 for o in outs)


def test_upernet_decoder_shape():
    m = UperNetDecoder(channels=64, align_corners=False)
    xs = [
        jnp.ones((2, 16, 16, 32)),
        jnp.ones((2, 8, 8, 64)),
        jnp.ones((2, 4, 4, 128)),
        jnp.ones((2, 2, 2, 256)),
    ]
    vars_ = m.init(jax.random.PRNGKey(0), xs, train=False)
    out = m.apply(vars_, xs, train=False)
    assert out.shape == (2, 16, 16, 64)


def test_upernet_scale_modules():
    m = UperNetDecoder(channels=32, scale_modules=True)
    xs = [jnp.ones((1, 8, 8, 64)) for _ in range(4)]  # uniform plain-ViT taps
    vars_ = m.init(jax.random.PRNGKey(0), xs, train=False)
    out = m.apply(vars_, xs, train=False)
    assert out.shape == (1, 32, 32, 32)  # finest level = 4x upsampled taps


def test_segformer_mlp_decoder_shape():
    m = SegFormerMLPDecoder(num_classes=5, embedding_dim=64)
    xs = [
        jnp.ones((2, 32, 32, 32)),
        jnp.ones((2, 16, 16, 64)),
        jnp.ones((2, 8, 8, 160)),
        jnp.ones((2, 4, 4, 256)),
    ]
    vars_ = m.init(jax.random.PRNGKey(0), xs, train=False)
    out = m.apply(vars_, xs, train=False)
    assert out.shape == (2, 32, 32, 5)


def test_unetpp_decoder_shape():
    m = UnetPlusPlusDecoder(decoder_channels=(32, 24, 16, 8, 8))
    feats = [
        jnp.ones((1, 32, 32, 16)),  # stride 2
        jnp.ones((1, 16, 16, 24)),  # stride 4
        jnp.ones((1, 8, 8, 40)),  # stride 8
        jnp.ones((1, 4, 4, 48)),  # stride 16
        jnp.ones((1, 2, 2, 64)),  # stride 32
    ]
    vars_ = m.init(jax.random.PRNGKey(0), feats, train=False)
    out = m.apply(vars_, feats, train=False)
    assert out.shape == (1, 64, 64, 8)  # stride 1


def test_unetpp_decoder_deep_supervision():
    m = UnetPlusPlusDecoder(decoder_channels=(16, 8, 8), deep_supervision=True)
    feats = [
        jnp.ones((1, 16, 16, 8)),
        jnp.ones((1, 8, 8, 16)),
        jnp.ones((1, 4, 4, 24)),
    ]
    vars_ = m.init(jax.random.PRNGKey(0), feats, train=False)
    out, ds = m.apply(vars_, feats, train=False)
    assert out.shape == (1, 32, 32, 8)
    assert len(ds) == 2
    assert all(d.shape[1:3] == (16, 16) for d in ds)


def test_bn_barrier_hook_numerics_identical(monkeypatch):
    """GDL_BN_BARRIER (the stats-decoupling A/B hook, BASELINE.md round 5)
    must be a pure scheduling hint: bit-identical forward + BN stats."""
    import jax

    from geo_deep_learning_tpu.models.layers import ConvModule

    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 8, 8, 4)), jnp.float32
    )
    m = ConvModule(features=8)
    v = m.init(jax.random.PRNGKey(0), x, train=False)

    def run():
        y, upd = m.apply(v, x, train=True, mutable=["batch_stats"])
        return np.asarray(y), jax.tree.map(np.asarray, upd)

    monkeypatch.delenv("GDL_BN_BARRIER", raising=False)
    jax.clear_caches()
    y0, s0 = run()
    monkeypatch.setenv("GDL_BN_BARRIER", "1")
    jax.clear_caches()
    y1, s1 = run()
    np.testing.assert_array_equal(y0, y1)
    for a, b in zip(jax.tree.leaves(s0), jax.tree.leaves(s1)):
        np.testing.assert_array_equal(a, b)
