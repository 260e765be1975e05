"""UNet++ assembly + ResNet encoder tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geo_deep_learning_tpu.models.encoders.resnet import ResNetEncoder
from geo_deep_learning_tpu.models.segmentation.unetpp import UnetPlusPlus


def test_resnet18_pyramid_shapes():
    m = ResNetEncoder(variant="resnet18")
    x = jnp.ones((1, 64, 64, 3))
    vars_ = m.init(jax.random.PRNGKey(0), x, train=False)
    feats = m.apply(vars_, x, train=False)
    assert [f.shape[1] for f in feats] == [32, 16, 8, 4, 2]
    assert [f.shape[-1] for f in feats] == [64, 64, 128, 256, 512]


def test_resnet50_channels():
    m = ResNetEncoder(variant="resnet50")
    x = jnp.ones((1, 32, 32, 3))
    vars_ = m.init(jax.random.PRNGKey(0), x, train=False)
    feats = m.apply(vars_, x, train=False)
    assert [f.shape[-1] for f in feats] == [64, 256, 512, 1024, 2048]


def test_resnet_matches_torchvision_topology():
    """Param-count parity with torchvision resnet18 (conv/bn only)."""
    torch = pytest.importorskip("torch")
    tv = pytest.importorskip("torchvision")
    ref = tv.models.resnet18()
    ref_params = sum(
        p.numel()
        for n, p in ref.named_parameters()
        if not n.startswith("fc")
    )
    m = ResNetEncoder(variant="resnet18")
    vars_ = m.init(jax.random.PRNGKey(0), jnp.ones((1, 32, 32, 3)), train=False)
    ours = sum(x.size for x in jax.tree.leaves(vars_["params"]))
    assert ours == ref_params


def test_unetpp_forward_and_grad():
    m = UnetPlusPlus(
        encoder_name="resnet18", num_classes=3, decoder_channels=(32, 24, 16, 8, 8)
    )
    x = jnp.ones((2, 64, 64, 3))
    vars_ = m.init(jax.random.PRNGKey(0), x, train=False)
    out = m.apply(vars_, x, train=False)
    assert out.out.shape == (2, 64, 64, 3)
    assert out.aux is None
    assert out.out.dtype == jnp.float32

    def loss_fn(params):
        o, _ = m.apply(
            {"params": params, "batch_stats": vars_["batch_stats"]},
            x,
            train=True,
            mutable=["batch_stats"],
        )
        return jnp.mean(o.out**2)

    g = jax.grad(loss_fn)(vars_["params"])
    gnorm = sum(jnp.sum(jnp.abs(v)) for v in jax.tree.leaves(g))
    assert float(gnorm) > 0


def test_unetpp_bf16_compute():
    m = UnetPlusPlus(
        encoder_name="resnet18",
        num_classes=2,
        decoder_channels=(16, 8, 8, 8, 8),
        dtype=jnp.bfloat16,
    )
    x = jnp.ones((1, 32, 32, 3), dtype=jnp.bfloat16)
    vars_ = m.init(jax.random.PRNGKey(0), x, train=False)
    # params stay f32, logits come back f32
    assert all(
        v.dtype == jnp.float32 for v in jax.tree.leaves(vars_["params"])
    )
    out = m.apply(vars_, x, train=False)
    assert out.out.dtype == jnp.float32


def test_unetpp_multispectral_input():
    m = UnetPlusPlus(
        encoder_name="resnet18", num_classes=2, decoder_channels=(16, 8, 8, 8, 8)
    )
    x = jnp.ones((1, 32, 32, 6))  # 6-band imagery
    vars_ = m.init(jax.random.PRNGKey(0), x, train=False)
    out = m.apply(vars_, x, train=False)
    assert out.out.shape == (1, 32, 32, 2)


@pytest.mark.slow  # ~43s A/B; default path covered by forward/grad tests
def test_packed_tail_matches_unpacked():
    """The space-to-depth packed tail (ops/s2d.py) is the SAME math:
    identical param tree, matching logits and batch_stats updates."""
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 64, 64, 3)).astype(np.float32)
    )
    packed = UnetPlusPlus(encoder_name="resnet18", num_classes=3, packed_tail=True)
    plain = UnetPlusPlus(encoder_name="resnet18", num_classes=3, packed_tail=False)
    variables = packed.init(jax.random.PRNGKey(0), x, train=False)
    # identical parameter trees (checkpoints interchangeable)
    v2 = plain.init(jax.random.PRNGKey(0), x, train=False)
    assert jax.tree.structure(variables) == jax.tree.structure(v2)

    out_p = packed.apply(variables, x, train=False)
    out_u = plain.apply(variables, x, train=False)
    np.testing.assert_allclose(
        np.asarray(out_p.out), np.asarray(out_u.out), atol=2e-4, rtol=1e-4
    )

    # train mode: logits AND the mutated batch_stats must match
    op, mp = packed.apply(variables, x, train=True, mutable=["batch_stats"])
    ou, mu = plain.apply(variables, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(
        np.asarray(op.out), np.asarray(ou.out), atol=2e-4, rtol=1e-4
    )
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(mp)[0][0:],
        jax.tree_util.tree_flatten_with_path(mu)[0][0:],
    ):
        assert pa == pb
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5,
            err_msg=str(pa),
        )


@pytest.mark.slow  # ~70s variant-equivalence A/B; quick lane exercises the
# default factored path via the forward/grad tests (VERDICT r4 #8 budget)
def test_up2_factored_matches_naive():
    """The factored up2+skip first conv (UpSkipConv3x3) is the SAME math
    as resize->concat->conv: identical param tree, matching logits,
    batch_stats updates, and parameter gradients."""
    from geo_deep_learning_tpu.models.decoders.unetpp import UnetPlusPlusDecoder

    rng = np.random.default_rng(1)
    feats = [
        jnp.asarray(rng.normal(size=(2, s, s, c)).astype(np.float32))
        for s, c in zip((32, 16, 8, 4, 2), (64, 64, 128, 256, 512))
    ]
    fac = UnetPlusPlusDecoder(up2_factored=True, packed_tail=False)
    # the retained A/B intermediate: factored per-node UpSkipConvModule
    # execution WITHOUT the merged-source kernel concat (advisor r3 #1)
    unmerged = UnetPlusPlusDecoder(
        up2_factored=True, merged_skips=False, packed_tail=False
    )
    naive = UnetPlusPlusDecoder(up2_factored=False, packed_tail=False)
    variables = fac.init(jax.random.PRNGKey(0), feats, train=False)
    v2 = naive.init(jax.random.PRNGKey(0), feats, train=False)
    v3 = unmerged.init(jax.random.PRNGKey(0), feats, train=False)
    assert jax.tree.structure(variables) == jax.tree.structure(v2)
    assert jax.tree.structure(variables) == jax.tree.structure(v3)

    out_f = fac.apply(variables, feats, train=False)
    out_n = naive.apply(variables, feats, train=False)
    out_u = unmerged.apply(variables, feats, train=False)
    np.testing.assert_allclose(
        np.asarray(out_f), np.asarray(out_n), atol=2e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out_u), np.asarray(out_n), atol=2e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out_u), np.asarray(out_f), atol=2e-4, rtol=1e-4
    )

    def loss(params, mod):
        out, mut = mod.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            feats, train=True, mutable=["batch_stats"],
        )
        return jnp.mean(out * out), mut

    (lf, mf), gf = jax.value_and_grad(loss, has_aux=True)(
        variables["params"], fac
    )
    (ln, mn), gn = jax.value_and_grad(loss, has_aux=True)(
        variables["params"], naive
    )
    (lu, mu_), gu = jax.value_and_grad(loss, has_aux=True)(
        variables["params"], unmerged
    )
    np.testing.assert_allclose(float(lf), float(ln), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(float(lu), float(ln), atol=1e-5, rtol=1e-5)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path((gu, mu_))[0],
        jax.tree_util.tree_flatten_with_path((gn, mn))[0],
    ):
        assert pa == pb
        # factored-vs-naive grad comparisons share the fac-leg tolerance:
        # the up/skip split reassociates f32 sums (measured ~4e-5 abs on
        # 1e-3-scale grads with the torch-default kaiming init)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-4,
            err_msg=str(pa),
        )
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path((gf, mf))[0],
        jax.tree_util.tree_flatten_with_path((gn, mn))[0],
    ):
        assert pa == pb
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-4,
            err_msg=str(pa),
        )


@pytest.mark.slow  # ~55s A/B of the off-by-default W-packed column
def test_wpacked_column_matches_unpacked():
    """The W-packed (1x2) finest dense column is the SAME math as the
    plain merged grid: identical param tree, matching logits, batch_stats
    updates, and parameter gradients (f32 reassociation tolerance — the
    slot-partitioned BN statistics regroup the same sums)."""
    from geo_deep_learning_tpu.models.decoders.unetpp import UnetPlusPlusDecoder

    rng = np.random.default_rng(3)
    feats = [
        jnp.asarray(rng.normal(size=(2, s, s, c)).astype(np.float32))
        for s, c in zip((32, 16, 8, 4, 2), (64, 64, 128, 256, 512))
    ]
    wpk = UnetPlusPlusDecoder(packed_tail=False, wpacked_column=True)
    plain = UnetPlusPlusDecoder(packed_tail=False, wpacked_column=False)
    variables = wpk.init(jax.random.PRNGKey(0), feats, train=False)
    v2 = plain.init(jax.random.PRNGKey(0), feats, train=False)
    assert jax.tree.structure(variables) == jax.tree.structure(v2)

    out_w = wpk.apply(variables, feats, train=False)
    out_p = plain.apply(variables, feats, train=False)
    np.testing.assert_allclose(
        np.asarray(out_w), np.asarray(out_p), atol=2e-4, rtol=1e-4
    )

    def loss(params, mod):
        out, mut = mod.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            feats, train=True, mutable=["batch_stats"],
        )
        return jnp.mean(out * out), mut

    (lw, mw), gw = jax.value_and_grad(loss, has_aux=True)(
        variables["params"], wpk
    )
    (lp, mp), gp = jax.value_and_grad(loss, has_aux=True)(
        variables["params"], plain
    )
    np.testing.assert_allclose(float(lw), float(lp), atol=1e-5, rtol=1e-5)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path((gw, mw))[0],
        jax.tree_util.tree_flatten_with_path((gp, mp))[0],
    ):
        assert pa == pb
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-4,
            err_msg=str(pa),
        )
