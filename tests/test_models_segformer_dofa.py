"""SegFormer + DOFA assembly tests (shapes, dtypes, grads, dynamic channels)."""

import jax
import jax.numpy as jnp
import numpy as np

from geo_deep_learning_tpu.models.encoders.dofa import DOFAv2, sincos_1d, sincos_2d
from geo_deep_learning_tpu.models.encoders.mix_transformer import (
    MixVisionTransformer,
)
from geo_deep_learning_tpu.models.segmentation.dofa import DOFASegmentation
from geo_deep_learning_tpu.models.segmentation.segformer import SegFormer

WAVELENGTHS_RGB = jnp.array([0.665, 0.549, 0.481])


def test_mit_b0_pyramid():
    m = MixVisionTransformer(variant="mit_b0")
    x = jnp.ones((1, 64, 64, 3))
    vars_ = m.init(jax.random.PRNGKey(0), x, train=False)
    feats = m.apply(vars_, x, train=False)
    assert [f.shape[1] for f in feats] == [16, 8, 4, 2]
    assert [f.shape[-1] for f in feats] == [32, 64, 160, 256]


def test_segformer_forward():
    m = SegFormer(encoder_name="mit_b0", num_classes=5)
    x = jnp.ones((2, 64, 64, 3))
    vars_ = m.init(jax.random.PRNGKey(0), x, train=False)
    out = m.apply(vars_, x, train=False)
    assert out.out.shape == (2, 64, 64, 5)
    assert out.out.dtype == jnp.float32
    assert out.aux is None


def test_segformer_dynamic_encoder_channel_agnostic():
    m = SegFormer(encoder_name="mit_b0", num_classes=2, use_dynamic_encoder=True)
    x6 = jnp.ones((1, 64, 64, 6))
    vars_ = m.init(jax.random.PRNGKey(0), x6, train=False)
    out = m.apply(vars_, x6, train=False)
    assert out.out.shape == (1, 64, 64, 2)
    # same params accept a different channel count (the whole point)
    x4 = jnp.ones((1, 64, 64, 4))
    out4 = m.apply(vars_, x4, train=False)
    assert out4.out.shape == (1, 64, 64, 2)


def test_segformer_train_mode_with_dropout_rngs():
    m = SegFormer(encoder_name="mit_b0", num_classes=3)
    x = jnp.ones((2, 64, 64, 3))
    vars_ = m.init(jax.random.PRNGKey(0), x, train=False)
    out, updates = m.apply(
        vars_,
        x,
        train=True,
        mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    assert out.out.shape == (2, 64, 64, 3)
    assert "batch_stats" in updates


def test_sincos_embeddings():
    e = sincos_1d(128, jnp.array([665.0, 549.0, 481.0]))
    assert e.shape == (3, 128)
    p = sincos_2d(768, 4, 4)
    assert p.shape == (16, 768)
    # distinct positions get distinct embeddings
    assert not np.allclose(p[0], p[5])


def test_dofa_encoder_token_grid():
    """512//14 with padding=1 → 36x36 grid (SURVEY.md note on conv arith)."""
    m = DOFAv2(variant="dofa_base", drop_path_rate=0.0)
    x = jnp.ones((1, 112, 112, 3))  # small multiple: (112+2-14)/14+1 = 8
    vars_ = m.init(jax.random.PRNGKey(0), x, WAVELENGTHS_RGB, train=False)
    feats = m.apply(vars_, x, WAVELENGTHS_RGB, train=False)
    assert len(feats) == 4
    assert all(f.shape == (1, 8, 8, 768) for f in feats)


def test_dofa_wavelength_sensitivity():
    """Different wavelengths → different dynamic kernels → different features."""
    m = DOFAv2(variant="dofa_base", out_indices=(0,), drop_path_rate=0.0)
    x = jnp.ones((1, 56, 56, 3))
    vars_ = m.init(jax.random.PRNGKey(0), x, WAVELENGTHS_RGB, train=False)
    f_rgb = m.apply(vars_, x, WAVELENGTHS_RGB, train=False)[0]
    f_nir = m.apply(vars_, x, jnp.array([0.842, 0.665, 0.549]), train=False)[0]
    assert not np.allclose(np.asarray(f_rgb), np.asarray(f_nir), atol=1e-5)


def test_dofa_batched_wavelengths():
    m = DOFAv2(variant="dofa_base", out_indices=(0,), drop_path_rate=0.0)
    x = jnp.ones((2, 56, 56, 3))
    wv = jnp.tile(WAVELENGTHS_RGB[None], (2, 1))
    vars_ = m.init(jax.random.PRNGKey(0), x, wv, train=False)
    feats = m.apply(vars_, x, wv, train=False)
    assert feats[0].shape == (2, 4, 4, 768)


def test_dofa_segmentation_assembly():
    m = DOFASegmentation(encoder_name="dofa_base", num_classes=5)
    x = jnp.ones((1, 112, 112, 3))
    vars_ = m.init(jax.random.PRNGKey(0), x, WAVELENGTHS_RGB, train=False)
    out = m.apply(vars_, x, WAVELENGTHS_RGB, train=False)
    assert out.out.shape == (1, 112, 112, 5)
    assert out.aux.shape == (1, 112, 112, 5)
    assert out.out.dtype == jnp.float32


def test_remat_matches_non_remat():
    """jax.checkpoint'd blocks must be numerically identical in forward."""
    m0 = SegFormer(encoder_name="mit_b0", num_classes=2)
    m1 = SegFormer(encoder_name="mit_b0", num_classes=2, remat=True)
    x = jnp.ones((1, 64, 64, 3))
    v = m0.init(jax.random.PRNGKey(0), x, train=False)
    o0 = m0.apply(v, x, train=False).out
    o1 = m1.apply(v, x, train=False).out
    np.testing.assert_allclose(np.asarray(o0), np.asarray(o1), atol=1e-5)


def test_dofa_mlp_remat_matches_non_remat():
    """remat_mode='mlp' must keep the exact param tree and forward math.

    The MLP-only remat region (ViTBlock.remat_mlp) rearranges which
    residuals the backward stores; the forward and the variable tree
    must be bit-for-bit the layout of the non-remat model so checkpoints
    and pretrained weights load identically. (Grad equivalence for both
    remat modes is covered by the block-remat path sharing the same
    module math; verified at 1e-9 in the round-4 A/B study, BASELINE.md.)
    """
    m0 = DOFAv2(variant="dofa_base", drop_path_rate=0.0)
    mm = DOFAv2(
        variant="dofa_base", drop_path_rate=0.0, remat=True, remat_mode="mlp"
    )
    x = jnp.ones((1, 28, 28, 3))
    v0 = m0.init(jax.random.PRNGKey(0), x, WAVELENGTHS_RGB, train=False)
    assert jax.tree_util.tree_structure(v0) == jax.tree_util.tree_structure(
        mm.init(jax.random.PRNGKey(0), x, WAVELENGTHS_RGB, train=False)
    )
    f0 = m0.apply(v0, x, WAVELENGTHS_RGB, train=False)
    fm = mm.apply(v0, x, WAVELENGTHS_RGB, train=False)
    for a, b in zip(f0, fm):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_dofa_large_variant():
    from geo_deep_learning_tpu.models.encoders.dofa import create_dofa_large

    m = create_dofa_large(drop_path_rate=0.0)
    assert m.embed_dim == 1024
    x = jnp.ones((1, 56, 56, 3))
    vars_ = m.init(jax.random.PRNGKey(0), x, WAVELENGTHS_RGB, train=False)
    feats = m.apply(vars_, x, WAVELENGTHS_RGB, train=False)
    assert len(feats) == 4  # taps (5, 9, 15, 21)
    assert all(f.shape == (1, 4, 4, 1024) for f in feats)


def test_mit_registry_complete():
    from geo_deep_learning_tpu.models.encoders.mix_transformer import mit_configs

    assert set(mit_configs) == {f"mit_b{i}" for i in range(6)}
    assert mit_configs["mit_b5"].depths == (3, 6, 40, 3)
    assert mit_configs["mit_b0"].embed_dims == (32, 64, 160, 256)
