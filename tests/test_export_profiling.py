"""Export + profiling tests."""

import numpy as np
import pytest

from geo_deep_learning_tpu.inference.export import (
    export_model,
    load_exported,
    make_serving_fn,
)
from geo_deep_learning_tpu.tools.profiling import StepTimer, device_memory_stats


def test_export_roundtrip_with_preprocessing(tmp_path):
    import jax
    import jax.numpy as jnp

    from geo_deep_learning_tpu.models.segmentation.unetpp import UnetPlusPlus

    model = UnetPlusPlus(
        encoder_name="resnet18", num_classes=3, decoder_channels=(8, 8, 8, 8, 8)
    )
    x_raw = np.random.default_rng(0).uniform(0, 255, (2, 32, 32, 3)).astype(np.float32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(x_raw) / 255.0, train=False
    )
    serve = make_serving_fn(
        model.apply, variables, mean=[0.4, 0.4, 0.4], std=[0.2, 0.2, 0.2], num_classes=3
    )
    direct = np.asarray(serve(jnp.asarray(x_raw)))
    np.testing.assert_allclose(direct.sum(-1), 1.0, atol=1e-4)  # softmax

    path = export_model(serve, (2, 32, 32, 3), tmp_path / "model.shlo")
    assert path.stat().st_size > 1000
    loaded = load_exported(path)
    out = np.asarray(loaded(x_raw))
    np.testing.assert_allclose(out, direct, atol=1e-5)
    # batch-polymorphic: different batch size works from the same artifact
    out4 = np.asarray(loaded(np.tile(x_raw, (2, 1, 1, 1))))
    assert out4.shape[0] == 4


def test_export_binary_sigmoid(tmp_path):
    import jax
    import jax.numpy as jnp

    def tiny_model(variables, x, train=False):
        del variables, train
        return x.mean(axis=-1, keepdims=True)

    serve = make_serving_fn(tiny_model, {}, [0.5], [0.25], num_classes=1)
    out = np.asarray(serve(jnp.ones((1, 4, 4, 1)) * 255.0))
    assert np.all((out > 0) & (out < 1))


def test_step_timer_warmup_excluded():
    t = StepTimer(warmup=2)
    for _ in range(5):
        with t.step():
            pass
    s = t.summary(items_per_step=8)
    assert s["steps_timed"] == 3
    assert s["items_per_sec"] > 0


def test_device_memory_stats_shape():
    stats = device_memory_stats()
    assert len(stats) == 8  # fake CPU mesh
    assert all("device" in s for s in stats)


@pytest.mark.slow  # ~40s; export mechanics covered in the quick lane by
# test_export_roundtrip_with_preprocessing (VERDICT r4 #8 budget)
def test_export_dofa_with_wavelengths(tmp_path):
    """DOFA exports with wavelengths baked in (static-λ serving): the whole
    weight-generator subgraph becomes a constant of the artifact."""
    import jax
    import jax.numpy as jnp

    from geo_deep_learning_tpu.models.segmentation.dofa import DOFASegmentation

    model = DOFASegmentation(encoder_name="dofa_base", num_classes=2)
    wv = [0.665, 0.549, 0.481]
    x_raw = np.random.default_rng(1).uniform(0, 255, (1, 56, 56, 3)).astype(np.float32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(x_raw) / 255.0, jnp.asarray(wv), train=False
    )
    serve = make_serving_fn(
        model.apply, variables, mean=[0.4] * 3, std=[0.2] * 3, num_classes=2,
        wavelengths=wv,
    )
    direct = np.asarray(serve(jnp.asarray(x_raw)))
    path = export_model(serve, (1, 56, 56, 3), tmp_path / "dofa.shlo",
                        batch_polymorphic=False)
    out = np.asarray(load_exported(path)(x_raw))
    np.testing.assert_allclose(out, direct, atol=1e-5)
    np.testing.assert_allclose(out.sum(-1), 1.0, atol=1e-4)


def test_baked_embedding_skips_generator():
    """ROADMAP #9: XLA does NOT constant-fold the λ weight generator even
    with λ closed over as a constant (measured: identical fusion counts),
    so static-λ serving pre-bakes the generated conv weights via
    ``bake_dofa_embedding``. The baked graph must (a) produce identical
    outputs and (b) compile to strictly fewer ops."""
    import jax
    import jax.numpy as jnp

    from geo_deep_learning_tpu.inference.export import bake_dofa_embedding
    from geo_deep_learning_tpu.models.segmentation.dofa import DOFASegmentation

    model = DOFASegmentation(encoder_name="dofa_base", num_classes=2)
    wv = jnp.asarray([0.665, 0.549, 0.481], jnp.float32)
    x = np.random.default_rng(0).normal(size=(1, 56, 56, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), wv, train=False)

    baked = bake_dofa_embedding(variables, [0.665, 0.549, 0.481], in_channels=3)
    assert baked[0].shape == (14, 14, 3, 768)

    def serve_static(image):
        return model.apply(variables, image, wv, train=False).out

    def serve_baked(image):
        return model.apply(
            variables, image, train=False,
            baked_embed=tuple(jnp.asarray(b) for b in baked),
        ).out

    ref = np.asarray(serve_static(jnp.asarray(x)))
    got = np.asarray(serve_baked(jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)

    def n_ops(fn, *a) -> int:
        txt = jax.jit(fn).lower(*a).compile().as_text()
        return txt.count("fusion(") + txt.count("custom-call")

    assert n_ops(serve_baked, jnp.asarray(x)) < n_ops(serve_static, jnp.asarray(x))
