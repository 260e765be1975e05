"""Resize parity tests against torch F.interpolate."""

import jax.numpy as jnp
import numpy as np
import pytest

from geo_deep_learning_tpu.ops.resize import resize


@pytest.fixture
def img():
    rng = np.random.default_rng(0)
    return rng.normal(size=(2, 13, 17, 3)).astype(np.float32)


def _torch_resize(x_nhwc, size, mode, align_corners=None):
    torch = pytest.importorskip("torch")
    t = torch.tensor(x_nhwc).permute(0, 3, 1, 2)
    kwargs = {} if mode == "nearest" else {"align_corners": align_corners}
    out = torch.nn.functional.interpolate(t, size=size, mode=mode, **kwargs)
    return out.permute(0, 2, 3, 1).numpy()


def test_bilinear_half_pixel_matches_torch(img):
    expected = _torch_resize(img, (32, 8), "bilinear", align_corners=False)
    got = resize(jnp.asarray(img), size=(32, 8), method="bilinear")
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-5)


def test_bilinear_align_corners_matches_torch(img):
    expected = _torch_resize(img, (27, 5), "bilinear", align_corners=True)
    got = resize(jnp.asarray(img), size=(27, 5), method="bilinear", align_corners=True)
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-5)


def test_nearest_matches_torch(img):
    expected = _torch_resize(img, (7, 9), "nearest")
    got = resize(jnp.asarray(img), size=(7, 9), method="nearest")
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-6)


def test_scale_factor_and_unbatched():
    x = jnp.ones((8, 8, 2))
    out = resize(x, scale_factor=2.0)
    assert out.shape == (16, 16, 2)
    with pytest.raises(ValueError):
        resize(x)
