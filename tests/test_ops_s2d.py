"""Space-to-depth conv identities (ops/s2d.py).

These are the exactness contracts behind the packed UNet++ decoder tail
(models/decoders/unetpp.py): same math as the reference composition, only
the MXU-visible layout changes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geo_deep_learning_tpu.ops.resize import resize
from geo_deep_learning_tpu.ops.s2d import (
    depth_to_space,
    pack_conv3x3_kernel,
    pack_up2_conv3x3_kernel,
    space_to_depth,
)


def _conv(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


@pytest.mark.parametrize("hw", [(16, 12), (8, 8)])
def test_packed_conv_matches_plain(hw):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, *hw, 5)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 5, 7)).astype(np.float32))
    ref = _conv(x, k)
    got = depth_to_space(_conv(space_to_depth(x), pack_conv3x3_kernel(k)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("hw", [(9, 7), (8, 8)])
def test_up2_fused_kernel_matches_upsample_then_conv(hw):
    """conv3x3(nearest_up2(x)) == depth_to_space(conv(x, packed_up2_kernel))
    — the 4x-tiled input and the 75%-zero packed kernel never exist."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, *hw, 6)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 6, 4)).astype(np.float32))
    up = resize(x, scale_factor=2.0, method="nearest")
    ref = _conv(up, k)
    got = depth_to_space(_conv(x, pack_up2_conv3x3_kernel(k)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_up2_fused_kernel_gradients_match():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 6, 5, 3)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 3, 2)).astype(np.float32))

    def loss_ref(x, k):
        up = resize(x, scale_factor=2.0, method="nearest")
        return (_conv(up, k) ** 2).sum()

    def loss_fused(x, k):
        return (depth_to_space(_conv(x, pack_up2_conv3x3_kernel(k))) ** 2).sum()

    gr = jax.grad(loss_ref, argnums=(0, 1))(x, k)
    gf = jax.grad(loss_fused, argnums=(0, 1))(x, k)
    for a, b in zip(gr, gf):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-4
        )
