"""Augmentation tests: joint image/mask consistency, static shapes, jit."""

import jax
import jax.numpy as jnp
import numpy as np

from geo_deep_learning_tpu.ops import augment


def _case(b=2, h=16, w=16, c=3):
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(size=(b, h, w, c)).astype(np.float32))
    mask = jnp.asarray(rng.integers(0, 3, size=(b, h, w)).astype(np.int32))
    return img, mask


def test_hflip_vflip_exact():
    img, mask = _case()
    fi, fm = augment.hflip(img, mask)
    np.testing.assert_array_equal(np.asarray(fi), np.asarray(img)[:, :, ::-1])
    np.testing.assert_array_equal(np.asarray(fm), np.asarray(mask)[:, :, ::-1])
    fi, fm = augment.vflip(img, mask)
    np.testing.assert_array_equal(np.asarray(fi), np.asarray(img)[:, ::-1])


def test_rot90_matches_numpy():
    img, mask = _case()
    for k in (1, 2, 3):
        ks = jnp.full((2,), k, dtype=jnp.int32)
        ri, rm = augment._rot90_batch(img, mask, ks)
        exp_i = np.stack([np.rot90(np.asarray(img)[i], k) for i in range(2)])
        exp_m = np.stack([np.rot90(np.asarray(mask)[i], k) for i in range(2)])
        np.testing.assert_allclose(np.asarray(ri), exp_i)
        np.testing.assert_array_equal(np.asarray(rm), exp_m)


def test_identity_crop_is_noop():
    img, mask = _case()
    b, h, w = 2, 16, 16
    ri, rm = augment._grid_sample_crop(
        img,
        mask,
        jnp.zeros(b),
        jnp.zeros(b),
        jnp.full((b,), float(h)),
        jnp.full((b,), float(w)),
    )
    np.testing.assert_allclose(np.asarray(ri), np.asarray(img), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(rm), np.asarray(mask))


def test_zoom_out_pads_with_zeros():
    img, mask = _case()
    img = img + 1.0  # strictly positive so padding is detectable
    mask = mask + 1
    b = 2
    # crop box twice the image, centered: half of output samples out of bounds
    ri, rm = augment._grid_sample_crop(
        img,
        mask,
        jnp.full((b,), -8.0),
        jnp.full((b,), -8.0),
        jnp.full((b,), 32.0),
        jnp.full((b,), 32.0),
    )
    assert float(ri[0, 0, 0].sum()) == 0.0  # corner is padding
    assert int(rm[0, 0, 0]) == 0
    assert float(ri[0, 8, 8].sum()) > 0  # center still has content


def test_apply_augmentations_jit_and_shapes():
    img, mask = _case()
    fn = jax.jit(augment.apply_augmentations)
    for seed in range(6):
        oi, om = fn(jax.random.PRNGKey(seed), img, mask)
        assert oi.shape == img.shape and om.shape == mask.shape
        assert om.dtype == mask.dtype
        # mask values stay within original label set (no interpolation of labels)
        assert set(np.unique(np.asarray(om))).issubset({0, 1, 2})


def test_augmentations_preserve_joint_geometry():
    # image encodes pixel coordinates; mask encodes a function of them.
    h = w = 16
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    img = jnp.asarray(
        np.stack([ys, xs], axis=-1)[None].astype(np.float32)
    )  # [1,H,W,2]
    mask = jnp.asarray(((ys + xs) % 3)[None].astype(np.int32))
    for seed in range(8):
        oi, om = augment.apply_augmentations(jax.random.PRNGKey(seed), img, mask)
        # wherever the image was sampled exactly on-grid, mask must agree
        oy = np.asarray(oi[0, ..., 0])
        ox = np.asarray(oi[0, ..., 1])
        om_np = np.asarray(om[0])
        on_grid = (oy == np.round(oy)) & (ox == np.round(ox)) & (oy + ox > 0)
        if on_grid.sum() < 10:  # resampled crop rarely lands on-grid
            continue
        expected = ((oy + ox) % 3).astype(np.int32)
        agree = om_np[on_grid] == expected[on_grid]
        assert agree.mean() > 0.95  # nearest-vs-bilinear edges may differ
