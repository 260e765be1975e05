"""On-device joint image/mask augmentation.

TPU-native replacement for the reference's Kornia pipeline
(reference tasks_with_models/segmentation_dofa.py:91-121: an
``AugmentationSequential(random_apply=1)`` over HFlip, VFlip, RandomRotation90,
and two RandomResizedCrops — zoom-in scale (1.0, 2.0) and zoom-out (0.5, 1.0),
each with p=0.5 and per-sample parameters).

Design notes (why this is not a port):

- Runs INSIDE the jitted train step on device, keyed by ``jax.random`` —
  the reference runs Kornia on host CPU tensors before transfer
  (``on_before_batch_transfer``), serializing augmentation with compute.
- All shapes are static: resized crops are expressed as coordinate-grid
  resampling (bilinear for images, nearest for masks, zero padding
  outside the source), never as dynamic slicing — XLA requires static
  shapes and this formulation also gives zoom-out padding for free.
- ``random_apply=1`` maps to a batch-level ``lax.switch`` so only the
  selected transform executes at runtime.

Contract: ``image`` is NHWC float, ``mask`` is ``[B, H, W]`` integer.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp


def _bernoulli_blend(key, aug_img, aug_mask, img, mask, p):
    """Per-sample keep/apply gate (each Kornia aug's own ``p``)."""
    apply = jax.random.bernoulli(key, p, (img.shape[0],))
    img_out = jnp.where(apply[:, None, None, None], aug_img, img)
    mask_out = jnp.where(apply[:, None, None], aug_mask, mask)
    return img_out, mask_out


def hflip(img, mask):
    return img[:, :, ::-1, :], mask[:, :, ::-1]


def vflip(img, mask):
    return img[:, ::-1, :, :], mask[:, ::-1, :]


def _rot90_batch(img, mask, k):
    """Per-sample rot90 by traced ``k`` ∈ {0,1,2,3} (square inputs).

    k=1..3 are compositions of transpose and flips; all four variants are
    computed and selected per sample — pure data movement on the VPU,
    negligible next to the model forward.
    """
    r1_i = jnp.flip(jnp.swapaxes(img, 1, 2), axis=1)  # 90° CCW
    r2_i = img[:, ::-1, ::-1, :]
    r3_i = jnp.flip(jnp.swapaxes(img, 1, 2), axis=2)
    r1_m = jnp.flip(jnp.swapaxes(mask, 1, 2), axis=1)
    r2_m = mask[:, ::-1, ::-1]
    r3_m = jnp.flip(jnp.swapaxes(mask, 1, 2), axis=2)
    sel = k[:, None, None, None]
    img_out = jnp.where(
        sel == 1, r1_i, jnp.where(sel == 2, r2_i, jnp.where(sel == 3, r3_i, img))
    )
    sel_m = k[:, None, None]
    mask_out = jnp.where(
        sel_m == 1, r1_m, jnp.where(sel_m == 2, r2_m, jnp.where(sel_m == 3, r3_m, mask))
    )
    return img_out, mask_out


def _grid_sample_crop(img, mask, y0, x0, crop_h, crop_w):
    """Resample the (possibly out-of-bounds) crop box back to full size.

    ``y0/x0/crop_h/crop_w`` are per-sample floats in pixel units. Bilinear
    for the image, nearest for the mask; out-of-source coordinates produce
    zeros (matches Kornia's zero padding for oversized crops).

    TPU formulation: the sampling grid is separable (row coordinate
    depends only on the output row, column only on the output column), so
    bilinear resampling is two dense matmuls with interpolation matrices
    ``Wy[i, j] = relu(1 - |src_y_i - j|)`` — tent-kernel rows with ≤2
    nonzeros that also encode zero padding. Matmuls run on the MXU;
    the gather-based alternative serializes on TPU.
    """
    b, h, w = img.shape[0], img.shape[1], img.shape[2]
    # target pixel centers mapped into source coordinates
    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h  # [H] in (0,1)
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    src_y = y0[:, None] + ys[None, :] * crop_h[:, None] - 0.5  # [B, H]
    src_x = x0[:, None] + xs[None, :] * crop_w[:, None] - 0.5  # [B, W]

    j_h = jnp.arange(h, dtype=jnp.float32)
    j_w = jnp.arange(w, dtype=jnp.float32)
    # bilinear tent weights [B, out, src]
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(src_y[:, :, None] - j_h[None, None, :]))
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(src_x[:, :, None] - j_w[None, None, :]))
    imgf = img.astype(jnp.float32)
    out = jnp.einsum("bij,bjwc->biwc", wy, imgf)
    out = jnp.einsum("bxw,biwc->bixc", wx, out).astype(img.dtype)

    # nearest for labels: one-hot selection matrices (exact value transport)
    ny = jnp.round(src_y)[:, :, None] == j_h[None, None, :]
    nx = jnp.round(src_x)[:, :, None] == j_w[None, None, :]
    mf = mask.astype(jnp.float32)
    m = jnp.einsum("bij,bjw->biw", ny.astype(jnp.float32), mf)
    m = jnp.einsum("bxw,biw->bix", nx.astype(jnp.float32), m)
    return out, jnp.round(m).astype(mask.dtype)


def random_resized_crop(key, img, mask, scale, ratio=(3.0 / 4.0, 4.0 / 3.0)):
    """Per-sample random resized crop (area ``scale``, aspect ``ratio``).

    Crop boxes larger than the source (scale > 1 — the reference's
    "zoom-out") extend past the borders and produce zero padding; boxes
    smaller than the source sample a uniform in-bounds origin.
    """
    b, h, w = img.shape[0], img.shape[1], img.shape[2]
    k_area, k_ratio, k_y, k_x = jax.random.split(key, 4)
    area = jax.random.uniform(k_area, (b,), minval=scale[0], maxval=scale[1]) * h * w
    log_r = jax.random.uniform(
        k_ratio, (b,), minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1])
    )
    aspect = jnp.exp(log_r)
    crop_w = jnp.sqrt(area * aspect)
    crop_h = jnp.sqrt(area / aspect)
    # origin: uniform over valid range when it fits, centered overhang when not
    max_y = h - crop_h
    max_x = w - crop_w
    u_y = jax.random.uniform(k_y, (b,))
    u_x = jax.random.uniform(k_x, (b,))
    y0 = jnp.where(max_y > 0, u_y * jnp.maximum(max_y, 0), max_y / 2.0)
    x0 = jnp.where(max_x > 0, u_x * jnp.maximum(max_x, 0), max_x / 2.0)
    return _grid_sample_crop(img, mask, y0, x0, crop_h, crop_w)


@dataclass(frozen=True)
class AugmentConfig:
    """Mirrors the reference pipeline's transform list and probabilities."""

    p: float = 0.5  # each transform's own probability
    rot90_times: tuple[int, int] = (1, 3)
    zoom_in_scale: tuple[float, float] = (1.0, 2.0)
    zoom_out_scale: tuple[float, float] = (0.5, 1.0)
    ratio: tuple[float, float] = field(default=(3.0 / 4.0, 4.0 / 3.0))


def apply_augmentations(
    key: jax.Array,
    image: jnp.ndarray,
    mask: jnp.ndarray,
    config: AugmentConfig | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Apply exactly one randomly-chosen transform (``random_apply=1``).

    The transform index is sampled once per batch (Kornia samples the
    subset per forward call); the chosen transform then gates itself per
    sample with probability ``config.p`` and samples per-sample params.
    """
    cfg = config or AugmentConfig()
    k_choice, k_gate, k_param = jax.random.split(key, 3)
    b = image.shape[0]

    def t_hflip(img, msk):
        return hflip(img, msk)

    def t_vflip(img, msk):
        return vflip(img, msk)

    def t_rot90(img, msk):
        k = jax.random.randint(
            k_param, (b,), cfg.rot90_times[0], cfg.rot90_times[1] + 1
        )
        return _rot90_batch(img, msk, k)

    def t_zoom_in(img, msk):
        return random_resized_crop(k_param, img, msk, cfg.zoom_in_scale, cfg.ratio)

    def t_zoom_out(img, msk):
        return random_resized_crop(k_param, img, msk, cfg.zoom_out_scale, cfg.ratio)

    branches = [t_hflip, t_vflip, t_rot90, t_zoom_in, t_zoom_out]
    idx = jax.random.randint(k_choice, (), 0, len(branches))
    aug_img, aug_mask = jax.lax.switch(idx, branches, image, mask)
    return _bernoulli_blend(k_gate, aug_img, aug_mask, image, mask, cfg.p)
